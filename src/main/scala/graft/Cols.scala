package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Column helpers shared across operators.
  *
  * Float discipline for oracle hash-matching (SURVEY.md §6): money math
  * goes through DECIMAL(18,4) so sums are exact and order-independent
  * (a requirement once partial aggregation reorders additions across
  * 1000 executors), then `round(_, 2).cast(double)` — both Spark and
  * DuckDB produce identical bits from the same exact decimal.
  */
object Cols {
  val Money: DecimalType = DecimalType(18, 4)

  /** Cast to exact money decimal. */
  def dec(c: Column): Column = c.cast(Money)

  /** Literal 1 as money decimal (for `1 - l_discount` style exprs). */
  def oneDec: Column = lit(1).cast(Money)

  /** Exact decimal SUM of a money column, emitted as a stable double. */
  def moneySum(c: Column): Column = round(sum(dec(c)), 2).cast(DoubleType)

  /** Same, for an expression that is already decimal (e.g. a product). */
  def sumStable(e: Column): Column = round(sum(e), 2).cast(DoubleType)

  /** `l_extendedprice * (1 - l_discount)` in exact decimal. */
  def discPrice(price: Column, discount: Column): Column =
    dec(price) * (oneDec - dec(discount))

  /** Order-stable mean: exact decimal sum, one double division. */
  def meanStable(c: Column): Column =
    sum(dec(c)).cast(DoubleType) / count(lit(1))
}
