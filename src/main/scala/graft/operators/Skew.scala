package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §5). AQE's skew-join splitting handles
  * most cases at runtime; explicit salting remains the tool when one
  * join key dominates so heavily that even split shuffle blocks land on
  * one executor (e.g. the null/default key of a 100 TB fact table).
  */
object Skew {

  val SaltCol = "__graft_salt"

  /** Salted equi-join: the big (skewed) side scatters each row into one
    * of `salt` buckets; the small side replicates `salt`× so every
    * bucket can match. Shuffle parallelism on a hot key becomes `salt`
    * tasks instead of one. Result is row-identical to `big.join(small,
    * key)`; small-side cost is salt× replication — keep `salt` ≤ ~32 and
    * the small side dimension-sized. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    val bigS = big.withColumn(SaltCol,
      pmod(xxhash64(col(key), spark_partition_id(), monotonically_increasing_id()), lit(salt)))
    val smallS = small.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(salt - 1L))))
    bigS.join(smallS, Seq(key, SaltCol), joinType).drop(SaltCol)
  }

  /** q81: join-key skew report — the diagnostic run BEFORE pointing a
    * big join at a 100 TB fact table: the top-10 heaviest values of the
    * join key with row counts and corpus share. A key holding ≫ 1/tasks
    * of the rows is the one AQE's skew split or [[saltedJoin]] must
    * handle. One partial-aggregated shuffle + TakeOrderedAndProject;
    * share is a single double divide against a broadcast total derived
    * from the same aggregate. */
  def q81(fact: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    val perKey = fact.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_rows"))
    // total via a broadcast single-row reduction of the SAME aggregate
    // subtree (exchange-reused at runtime, one fact scan) — NOT an
    // unpartitioned window, which would drag the whole key space
    // through one task when the join key is high-cardinality
    val total = perKey.agg(sum(col("n_rows")).as("total_rows"))
    perKey.crossJoin(broadcast(total))
      .withColumn("share", col("n_rows").cast("double") / col("total_rows"))
      .select(col("key"), col("n_rows"), col("share"))
      .orderBy(col("n_rows").desc, col("key"))
      .limit(topK)
  }

  /** q71: the salted join as a driver-checked operator — lineitem
    * (fact) ⋈ supplier (dim) through [[saltedJoin]], aggregated per
    * supplier nation. The salt is invisible in the result (row-identical
    * to the plain join), so the DuckDB oracle is the plain join+agg —
    * the driver gate proves the rewrite is lossless on real data, the
    * SkewSpec property test proves it on a planted hot key. */
  def q71(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    import graft.Cols._
    val big = lineitem.select(col("l_suppkey").as("s_suppkey"),
      col("l_extendedprice"))
    saltedJoin(big, supplier.select(col("s_suppkey"), col("s_nationkey")),
        "s_suppkey", salt = 8)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"),
        moneySum(col("l_extendedprice")).as("revenue"))
      .orderBy(col("s_nationkey"))
  }
}
