package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two array<double> columns.
  *
  * The workhorse scalar of the similarity family (q44/q46 norms and
  * cosines). A `functions.aggregate` lambda evaluates an interpreted
  * HigherOrderFunction per row, and a fully unrolled 64-term expression
  * chain bloats generated methods past JIT limits; this expression
  * generates one tight loop inside whole-stage codegen. Accumulation is
  * strictly left-to-right, so results are bit-identical to the DuckDB
  * oracle's sequential `list_reduce` fold (SURVEY.md §6).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  /** Analysis-time typing for the SQL surface (`graft_dot`): wrong
    * argument types fail analysis (array<float> auto-casts) instead of
    * reinterpreting raw bytes at runtime. (Result type inferred —
    * AbstractDataType is private[sql].) */
  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  /** NULL (not a garbage number) for length-mismatched vectors or null
    * elements — the oracle's sequential list fold propagates NULL the
    * same way. */
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-level entry point, independent of any function registry so
    * it works in sessions the caller created (driver contract). */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
