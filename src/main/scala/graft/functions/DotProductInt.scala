package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst dot product over two array<int> columns — the
  * integer sibling of [[DotProduct]], for QUANTIZED vector codes
  * (q74's int8 scheme stores codes as array<int>). Accumulates in
  * long, so up to ~2^31 elements of int8·int8 products are exact with
  * no float rounding at all — candidate scoring over quantized codes
  * is bit-reproducible on any engine and any accumulation order.
  * Same shape as [[DotProduct]]: one tight loop inside whole-stage
  * codegen, NULL on length mismatch or null elements.
  *
  * Overflow contract: each int·int product is promoted to long before
  * accumulating (cannot overflow — |product| ≤ 2^62), and the RUNNING
  * SUM accumulates via `Math.addExact`, so a general SQL caller
  * (`graft_dot_int` is registered for any array<int>) who exceeds the
  * int64 range gets an ArithmeticException, not a silently wrapped
  * value. For the intended int8-range codes the sum can't come near
  * the bound (2^31 elements × 127² ≪ 2^63) and addExact JIT-compiles
  * to the same add + no-taken-branch as a raw `+`.
  */
case class DotProductInt(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_int"

  override def inputTypes =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc = Math.addExact(acc, x.getInt(i).toLong * y.getInt(i))
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
         |long $acc = 0L;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc = Math.addExact($acc, (long) $a.getInt($i) * $b.getInt($i));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductInt =
    copy(left = newLeft, right = newRight)
}

object DotProductInt {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductInt(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
