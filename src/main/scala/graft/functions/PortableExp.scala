package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** exp with cross-engine BIT parity — [[GraftMath.portableExp]], the
  * fixed double-op sequence the DuckDB oracle replays in generated SQL
  * ([[graft.Oracles]]). Composed with [[PortableLn]] it gives a
  * bit-deterministic pow: x^a = exp(a·ln x) — the temperature-scaling
  * primitive q120 needs. Codegen-friendly: one static call. */
case class PortableExp(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_exp"
  override def inputTypes = Seq(DoubleType)
  override def nullable: Boolean = true

  override def nullSafeEval(x: Any): Any =
    GraftMath.portableExp(x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.GraftMath.portableExp($x)")

  override protected def withNewChildInternal(newChild: Expression): PortableExp =
    copy(child = newChild)
}

object PortableExp {
  def apply(c: Column): Column =
    ColumnBridge.column(PortableExp(ColumnBridge.expression(c)))
}
