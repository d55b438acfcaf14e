package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Natural log with cross-engine BIT parity: evaluates
  * [[GraftMath.portableLn]], the fixed double-op sequence the DuckDB
  * oracle replays in generated SQL ([[graft.Oracles]]), so Spark and
  * the oracle agree bitwise on every input — not just on the inputs a
  * probe happened to cover. Replaces the former Math.log-based
  * PlatformLn, which lost the last-ulp lottery on q116's idf inputs
  * (Math.log, StrictMath.log and glibc log are all merely faithful and
  * mutually disagree on ~1e-3 of inputs). Still codegen-friendly: one
  * static call, no boxing. */
case class PortableLn(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_ln"
  override def inputTypes = Seq(DoubleType)
  override def nullable: Boolean = true

  override def nullSafeEval(x: Any): Any =
    GraftMath.portableLn(x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.GraftMath.portableLn($x)")

  override protected def withNewChildInternal(newChild: Expression): PortableLn =
    copy(child = newChild)
}

object PortableLn {
  def apply(c: Column): Column =
    ColumnBridge.column(PortableLn(ColumnBridge.expression(c)))
}
