package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Natural log via `java.lang.Math.log` — NOT Spark's built-in `log`,
  * which routes through `StrictMath.log` (fdlibm). The two differ in
  * the last ulp on a small fraction of inputs, and the engines we
  * cross-check against (DuckDB → glibc `std::log`, and `Math.log`'s
  * platform intrinsic) agree with EACH OTHER on every input the corpus
  * operators produce (probe-verified over the live idf/probability
  * ranges at sf0.001/0.01/0.1, plus 5 000-point sweeps) — so q85/q86
  * stay hash-exact against the oracle where `StrictMath` drifts.
  *
  * The trade: `Math.log` is allowed to vary BY PLATFORM (that is why
  * Spark chose StrictMath), so cross-engine parity here assumes the
  * usual x86-64/aarch64 libm behavior every mainstream JDK ships. For
  * oracle-checked analytics that is the right default; a bitwise
  * platform-pinned variant is one `StrictMath` swap away. */
case class PlatformLn(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_ln"
  override def inputTypes = Seq(DoubleType)
  override def nullable: Boolean = true

  override def nullSafeEval(x: Any): Any =
    java.lang.Math.log(x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"java.lang.Math.log($x)")

  override protected def withNewChildInternal(newChild: Expression): PlatformLn =
    copy(child = newChild)
}

object PlatformLn {
  def apply(c: Column): Column =
    ColumnBridge.column(PlatformLn(ColumnBridge.expression(c)))
}
