package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial fingerprint h = Σ cp·31^i mod 1e9+7 over a
  * string's code points (q50's doc identity).
  *
  * The composable formulation — split the text into a per-character
  * array, fold with a Catalyst `aggregate` lambda — allocates an array
  * of single-char strings per document and interprets the fold; this
  * expression walks the string's code points in one loop. Code-point
  * iteration (not UTF-16 units) matches DuckDB's
  * `string_split(text,'') → unicode(c)` oracle semantics. */
case class PolyFingerprint(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"

  /** Analysis-time typing for the SQL surface (`graft_fingerprint`):
    * non-string arguments cast (or fail analysis) instead of blowing up
    * in generated code at runtime. (Result type inferred —
    * AbstractDataType is private[sql].) */
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    PolyFingerprint.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyFingerprint.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyFingerprint =
    copy(child = newChild)
}

object PolyFingerprint {
  final val Mod = 1000000007L

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  def apply(c: Column): Column =
    ColumnBridge.column(PolyFingerprint(ColumnBridge.expression(c)))
}
