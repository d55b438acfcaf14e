package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** q104's hashed-feature linear quality score as ONE native expression:
  * tokenize → polynomial bucket hash → signed weight → integer
  * accumulate → single float divide, all in a single code-point walk
  * over the document — no token array allocation, no interpreted
  * lambda, no shuffle. This is the per-row form the streaming gate
  * (st14) runs at ingest; QualityScoreSpec/FunctionsSpec assert bit
  * parity with the batch q104 aggregate (the integer weight sum is
  * order-independent, so the two plans cannot drift).
  *
  * Tokenization mirrors `split(lower(trim(text)), " ")` exactly,
  * including empty segments from consecutive spaces and the single
  * empty token of an all-space document: trim strips ASCII spaces,
  * lowercasing is UTF8String semantics, token boundaries are single
  * ' ' code points, and each token folds h = Σ cp·31^i mod 1e9+7
  * ([[PolyFingerprint]] semantics) into bucket h mod 16, weight
  * ((bucket+1)·2654435761 mod P) − (P−1)/2. */
case class QualityScore(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_quality_score"

  override def inputTypes = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    QualityScore.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QualityScore.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): QualityScore =
    copy(child = newChild)
}

object QualityScore {
  final val Mod = 1000000007L
  final val Mult = 2654435761L
  final val Buckets = 16L
  private final val Half = (Mod - 1) / 2

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): Double = {
    val str = s.trim().toLowerCase().toString
    var acc = 0L   // exact integer weight sum
    var n = 0L     // token count (split semantics: segments + 1)
    var h = 0L     // rolling fingerprint of the current token
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      if (cp == ' ') {
        acc += (h % Buckets + 1) * Mult % Mod - Half
        n += 1
        h = 0L
      } else {
        h = (h * 31 + cp) % Mod
      }
      i += Character.charCount(cp)
    }
    acc += (h % Buckets + 1) * Mult % Mod - Half
    n += 1
    acc.toDouble / (Mod.toDouble * n)
  }

  def apply(c: Column): Column =
    ColumnBridge.column(QualityScore(ColumnBridge.expression(c)))
}
