package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** fn07: MODEL-BASED text classification as a native expression — the
  * fastText-architecture inference shape (Joulin et al. '16: mean of
  * bucket-hashed word/bigram features → linear classifier → argmax)
  * with BROADCAST WEIGHTS and a loadable weights-file format. This is
  * the upgrade path the heuristic operators declare: q47's stopword
  * language-ID and q104's hashed linear quality score are both special
  * cases of this model class, so a real CCNet/FineWeb-style
  * fastText-class model drops into the same expression by `load`ing
  * its weights file — no operator changes.
  *
  * Scale shape: the model rides the serialized expression to every
  * task exactly like a broadcast-hash-join side (weights are
  * reference-objects in generated code, not per-row closures);
  * inference is one code-point walk per document inside whole-stage
  * codegen — no token array, no UDF, no shuffle.
  *
  * Tokenization mirrors `split(lower(trim(text)), " ")` exactly (the
  * q47/fn04 contract), each token folds the [[PolyFingerprint]] hash
  * h = Σ cp·31^i mod 1e9+7, and the feature bucket is h mod `buckets`.
  * Optional word-BIGRAM features hash as (h₁·31 + h₂) mod 1e9+7.
  * Collisions follow the q114 hashing contract: distinct tokens may
  * share a bucket (spec'd against the fixture corpus); grow `buckets`
  * to shrink the rate, exactly as fastText does. */
final class LinearModel(val classes: Array[String], val buckets: Long,
                        val useBigrams: Boolean, val bias: Array[Float],
                        val rows: java.util.HashMap[java.lang.Long, Array[Float]])
    extends Serializable {
  require(classes.nonEmpty && bias.length == classes.length)

  private final val Mod = 1000000007L

  /** Per-class scores: bias + mean of feature-bucket weight rows —
    * one walk over the code points, no token materialization. A
    * production-sized DENSE model swaps the HashMap row store for a
    * flat float array without touching this walk. */
  def scores(text: String): Array[Double] = {
    val out = new Array[Double](classes.length)
    var c = 0
    while (c < out.length) { out(c) = bias(c); c += 1 }
    val str = text.trim.toLowerCase
    val acc = new Array[Double](classes.length)
    var nFeats = 0L
    var h = 0L        // current token hash
    var prev = -1L    // previous token hash (bigrams)
    def feed(feature: Long): Unit = {
      val row = rows.get(feature % buckets)
      if (row != null) {
        var i = 0
        while (i < acc.length) { acc(i) += row(i); i += 1 }
      }
      nFeats += 1
    }
    def endToken(): Unit = {
      feed(h)
      if (useBigrams && prev >= 0) feed((prev * 31 + h) % Mod)
      prev = h
      h = 0L
    }
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      if (cp == ' ') endToken()
      else h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    endToken()
    c = 0
    while (c < out.length) { out(c) += acc(c) / nFeats; c += 1 }
    out
  }

  /** Argmax class, first-index tie-break (= lexicon/class order —
    * q47's tie cascade). */
  def predict(text: String): String = {
    val s = scores(text)
    var best = 0
    var i = 1
    while (i < s.length) { if (s(i) > s(best)) best = i; i += 1 }
    classes(best)
  }
}

object LinearModel {
  private final val Mod = 1000000007L
  private final val Header = "graft-linear-v1"

  private def tokenHash(tok: String): Long = {
    var h = 0L
    var i = 0
    while (i < tok.length) {
      val cp = tok.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Build the model that reproduces a marker-lexicon argmax
    * classifier (q47's heuristic as a LinearModel): weight 1 for class
    * c in the bucket of each of c's marker words, zero bias. The
    * heuristic becomes a special case of the model — the parity spec
    * pins them equal — and a trained weights file replaces it via
    * [[load]] with no operator change. */
  def fromLexicons(lexicons: Seq[(String, Seq[String])],
                   buckets: Long = 1L << 20): LinearModel = {
    val classes = lexicons.map(_._1).toArray
    val rows = new java.util.HashMap[java.lang.Long, Array[Float]]()
    lexicons.zipWithIndex.foreach { case ((_, words), c) =>
      words.foreach { w =>
        val b = tokenHash(w.trim.toLowerCase) % buckets
        val row = rows.computeIfAbsent(b, _ => new Array[Float](classes.length))
        row(c) += 1.0f
      }
    }
    new LinearModel(classes, buckets, useBigrams = false,
      new Array[Float](classes.length), rows)
  }

  /** Line-oriented weights-file format (human-diffable, store-agnostic
    * via the Hadoop FS API — same transport as the lake manifests):
    * header, classes, buckets, bigram flag, bias row, then one sparse
    * `w,<bucket>,<w_c0>,<w_c1>,…` row per non-zero bucket. */
  def save(spark: SparkSession, path: String, m: LinearModel): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sb = new StringBuilder
    sb ++= Header += '\n'
    sb ++= "classes," + m.classes.mkString(",") += '\n'
    sb ++= s"buckets,${m.buckets}" += '\n'
    sb ++= s"bigrams,${m.useBigrams}" += '\n'
    sb ++= "bias," + m.bias.mkString(",") += '\n'
    val keys = m.rows.keySet().toArray(new Array[java.lang.Long](0)).sorted
    keys.foreach { k =>
      sb ++= s"w,$k," + m.rows.get(k).mkString(",") += '\n'
    }
    val out = f.create(p, true)
    try out.write(sb.result().getBytes("UTF-8")) finally out.close()
  }

  def load(spark: SparkSession, path: String): LinearModel = {
    val p = new org.apache.hadoop.fs.Path(path)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = f.open(p)
    val body = try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      new String(bos.toByteArray, "UTF-8")
    } finally in.close()
    val lines = body.split("\n").filter(_.nonEmpty)
    require(lines.head == Header, s"not a $Header file: ${lines.head}")
    def field(tag: String): String = {
      val l = lines.find(_.startsWith(tag + ",")).getOrElse(
        throw new IllegalArgumentException(s"missing $tag line"))
      l.substring(tag.length + 1)
    }
    val classes = field("classes").split(",")
    val buckets = field("buckets").toLong
    val bigrams = field("bigrams").toBoolean
    val bias = field("bias").split(",").map(_.toFloat)
    val rows = new java.util.HashMap[java.lang.Long, Array[Float]]()
    lines.filter(_.startsWith("w,")).foreach { l =>
      val parts = l.split(",")
      rows.put(parts(1).toLong, parts.drop(2).map(_.toFloat))
    }
    new LinearModel(classes, buckets, bigrams, bias, rows)
  }
}

/** The inference expression: text → argmax class name, the model as a
  * codegen reference object (broadcast with the plan, evaluated inside
  * whole-stage codegen). */
case class ModelPredict(child: Expression, model: LinearModel)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_model_predict"
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(model.predict(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("graftLinearModel", model,
      classOf[LinearModel].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString($m.predict($c.toString()))")
  }

  override protected def withNewChildInternal(newChild: Expression): ModelPredict =
    copy(child = newChild)
}

object ModelPredict {
  def apply(c: Column, model: LinearModel): Column =
    ColumnBridge.column(ModelPredict(ColumnBridge.expression(c), model))
}

/** The score variant: text → the model's score for one class as a
  * double — the REGRESSION/quality shape (a 1-class model over the
  * fn04 bucket hash is exactly q104's scorer class, now with loadable
  * weights instead of the derived hash weights). Same broadcast and
  * codegen story as [[ModelPredict]]. */
case class ModelScore(child: Expression, model: LinearModel, classIdx: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(classIdx >= 0 && classIdx < model.classes.length,
    s"classIdx $classIdx out of range for ${model.classes.length} classes")

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_model_score"
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    model.scores(input.asInstanceOf[UTF8String].toString)(classIdx)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("graftLinearModel", model,
      classOf[LinearModel].getName)
    defineCodeGen(ctx, ev, c => s"$m.scores($c.toString())[$classIdx]")
  }

  override protected def withNewChildInternal(newChild: Expression): ModelScore =
    copy(child = newChild)
}

object ModelScore {
  def apply(c: Column, model: LinearModel, classIdx: Int = 0): Column =
    ColumnBridge.column(ModelScore(ColumnBridge.expression(c), model, classIdx))
}
