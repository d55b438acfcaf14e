package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY.md §2c).
  *
  * Float discipline: elements are cast float→double (exact), then dot
  * products fold strictly left-to-right (`aggregate`), which DuckDB's
  * `list_reduce` mirrors — so cosine values are bit-identical across
  * engines and thresholds/rankings agree.
  */
object Similarity {

  /** (vec_id, v: array<double>, norm) with a deterministic norm. */
  def normalized(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("norm",
        sqrt(aggregate(transform(col("v"), x => x * x), lit(0.0), (acc, x) => acc + x)))

  /** Sequential-fold dot product of two equal-length double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def cosinePairs(embeddings: DataFrame, queryPred: Column): DataFrame = {
    val n = normalized(embeddings)
    val q = n.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qn"))
    // Broadcast the (small) query side; the corpus streams — at 100 TB the
    // corpus never materializes pairwise, each partition scans locally.
    broadcast(q)
      .join(n.select(col("vec_id").as("nid"), col("v").as("nv"), col("norm").as("nn")),
        col("qid") =!= col("nid"))
      .withColumn("cos", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
  }

  /** q44: brute-force cosine top-5 neighbors for the first 20 query
    * vectors — the exact baseline every ANN variant is judged against. */
  def q44(embeddings: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    cosinePairs(embeddings, col("vec_id") < 20)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("qid"), col("nid"), col("cos"), col("rk"))
      .orderBy(col("qid"), col("rk"))
  }

  val Tables      = 8  // L hash tables (OR-amplification → recall)
  val PlanesPerTable = 8  // k planes per table (AND-amplification → precision)

  /** Deterministic random hyperplanes, planes(table)(j) ∈ R^64. */
  private lazy val planes: Seq[Seq[Seq[Double]]] = {
    val rng = new scala.util.Random(20260812L)
    Seq.fill(Tables, PlanesPerTable)(Seq.fill(64)(rng.nextGaussian()))
  }

  /** Random-hyperplane signature for one table: bit j = sign(v·plane_j). */
  def rhpSignature(v: Column, table: Int): Column =
    (0 until PlanesPerTable).map { j =>
      val p = typedLit(planes(table)(j))
      when(dot(v, p) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** q45: multi-table LSH ANN — the 100 TB scale path. Each vector lands
    * in one bucket per table (L=8 tables × 2^8 buckets); neighbor
    * candidates come from an equi-join on (table, bucket), so two vectors
    * meet iff they agree on all 8 plane signs in at least one table —
    * P(meet) = 1-(1-(1-θ/π)^k)^L ≈ 0.93 for cos=0.8, ≈ 0.03 for cos=0.
    * Shuffle is ∝ L·n + candidate pairs, never n². Exact cosine re-ranks
    * candidates; top-k per query. */
  def q45(embeddings: DataFrame): DataFrame = {
    val n = normalized(embeddings)
    val sig = n.select(col("vec_id"), col("v"), col("norm"),
      explode(array((0 until Tables).map(t =>
        struct(lit(t).as("t"), rhpSignature(col("v"), t).as("bucket"))): _*)).as("tb"))
      .select(col("vec_id"), col("v"), col("norm"),
        col("tb.t").as("t"), col("tb.bucket").as("bucket"))
    val candidates = sig.as("a")
      .join(sig.as("b"),
        col("a.t") === col("b.t") && col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("qid"), col("b.vec_id").as("nid"),
        (dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm"))).as("cos"))
      .distinct()  // same pair can collide in several tables
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    candidates
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("qid"), col("nid"), col("cos"), col("rk"))
      .orderBy(col("qid"), col("rk"))
  }

  /** q46: embedding-cosine near-duplicate pairs (cos > 0.4, a<b). */
  def q46(embeddings: DataFrame): DataFrame = {
    val n = normalized(embeddings)
    n.as("a")
      .join(n.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        (dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm"))).as("cos"))
      .filter(col("cos") > 0.4)
      .orderBy(col("id_a"), col("id_b"))
  }
}
