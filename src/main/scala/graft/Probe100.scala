package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 100× volume probe for the composite pipelines (SURVEY §5): compares
  * each pipeline's wall time on the sf0.01 corpus (~5k docs) vs a ×10
  * replication of sf0.1 (~500k docs ≈ sf1-equivalent) — 100× the doc
  * volume. Each replica's text is salted by SUFFIXING every word with
  * the replica id (token and shingle COUNTS unchanged — an earlier
  * variant that inserted a salt token between words doubled the token
  * stream and changed the workload, not just the volume), so replicas
  * are disjoint in shingle space: the probe measures volume scaling
  * with the natural corpus' near-dup density, not an adversarial
  * 10-clique per document (that regime is the DedupSpec
  * adversarial-clique test's job). Warm best-of-2 per side.
  *
  * Not part of the driver contract — run manually per round:
  *   sbt "runMain graft.Probe100"
  */
object Probe100 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val bigPath = "/tmp/probe100_documents.parquet"
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    (0 until 10).map { i =>
      base.select(
        (col("doc_id") + lit(i * 100000000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"$$1r$i").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(bigPath)
    val small = Tables.documents(spark, "/root/testdata/sf0.01")
    val big = spark.read.parquet(bigPath)
    println(s"[probe100] small=${small.count()} big=${big.count()}")

    def time(f: => DataFrame): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.min

    val pipelines: Seq[(String, DataFrame => DataFrame)] = Seq(
      "q64_dedup_clusters" -> (d => operators.Dedup.q64(d)),
      "q65_clean_corpus"   -> (d => operators.Pipeline.cleanCorpus(d)),
      "q65_clean_scrubbed" -> (d => operators.Pipeline.cleanCorpus(d, scrubSpans = true)),
      "q84_dedup_editdist" -> (d => operators.Dedup.q84(d)),
      "q94_media_clean"    -> (d => operators.Multimodal.q94(spark, d)),
      "q105_canonical"     -> (d => operators.Pipeline.q105(d)))
    pipelines.foreach { case (name, fn) =>
      val ts = time(fn(small))
      val tb = time(fn(big))
      val ratio = tb / ts
      println(f"[probe100] $name%-20s small=$ts%7.2fs big=$tb%8.2fs " +
        f"ratio=$ratio%6.1fx exponent=${math.log(ratio) / math.log(100)}%.2f")
    }
    spark.stop()
  }
}
