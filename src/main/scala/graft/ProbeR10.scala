package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-10 10× volume probes (SURVEY §5): the round-9/10 additions
  * with no probe notes yet — the scrubbed pipeline stage and the s11
  * persisted-index lifecycle (fit once, serve query batches, append an
  * ingest increment) — timed at sf0.01 vs sf0.1 (10× docs/vectors),
  * warm best-of-2 per side like Probe100. The bench-covered r9 queries
  * (q123/q124/q125) are probed through the Bench name filter instead,
  * so their numbers share the committed harness.
  *
  * Not part of the driver contract — run manually per round:
  *   sbt "runMain graft.ProbeR10"
  */
object ProbeR10 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    // a previous probe JVM's table DIRECTORIES outlive its in-memory
    // catalog, and CTAS refuses an existing managed location — wipe
    // the probe namespaces before fitting
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rmrf))
      f.delete(); ()
    }
    Option(new java.io.File("spark-warehouse").listFiles)
      .foreach(_.filter(_.getName.startsWith("probe_")).foreach(rmrf))

    def time(f: => Unit): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.min
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val walls = scala.collection.mutable.Map[(String, String), Double]()
    for ((sf, tag) <- Seq("/root/testdata/sf0.01" -> "sf0.01",
                          "/root/testdata/sf0.1"  -> "sf0.1")) {
      val docs = Tables.documents(spark, sf)
      val emb  = Tables.embeddings(spark, sf)

      walls(("clean_scrubbed", tag)) =
        time(noop(operators.Pipeline.cleanCorpus(docs, scrubSpans = true)))

      // s11 lifecycle: fit is eager (writes the five tables) — time one
      // full fit; then serve a 100-vector external batch per path; then
      // append a 5% increment
      val name = "probe_annix_" + tag.replace(".", "")
      val nVec = emb.count()
      val qBatch = emb.filter(col("vec_id") < 100)
        .select((col("vec_id") + 100000000L).as("vec_id"), col("embedding"))
      val incCut = (nVec * 95) / 100
      val fitPart = emb.filter(col("vec_id") < incCut)
      val incPart = emb.filter(col("vec_id") >= incCut)
        .select((col("vec_id") + 200000000L).as("vec_id"), col("embedding"))
      walls(("s11_fit", tag)) = time {
        operators.AnnIndex.drop(spark, name)
        operators.AnnIndex.fit(emb, name)
      }
      walls(("s11_searchLsh", tag)) =
        time(noop(operators.AnnIndex.searchLsh(qBatch, name)))
      walls(("s11_searchIvf", tag)) =
        time(noop(operators.AnnIndex.searchIvf(qBatch, name)))
      walls(("s11_searchInt8", tag)) =
        time(noop(operators.AnnIndex.searchInt8(qBatch, name)))
      walls(("s11_searchPq", tag)) =
        time(noop(operators.AnnIndex.searchPq(qBatch, name)))
      walls(("s11_searchIvfPq", tag)) =
        time(noop(operators.AnnIndex.searchIvfPq(qBatch, name)))
      // append timed alone on a fresh fit each iteration (an append
      // into an already-appended index would double the increment)
      walls(("s11_append5pct", tag)) = (1 to 2).map { _ =>
        operators.AnnIndex.drop(spark, name + "_inc")
        operators.AnnIndex.fit(fitPart, name + "_inc")
        val t0 = System.nanoTime()
        operators.AnnIndex.append(incPart, name + "_inc")
        (System.nanoTime() - t0) / 1e9
      }.min

      // s12 lifecycle: fit the digest index on the doc corpus, serve a
      // 20% re-keyed batch, append a 5% novel increment (suffix-salted
      // so its digests are genuinely new)
      val dixName = "probe_dedupix_" + tag.replace(".", "")
      val nDoc = docs.count()
      val dedupBatch = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000000L).as("doc_id"), col("text"))
      val incDocs = docs.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 200000000L).as("doc_id"),
          concat(col("text"), lit(" probe salt "), col("doc_id")).as("text"))
      walls(("s12_fit", tag)) = time {
        operators.DedupIndex.drop(spark, dixName)
        operators.DedupIndex.fit(docs, dixName)
      }
      walls(("s12_dedup20pct", tag)) =
        time(noop(operators.DedupIndex.dedup(dedupBatch, dixName)))
      walls(("s12_append5pct", tag)) = (1 to 2).map { _ =>
        operators.DedupIndex.drop(spark, dixName + "_inc")
        operators.DedupIndex.fit(docs, dixName + "_inc")
        val t0 = System.nanoTime()
        operators.DedupIndex.append(incDocs, dixName + "_inc")
        (System.nanoTime() - t0) / 1e9
      }.min
      // s13 lifecycle: fit the near-dup index, serve a 20% batch whose
      // odd rows are one-word rewrites (so the near path does real
      // verify work), append a 5% novel increment
      val nixName = "probe_neardupix_" + tag.replace(".", "")
      val nearBatch = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000000L).as("doc_id"),
          when(col("doc_id") % 2 === 0,
            concat(col("text"), lit(" probenear tail")))
            .otherwise(col("text")).as("text"))
      walls(("s13_fit", tag)) = time {
        operators.NearDupIndex.drop(spark, nixName)
        operators.NearDupIndex.fit(docs, nixName)
      }
      walls(("s13_dedup20pct", tag)) =
        time(noop(operators.NearDupIndex.dedup(nearBatch, nixName)))
      walls(("s13_append5pct", tag)) = (1 to 2).map { _ =>
        operators.NearDupIndex.drop(spark, nixName + "_inc")
        operators.NearDupIndex.fit(docs, nixName + "_inc")
        val t0 = System.nanoTime()
        operators.NearDupIndex.append(incDocs, nixName + "_inc")
        (System.nanoTime() - t0) / 1e9
      }.min
      // s14 lifecycle: fit the BM25 inverted index, serve the driver's
      // standing query batch, append a 5% novel increment
      val bixName = "probe_bm25ix_" + tag.replace(".", "")
      val bmQueries = {
        import spark.implicits._
        graft.Oracles.Bm25Queries.toDF("query_id", "terms")
      }
      walls(("s14_fit", tag)) = time {
        operators.Bm25Index.drop(spark, bixName)
        operators.Bm25Index.fit(docs, bixName)
      }
      walls(("s14_search", tag)) =
        time(noop(operators.Bm25Index.search(bmQueries, bixName)))
      walls(("s14_append5pct", tag)) = (1 to 2).map { _ =>
        operators.Bm25Index.drop(spark, bixName + "_inc")
        operators.Bm25Index.fit(docs, bixName + "_inc")
        val t0 = System.nanoTime()
        operators.Bm25Index.append(incDocs, bixName + "_inc")
        (System.nanoTime() - t0) / 1e9
      }.min
      println(s"[probeR10] $tag done (n_vec=$nVec, n_doc=$nDoc)")
    }
    for (op <- Seq("clean_scrubbed", "s11_fit", "s11_searchLsh",
                   "s11_searchIvf", "s11_searchInt8", "s11_searchPq",
                   "s11_searchIvfPq", "s11_append5pct",
                   "s12_fit", "s12_dedup20pct", "s12_append5pct",
                   "s13_fit", "s13_dedup20pct", "s13_append5pct",
                   "s14_fit", "s14_search", "s14_append5pct")) {
      val s = walls((op, "sf0.01")); val b = walls((op, "sf0.1"))
      println(f"[probeR10] $op%-16s sf0.01=$s%7.2fs sf0.1=$b%7.2fs " +
        f"ratio=${b / s}%5.2fx")
    }
    spark.stop()
  }
}
