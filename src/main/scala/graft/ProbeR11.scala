package graft

import org.apache.spark.sql.DataFrame

/** Round-11 10× volume probes (SURVEY §5): the URL/domain curation
  * family q148–q153 at sf0.01 vs sf0.1 (10× docs), warm best-of-2 per
  * side like Probe100/ProbeR10. All six are one-scan plans whose only
  * exchanges carry (short-key, id) rows, so the expectation is ratios
  * well under 10× (scan-dominated, sublinear wall growth).
  *
  * Not part of the driver contract — run manually per round:
  *   sbt "runMain graft.ProbeR11"
  */
object ProbeR11 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => Unit): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f
        Pins.release()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.min
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val walls = scala.collection.mutable.Map[(String, String), Double]()
    for ((sf, tag) <- Seq("/root/testdata/sf0.01" -> "sf0.01",
                          "/root/testdata/sf0.1"  -> "sf0.1")) {
      val docs = Tables.documents(spark, sf)
      walls(("q148_url_normalize", tag)) =
        time(noop(operators.UrlCuration.q148(docs)))
      walls(("q149_blocklist", tag)) =
        time(noop(operators.UrlCuration.q149(docs)))
      walls(("q150_domain_quota", tag)) =
        time(noop(operators.UrlCuration.q150(docs)))
      walls(("q151_url_dedup", tag)) =
        time(noop(operators.UrlCuration.q151(docs)))
      walls(("q152_domain_split", tag)) =
        time(noop(operators.UrlCuration.q152(docs)))
      walls(("q153_domain_profile", tag)) =
        time(noop(operators.UrlCuration.q153(docs)))
      walls(("q154_domain_pagerank", tag)) =
        time(noop(operators.Graphs.q154(docs)))
      val emb = Tables.embeddings(spark, sf)
      walls(("q155_kmeans", tag)) =
        time(noop(operators.KMeans.q155(emb)))
      walls(("q156_cluster_profile", tag)) =
        time(noop(operators.KMeans.q156(emb)))
      walls(("q157_zipf_fit", tag)) =
        time(noop(operators.TextAnalysis.q157(docs)))
      walls(("q158_skyline", tag)) =
        time(noop(operators.Relational.q158(docs)))
      walls(("q159_sentiment", tag)) =
        time(noop(operators.TextAnalysis.q159(docs)))
      walls(("q160_token_entropy", tag)) =
        time(noop(operators.TextAnalysis.q160(docs)))
      walls(("q161_hybrid_rrf", tag)) = time(noop {
        import spark.implicits._
        operators.Similarity.q161(docs, emb,
          Oracles.Bm25Queries.toDF("query_id", "terms"),
          depth = Oracles.HybridDepth)
      })
      walls(("q162_minimizer", tag)) =
        time(noop(operators.Dedup.q162(docs,
          w = Oracles.MinimizerW, minShared = Oracles.MinimizerShared)))
      walls(("q163_novelty", tag)) =
        time(noop(operators.Dedup.q163(docs)))
      walls(("q164_mmr", tag)) = time(noop {
        import org.apache.spark.sql.functions.col
        operators.Similarity.q164(emb.filter(col("vec_id") < 5), emb)
      })
      walls(("q165_lpa", tag)) =
        time(noop(operators.Graphs.q165(docs, iters = Oracles.LpaIters)))
      walls(("q166_rake", tag)) =
        time(noop(operators.TextAnalysis.q166(docs)))
      walls(("q167_chi2", tag)) =
        time(noop(operators.TextAnalysis.q167(docs,
          buckets = Oracles.DsirBuckets)))
      walls(("q168_gini", tag)) =
        time(noop(operators.UrlCuration.q168(docs)))
      walls(("q169_sem_decontam", tag)) = time(noop {
        import org.apache.spark.sql.functions.col
        operators.Similarity.q169(
          emb.filter(col("vec_id") >= Oracles.SemBenchIds),
          emb.filter(col("vec_id") < Oracles.SemBenchIds),
          tau = Oracles.SemDecontamTau)
      })
      walls(("q170_temporal_split", tag)) =
        time(noop(operators.Events.q170(Tables.events(spark, sf))))
      walls(("q171_shard_rebalance", tag)) =
        time(noop(operators.Sharding.q171(docs, n = Oracles.ShardN,
          m = Oracles.ShardM, vnodes = Oracles.ShardVnodes)))
      walls(("q172_attribution", tag)) =
        time(noop(operators.Events.q172(Tables.events(spark, sf))))
      walls(("q173_hourly_anomaly", tag)) =
        time(noop(operators.Events.q173(Tables.events(spark, sf))))
      walls(("q174_triangles", tag)) =
        time(noop(operators.Graphs.q174(docs)))
      walls(("q175_khop", tag)) =
        time(noop(operators.Graphs.q175(docs, hops = Oracles.KhopHops)))
      walls(("q176_dedup_savings", tag)) =
        time(noop(operators.Dedup.q176(docs)))
      println(s"[probeR11] $tag done (n_doc=${docs.count()})")
    }
    for (op <- Seq("q148_url_normalize", "q149_blocklist",
                   "q150_domain_quota", "q151_url_dedup",
                   "q152_domain_split", "q153_domain_profile",
                   "q154_domain_pagerank", "q155_kmeans",
                   "q156_cluster_profile", "q157_zipf_fit",
                   "q158_skyline", "q159_sentiment",
                   "q160_token_entropy", "q161_hybrid_rrf",
                   "q162_minimizer", "q163_novelty", "q164_mmr",
                   "q165_lpa", "q166_rake", "q167_chi2",
                   "q168_gini", "q169_sem_decontam",
                   "q170_temporal_split", "q171_shard_rebalance",
                   "q172_attribution", "q173_hourly_anomaly",
                   "q174_triangles", "q175_khop",
                   "q176_dedup_savings")) {
      val s = walls((op, "sf0.01")); val b = walls((op, "sf0.1"))
      println(f"[probeR11] $op%-20s sf0.01=$s%7.2fs sf0.1=$b%7.2fs " +
        f"ratio=${b / s}%5.2fx")
    }
    spark.stop()
  }
}
