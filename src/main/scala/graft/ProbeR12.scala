package graft

import org.apache.spark.sql.DataFrame

/** Round-12 10× volume probes (SURVEY §5): the iterative GRAPH family
  * q154/q165/q174/q175/q180 at sf0.01 vs sf0.1 (10× docs), warm
  * best-of-2 per side like ProbeR11 — run AFTER the thresholded
  * co-partitioned path landed, to record the family's scale ratios
  * with the final round shapes. Also times the CO-PARTITIONED path
  * (`broadcastNodeLimit = 0`) against the broadcast path at sf0.1:
  * at test scale broadcast should win (that is why the threshold
  * exists), and the probe quantifies the gap the threshold is
  * trading away when a graph is too big to broadcast.
  *
  * Not part of the driver contract — run manually per round:
  *   sbt "runMain graft.ProbeR12"
  */
object ProbeR12 {
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
      walls(("q154_pagerank", tag)) =
        time(noop(operators.Graphs.q154(docs)))
      walls(("q165_lpa", tag)) =
        time(noop(operators.Graphs.q165(docs, iters = Oracles.LpaIters)))
      walls(("q174_triangles", tag)) =
        time(noop(operators.Graphs.q174(docs)))
      walls(("q175_khop", tag)) =
        time(noop(operators.Graphs.q175(docs, hops = Oracles.KhopHops)))
      walls(("q180_hits", tag)) =
        time(noop(operators.Graphs.q180(docs)))
      println(s"[probeR12] $tag done (n_doc=${docs.count()})")
    }
    println(f"[probeR12] ${"op"}%-16s ${"sf0.01"}%8s ${"sf0.1"}%8s ratio")
    for (op <- Seq("q154_pagerank", "q165_lpa", "q174_triangles",
                   "q175_khop", "q180_hits")) {
      val a = walls((op, "sf0.01")); val b = walls((op, "sf0.1"))
      println(f"[probeR12] $op%-16s $a%8.2f $b%8.2f ${b / a}%5.2fx")
    }

    // broadcast vs co-partitioned at sf0.1 (both on the crawl graph):
    // the co-partitioned path pays node-table shuffles per round in
    // exchange for removing the broadcast ceiling
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val e = operators.Graphs.crawlEdges(docs)
    val bcast = time(noop(operators.Graphs.pagerank(e)))
    val copart = time(noop(operators.Graphs.pagerank(e,
      broadcastNodeLimit = 0L)))
    println(f"[probeR12] pagerank sf0.1: broadcast $bcast%.2f s, " +
      f"co-partitioned $copart%.2f s (${copart / bcast}%.2fx)")
    spark.stop()
  }
}
