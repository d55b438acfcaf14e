package graft

/** Measurement utility (optimization rounds): time each of q193's six
  * ANN serving lanes SEPARATELY — the per-lane instrumentation r19
  * named as the blocker for optimizing q193 ("105 jobs are the six
  * lanes' inherent fan-out" was measured only in aggregate). Builds
  * the lanes through [[graft.operators.Similarity.q193Lanes]] — the
  * exact production composition, shared fits and pins included — and
  * materializes each through the noop sink in q193's report order.
  *
  * Reading the numbers: lanes share pinned frames (vecs, codes,
  * ivfCands), so the FIRST lane touching a shared pin pays its
  * materialization; run 2 (warm pins, same session) separates a lane's
  * own cost from shared-frame cost. The fits (ivfFit/pqFit/q44 truth
  * pin) are timed on their own lines. Usage:
  *   runMain graft.Q193Probe [runs]
  */
object Q193Probe {
  def main(args: Array[String]): Unit = {
    val runs = if (args.nonEmpty) args(0).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sfDir)
    def t[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    (1 to runs).foreach { run =>
      val (exact, tTruth) = t {
        val e = graft.Pins.pin(
          graft.operators.Similarity.q44(emb).select(col("qid"), col("nid")))
        e.write.format("noop").mode("overwrite").save(); e
      }
      val (lanes, tFits) = t(graft.operators.Similarity.q193Lanes(emb))
      println(f"[q193probe] run$run truth(q44+pin)=$tTruth%.2fs fits(ivf+pq)=$tFits%.2fs")
      lanes.foreach { case (name, lane) =>
        spark.sparkContext.setJobDescription(s"q193 lane: $name")
        val (_, dt) = t(lane.write.format("noop").mode("overwrite").save())
        println(f"[q193probe] run$run lane=$name%-6s $dt%7.2fs")
      }
      spark.sparkContext.setJobDescription(null)
      val _ = exact
      graft.Pins.release(); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
