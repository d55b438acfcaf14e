package graft

/** Driver benchmark: every SparkEntry query against SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout. Results are fully materialized via a
  * zero-overhead noop sink (`count()` would let Catalyst prune the
  * projections and under-report scan/compute cost). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // optional arg (local probes only; the driver passes none):
    // comma-separated name substrings — bench just the matching queries.
    // A filtered run NEVER writes BENCH_LOCAL.json (partial totals must
    // not masquerade as the committed full-query-set baseline).
    val only = args.headOption.map(_.split(",").toSeq)
    // loadavg sentinel: sample BEFORE the session/warmup — the warmup
    // itself drives 32 threads, so a post-warmup sample conflates the
    // bench's own load with external pollution (r10: clean launches
    // read 1.3–2.5 post-warmup and tripped the guard; a truly loaded
    // box reads 4–12 either way). Keep the MAX across the run too —
    // it includes self-load by design, the spread column separates a
    // mid-run burst from a real regression.
    def loadavg(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val loadavgStart = loadavg()
    var loadavgMax = loadavgStart
    val spark = GraftSession.local()
    // JIT/codegen warmup over SYNTHETIC data (no table file is touched):
    // exercises the hot execution classes — decimal partial aggregation,
    // hash join, window functions, sort — so per-query timings measure
    // the operator, not first-use class loading + JIT.
    locally {
      import org.apache.spark.sql.functions._
      val a = spark.range(2000000).select((col("id") % 97).as("k"),
        (col("id") % 1000).cast("decimal(18,4)").as("d"))
      a.groupBy("k").agg(sum(col("d")), avg(col("d")), countDistinct(col("d")))
        .write.format("noop").mode("overwrite").save()
      val b = spark.range(100000).select((col("id") % 1000).as("k"), col("id").as("v"))
      b.join(spark.range(1000).toDF("k"), "k")
        .select(col("k"), col("v"),
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("k").orderBy("v")).as("rn"))
        .orderBy(col("k"), col("rn")).limit(10)
        .write.format("noop").mode("overwrite").save()
      // warm the vectorized parquet reader classes on a 5-row dim table
      // from the SMALLEST sf dir — not the benchmarked dataset
      try spark.read.parquet("/root/testdata/sf0.001/region.parquet")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      // warm the ImageIO codec path (render → PNG encode → decode →
      // dHash): the first codec pass pays ~6x its warm cost in class
      // loading + JIT (r7 committed bench: q93 spread 24.7 s, best
      // 4.15 s) — without this, the spread column of whichever codec
      // query runs FIRST (q51/q52/q53/q93/q94) reads as machine noise
      // instead of real variance
      locally {
        import graft.operators.Multimodal
        val img = Multimodal.renderImage("codec warmup tokens here", 24, 24)
        val png = Multimodal.encodePng(img)
        Multimodal.decodeImage(png).foreach { case (d, _) => Multimodal.dHash(d) }
      }
    }
    loadavgMax = math.max(loadavgMax, loadavg())
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.contains)) }
      .map { case (name, fn) =>
      def once(): Option[Double] = {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); false }
        val dt = (System.nanoTime() - t0) / 1e9
        // drop caches an operator persisted for its own internal reuse —
        // a lingering cache would tax every LATER query's GC instead of
        // being accounted to the query that created it
        graft.Pins.release()
        spark.catalog.clearCache()
        if (ok) Some(dt) else None
      }
      // MEDIAN-of-3 over SUCCESSFUL runs (r15; was best-of-3): the min
      // hides real per-query variance — two clean runs of identical
      // r14 code differed 38% on one query under best-of-3, which made
      // every per-query perf claim unfalsifiable. The median absorbs
      // the one-off GC/JIT outlier (the reason best-of existed) while
      // tracking the typical cost; with 2 successes the LOWER median
      // keeps the old bias direction, and a query with no successful
      // run still reports -1 (a fast FAILURE must never masquerade as
      // a fast run). The max-min spread is kept alongside so a reader
      // can separate regression from machine noise without a re-run.
      val runs = Seq(once(), once(), once()).flatten.sorted
      loadavgMax = math.max(loadavgMax, loadavg())
      (name,
        if (runs.isEmpty) -1.0 else runs((runs.size - 1) / 2),
        if (runs.size >= 2) runs.max - runs.min else -1.0)
    }
    val total = results.map(_._2).sum
    // STDOUT LINE MUST STAY UNDER ~2000 BYTES: the driver keeps only the
    // last ~2 KB of stdout and json-parses that tail — rounds 1-4 all
    // recorded `parsed: null` because the full-name per-query map pushed
    // the line past the buffer and its head was cut off; at 201 queries
    // the r13/r14 2-decimal map overflowed AGAIN (the driver captured
    // only the last ~164 queries). r15: per-query values go out as
    // CENTISECOND INTEGERS ("qunit":"centisec" self-describes) — ~8
    // bytes/query keeps 205+ queries near 1.7 KB; full names, seconds,
    // and the max-min spread live in BENCH_LOCAL.json.
    val qsShort = results.map { case (k, v, _) =>
      "\"" + k.split("_")(0).drop(1) + "\":" + math.round(v * 100) }
      .mkString("{", ",", "}")
    // self-describing provenance: the sentinel's verdict travels IN the
    // driver-facing JSON, so a judge comparing rounds sees "polluted"
    // next to the number instead of reverse-engineering it from loadavg
    val polluted = loadavgStart > 2.0
    // one-time index-fit cost (s27): paid inside the first q64-family
    // query's FIRST run and excluded by the median — report it next to
    // the total so the served-label savings are never read as if the
    // fit were free (r16 review)
    val fit = f""""index_fit_sec":${SparkEntry.indexFitSec}%.2f"""
    val load =
      f""""loadavg_start":$loadavgStart%.2f,"loadavg_max":$loadavgMax%.2f,"polluted":$polluted"""
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","stat":"median3","qunit":"centisec",$load,$fit,"queries":$qsShort,"sf":"$sfDir"}"""
    println(json)
    val qsFull = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val spreads = results.map { case (k, _, s) => "\"" + k + "\":" + f"$s%.3f" }
      .mkString("{", ",", "}")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","stat":"median3",$load,$fit,"queries":$qsFull,"spread":$spreads,"sf":"$sfDir"}"""
    // loadavg guard: a polluted run must never become the committed
    // baseline (r8/r9 both shipped load-inflated files) — refuse to
    // write BENCH_LOCAL.json unless the box was idle at start.
    // sf guard (r16): the committed baseline is DEFINED at sf0.1 — a
    // full run at another sf is a valid probe but must not replace it
    // (an sf0.01 smoke overwrote the clean sf0.1 file this round)
    // exact path-component match: a contains() probe also matched
    // sf0.12/sf0.15 (r16 review)
    val baselineSf = new java.io.File(sfDir).getName == "sf0.1"
    if (only.isEmpty && !polluted && baselineSf)
      try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LOCAL.json"),
        full.getBytes("UTF-8"))
      catch { case _: Throwable => () }
    else if (only.isEmpty)
      System.err.println(
        if (!baselineSf) s"[bench] NOT writing BENCH_LOCAL.json: $sfDir is not the sf0.1 baseline scale"
        else f"[bench] NOT writing BENCH_LOCAL.json: loadavg_start $loadavgStart%.2f > 2.0 (polluted box)")
    spark.stop()
  }
}
