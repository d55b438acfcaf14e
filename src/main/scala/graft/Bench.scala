package graft

/** Driver benchmark: every SparkEntry query against SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout. Results are fully materialized via a
  * zero-overhead noop sink (`count()` would let Catalyst prune the
  * projections and under-report scan/compute cost). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    // JIT/codegen warmup — not data warmup; tables are untouched
    spark.range(2000000).selectExpr("sum(id) s", "count(distinct id % 7) c")
      .write.format("noop").mode("overwrite").save()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
