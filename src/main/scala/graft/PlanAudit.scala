package graft

/** Plan auditor: dumps per-query physical-plan stats (exchanges,
  * broadcast vs sort-merge joins, scans without pushed filters) so scale
  * regressions are visible before they cost anything at 100 TB. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local()
    // audit with AQE off: AdaptiveSparkPlan prints no WholeStageCodegen
    // "*(n)" spans before stages materialize, which would zero the
    // codegen column for every query (execution still runs AQE-on — this
    // session is audit-only)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.executedPlan.toString
        def n(p: String) = p.r.findAllIn(plan).size
        val scans = n("FileScan")
        val pushed = n("PushedFilters: \\[[^\\]]")
        println(f"$name%-26s exch=${n("Exchange")}%2d bhj=${n("BroadcastHashJoin")}%2d smj=${n("SortMergeJoin")}%2d scans=$scans%2d pushedScans=$pushed%2d cache=${n("InMemoryTableScan")}%2d codegen=${n("\\*\\(")}%2d")
      } catch { case e: Throwable => println(s"$name AUDIT FAILED: ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
