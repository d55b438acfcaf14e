package graft

/** Measurement utility (optimization rounds): write the formatted
  * explain of named SparkEntry queries to files, for before/after plan
  * evidence. Usage:
  *   runMain graft.PlanDump <outDir> <suffix> <nameSubstr>[,<nameSubstr>...]
  * Produces <outDir>/<queryName>_<suffix>.txt per matching query.
  * Explains the LAZY plan (AdaptiveSparkPlan isFinalPlan=false) — the
  * shape evidence (Exchange count, join strategy, PushedFilters) lives
  * there; no data is computed. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => names.exists(name.contains) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val out = new java.io.ByteArrayOutputStream()
          Console.withOut(new java.io.PrintStream(out))(df.explain("formatted"))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
            out.toByteArray)
          println(s"[plandump] wrote $name")
        } catch {
          case e: Throwable => System.err.println(s"[plandump] $name: $e")
        } finally {
          graft.Pins.release(); spark.catalog.clearCache()
        }
      }
    spark.stop()
  }
}
