package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-CLI-style SQL entry point: registers every lake table under a
  * directory as a view and executes SQL text against them — the
  * `spark-sql`/`beeline` workflow a warehouse user drives daily.
  *
  *   sbt "runMain graft.Sql /root/testdata/sf0.01 \
  *     SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1"
  *
  * Ad-hoc exploration only — programmatic callers use [[run]] and get a
  * DataFrame back (full Catalyst plan, no materialization here). */
object Sql {

  val TableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Register each graft table present under `dir` as a temp view
    * (missing parquet files are skipped, so partial lakes work).
    * Existence goes through the Hadoop FileSystem of `dir`'s scheme, so
    * hdfs:///s3a:// lake paths work, not just local files. */
  def registerTables(spark: SparkSession, dir: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    TableNames.filter { name =>
      val exists = fs.exists(new Path(s"$dir/$name.parquet"))
      if (exists) {
        val df = name match {
          case "events" => Tables.events(spark, dir) // nanos→µs handling
          case _        => Tables.table(spark, dir, name)
        }
        df.createOrReplaceTempView(name)
      }
      exists
    }
  }

  def run(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(query)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.Sql <tableDir> <sql...>")
    val spark = GraftSession.local()
    run(spark, args.head, args.tail.mkString(" ")).show(100, truncate = false)
    spark.stop()
  }
}
