package graft
object TmpProbe {
  def main(a: Array[String]): Unit = {
    val spark = GraftSession.builder(32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.range(2000000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()
    time("q01 run1") { operators.Relational.q01(Tables.lineitem(spark, d)).write.format("noop").mode("overwrite").save() }
    time("q01 run2") { operators.Relational.q01(Tables.lineitem(spark, d)).write.format("noop").mode("overwrite").save() }
    time("q44 run1") { operators.Similarity.q44(Tables.embeddings(spark, d)).write.format("noop").mode("overwrite").save() }
    time("q44 run2") { operators.Similarity.q44(Tables.embeddings(spark, d)).write.format("noop").mode("overwrite").save() }
    time("q41 run1") { operators.Dedup.q41(Tables.documents(spark, d)).write.format("noop").mode("overwrite").save() }
    time("q41 run2") { operators.Dedup.q41(Tables.documents(spark, d)).write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
