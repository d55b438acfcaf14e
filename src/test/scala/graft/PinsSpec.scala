package graft

/** Ownership contract for intra-plan persists ([[Pins]]): operators
  * register every cache they take; the driving loop's release()
  * empties the registry (Verify/Bench per query, GraftSpec per test).
  * Correctness never depends on the pin — releasing early only costs
  * recompute — so the assertions here are about lifetime, not values. */
class PinsSpec extends GraftSpec {
  import spark.implicits._

  test("a pin-using operator registers; release empties the registry") {
    Pins.release() // clean slate
    assert(Pins.pending == 0)
    val docs = Tables.documents(spark, SF)
    val out = graft.operators.TextAnalysis.q89(docs) // pins its tf frame
    out.write.format("noop").mode("overwrite").save()
    assert(Pins.pending > 0)
    Pins.release()
    assert(Pins.pending == 0)
  }

  test("released pins still compute correctly (cache-only semantics)") {
    val docs = Seq((1L, "alpha beta beta"), (2L, "beta gamma gamma"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
    val r1 = graft.operators.TextAnalysis.q89(docs).collect().map(_.toSeq)
    Pins.release() // drop the caches mid-lifetime of the returned frame
    val r2 = graft.operators.TextAnalysis.q89(docs).collect().map(_.toSeq)
    assert(r1.toSeq == r2.toSeq)
    Pins.release()
  }
}
