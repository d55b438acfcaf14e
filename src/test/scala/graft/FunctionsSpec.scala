package graft

import org.apache.spark.sql.functions._
import graft.functions.DotProduct

/** Specs for graft's native Catalyst expressions. */
class FunctionsSpec extends GraftSpec {
  import spark.implicits._

  test("DotProduct matches a manual fold (codegen path)") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
      .select(DotProduct(col("a"), col("b")).as("d"))
    assert(df.collect().head.getDouble(0) == 32.0)
  }

  test("DotProduct matches the interpreted aggregate-lambda fold bit-for-bit") {
    val vecs = Tables.embeddings(spark, SF).limit(50)
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
    val both = vecs.select(
      DotProduct(col("v"), col("v")).as("native"),
      aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("lambda"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
             java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("DotProduct is null-safe") {
    val df = Seq((Some(Array(1.0)), None: Option[Array[Double]]))
      .toDF("a", "b")
      .select(DotProduct(col("a"), col("b")).as("d"))
    assert(df.collect().head.isNullAt(0))
  }

  test("DotProductInt: exact long accumulation, null on length mismatch") {
    import graft.functions.DotProductInt
    val df = Seq((Array(127, -128, 3), Array(127, 127, 2)))
      .toDF("a", "b")
      .select(DotProductInt(col("a"), col("b")).as("d"))
    assert(df.collect().head.getLong(0) == 127L * 127 - 128L * 127 + 6)
    val mism = Seq((Array(1, 2), Array(1)))
      .toDF("a", "b")
      .select(DotProductInt(col("a"), col("b")).as("d"))
    assert(mism.collect().head.isNullAt(0))
  }

  test("graft_dot_int is callable from SQL text via GraftExtensions") {
    val v = spark.sql("SELECT graft_dot_int(array(1, 2), array(3, 4)) AS d")
      .collect().head.getLong(0)
    assert(v == 11L)
  }

  test("PolyFingerprint matches the manual polynomial fold") {
    val fp = Seq((1L, "ab")).toDF("doc_id", "text")
      .select(graft.functions.PolyFingerprint(col("text")).as("f"))
      .collect().head.getLong(0)
    assert(fp == 97L * 31 + 98)
    // and matches the composable aggregate-lambda formulation on real text
    val docs = Tables.documents(spark, SF).limit(100)
    val codes = transform(array_remove(split(col("text"), ""), ""),
      c => ascii(c).cast("long"))
    val both = docs.select(
      graft.functions.PolyFingerprint(col("text")).as("native"),
      aggregate(codes, lit(0L), (h, c) => (h * 31 + c) % 1000000007L).as("lambda"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("graft_fingerprint is callable from SQL text via GraftExtensions") {
    val v = spark.sql("SELECT graft_fingerprint('ab') AS f").collect().head.getLong(0)
    assert(v == 97L * 31 + 98)
  }

  test("graft_dot is callable from SQL text via GraftExtensions") {
    val v = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(v == 11.0)
  }

  test("graft_dot: length mismatch and null elements yield NULL, int arrays cast") {
    // implicit cast: array<int> → array<double>, not byte reinterpretation
    val cast = spark.sql("SELECT graft_dot(array(1, 2), array(3, 4)) AS d").collect().head
    assert(cast.getDouble(0) == 11.0)
    val mismatch = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d)) AS d").collect().head
    assert(mismatch.isNullAt(0))
    val nullElem = spark.sql(
      "SELECT graft_dot(array(1.0d, CAST(NULL AS DOUBLE)), array(3.0d, 4.0d)) AS d")
      .collect().head
    assert(nullElem.isNullAt(0))
  }

  test("graft_fingerprint casts non-string input at analysis instead of failing codegen") {
    val a = spark.sql("SELECT graft_fingerprint(12) AS f").collect().head.getLong(0)
    val b = spark.sql("SELECT graft_fingerprint('12') AS f").collect().head.getLong(0)
    assert(a == b)
  }
}
