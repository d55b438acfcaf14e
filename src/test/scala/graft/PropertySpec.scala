package graft

/** Property-style specs: operator equivalences over seeded random data
  * (several trials per property, deterministic seeds). */
class PropertySpec extends GraftSpec {
  import spark.implicits._

  private def randRows(seed: Int, n: Int): Seq[(Long, Long, Double)] = {
    val r = new scala.util.Random(seed)
    (0 until n).map(i => (r.nextInt(5).toLong, i.toLong,
      math.round(r.nextDouble() * 2000 - 1000) / 10.0))
  }

  test("property: saltedJoin ≡ plain join across seeds and salts") {
    for (seed <- 1 to 4; salt <- Seq(1, 3, 8)) {
      val big = randRows(seed, 60).toDF("k", "id", "v")
      val small = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "name")
      val expected = big.join(small, "k").orderBy("k", "id", "v").collect().toSeq
      val got = operators.Skew.saltedJoin(big, small, "k", salt)
        .orderBy("k", "id", "v").collect().toSeq
      assert(got == expected, s"seed=$seed salt=$salt")
    }
  }

  test("property: native topKPerKey ≡ per-key sort-take(k) across seeds") {
    for (seed <- 1 to 4; k <- Seq(1, 3, 7)) {
      val rows = randRows(seed, 80)
      val df = rows.toDF("k", "id", "v")
      val got = operators.Events
        .topKPerKey(df, Seq("k"), Seq(("v", false), ("id", true)), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val expected = rows.groupBy(_._1).flatMap { case (_, g) =>
        g.sortBy(t => (-t._3, t._2)).take(k)
      }.toSet
      assert(got == expected, s"seed=$seed k=$k")
    }
  }

  test("property: q54 normalization is idempotent across seeds") {
    for (seed <- 1 to 3) {
      val r = new scala.util.Random(seed)
      val texts = (0 until 30).map { i =>
        (i.toLong, (0 until 40).map(_ => (32 + r.nextInt(95)).toChar).mkString)
      }
      val docs = texts.toDF("doc_id", "text")
      val once = operators.TextAnalysis.q54(docs)
        .select($"doc_id", $"clean_text".as("text"))
      val a = once.orderBy("doc_id").collect().map(_.getString(1)).toSeq
      val b = operators.TextAnalysis.q54(once)
        .orderBy("doc_id").collect().map(_.getAs[String]("clean_text")).toSeq
      assert(a == b, s"seed=$seed")
    }
  }

  test("property: DotProduct matches a plain Scala loop across seeds") {
    import org.apache.spark.sql.functions._
    for (seed <- 1 to 3) {
      val r = new scala.util.Random(seed)
      val vecs = (0 until 20).map { i =>
        (i.toLong, Array.fill(64)(r.nextDouble() * 2 - 1),
          Array.fill(64)(r.nextDouble() * 2 - 1))
      }
      val expected = vecs.map { case (id, a, b) =>
        var acc = 0.0; var j = 0
        while (j < 64) { acc += a(j) * b(j); j += 1 }
        id -> acc
      }.toMap
      val got = vecs.toDF("id", "a", "b")
        .select($"id", functions.DotProduct(col("a"), col("b")).as("d"))
        .collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap
      expected.foreach { case (id, v) =>
        assert(java.lang.Double.doubleToLongBits(got(id)) ==
               java.lang.Double.doubleToLongBits(v), s"seed=$seed id=$id")
      }
    }
  }
}
