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

  test("property: QualityScore ≡ plain-Scala model on random text incl. unicode") {
    val P = 1000000007L
    def model(text: String): Double = {
      // mirror split(lower(trim(text)), " ") + per-token polynomial
      // fold over CODE POINTS + bucket weight + single divide
      val norm = text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ')
        .reverse.toLowerCase
      val toks = norm.split(" ", -1)
      val acc = toks.map { t =>
        var h = 0L; var i = 0
        while (i < t.length) {
          val cp = t.codePointAt(i)
          h = (h * 31 + cp) % P
          i += Character.charCount(cp)
        }
        (h % 16 + 1) * 2654435761L % P - (P - 1) / 2
      }.sum
      acc.toDouble / (P.toDouble * toks.length)
    }
    // whole code points (never a lone surrogate half — an invalid
    // UTF-16 string wouldn't survive the UTF-8 round trip into Spark)
    val alphabet = Seq("a", "b", " ", "c", " ", "Z", "9", "!", ".", "é", "中", "😀")
    val r = new scala.util.Random(20260813)
    val texts = (1 to 60).map(_ =>
      (0 until r.nextInt(30)).map(_ => alphabet(r.nextInt(alphabet.length))).mkString)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select($"id", graft.functions.QualityScore($"text").as("s"))
      .collect().map(x => x.getAs[Long]("id") -> x.getAs[Double]("s")).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(java.lang.Double.doubleToLongBits(got(i.toLong)) ==
        java.lang.Double.doubleToLongBits(model(t)), s"text=${t.take(40)}")
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

  test("property: q67 PII scrub is idempotent and leaves clean text unchanged") {
    for (seed <- 1 to 3) {
      val r = new scala.util.Random(seed)
      val texts = (0 until 25).map { i =>
        val base = (0 until 6).map(_ => ('a' + r.nextInt(26)).toChar.toString * (1 + r.nextInt(5))).mkString(" ")
        val withPii = r.nextInt(3) match {
          case 0 => s"$base user${r.nextInt(99)}@mail${r.nextInt(9)}.com $base"
          case 1 => s"$base 10.${r.nextInt(256)}.${r.nextInt(256)}.${r.nextInt(256)} $base"
          case _ => s"$base ${100000 + r.nextInt(900000)}${r.nextInt(1000)} $base"
        }
        (i.toLong, withPii)
      }
      val docs = texts.toDF("doc_id", "text")
      val once = operators.TextAnalysis.q67(docs)
        .select($"doc_id", $"scrubbed".as("text"))
      val twice = operators.TextAnalysis.q67(once)
      // scrubbing scrubbed text is a no-op: nothing left matches
      val again = twice.orderBy("doc_id").collect()
      assert(again.forall(_.getAs[Long]("n_emails") == 0L), s"seed=$seed")
      assert(again.forall(_.getAs[Long]("n_ips") == 0L), s"seed=$seed")
      assert(again.forall(_.getAs[Long]("n_longnums") == 0L), s"seed=$seed")
      val a = once.orderBy("doc_id").collect().map(_.getString(1)).toSeq
      assert(a == again.map(_.getAs[String]("scrubbed")).toSeq, s"seed=$seed")
    }
  }

  test("property: q74 quantization error is bounded by scale/2 per element across seeds") {
    for (seed <- 1 to 3) {
      val r = new scala.util.Random(seed)
      val vecs = (0 until 20).map(i =>
        (i.toLong, Array.fill(64)((r.nextFloat() * 2 - 1) * math.pow(10, r.nextInt(4)).toFloat)))
      val rows = operators.Similarity.q74(vecs.toDF("vec_id", "embedding")).collect()
      for (row <- rows) {
        val scale = row.getAs[Double]("scale")
        val codes = row.getAs[scala.collection.Seq[Int]]("qv")
        assert(codes.forall(c => c.abs <= 127), s"seed=$seed")
        assert(row.getAs[Double]("rmse") <= scale / 2 + 1e-9, s"seed=$seed")
      }
    }
  }

  test("property: q73 gap-fill spine is hour-contiguous and LOCF leaves no holes after first value") {
    for (seed <- 1 to 3) {
      val r = new scala.util.Random(seed)
      val base = java.time.Instant.parse("2026-01-01T00:00:00Z")
      val evs = (0 until 60).map { i =>
        (i.toLong, (1 + r.nextInt(4)).toLong,
          java.sql.Timestamp.from(base.plusSeconds(r.nextInt(72) * 3600L + r.nextInt(3600))),
          1.0 + r.nextInt(50))
      }
      val df = evs.toDF("event_id", "user_id", "ts", "value")
      val filled = operators.Events.q73(df).collect()
      val byUser = filled.groupBy(_.getAs[Long]("user_id"))
      for ((_, rows) <- byUser) {
        val hours = rows.map(_.getAs[java.sql.Timestamp]("h").getTime).sorted
        // spine contiguous: every consecutive delta is exactly one hour
        assert(hours.sliding(2).forall { case Array(a, b) => b - a == 3600000L; case _ => true },
          s"seed=$seed")
        // the first spine hour contains the user's first event → filled
        // from row 1 on, filled_value is never null
        assert(rows.sortBy(_.getAs[java.sql.Timestamp]("h").getTime)
          .forall(!_.isNullAt(3)), s"seed=$seed")
      }
    }
  }

  test("property: q42 MinHash-LSH pairs ⊆ brute-force exact Jaccard; J≥0.9 pairs always found") {
    import org.apache.spark.sql.functions._
    for (seed <- 1 to 2) {
      val r = new scala.util.Random(seed)
      val vocab = (0 until 40).map(i => s"w$i")
      // 12 base docs + near-identical variants (1-word edit → J≈0.9 on
      // word-3-gram sets of 30-token docs)
      val base = (0 until 12).map { i =>
        (i.toLong, (0 until 30).map(_ => vocab(r.nextInt(vocab.size))).mkString(" "))
      }
      // last-token edit changes only the trailing 2 shingles → J ≈ 0.87
      val variants = base.take(4).map { case (id, text) =>
        val w = text.split(" "); w(w.length - 1) = "edited"
        (id + 100L, w.mkString(" "))
      }
      val docs = (base ++ variants).toDF("doc_id", "text")
      val got = operators.Dedup.q42(docs).collect()
        .map(x => (x.getAs[Long]("doc_a"), x.getAs[Long]("doc_b"))).toSet
      // brute-force exact Jaccard over FULL shingle sets (no blocking)
      val g = operators.Dedup.shingles(docs).collect()
        .groupBy(_.getAs[Long]("doc_id")).view
        .mapValues(_.map(_.getAs[String]("g")).toSet).toMap
      val exact = (for {
        a <- g.keys; b <- g.keys if a < b
        j = (g(a) & g(b)).size.toDouble / (g(a) | g(b)).size
        if j > operators.Dedup.MinhashJaccardThreshold
      } yield (a, b, j)).toSeq
      // precision 1.0 is guaranteed (candidates are verified exactly)
      assert(got.subsetOf(exact.map(t => (t._1, t._2)).toSet), s"seed=$seed")
      // pairs with J >= 0.85 collide in some band with near-certainty
      // (per-band p = J^4 ≈ 0.52, P(all 16 bands miss) ≈ 1e-5; inputs
      // and hashes are deterministic, so this is not flaky)
      val mustFind = exact.filter(_._3 >= 0.85).map(t => (t._1, t._2)).toSet
      assert(mustFind.subsetOf(got), s"seed=$seed missing=${mustFind -- got}")
      assert(mustFind.nonEmpty, s"seed=$seed produced no high-J pairs - weak test")
    }
  }

  test("property: q43 SimHash banding finds EXACTLY the Hamming<=3 pairs (pigeonhole-complete)") {
    import org.apache.spark.sql.functions._
    for (seed <- 1 to 2) {
      val r = new scala.util.Random(seed)
      val vocab = (0 until 40).map(i => s"w$i")
      val base = (0 until 12).map { i =>
        (i.toLong, (0 until 30).map(_ => vocab(r.nextInt(vocab.size))).mkString(" "))
      }
      val variants = base.take(4).map { case (id, text) =>
        val w = text.split(" "); w(w.length - 1) = "edited"
        (id + 100L, w.mkString(" "))
      }
      val docs = (base ++ variants).toDF("doc_id", "text")
      val got = operators.Dedup.q43(docs).collect()
        .map(x => (x.getAs[Long]("doc_a"), x.getAs[Long]("doc_b"))).toSet
      val hashes = operators.Dedup.simhash(docs).collect()
        .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("simhash")).toMap
      // 4×16-bit banding is pigeonhole-COMPLETE for Hamming<=3 (3 flipped
      // bits touch at most 3 of the 4 bands), and verification is exact —
      // so the operator must equal the brute-force pair set, both ways
      val exact = (for {
        a <- hashes.keys; b <- hashes.keys if a < b
        if java.lang.Long.bitCount(hashes(a) ^ hashes(b)) <= 3
      } yield (a, b)).toSet
      assert(got == exact, s"seed=$seed got=$got exact=$exact")
      assert(exact.nonEmpty, s"seed=$seed produced no close pairs - weak test")
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
