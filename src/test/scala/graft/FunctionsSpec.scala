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

  test("QualityScore: bit parity with the batch q104 aggregate on the real corpus") {
    val docs = Tables.documents(spark, SF)
    val batch = graft.operators.TextAnalysis.q104(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    val native = docs
      .select(col("doc_id"), graft.functions.QualityScore(col("text")).as("s"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("s")).toMap
    assert(native.keySet == batch.keySet)
    native.foreach { case (id, s) =>
      assert(java.lang.Double.doubleToLongBits(s) ==
             java.lang.Double.doubleToLongBits(batch(id)), s"doc $id")
    }
  }

  test("QualityScore keeps split semantics: empty tokens from repeated spaces count") {
    // "a  b" → tokens [a, "", b]: the empty token hashes to bucket 0
    val s3 = Seq(Tuple1("a  b")).toDF("text")
      .select(graft.functions.QualityScore(col("text")).as("s")).collect().head.getDouble(0)
    val P = 1000000007L
    def w(tok: String) = {
      val fp = tok.foldLeft(0L)((h, c) => (h * 31 + c) % P)
      (fp % 16 + 1) * 2654435761L % P - (P - 1) / 2
    }
    assert(s3 == (w("a") + w("") + w("b")).toDouble / (P.toDouble * 3))
  }

  test("graft_quality_score is callable from SQL text via GraftExtensions") {
    val v = spark.sql("SELECT graft_quality_score('the quick fox') AS s")
      .collect().head.getDouble(0)
    assert(!v.isNaN)
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

  test("portableLn: exact at 1.0, faithful (≤3 ulp) across the live ranges") {
    import graft.functions.GraftMath.portableLn
    assert(portableLn(1.0) == 0.0)
    // ln(2^k) recomposes from the split constant alone (t == 0 branch)
    assert(math.abs(portableLn(2.0) - 0.6931471805599453) <= math.ulp(1.0))
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 20000) {
      // idf-style (1, 1000] and probability-style [1e-12, 1) draws
      val x =
        if (rnd.nextBoolean()) math.exp(rnd.nextDouble() * math.log(1000.0))
        else math.exp(-rnd.nextDouble() * 27.6)
      val got = portableLn(x)
      val ref = StrictMath.log(x)
      assert(math.abs(got - ref) <= 3 * math.ulp(ref),
        s"portableLn($x) = $got vs $ref")
    }
    // the q116 regression input that broke Math.log-based parity
    val x = 1.2572145545796738
    assert(math.abs(portableLn(x) - StrictMath.log(x)) <= math.ulp(1.0))
  }

  test("PortableLn codegen path equals the eval-path static on a column") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val xs = Seq(1.2572145545796738, 1.3306772908366533, 0.001, 7.25, 500.5)
    val got = xs.toDF("x")
      .select(graft.functions.PortableLn(col("x")).as("y"))
      .collect().map(_.getDouble(0))
    assert(got.sameElements(xs.map(graft.functions.GraftMath.portableLn)))
  }

  test("portableExp: exact at 0, faithful (≤3 ulp) across the live range") {
    import graft.functions.GraftMath.portableExp
    assert(portableExp(0.0) == 1.0)
    val rnd = new scala.util.Random(43)
    for (_ <- 1 to 20000) {
      // α·ln(n) style inputs: |x| up to ~20 covers n^α for any count
      // a corpus can hold; also sweep the k·ln2 rounding boundaries
      val x = (rnd.nextDouble() * 40.0) - 20.0
      val got = portableExp(x)
      val ref = StrictMath.exp(x)
      assert(math.abs(got - ref) <= 3 * math.ulp(ref),
        s"portableExp($x) = $got vs $ref")
    }
    // boundary: x where x/ln2 + 0.5 sits at an integer edge
    for (k <- -8 to 8) {
      val x = (k + 0.5) * 0.6931471805599453
      val got = portableExp(x)
      val ref = StrictMath.exp(x)
      assert(math.abs(got - ref) <= 3 * math.ulp(ref))
    }
    // out-of-domain falls back to Math.exp
    assert(portableExp(710.0) == Math.exp(710.0))
    assert(portableExp(-710.0) == Math.exp(-710.0))
  }

  test("PortableExp codegen path equals the eval-path static; pow closes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val xs = Seq(-5.5, -0.1, 0.0, 0.7, 3.25, 14.0)
    val got = xs.toDF("x")
      .select(graft.functions.PortableExp(col("x")).as("y"))
      .collect().map(_.getDouble(0))
    assert(got.sameElements(xs.map(graft.functions.GraftMath.portableExp)))
    // n^α via exp(α·ln n) is deterministic and ~exact: 8^0.5 vs sqrt 8
    val p = Seq(8.0).toDF("n").select(graft.functions.PortableExp(
      lit(0.5) * graft.functions.PortableLn(col("n"))).as("p"))
      .collect().head.getDouble(0)
    assert(math.abs(p - math.sqrt(8.0)) <= 4 * math.ulp(math.sqrt(8.0)))
  }

  test("FreqSketch: Misra-Gries guarantee vs exact counts, partitioning-independent") {
    val docs = Tables.documents(spark, SF)
    val toks = docs.select(
      explode(split(lower(trim(col("text"))), " ")).as("tok"))
    val exact = toks.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val cap = 16
    val threshold = n.toDouble / (cap + 1)
    for (parts <- Seq(1, 7, 32)) {
      val sketch = toks.repartition(parts)
        .agg(graft.functions.FreqSketch(col("tok"), cap).as("sk"))
        .select(explode(col("sk")).as("hh"))
        .select(col("hh.token"), col("hh.est"), col("hh.err"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(sketch.size <= cap)
      // every true heavy hitter (count > n/(cap+1)) must be reported
      exact.foreach { case (tok, c) =>
        if (c > threshold)
          assert(sketch.contains(tok),
            s"parts=$parts: heavy token '$tok' (count $c > $threshold) missing")
      }
      // every estimate is a lower bound within its error mass
      sketch.foreach { case (tok, (est, err)) =>
        val t = exact.getOrElse(tok, 0L)
        assert(est <= t, s"parts=$parts: '$tok' est $est > true $t")
        assert(t <= est + err,
          s"parts=$parts: '$tok' true $t > est $est + err $err")
        assert(err <= threshold.toLong + 1,
          s"parts=$parts: err $err exceeds the n/(k+1) ceiling")
      }
    }
  }

  test("FreqSketch: planted dominant token is rank 1 with a tight estimate") {
    val rows = (1 to 5000).map { i =>
      if (i % 2 == 0) "dominant" else s"noise${i % 997}"
    }
    val toks = rows.toDF("tok")
    val hh = toks.repartition(11)
      .agg(graft.functions.FreqSketch(col("tok"), 32).as("sk"))
      .select(explode(col("sk")).as("hh"))
      .select(col("hh.token"), col("hh.est")).collect()
    assert(hh.head.getString(0) == "dominant")
    // half the stream is one token: the MG lower bound stays within
    // the decrement ceiling n/(k+1) of the true 2500
    assert(hh.head.getLong(1) >= 2500 - 5000 / 33 - 1)
    assert(hh.head.getLong(1) <= 2500)
  }

  test("graft_freq_sketch is callable from SQL text via GraftExtensions") {
    Seq("a", "a", "a", "b", "b", "c").toDF("tok").createOrReplaceTempView("fs_toks")
    val hh = spark.sql(
      """SELECT hh.token, hh.est FROM (
           SELECT explode(graft_freq_sketch(tok, 8)) AS hh FROM fs_toks)""")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(hh.head == ("a" -> 3L))   // capacity above vocab: exact counts
    assert(hh.toMap == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    // a non-literal capacity fails loudly at resolution, not at runtime
    intercept[Exception] {
      spark.sql("SELECT graft_freq_sketch(tok, length(tok)) FROM fs_toks").collect()
    }
    // a non-string input fails at ANALYSIS (ExpectsInputTypes), not as a
    // runtime ClassCastException inside the aggregate's update loop
    Seq(1L, 2L, 2L).toDF("n").createOrReplaceTempView("fs_longs")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_freq_sketch(n, 8) FROM fs_longs").collect()
    }
  }

  test("q140 heavy hitters: ranked output, est descending, ties on token") {
    val out = graft.operators.TextAnalysis.q140(
      Tables.documents(spark, SF)).collect()
    assert(out.nonEmpty && out.length <= 32)
    assert(out.map(_.getAs[Long]("rank")).toSeq == (1L to out.length).toSeq)
    out.sliding(2).foreach {
      case Array(a, b) =>
        val (ea, eb) = (a.getAs[Long]("est"), b.getAs[Long]("est"))
        assert(ea > eb ||
          (ea == eb && a.getAs[String]("token") < b.getAs[String]("token")))
      case _ =>
    }
    // with capacity 256 on the small corpus the sketch is effectively
    // exact: rank-1 matches the true most frequent token
    val exactTop = graft.operators.TextAnalysis.q75(
      Tables.documents(spark, SF)).head()
    assert(out.head.getAs[String]("token") == exactTop.getAs[String]("tok"))
  }

  test("fn07 q199 model langid == q47 heuristic on the real corpus and planted ties") {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, SF)
    val heur = TextAnalysis.q47(docs).select("doc_id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val model = TextAnalysis.q199(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    assert(model == heur, "lexicon-compiled model must reproduce the heuristic")
    // planted: a tie on zero hits falls to the first class (both paths)
    // and single-marker docs classify to the marker's language
    import spark.implicits._
    val planted = Seq((1L, "en", "nothing matches here"),
      (2L, "xx", "fast spark all day"), (3L, "xx", "join the window group"))
      .toDF("doc_id", "lang", "text")
    val p = TextAnalysis.q199(planted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    assert(p == Map(1L -> "en", 2L -> "es", 3L -> "fr"), p)
  }

  test("fn07 weights file: save -> load round-trips predictions; format is line-readable") {
    import graft.functions.LinearModel
    val m = LinearModel.fromLexicons(graft.operators.TextAnalysis.Lexicons)
    val path = java.nio.file.Files.createTempDirectory("graft-lm")
      .resolve("langid.weights").toString
    LinearModel.save(spark, path, m)
    val body = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    assert(body.startsWith("graft-linear-v1\nclasses,en,es,de,fr,zh"), body.take(80))
    val loaded = LinearModel.load(spark, path)
    val texts = Seq("the fast table join stream", "order by column vector",
      "scan part key agg", "completely unrelated words")
    texts.foreach(t => assert(loaded.predict(t) == m.predict(t), t))
    assert(loaded.buckets == m.buckets && loaded.classes.sameElements(m.classes))
  }

  test("fn07 trainer: featureBuckets mirrors the scores() walk exactly") {
    import graft.functions.LinearModel
    val m = LinearModel.fromLexicons(graft.operators.TextAnalysis.Lexicons)
    val texts = Seq("the fast  double space", " padded ends ", "", "one",
      "the el der le zhong mixed marker bag", "a  b   c")
    texts.foreach { t =>
      val fb = LinearModel.featureBuckets(t, m.buckets, useBigrams = false)
      val acc = new Array[Double](m.classes.length)
      fb.foreach { b =>
        val row = m.rows.get(b)
        if (row != null) acc.indices.foreach(c => acc(c) += row(c))
      }
      val viaWalk = acc.map(_ / fb.length) // bias is zero in fromLexicons
      val direct = m.scores(t)
      assert(viaWalk.zip(direct).forall { case (a, b) => math.abs(a - b) < 1e-12 },
        s"'$t': ${viaWalk.toSeq} vs ${direct.toSeq}")
    }
    // bigram variant: one extra feature per adjacent token pair
    val fb2 = LinearModel.featureBuckets("a b c", 1L << 20, useBigrams = true)
    assert(fb2.length == 5, fb2.toSeq) // 3 unigrams + 2 bigrams
  }

  test("fn07 trainer: fit on q47 labels generalizes held-out; deterministic; save/load round-trips") {
    import graft.functions.LinearModel
    import graft.operators.TextAnalysis
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, SF)
    val labeled = docs.join(
      TextAnalysis.q47(docs).select(col("doc_id"), col("pred_lang")),
      Seq("doc_id"))
    val train = labeled.filter(col("doc_id") % 2 === 0)
    val heldOut = labeled.filter(col("doc_id") % 2 === 1)
    val m = LinearModel.fit(train, "text", "pred_lang")
    // held-out agreement with the q47 weak labels: the trained model
    // must rediscover the marker signal it was taught from (measured
    // 0.76 on the 250/250 split — deterministic, floored with margin)
    val preds = TextAnalysis.q199(heldOut, m)
      .select(col("doc_id"), col("pred_lang"))
    val agree = preds.join(
        heldOut.select(col("doc_id"), col("pred_lang").as("y")), Seq("doc_id"))
      .agg(avg(when(col("pred_lang") === col("y"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(agree >= 0.7, s"held-out agreement $agree < 0.7")
    // >= heuristic parity against GROUND TRUTH: trained on the true
    // lang column, the model must match-or-beat q47's accuracy on
    // held-out docs (measured 0.30 vs the heuristic's 0.22)
    val truthTrain = docs.filter(col("doc_id") % 2 === 0)
    val truthHeld = docs.filter(col("doc_id") % 2 === 1)
    val heurAcc = TextAnalysis.q47(truthHeld)
      .agg(avg(when(col("pred_lang") === col("lang"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    val mT = LinearModel.fit(truthTrain, "text", "lang")
    val trainedAcc = TextAnalysis.q199(truthHeld, mT)
      .agg(avg(when(col("pred_lang") === col("lang"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(trainedAcc >= heurAcc,
      s"trained $trainedAcc below heuristic $heurAcc on ground truth")
    // determinism: a different input layout fits BIT-IDENTICAL weights
    // (fixed-point gradient accumulation commutes)
    val m2 = LinearModel.fit(train.repartition(7), "text", "pred_lang")
    assert(m2.bias.sameElements(m.bias))
    assert(m2.rows.size == m.rows.size)
    m.rows.forEach { (b, w) =>
      assert(m2.rows.get(b) != null && m2.rows.get(b).sameElements(w), s"bucket $b")
    }
    // the trained model round-trips through the fn07 weights format
    val path = java.nio.file.Files.createTempDirectory("graft-lm-fit")
      .resolve("trained.weights").toString
    LinearModel.save(spark, path, m)
    val loaded = LinearModel.load(spark, path)
    Seq("the fast table join", "el la filtro rapido", "unrelated words here")
      .foreach(t => assert(loaded.predict(t) == m.predict(t), t))
  }

  test("fn07 ModelPredict runs inside whole-stage codegen") {
    import graft.operators.TextAnalysis
    val df = TextAnalysis.q199(Tables.documents(spark, SF))
    val plan = formattedPlan(df)
    assert(plan.contains("graft_model_predict"), plan)
    val r = PlanReport.analyze(df, execute = true)
    assert(r.codegenSpans >= 1, r)
  }

  test("fn07 ModelScore: loadable-weights quality scoring, codegen == hand fold") {
    import graft.functions.{LinearModel, ModelScore}
    // 1-class "quality" model: one positive and one negative marker
    val mod = 1000000007L
    def th(t: String): Long = t.foldLeft(0L)((h, c) => (h * 31 + c) % mod)
    val rows = new java.util.HashMap[java.lang.Long, Array[Float]]()
    rows.put(th("good") % (1L << 20), Array(2.0f))
    rows.put(th("bad") % (1L << 20), Array(-3.0f))
    val m = new LinearModel(Array("quality"), 1L << 20, false,
      Array(0.5f), rows)
    // hand fold: bias + mean of per-token weights
    assert(m.scores("good good bad")(0) == 0.5 + (2.0 + 2.0 - 3.0) / 3.0)
    assert(m.scores("neutral words only")(0) == 0.5)
    // codegen path over a DataFrame equals the eval path
    import spark.implicits._
    val df = Seq((1L, "good good bad"), (2L, "bad bad bad"),
      (3L, "neutral words only")).toDF("doc_id", "text")
    val got = df.select($"doc_id", ModelScore($"text", m).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == m.scores("good good bad")(0))
    assert(got(2L) == m.scores("bad bad bad")(0))
    assert(got(3L) == 0.5)
  }

  test("fn07 bigram features separate word order a unigram model cannot") {
    import graft.functions.LinearModel
    // hand-built: one bigram feature 'new york' with weight toward
    // class 'place'; unigrams carry nothing
    val classes = Array("other", "place")
    val rows = new java.util.HashMap[java.lang.Long, Array[Float]]()
    val mod = 1000000007L
    def th(t: String): Long = t.foldLeft(0L)((h, c) => (h * 31 + c) % mod)
    val big = (th("new") * 31 + th("york")) % mod
    rows.put(big % (1L << 20), Array(0.0f, 5.0f))
    val m = new LinearModel(classes, 1L << 20, true,
      new Array[Float](2), rows)
    assert(m.predict("i love new york today") == "place")
    assert(m.predict("i love york new today") == "other")
  }
}
