package graft

import graft.operators.TextAnalysis

class TextAnalysisSpec extends GraftSpec {
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "the the the a a of", 18L),
    (2L, "spark runs 32 threads!", 22L)
  ).toDF("doc_id", "text", "n_chars")

  test("q49 token counting: whitespace vs BPE-ish regex") {
    val r = TextAnalysis.q49(docs).collect().map(r =>
      r.getAs[Long]("doc_id") -> (r.getAs[Long]("ws_tokens"), r.getAs[Long]("bpe_ish_tokens"))).toMap
    assert(r(1L) == (6L, 6L))
    // "spark runs 32 threads!" → spark|runs|32|threads|! = 5 regex tokens
    assert(r(2L) == (4L, 5L))
  }

  test("q50 fingerprint is the exact polynomial fold") {
    val fp = TextAnalysis.q50(Seq((1L, "ab")).toDF("doc_id", "text"))
      .collect().head.getAs[Long]("fingerprint")
    assert(fp == 97L * 31 + 98)       // ((0*31+'a')*31+'b') % 1e9+7
  }

  test("q47 language-ID picks the lexicon with most hits") {
    val d = Seq((1L, "the a the order column vector", "en")).toDF("doc_id", "text", "lang")
    val r = TextAnalysis.q47(d).collect().head
    assert(r.getAs[String]("pred_lang") == "en")
    assert(r.getAs[Long]("s_en") == 6L)
  }

  test("q67 PII scrub redacts emails, IPs, and long digit runs") {
    val d = Seq(
      (1L, "contact bob.smith+x@example.co.uk or 10.0.255.1 ref 12345678 ok"),
      (2L, "clean text with short 123 number")).toDF("doc_id", "text")
    val r = TextAnalysis.q67(d).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[String]("scrubbed") ==
      "contact <EMAIL> or <IP> ref <NUM> ok")
    assert(r(1L).getAs[Long]("n_emails") == 1L)
    assert(r(1L).getAs[Long]("n_ips") == 1L)
    assert(r(1L).getAs[Long]("n_longnums") == 1L)
    assert(r(2L).getAs[String]("scrubbed") == "clean text with short 123 number")
    assert(r(2L).getAs[Long]("n_longnums") == 0L)
  }

  test("q68 repetition: repeated doc scores high, diverse doc scores zero") {
    val d = Seq(
      (1L, "spam spam spam spam spam spam"),   // 6 tokens, 1 distinct
      (2L, "one two three four five six")      // all distinct
    ).toDF("doc_id", "text")
    val r = TextAnalysis.q68(d).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Double]("dup_token_frac") == 5.0 / 6)
    assert(r(1L).getAs[Double]("top_token_share") == 1.0)
    assert(r(1L).getAs[Double]("dup_bigram_frac") == 4.0 / 5)
    assert(r(2L).getAs[Double]("dup_token_frac") == 0.0)
    assert(r(2L).getAs[Double]("dup_bigram_frac") == 0.0)
  }

  test("q68 scores one-token docs too (null bigram fraction, not dropped)") {
    val d = Seq((1L, "solo"), (2L, "two words")).toDF("doc_id", "text")
    val rows = TextAnalysis.q68(d).collect()
    assert(rows.length == 2, rows.toSeq)
    val r1 = rows.find(_.getAs[Long]("doc_id") == 1L).get
    assert(r1.getAs[Long]("n_tokens") == 1L)
    assert(r1.isNullAt(r1.fieldIndex("dup_bigram_frac")))
  }

  test("q70 mix stats: shares sum to 1, uniform weight flattens the mix") {
    val d = Seq(
      (1L, "a b c d", "s1", 7L), (2L, "a b", "s1", 3L),
      (3L, "x y z", "s2", 5L)).toDF("doc_id", "text", "source", "n_chars")
    val rows = TextAnalysis.q70(d).collect()
    val byS = rows.map(r => r.getAs[String]("source") -> r).toMap
    assert(byS("s1").getAs[Long]("n_tokens") == 6L)
    assert(byS("s2").getAs[Long]("n_tokens") == 3L)
    assert(rows.map(_.getAs[Double]("token_share")).sum == 1.0)
    // weight × share = 1/n_sources for every source
    for (r <- rows)
      assert(math.abs(r.getAs[Double]("uniform_weight") *
        r.getAs[Double]("token_share") - 0.5) < 1e-12)
  }

  test("q75/q76: vocab counts and bigram conditional probabilities on planted text") {
    val d = Seq(
      (1L, "a b a b a c"),           // bigrams: ab×2 ba×2 ac×1
      (2L, "a b a b a b a b")).toDF("doc_id", "text")
    val vocab = TextAnalysis.q75(d).collect()
      .map(r => r.getAs[String]("tok") -> (r.getAs[Long]("cnt"), r.getAs[Long]("doc_freq"))).toMap
    assert(vocab("a") == (7L, 2L))
    assert(vocab("b") == (6L, 2L))
    assert(vocab("c") == (1L, 1L))
    val bi = TextAnalysis.q76(d).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) ->
        (r.getAs[Long]("c12"), r.getAs[Double]("cond_p"))).toMap
    // "a b": 2+4=6 of a's 7 outgoing... a's bigram starts: ab×6, ac×1 → c1=7
    assert(bi(("a", "b")) == (6L, 6.0 / 7))
    assert(!bi.contains(("a", "c")))           // c12=1 < 5 filtered
  }

  test("q77 packing buckets land docs on power-of-two boundaries") {
    val mk = (n: Int) => (1 to n).map(i => s"t$i").mkString(" ")
    val d = Seq((1L, mk(15)), (2L, mk(16)), (3L, mk(100)), (4L, mk(600)))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.q77(d).collect()
      .map(r => r.getAs[Long]("bucket_lo") -> (r.getAs[Long]("n_docs"), r.getAs[Long]("max_tokens"))).toMap
    assert(rows(0L) == (1L, 15L))
    assert(rows(16L) == (1L, 16L))
    assert(rows(64L) == (1L, 100L))
    assert(rows(512L) == (1L, 600L))
  }

  test("q85 BM25 ranks the term-dense doc first and drops no-match docs") {
    val corpus = Seq(
      (1L, "data data spark engine"),
      (2L, "data engine table row"),
      (3L, "table row scan merge")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.q85(corpus).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L)) // 3 has no query term
    val r1 = rows.head
    assert(r1.getAs[Long]("tf0") == 2L && r1.getAs[Long]("tf1") == 1L)
    assert(rows(0).getAs[Double]("score") > rows(1).getAs[Double]("score"))
  }

  test("q86 unigram cross-entropy: common-token doc scores higher than rare-token doc") {
    val corpus = Seq((1L, "a a a a"), (2L, "a a a b")).toDF("doc_id", "text")
    val rows = TextAnalysis.q86(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Long]("n_tokens") == 4L)
    // doc 1 is four copies of the 7/8-probability token — exact fold
    assert(rows(1L).getAs[Double]("logp") ==
      0.0 + 4L * math.log(7.0 / 8.0))
    assert(rows(1L).getAs[Double]("avg_logp") > rows(2L).getAs[Double]("avg_logp"))
  }

  test("q87 chunking: short doc is one window; long doc overlaps by window-stride") {
    val shortDoc = (1 to 10).map(i => s"t$i").mkString(" ")
    val longDoc = (1 to 100).map(i => s"w$i").mkString(" ")
    val rows = TextAnalysis.q87(
      Seq((1L, shortDoc), (2L, longDoc)).toDF("doc_id", "text")).collect()
    val one = rows.filter(_.getAs[Long]("doc_id") == 1L)
    assert(one.length == 1 && one.head.getAs[Int]("chunk_tokens") == 10)
    val two = rows.filter(_.getAs[Long]("doc_id") == 2L).sortBy(_.getAs[Long]("chunk_id"))
    assert(two.length == 2) // 100 tokens: [1..64] then [49..100]
    assert(two(0).getAs[Int]("chunk_tokens") == 64)
    assert(two(1).getAs[Int]("chunk_tokens") == 52)
    assert(two(0).getAs[String]("chunk_text").endsWith("w64"))
    assert(two(1).getAs[String]("chunk_text").startsWith("w49 "))
    // overlap: stride 48 means tokens 49..64 appear in both chunks
    assert(two(1).getAs[String]("chunk_text").contains("w64"))
  }

  test("q88 shuffle-shard: every doc placed once, positions dense per shard, layout-invariant") {
    val docs = Tables.documents(spark, SF)
    val placed = TextAnalysis.q88(docs).collect()
    assert(placed.length == docs.count())
    assert(placed.map(_.getAs[Long]("doc_id")).distinct.length == placed.length)
    placed.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      val ps = rows.map(_.getAs[Long]("pos")).sorted
      assert(ps.toSeq == (1L to ps.length).toSeq) // dense ranks, no gaps
    }
    val reshuffled = TextAnalysis.q88(docs.repartition(17)).collect()
    assert(reshuffled.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      placed.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("q48 quality score components are consistent") {
    val r = TextAnalysis.q48(Seq((1L, "the data row row", 16L)).toDF("doc_id", "text", "n_chars"))
      .collect().head
    assert(r.getAs[Long]("n_tokens") == 4L)
    assert(r.getAs[Long]("n_distinct") == 3L)
    assert(r.getAs[Long]("n_stop") == 4L)     // all four are stopwords
    val q = r.getAs[Double]("quality")
    assert(q == 0.75 * 0.4 + 0.04 * 0.3 + 1.0 * 0.3)
  }

  test("q89 tf-idf: rare repeated term outranks the corpus-wide term") {
    val corpus = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.q89(corpus).collect()
    val top1 = rows.filter(r => r.getAs[Long]("doc_id") == 1L &&
      r.getAs[Long]("rk") == 1L).head
    // apple: tf=2 df=1 → 2·(ln(3/2)+1) ≈ 2.81; banana: tf=1 df=2 → 1.0
    assert(top1.getAs[String]("tok") == "apple")
    assert(top1.getAs[Double]("score") == 2.0 * (math.log(3.0 / 2.0) + 1.0))
    val d1 = rows.filter(_.getAs[Long]("doc_id") == 1L)
    assert(d1.length == 2)                       // only 2 distinct terms
    assert(d1.map(_.getAs[Long]("rk")).sorted.toSeq == Seq(1L, 2L))
  }

  test("q90 PMI: pair below the co-occurrence floor is dropped, pmi exact") {
    val corpus = Seq(
      (1L, "alpha beta"), (2L, "alpha beta"), (3L, "alpha gamma")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.q90(corpus, vocab = 10, minPair = 2L).collect()
    val byPair = rows.map(r =>
      (r.getAs[String]("tok_a"), r.getAs[String]("tok_b")) -> r).toMap
    val ab = byPair(("alpha", "beta"))
    assert(ab.getAs[Long]("c_ab") == 2L)
    // pmi = ln(c_ab·D / (c_a·c_b)) = ln(2·3 / (3·2)) = 0 exactly
    assert(ab.getAs[Double]("pmi") == 0.0)
    assert(!byPair.contains(("alpha", "gamma"))) // c_ab=1 < minPair
  }

  test("q91 split: deterministic, partition-layout-invariant, exhaustive") {
    val docs = Tables.documents(spark, SF)
    val a = TextAnalysis.q91(docs).collect()
    val b = TextAnalysis.q91(docs.repartition(17)).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq) // layout-invariant
    assert(a.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val splits = a.map(_.getAs[String]("split")).distinct.sorted
    assert(splits.toSeq == Seq("test", "train", "valid"))
    // the 80/10/10 hash split should land near its design fractions
    val total = a.map(_.getAs[Long]("n_docs")).sum.toDouble
    val train = a.filter(_.getAs[String]("split") == "train")
      .map(_.getAs[Long]("n_docs")).sum.toDouble
    assert(train / total > 0.7 && train / total < 0.9, s"train share ${train / total}")
  }

  test("q98 BPE pair counts: every adjacent char pair, weighted by occurrence") {
    val d = Seq((1L, "ab ab cd"), (2L, "abc")).toDF("doc_id", "text")
    // words: ab, ab, cd, abc → (a,b)=3 (two "ab" + one inside "abc"),
    // (b,c)=1, (c,d)=1; single-char words contribute nothing
    val r = TextAnalysis.q98(d).collect()
      .map(x => (x.getAs[String]("a"), x.getAs[String]("b")) -> x.getAs[Long]("cnt"))
    assert(r.toSeq == Seq(("a", "b") -> 3L, ("b", "c") -> 1L, ("c", "d") -> 1L))
  }

  test("q99 bigram nll matches the hand-computed add-one-smoothed model") {
    val d = Seq((1L, "a b a"), (2L, "b a")).toDF("doc_id", "text")
    // unigrams a:3 b:2, V=2; bigrams (a,b)=1 (b,a)=2
    // nll(a,b) = -ln((1+1)/(3+2)) = -ln(0.4); nll(b,a) = -ln((2+1)/(2+2))
    val r = TextAnalysis.q99(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_bigrams"), x.getAs[Double]("nll_sum"))).toMap
    val nAB = -math.log(0.4); val nBA = -math.log(0.75)
    assert(r(1L)._1 == 2L && math.abs(r(1L)._2 - (nAB + nBA)) < 1e-12)
    assert(r(2L)._1 == 1L && math.abs(r(2L)._2 - nBA) < 1e-12)
  }

  test("q99 drops docs with fewer than two tokens") {
    val d = Seq((1L, "solo"), (2L, "a b")).toDF("doc_id", "text")
    assert(TextAnalysis.q99(d).collect().map(_.getAs[Long]("doc_id")).toSeq == Seq(2L))
  }

  test("q100 feature hashing buckets by the q50 polynomial fold") {
    val d = Seq((1L, "ab ab ba cd")).toDF("doc_id", "text")
    def fp(s: String) = s.foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L)
    val expected = Seq("ab", "ab", "ba", "cd")
      .groupBy(t => fp(t) % 16).map { case (b, ts) => b -> ts.size.toLong }
    val r = TextAnalysis.q100(d).collect()
      .map(x => x.getAs[Long]("bucket") -> x.getAs[Long]("cnt")).toMap
    assert(r == expected)
    // counts conserve the token stream
    assert(r.values.sum == 4L)
  }

  test("q101 boilerplate: shared 3-gram flagged at minDf, unique doc clean") {
    val d = Seq(
      (1L, "cookie banner text aa bb cc"),  // 4 grams, 1 shared
      (2L, "cookie banner text dd ee"),
      (3L, "cookie banner text ff gg"),
      (4L, "xx yy zz ww")                   // 2 grams, none shared
    ).toDF("doc_id", "text")
    val r = TextAnalysis.q101(d, minDf = 3L).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_grams"), x.getAs[Long]("n_boiler"),
          x.getAs[Double]("boiler_frac"))).toMap
    assert(r(1L) == ((4L, 1L, 0.25)))      // only "cookie banner text" (df=3)
    assert(r(2L) == ((3L, 1L, 1.0 / 3)))
    assert(r(4L) == ((2L, 0L, 0.0)))
  }

  test("q102 resample: under-represented source kept whole, rates hit the uniform target") {
    val d = (1L to 8L).map(i => (i, "srcA")) ++ Seq((9L, "srcB"), (10L, "srcB"))
    val docs = d.toDF("doc_id", "source")
    val r = TextAnalysis.q102(docs).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_docs"), x.getAs[Double]("keep_rate"),
          x.getAs[Long]("n_sampled"))).toMap
    // total 10, 2 sources → target 5/source
    assert(r("srcA")._1 == 8L && r("srcA")._2 == 10.0 / 16.0)
    assert(r("srcB") == ((2L, 1.0, 2L)))   // rate clamps at 1, nothing dropped
    assert(r("srcA")._3 <= 8L)
    // deterministic: a rerun draws the identical sample
    val again = TextAnalysis.q102(docs).collect()
      .map(x => x.getAs[String]("source") -> x.getAs[Long]("n_sampled")).toMap
    assert(again("srcA") == r("srcA")._3)
  }

  test("q106 source profile: exact interpolated percentiles and short fraction") {
    val d = Seq(
      (1L, "srcA", "a"), (2L, "srcA", "a b"), (3L, "srcA", "a b c"),
      (4L, "srcA", "a b c d"), (5L, "srcA", "a b c d e"),
      (6L, "srcB", "z z z")
    ).toDF("doc_id", "source", "text")
    val r = TextAnalysis.q106(d, shortTokens = 3).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    val a = r("srcA")
    assert(a.getAs[Long]("n_docs") == 5L && a.getAs[Long]("n_tokens") == 15L)
    assert(a.getAs[Double]("mean_tokens") == 3.0)
    assert(a.getAs[Double]("median_tokens") == 3.0)
    // (n-1)*0.9 = 3.6 → 4 + 0.6*(5-4)
    assert(math.abs(a.getAs[Double]("p90_tokens") - 4.6) < 1e-12)
    assert(a.getAs[Double]("short_frac") == 0.4)   // lengths 1, 2 of 5
    assert(r("srcB").getAs[Double]("median_tokens") == 3.0)
  }

  test("q107 decontamination: test doc sharing train grams flagged, valid split ignored") {
    val P = 1000000007L
    def h(id: Long) = ((id % P) * 2654435761L % P + 40490L) % 100L
    val trainId = (1L to 200L).find(h(_) < 80).get
    val validId = (1L to 200L).find(id => h(id) >= 80 && h(id) < 90).get
    val testIds = (1L to 200L).filter(h(_) >= 90)
    val (t1, t2) = (testIds(0), testIds(1))
    val d = Seq(
      (trainId, "x y z w v"),   // train grams: x y z | y z w | z w v
      (validId, "m n o p"),     // valid split: must count for NO side
      (t1, "x y z w q"),        // shares 2 of its 3 grams with train
      (t2, "m n o p")           // overlaps only the VALID doc → clean
    ).toDF("doc_id", "text")
    val r = TextAnalysis.q107(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_grams"), x.getAs[Long]("leaked"),
          x.getAs[Double]("leak_frac"))).toMap
    assert(r.keySet == Set(t1, t2)) // only test docs reported
    assert(r(t1) == ((3L, 2L, 2.0 / 3)))
    assert(r(t2) == ((2L, 0L, 0.0)))
  }

  test("q104 linear scorer: integer weight-sum matches the hand fold, keep == sign") {
    val d = Seq((1L, "a"), (2L, "a b a")).toDF("doc_id", "text")
    val P = 1000000007L
    def fp(s: String) = s.foldLeft(0L)((h, c) => (h * 31 + c) % P)
    def w(tok: String) = ((fp(tok) % 16 + 1) * 2654435761L) % P - (P - 1) / 2
    val r = TextAnalysis.q104(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Long]("score_num"),
          x.getAs[Double]("score"), x.getAs[Boolean]("keep"))).toMap
    assert(r(1L)._1 == 1L && r(1L)._2 == w("a"))
    assert(r(2L)._1 == 3L && r(2L)._2 == 2 * w("a") + w("b"))
    r.values.foreach { case (n, num, s, keep) =>
      assert(s == num.toDouble / (P.toDouble * n))
      assert(keep == (s > 0.0))
    }
  }

  test("q116 search: both-term doc outranks single-term doc, k caps per query") {
    val d = Seq(
      (1L, "alpha beta alpha beta"),   // both query terms, twice each
      (2L, "alpha noise noise noise"), // one term
      (3L, "noise noise noise noise"), // no terms → absent
      (4L, "beta noise noise noise")
    ).toDF("doc_id", "text")
    val q = Seq((7L, Seq("alpha", "beta"))).toDF("query_id", "terms")
    val r = TextAnalysis.q116(d, q, k = 2).collect()
    assert(r.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L)) // k=2 caps
    assert(r.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L))
    val byDoc = r.map(x => x.getAs[Long]("doc_id") ->
      (x.getAs[Long]("n_hit"), x.getAs[Double]("score"))).toMap
    assert(byDoc(1L)._1 == 2L && byDoc(2L)._1 == 1L)
    assert(byDoc(1L)._2 > byDoc(2L)._2)
  }

  test("q117 DSIR: target-like docs weigh higher and fill the keep set") {
    val d = Seq(
      (1L, "alpha alpha alpha alpha", "tgt"),
      (2L, "alpha alpha alpha alpha", "web"),  // target-like raw doc
      (3L, "beta beta beta beta", "web"),
      (4L, "beta beta gamma gamma", "web")
    ).toDF("doc_id", "text", "source")
    val r = TextAnalysis.q117(d, targetSource = "tgt", buckets = 16, topN = 2)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Double]("weight"),
          x.getAs[Boolean]("keep"))).toMap
    assert(r.keySet == Set(1L, 2L, 3L, 4L))
    assert(r.values.forall(_._1 == 4L))
    // docs made of the target token score above the off-target ones
    assert(r(2L)._2 > r(3L)._2 && r(2L)._2 > r(4L)._2)
    assert(r(1L)._2 == r(2L)._2) // same text → same weight
    assert(r(1L)._3 && r(2L)._3 && !r(3L)._3 && !r(4L)._3) // topN = 2
  }

  test("q118 buckets: per-language tertile cutoffs, exact audit form") {
    // lang A: 6 docs with strictly decreasing avg_logp (more rare tokens
    // → lower avg logprob); lang B: 1 doc — must get its own tertile 1
    val d = Seq(
      (1L, "c c c", "A"), (2L, "c c r1", "A"), (3L, "c r1 r2", "A"),
      (4L, "r1 r2 r3", "A"), (5L, "r4 r5 r6", "A"), (6L, "r7 r8 r9", "A"),
      (7L, "c c c", "B")
    ).toDF("doc_id", "text", "lang")
    val r = TextAnalysis.q118(d, exact = true).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("tertile"), x.getAs[String]("bucket"),
          x.getAs[Double]("avg_logp"))).toMap
    assert(r(7L)._1 == 1L && r(7L)._2 == "head")
    // 6 strictly-ordered docs → interpolated 1/3 and 2/3 cutoffs fall
    // strictly between the 2nd/3rd and 4th/5th order statistics → 2/2/2
    assert(Seq(1L, 2L, 3L, 4L, 5L, 6L).map(r(_)._1) == Seq(1L, 1L, 2L, 2L, 3L, 3L))
    assert(r(1L)._2 == "head" && r(3L)._2 == "middle" && r(6L)._2 == "tail")
    // ordering basis really is avg_logp descending
    val lp = Seq(1L, 2L, 3L, 4L, 5L, 6L).map(r(_)._3)
    assert(lp == lp.sorted.reverse)
    // no window over a corpus-sized partition in the plan (the r8 form's
    // scale funnel): cutoffs aggregate + broadcast back instead
    val plan = TextAnalysis.q118(d, exact = true).queryExecution.optimizedPlan
    assert(!plan.toString.contains("windowspecdefinition"),
      "q118 must not use a rank window for bucketing")
  }

  test("q118 default (approx) form: same invariants, bucket monotone in score") {
    val d = Seq(
      (1L, "c c c", "A"), (2L, "c c r1", "A"), (3L, "c r1 r2", "A"),
      (4L, "r1 r2 r3", "A"), (5L, "r4 r5 r6", "A"), (6L, "r7 r8 r9", "A"),
      (7L, "c c c", "B")
    ).toDF("doc_id", "text", "lang")
    val r = TextAnalysis.q118(d).collect()
    assert(r.length == 7)
    // within each language, a better (higher) avg_logp never lands in a
    // worse (higher-numbered) tertile — cutoff comparison is monotone
    r.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(-_.getAs[Double]("avg_logp"))
      val terts = sorted.map(_.getAs[Long]("tertile")).toSeq
      assert(terts == terts.sorted, s"non-monotone tertiles: $terts")
    }
    // single-doc language sits at its own cutoff → head
    assert(r.find(_.getAs[Long]("doc_id") == 7L).get.getAs[String]("bucket") == "head")
  }

  test("q124/q125: packing and chunking bill in BPE subword currency") {
    val d = Seq(
      (1L, "aaaa bbbb aaaa bbbb aaaa"),
      (2L, "cc dd"),
      (3L, "aaaa aaaa bbbb bbbb aaaa aaaa bbbb bbbb aaaa aaaa bbbb bbbb")
    ).toDF("doc_id", "text")
    val counts = TextAnalysis.q113(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_subwords")).toMap
    // sanity: merges fired, so subword counts differ from whitespace counts
    assert(counts.values.sum > 0)
    // q77Bpe bucket boundaries == manual bucketing of q113's counts
    def lo(n: Long) = if (n < 16) 0L else if (n < 32) 16L else if (n < 64) 32L
      else if (n < 128) 64L else if (n < 256) 128L else if (n < 512) 256L else 512L
    val expect = counts.values.groupBy(lo).map { case (b, ns) =>
      b -> (ns.size.toLong, ns.sum, ns.max) }
    val got = TextAnalysis.q77Bpe(d).collect()
      .map(r => r.getAs[Long]("bucket_lo") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens"),
          r.getAs[Long]("max_tokens"))).toMap
    assert(got == expect)
    // q87Bpe: chunk boundaries line up with the BPE sequence — window 4,
    // stride 3, so chunk k covers subwords [3k, 3k+4)
    val W = 4; val S = 3
    val chunks = TextAnalysis.q87Bpe(d, window = W, stride = S)
      .collect().groupBy(_.getAs[Long]("doc_id"))
    val whole = TextAnalysis.q87Bpe(d, window = 100000, stride = 100000)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("chunk_text").split(" ").toSeq).toMap
    for ((id, n) <- counts) {
      val exp = if (n > W) (n - W + S - 1) / S + 1 else 1L
      val rows = chunks(id).sortBy(_.getAs[Long]("chunk_id"))
      assert(rows.length.toLong == exp, s"doc $id: ${rows.length} chunks, want $exp")
      assert(rows.forall(_.getAs[Int]("chunk_tokens") <= W))
      // stride-aware reconstruction: the first S subwords of every chunk
      // but the last, plus the last chunk whole, is the full sequence
      val toks = rows.map(_.getAs[String]("chunk_text").split(" ").toSeq)
      val rebuilt = (toks.init.flatMap(_.take(S)) ++ toks.last).toSeq
      assert(rebuilt == whole(id), s"doc $id chunk boundaries off")
      assert(whole(id).length.toLong == n) // whole-doc chunk == q113 count
    }
  }

  test("q120 temperature mix: α<1 flattens, rates bounded, keep = hash rule") {
    // source A: 8 docs, source B: 1 doc — raw share 8/9 vs 1/9
    val d = (1L to 8L).map(i => (i, "A")) :+ ((9L, "B"))
    val df = d.toDF("doc_id", "source")
    val r = TextAnalysis.q120(df, alpha = 0.7, budget = 4L).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[String]("source"), x.getAs[Double]("mix_weight"),
          x.getAs[Double]("rate"), x.getAs[Boolean]("keep"))).toMap
    assert(r.size == 9)
    val (wA, wB) = (r(1L)._2, r(9L)._2)
    // temperature flattening: B's mix share exceeds its raw 1/9 share,
    // A's drops below its raw 8/9; weights normalize to 1
    assert(wB > 1.0 / 9.0 && wA < 8.0 / 9.0)
    assert(math.abs((wA + wB) - 1.0) < 1e-12)
    // closed form: w_s = n^0.7 / Σ
    val pa = math.pow(8.0, 0.7)
    assert(math.abs(wA - pa / (pa + 1.0)) < 1e-9)
    // rate = min(1, budget·q/n), within [0,1]
    assert(r.values.forall(v => v._3 >= 0.0 && v._3 <= 1.0))
    assert(math.abs(r(1L)._3 - math.min(1.0, 4.0 * wA / 8.0)) < 1e-12)
    // keep verdict replays the Knuth-hash threshold exactly
    r.foreach { case (id, (_, _, rate, keep)) =>
      val h = (((id % 1000000007L) * 2654435761L) % 1000000007L +
        graft.Oracles.MixSalt) % 1000000L
      assert(keep == (h < math.floor(rate * 1000000.0).toLong))
    }
  }

  test("q121 diversity: entropy/TTR/Zipf match closed forms per source") {
    val d = Seq(
      (1L, "a b c d", "div"),       // 4 distinct tokens, uniform
      (2L, "x x x x", "tmpl"),      // 1 token repeated
      (3L, "w w w w v v u", "zipf") // counts 4,2,1
    ).toDF("doc_id", "text", "source")
    val r = TextAnalysis.q121(d).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Long]("vocab"),
          x.getAs[Double]("ttr"), x.getAs[Double]("entropy"),
          Option(x.getAs[java.lang.Double]("zipf_slope")))).toMap
    assert(r.keySet == Set("div", "tmpl", "zipf"))
    // uniform: H = ln V, TTR = 1, slope 0 (all freqs equal)
    assert(r("div")._1 == 4L && r("div")._2 == 4L && r("div")._3 == 1.0)
    assert(math.abs(r("div")._4 - math.log(4.0)) < 1e-6)
    assert(r("div")._5.contains(0.0))
    // templated: H = 0, TTR = 1/4, slope undefined (single vocab row)
    assert(r("tmpl")._4 == 0.0 && r("tmpl")._3 == 0.25)
    assert(r("tmpl")._5.isEmpty)
    // 4/2/1 counts: closed-form entropy and OLS slope of ln f on ln r
    val ps = Seq(4.0 / 7, 2.0 / 7, 1.0 / 7)
    val h = -ps.map(p => p * math.log(p)).sum
    assert(math.abs(r("zipf")._4 - h) < 1e-6)
    val xs = Seq(1.0, 2.0, 3.0).map(math.log)
    val ys = Seq(4.0, 2.0, 1.0).map(math.log)
    val n = 3.0
    val slope = (n * xs.zip(ys).map { case (x, y) => x * y }.sum -
      xs.sum * ys.sum) / (n * xs.map(x => x * x).sum - xs.sum * xs.sum)
    assert(math.abs(r("zipf")._5.get - slope) < 1e-6)
    // diversity ordering: diverse > zipf > templated
    assert(r("div")._4 > r("zipf")._4 && r("zipf")._4 > r("tmpl")._4)
  }

  test("q128 per-source quality quota: top-N by score, native top-k plan") {
    import org.apache.spark.sql.functions._
    // srcA: 4 docs with strictly ordered quality (longer + more
    // distinct tokens score higher); srcB under quota entirely
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "srcA"),
      (2L, "alpha alpha alpha alpha", "srcA"),
      (3L, "one two three four five six seven eight nine ten", "srcA"),
      (4L, "data data", "srcA"),
      (5L, "solitary document", "srcB")
    ).toDF("doc_id", "text", "source")
    val kept = TextAnalysis.q128(d, quota = 2)
    val ids = kept.collect().map(r =>
      (r.getAs[String]("source"), r.getAs[Long]("doc_id"))).toSeq
    // reference: plain window over the same q48 scores
    val q = TextAnalysis.q48(d)
      .join(d.select(col("doc_id"), col("source")), "doc_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(floor(col("quality") * lit(1e8)).cast("long").desc, col("doc_id"))
    val ref = q.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .select(col("source"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(ids.sorted == ref)
    assert(ids.count(_._1 == "srcA") == 2)   // quota binds
    assert(ids.contains(("srcB", 5L)))       // under-quota source intact
    // the rank window compiled to the native bounded-heap operator
    val plan = formattedPlan(TextAnalysis.q128(d, quota = 2))
    assert(plan.contains("TopKPerKey"), plan)
  }

  test("q129 packing assignment: capacity, contiguity, determinism, q88 parity") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, SF)
    val capacity = 100
    val r = TextAnalysis.q129(docs, shards = 8, capacity = capacity).collect()
    // every doc assigned exactly once
    assert(r.map(_.getAs[Long]("doc_id")).distinct.length == docs.count())
    val byBin = r.groupBy(x => (x.getAs[Long]("shard"), x.getAs[Long]("bin")))
    byBin.foreach { case ((_, _), rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("offset"))
      // offsets are the running token sum — contiguous from 0
      sorted.foldLeft(0L) { (expect, row) =>
        assert(row.getAs[Long]("offset") == expect)
        expect + row.getAs[Long]("n_tokens")
      }
      // a bin respects capacity unless it is a single oversized doc
      val total = rows.map(_.getAs[Long]("n_tokens")).sum
      assert(total <= capacity ||
        (rows.length == 1 && rows.head.getAs[Long]("n_tokens") > capacity))
    }
    // bins are dense per shard: 0..max with no gaps
    r.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      val bins = rows.map(_.getAs[Long]("bin")).distinct.sorted
      assert(bins.sameElements(0L until bins.length.toLong))
    }
    // deterministic: a second run packs identically
    val r2 = TextAnalysis.q129(docs, shards = 8, capacity = capacity).collect()
    assert(r.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq)
    // shard assignment IS q88's hash (the shard-writer order contract)
    val q88Shards = TextAnalysis.q88(docs, shards = 8).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("shard")).toMap
    assert(r.forall(x =>
      q88Shards(x.getAs[Long]("doc_id")) == x.getAs[Long]("shard")))
    // an oversized doc occupies its own overflow bin
    val tiny = Seq((1L, Seq.fill(30)("tok").mkString(" ")),
      (2L, "small doc here"), (3L, "another small doc")).toDF("doc_id", "text")
    val o = TextAnalysis.q129(tiny, shards = 1, capacity = 10).collect()
    val big = o.find(_.getAs[Long]("doc_id") == 1L).get
    assert(big.getAs[Long]("offset") == 0L && big.getAs[Long]("n_tokens") == 30L)
    assert(o.filter(_.getAs[Long]("bin") == big.getAs[Long]("bin")).length == 1)
  }

  test("q130 vocabulary growth: tranche attribution and closed-form checks") {
    import org.apache.spark.sql.functions._
    // ids 0..9 → 2 tranches at buckets=2; tranche 2 re-treads tranche
    // 1's vocab plus two novel words
    val d = (0L to 9L).map { i =>
      val base = "alpha beta gamma"
      val text = if (i < 5) s"$base w$i" else s"$base ${if (i == 7) "nu1 nu2" else "w1"}"
      (i, text)
    }.toDF("doc_id", "text")
    val r = TextAnalysis.q130(d, buckets = 2).collect()
      .map(x => x.getAs[Long]("bucket") ->
        (x.getAs[Long]("n_docs"), x.getAs[Long]("token_volume"),
          x.getAs[Long]("new_tokens"), x.getAs[Long]("cum_vocab"))).toMap
    // tranche 0: 5 docs × 4 tokens; vocab = alpha beta gamma w0..w4 = 8
    assert(r(0L) == ((5L, 20L, 8L, 8L)))
    // tranche 1: only nu1/nu2 are first-seen there (w1 re-treads);
    // volume = 4 docs × 4 + 1 doc × 5
    assert(r(1L) == ((5L, 21L, 2L, 10L)))
    // novelty collapses from 8/20 to 2/21 — the exhaustion signal
    val rates = TextAnalysis.q130(d, buckets = 2).collect()
      .map(_.getAs[Double]("novelty_rate"))
    assert(rates(0) > rates(1))
  }

  test("q137 weighted sample: quality actually biases inclusion, deterministic") {
    // two weight classes with equal counts: long diverse docs (high
    // q48 quality) vs tiny low-quality docs — the sample must
    // overrepresent the high class well beyond its 50% count share
    val rng = new scala.util.Random(3)
    val docs = (0L until 400L).map { i =>
      // low class: repeated non-stopword token → quality ≈ 0.14 vs the
      // high class's ≈ 0.7 — a ~5× weight ratio
      val text =
        if (i % 2 == 0) (1 to 120).map(_ => s"tok${rng.nextInt(100000)}").mkString(" ")
        else "zzz zzz zzz"
      (i, text)
    }.toDF("doc_id", "text")
    val sample = TextAnalysis.q137(docs, n = 100).collect()
    assert(sample.length == 100)
    val high = sample.count(_.getAs[Long]("doc_id") % 2 == 0)
    assert(high > 70, s"high-quality class got only $high/100")
    // deterministic: same corpus, same sample, any run
    val again = TextAnalysis.q137(docs, n = 100).collect()
    assert(sample.map(_.getAs[Long]("doc_id")).toSeq ==
      again.map(_.getAs[Long]("doc_id")).toSeq)
    // n larger than the corpus degrades to "all docs"
    assert(TextAnalysis.q137(docs.limit(10), n = 100).count() == 10L)
  }

  test("q135 token budget: scale form == audit form, boundary semantics") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, SF)
    for (budget <- Seq(500L, 3000L, 1L, 100000000L)) {
      val scale = TextAnalysis.q135(docs, budget).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
          r.getAs[Double]("quality"))).toSeq
      val audit = TextAnalysis.q135(docs, budget, exact = true).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
          r.getAs[Double]("quality"))).toSeq
      assert(scale == audit, s"forms diverge at budget=$budget")
      // greedy boundary: everything but the last selected doc fits
      // strictly inside the budget; with the last, we meet or pass it
      // (unless the whole corpus fits)
      val toks = scale.map(_._2)
      if (toks.nonEmpty) assert(toks.dropRight(1).sum < budget)
      val allToks = docs.select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.trim(col("text")), " "))
          .cast("long")).collect().map(_.getLong(0)).sum
      if (allToks > budget) assert(toks.sum >= budget)
      else assert(toks.sum == allToks)
    }
    // budget 1 admits exactly the single best document
    assert(TextAnalysis.q135(docs, 1L).count() == 1L)
  }

  test("q132 token drift: closed-form KL and attribution ordering") {
    // old = "a a b", new = "a b b": union vocab {a,b}, both totals 3.
    // λ=0.5 smoothing → p_old = (2.5/4, 1.5/4), p_new = (1.5/4, 2.5/4);
    // KL(new‖old) = 0.25·ln(5/3) ≈ 0.1277 (fixed-point floor ≤ 2e-12 off)
    val old   = Seq((1L, "a a b")).toDF("doc_id", "text")
    val newer = Seq((1L, "a b b")).toDF("doc_id", "text")
    val r = TextAnalysis.q132(old, newer).collect()
    assert(r.length == 2)
    val expected = 0.25 * math.log(5.0 / 3.0)
    assert(math.abs(r(0).getAs[Double]("kl_total") - expected) < 1e-9)
    // kl_total is one constant across attribution rows
    assert(r.map(_.getAs[Double]("kl_total")).distinct.length == 1)
    // b gained mass → largest |contribution| and positive; a lost → negative
    assert(r(0).getAs[String]("tok") == "b" && r(0).getAs[Double]("contrib") > 0)
    assert(r(1).getAs[String]("tok") == "a" && r(1).getAs[Double]("contrib") < 0)
    // probabilities are smoothed over the union vocab: strictly positive
    // even for a token absent on one side
    val gone = TextAnalysis.q132(old, Seq((1L, "c c c")).toDF("doc_id", "text"))
      .collect()
    assert(gone.forall(x => x.getAs[Double]("p_old") > 0 &&
      x.getAs[Double]("p_new") > 0))
    assert(gone.head.getAs[Double]("kl_total") > 0)
  }

  test("q141 calibration: z stats per source, degenerate source NULL, order kept") {
    val real = TextAnalysis.q141(Tables.documents(spark, SF)).collect()
    val bySrc = real.groupBy(_.getAs[String]("source"))
    bySrc.foreach { case (src, rows) =>
      val zs = rows.filterNot(_.isNullAt(rows.head.fieldIndex("cal_z")))
        .map(_.getAs[Double]("cal_z"))
      // z-normalization: mean ~0, variance ~1 (fixed-point moments
      // introduce ≤1e-8 resolution error per term)
      val mu = zs.sum / zs.length
      val vr = zs.map(z => (z - mu) * (z - mu)).sum / zs.length
      assert(math.abs(mu) < 1e-4, s"$src mean=$mu")
      assert(math.abs(vr - 1.0) < 1e-3, s"$src var=$vr")
      // calibration is monotone in the raw score within a source
      val sorted = rows.sortBy(_.getAs[Double]("quality"))
      sorted.map(_.getAs[Double]("cal_z")).sliding(2).foreach {
        case Array(a, b) => assert(a <= b)
        case _ =>
      }
    }
    // a zero-variance source calibrates to NULL, others unaffected
    val planted = Seq(
      (1L, "same text here", "flat"), (2L, "same text here", "flat"),
      (3L, "alpha beta gamma delta", "mixed"), (4L, "alpha alpha alpha alpha", "mixed"))
      .toDF("doc_id", "text", "source")
    val p = TextAnalysis.q141(planted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(p(1L).isNullAt(p(1L).fieldIndex("cal_z")))
    assert(p(2L).isNullAt(p(2L).fieldIndex("cal_z")))
    assert(!p(3L).isNullAt(p(3L).fieldIndex("cal_z")))
    assert(p(3L).getAs[Double]("cal_z") > 0)   // the higher-TTR doc
    assert(p(4L).getAs[Double]("cal_z") < 0)
  }

  test("q144 Neyman allocation: zero-variance stratum gets 0, spread wins, budget conserved") {
    val planted = Seq(
      // 4 identical docs: σ = 0 — sampling one tells you everything
      (1L, "flat flat flat", "uni"), (2L, "flat flat flat", "uni"),
      (3L, "flat flat flat", "uni"), (4L, "flat flat flat", "uni"),
      // 2 docs with very different quality: all the variance lives here
      (5L, "alpha beta gamma delta epsilon", "noisy"),
      (6L, "x x x x x x x x x x x x", "noisy"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.q144(planted, budget = 100L).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out("uni").getAs[Long]("alloc_n") == 0L)
    assert(out("uni").getAs[Double]("sigma_q") == 0.0)
    // all the weight lands on 'noisy', but allocation caps at the
    // stratum's population — you can't sample 100 docs from 2
    assert(out("noisy").getAs[Long]("alloc_n") == 2L)
    assert(out("noisy").getAs[Double]("alloc_frac") == 1.0)
    // real corpus: floor-allocation never exceeds the budget, every
    // stratum appears, and allocation orders by N_h·σ_h
    val real = TextAnalysis.q144(Tables.documents(spark, SF)).collect()
    assert(real.map(_.getAs[Long]("alloc_n")).sum <= graft.Oracles.NeymanBudget)
    assert(real.length ==
      Tables.documents(spark, SF).select("source").distinct().count())
    val byWgt = real.sortBy(r =>
      -r.getAs[Long]("n_docs") * r.getAs[Double]("sigma_q"))
    assert(byWgt.map(_.getAs[Long]("alloc_n")).sliding(2).forall {
      case Array(a, b) => a >= b - 1 // floor can flip adjacent equals by 1
      case _ => true
    })
  }

  test("q145 fertility: algebra matches q113 per-doc counts, mismatched source reads high") {
    val real = Tables.documents(spark, SF)
    val fert = TextAnalysis.q145(real).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // source totals re-derive from q113's per-doc subword counts
    val perDoc = TextAnalysis.q113(real).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_subwords")).toMap
    val srcOf = real.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bySrc = perDoc.groupBy { case (id, _) => srcOf(id) }
      .map { case (s, m) => s -> m.values.sum }
    fert.foreach { case (s, r) =>
      assert(r.getAs[Long]("n_subwords") == bySrc(s),
        s"$s subword total drifted from q113")
      assert(r.getAs[Double]("fertility") >= 1.0) // a word is ≥1 subword
      val mr = r.getAs[Double]("merge_rate")
      assert(mr >= 0.0 && mr < 1.0)
    }
    // planted mismatch: a source the vocab was never fit for merges
    // nothing (merge_rate 0) and pays maximal fertility per character
    val planted = Seq(
      (1L, "aa aa aa aa aa aa aa aa", "fits"),   // one dominant pair
      (2L, "aa aa aa aa aa aa aa aa", "fits"),
      (3L, "zq xv wk jy zq xv wk jy", "alien"))  // pairs below the merge cut
      .toDF("doc_id", "text", "source")
    val p = TextAnalysis.q145(planted, topMerges = 1).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(p("fits").getAs[Double]("merge_rate") > 0.0)
    assert(p("fits").getAs[Double]("fertility") == 1.0) // "aa" → 1 subword
    assert(p("alien").getAs[Double]("merge_rate") == 0.0)
    assert(p("alien").getAs[Double]("fertility") == 2.0) // every pair unmerged
  }

  test("q146 compressibility: repetitive flags low, random blob flags high, prose ok") {
    val rng = new scala.util.Random(3)
    val blob = (1 to 400).map(_ => rng.nextPrintableChar()).mkString
    val docs = Seq(
      (1L, "spam spam spam spam " * 50),                       // too_compressible
      // mid-entropy "prose" stand-in: random draws from a 500-word
      // vocabulary deflate to ~0.4 — word repeats compress, order
      // doesn't — squarely inside the ok band
      (2L, { val r2 = new scala.util.Random(9)
             (1 to 300).map(_ => s"w${r2.nextInt(500)}").mkString(" ") }),
      (3L, blob))                                              // incompressible
      .toDF("doc_id", "text")
    val out = TextAnalysis.q146(spark, docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("verdict") == "too_compressible",
      out(1L).toString)
    assert(out(2L).getAs[String]("verdict") == "ok", out(2L).toString)
    assert(out(3L).getAs[String]("verdict") == "incompressible",
      out(3L).toString)
    // ratios are real deflate output: deterministic across runs
    val again = TextAnalysis.q146(spark, docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("gz_ratio")).toMap
    out.foreach { case (id, r) =>
      assert(r.getAs[Double]("gz_ratio") == again(id))
    }
  }

  test("q157 zipf fit: planted power-law recovers its exponent; layout-invariant") {
    import org.apache.spark.sql.functions.col
    // corpus where token t_r appears ~ C/r^1.2 times (top-30 ranks)
    val rows = for {
      r <- 1 to 30
      k <- 1 to math.max(1, math.round(3000.0 / math.pow(r, 1.2)).toInt)
    } yield (r.toLong * 1000 + k, s"tok$r")
    val docs = rows.toDF("doc_id", "text") // one token per doc
    val out = graft.operators.TextAnalysis.q157(docs, topN = 30).collect().head
    assert(out.getAs[Long]("n_terms") == 30L)
    val alpha = out.getAs[Double]("alpha")
    assert(math.abs(alpha - 1.2) < 0.05, s"alpha=$alpha")
    val re = graft.operators.TextAnalysis.q157(docs.repartition(9), topN = 30)
      .collect().head
    assert(re.getAs[Double]("alpha") == alpha) // bit-identical, any layout
  }

  test("q160 entropy: uniform doc hits ln(d), repeated doc hits 0, layout-invariant") {
    val docs = Seq(
      (1L, "a b c d"),          // 4 distinct uniform: H = ln 4
      (2L, "x x x x x"),        // one token type: H = 0, redundancy 1
      (3L, "a a b b c c d d"),  // uniform over 4: H = ln 4, redundancy 0
      (4L, "a a a b")           // skewed: 0 < H < ln 2 + eps
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.q160(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_distinct"),
          r.getAs[Double]("entropy"), r.getAs[Double]("redundancy"))).toMap
    val ln4 = math.log(4.0)
    assert(out(1L)._1 == 4L && out(1L)._2 == 4L)
    assert(math.abs(out(1L)._3 - ln4) < 1e-6, out(1L))
    assert(math.abs(out(1L)._4) < 1e-6, out(1L)) // uniform => redundancy ~0
    // floor-scaling truncates c·ln(c) at 1e-9, so H lands within one
    // truncation step above exact zero — deterministic, not drifting
    assert(out(2L)._3 >= 0.0 && out(2L)._3 < 1e-9 && out(2L)._4 == 1.0, out(2L))
    assert(math.abs(out(3L)._3 - ln4) < 1e-6, out(3L))
    // skewed doc: strictly between 0 and uniform-over-2 entropy... H(3/4,1/4)
    val h4 = out(4L)._3
    val expected = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert(math.abs(h4 - expected) < 1e-6, s"h4=$h4")
    // bit-identical across partition layouts (order-free long sums)
    val re = graft.operators.TextAnalysis.q160(docs.repartition(7)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("entropy")).toMap
    assert(re(4L) == h4 && re(1L) == out(1L)._3)
  }

  test("q167 chi2: disjoint-vocabulary sources score the closed-form statistic") {
    // A says only "alpha" (4x), B only "omega" (4x): per source,
    // own-bucket term (4-2)^2/2 = 2 and other-bucket term (0-2)^2/2
    // = 2 -> chi2 = 4 exactly (buckets differ for these two tokens)
    val docs = Seq(
      (1L, "alpha alpha alpha alpha", "A"),
      (2L, "omega omega omega omega", "B")
    ).toDF("doc_id", "text", "source")
    val out = graft.operators.TextAnalysis.q167(docs).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("chi2"))).toMap
    assert(out("A") == ((4L, 4.0)) && out("B") == ((4L, 4.0)), out)
    // a source matching the corpus mix scores lower than a divergent one
    val mixed = Seq(
      (1L, "x y x y x y", "balanced"),
      (2L, "x y x y x y", "alsobalanced"),
      (3L, "z z z z z z", "divergent")
    ).toDF("doc_id", "text", "source")
    val m = graft.operators.TextAnalysis.q167(mixed).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("chi2_norm")).toMap
    assert(m("divergent") > m("balanced"), m)
    // layout-invariant
    val re = graft.operators.TextAnalysis.q167(mixed.repartition(7)).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("chi2")).toMap
    val orig = graft.operators.TextAnalysis.q167(mixed).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("chi2")).toMap
    assert(re == orig)
  }

  test("q166 RAKE: stopword-split phrases, co-occurring words outrank loners") {
    // stopwords include "the" and "of". Doc 1 phrases:
    //   "deep learning" / "deep learning systems" / "fast gpu"
    // deg(deep)=2+3=5 freq=2 -> 2.5; learning same; systems deg=3 freq=1 -> 3
    // fast/gpu: deg=2 freq=1 -> 2 each
    // scores: "deep learning systems" = 2.5+2.5+3 = 8, "deep learning" = 5,
    //         "fast gpu" = 4
    val docs = Seq(
      (1L, "deep learning of deep learning systems the fast gpu")
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.q166(docs).collect()
    assert(out.map(r => (r.getAs[Long]("rank"), r.getAs[String]("phrase"),
      r.getAs[Double]("score"))).toSeq == Seq(
      (1L, "deep learning systems", 8.0),
      (2L, "deep learning", 5.0),
      (3L, "fast gpu", 4.0)), out.mkString("; "))
    // all-stopword doc contributes nothing
    val none = graft.operators.TextAnalysis.q166(
      Seq((2L, "the of and a")).toDF("doc_id", "text")).collect()
    assert(none.isEmpty)
  }

  test("q159 sentiment: planted polar docs get the right label; neutral in between") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "fast clean best good value pipeline"),   // strongly positive
      (2L, "slow bad error noise small run"),        // strongly negative
      (3L, "the table has a column and a row here")  // no lexicon hits
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.q159(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
          r.getAs[String]("label"))).toMap
    assert(out(1L) == ((5L, 0L, "positive")), out)
    assert(out(2L) == ((0L, 5L, "negative")), out)
    assert(out(3L) == ((0L, 0L, "neutral")), out)
  }

  /** 60 rule-clean words: lengths 3–5, all alpha, stopwords present,
    * no #/... symbols — passes every q178 rule. */
  private def cleanWords: String =
    (Seq("the", "data", "row", "and") ++
      (1 to 56).map(i => s"word${('a' + i % 26).toChar}")).mkString(" ")

  test("q178 gopher rules: each planted violator flips exactly its own rule") {
    val docs = Seq(
      (1L, cleanWords),                                // passes all five
      (2L, "too short entirely"),                      // r_len
      (3L, (Seq("the", "a") ++ (1 to 58)
        .map(_ => "extraordinarily")).mkString(" ")),  // r_wlen (15 chars)
      (4L, (Seq("the", "a") ++ (1 to 58)
        .map(i => (i * 7919).toString)).mkString(" ")),// r_alpha (digits)
      (5L, (1 to 60).map(i => s"tok${i % 9}").mkString(" ")), // r_stop
      (6L, cleanWords + " " + (1 to 12).map(_ => "#").mkString(" ")) // r_sym
    ).toDF("doc_id", "text")
    val out = TextAnalysis.q178(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("r_len"), r.getAs[Boolean]("r_wlen"),
          r.getAs[Boolean]("r_alpha"), r.getAs[Boolean]("r_stop"),
          r.getAs[Boolean]("r_sym"), r.getAs[Boolean]("pass"))).toMap
    assert(out(1L) == ((true, true, true, true, true, true)), out)
    assert(!out(2L)._1 && !out(2L)._6, out)
    assert(out(3L)._1 && !out(3L)._2 && !out(3L)._6, out)
    assert(!out(4L)._3 && !out(4L)._6, out)
    assert(!out(5L)._4 && !out(5L)._6, out)
    assert(out(6L)._1 && out(6L)._4 && !out(6L)._5 && !out(6L)._6, out)
  }

  test("q179 epoch schedule: small source hits the epoch cap, big one saturates") {
    // A: 90 tokens, B: 10 → total 100, target (×2 over 2 sources) = 100.
    val docs = Seq(
      (1L, (1 to 90).map(i => s"w$i").mkString(" "), "srcA"),
      (2L, (1 to 10).map(i => s"v$i").mkString(" "), "srcB")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.q179(docs, budgetFactor = 2, maxEpochs = 4)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("tokens"), r.getAs[Long]("target_tokens"),
          r.getAs[Long]("epochs"), r.getAs[Long]("served_tokens"),
          r.getAs[Double]("util"))).toMap
    assert(out("srcA") == ((90L, 100L, 2L, 100L, 1.0)), out)
    assert(out("srcB") == ((10L, 100L, 4L, 40L, 0.4)), out)
  }

  test("q181 reweighting upweights the hard source; mass ≈ 1; layout-invariant") {
    // easy: one token repeated (logprob ~ its high corpus frequency);
    // hard: all-distinct rare tokens → much lower logprob, more weight.
    val docs = Seq(
      (1L, (1 to 50).map(_ => "common").mkString(" "), "easy"),
      (2L, (1 to 50).map(_ => "common").mkString(" "), "easy"),
      (3L, (1 to 50).map(i => s"rare$i").mkString(" "), "hard")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.q181(docs).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("loss"), r.getAs[Long]("weight"),
          r.getAs[Double]("weight_frac"))).toMap
    assert(out("hard")._1 > out("easy")._1, out)   // excess loss is real
    assert(out("hard")._2 > out("easy")._2, out)   // and drives weight
    val mass = out.values.map(_._3).sum
    assert(mass > 0.99 && mass <= 1.0 + 1e-9, s"mass $mass: $out")
    val re = TextAnalysis.q181(docs.repartition(5)).collect().map(_.toSeq).toSet
    assert(re == TextAnalysis.q181(docs).collect().map(_.toSeq).toSet)
  }

  test("q187 vocab richness: closed-form Chao1 and Good-Turing mass") {
    val d = Seq(
      (1L, "a a b c", "srcA"),     // N=4 V=3 f1=2 f2=1
      (2L, "x y z w x", "srcB")    // N=5 V=4 f1=3 f2=1
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.q187(d).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("vocab"),
          r.getAs[Long]("f1"), r.getAs[Long]("f2"),
          r.getAs[Long]("chao1"), r.getAs[Long]("unseen_mass_e8"))).toMap
    // chao1 = V + f1(f1-1)//(2(f2+1)); unseen = f1*1e8//N
    assert(out("srcA") == ((4L, 3L, 2L, 1L, 3L, 50000000L)), out)
    assert(out("srcB") == ((5L, 4L, 3L, 1L, 5L, 60000000L)), out)
  }

  test("q189 KS drift: hand-traced two-source sup-distance, symmetric") {
    // srcA lengths {1,2}, srcB lengths {2,3}: D = 1/2 at v=1 for both
    val d = Seq(
      (1L, "t", "srcA", 1L), (2L, "t", "srcA", 2L),
      (3L, "t", "srcB", 2L), (4L, "t", "srcB", 3L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val out = TextAnalysis.q189(d).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_src"), r.getAs[Long]("n_rest"),
          r.getAs[Long]("ks_num"), r.getAs[Long]("ks_e8"))).toMap
    assert(out("srcA") == ((2L, 2L, 2L, 50000000L)), out)
    assert(out("srcB") == ((2L, 2L, 2L, 50000000L)), out)
    // single-source corpus: statistic undefined -> 0, no ANSI divide error
    val one = TextAnalysis.q189(
      Seq((1L, "t", "only", 5L)).toDF("doc_id", "text", "source", "n_chars"))
      .collect()(0)
    assert(one.getAs[Long]("n_rest") == 0L && one.getAs[Long]("ks_e8") == 0L, one)
  }

  test("q194 burstiness: template token reads D=3, uniform token reads D=0") {
    // 4 docs; "b" concentrates in one doc (bursty), "u" spreads 1/doc
    val d = Seq(
      (1L, "b b b b u"), (2L, "u x x x x"),
      (3L, "u y y y y"), (4L, "u z z z z")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.q194(d, minCount = 4L).collect()
      .map(r => r.getAs[String]("tok") ->
        (r.getAs[Long]("df"), r.getAs[Long]("n"), r.getAs[Long]("s2"),
          r.getAs[Double]("dispersion"))).toMap
    // D = (N*s2 - n^2)/(N*n): b -> (4*16-16)/16 = 3; u -> (16-16)/16 = 0
    assert(out("b") == ((1L, 4L, 16L, 3.0)), out)
    assert(out("u") == ((4L, 4L, 4L, 0.0)), out)
    assert(out.keySet == Set("b", "u", "x", "y", "z"), out) // minCount cut
    assert(out("x") == ((1L, 4L, 16L, 3.0)), out)
  }

  test("q196 conditional entropy: deterministic text reads exactly 0, forked reads (2/3)ln2") {
    val d = Seq(
      (1L, "a b a b a", "det"),   // every token determines its successor
      (2L, "x y x z", "fork")     // x forks 50/50, y deterministic
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.q196(d).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("h_cond_e9"),
          r.getAs[Double]("h_cond_nats"))).toMap
    assert(out("det") == ((4L, 0L, 0.0)), out)   // all p(v|u) = 1
    assert(out("fork")._1 == 3L, out)
    // H = (2/3)ln2 ≈ 0.462098: two 1/3-mass terms of ln(1/2)
    assert(math.abs(out("fork")._3 - 2.0 / 3.0 * math.log(2.0)) < 1e-6, out)
    val re = TextAnalysis.q196(d.repartition(5)).collect().map(_.toSeq).toSet
    assert(re == TextAnalysis.q196(d).collect().map(_.toSeq).toSet)
  }

  test("q190 vocab coverage: cumulative mass by rank, saturates past vocab") {
    val d = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val out = TextAnalysis.q190(d, ks = Seq(1, 2, 100)).collect()
      .map(r => r.getAs[Int]("k") ->
        (r.getAs[Long]("vocab_used"), r.getAs[Long]("covered"),
          r.getAs[Long]("n_total"), r.getAs[Long]("coverage_e8"))).toMap
    assert(out(1) == ((1L, 3L, 6L, 50000000L)), out)   // top-1 = "a"
    assert(out(2) == ((2L, 5L, 6L, 83333333L)), out)   // + "b"
    assert(out(100) == ((3L, 6L, 6L, 100000000L)), out) // saturated
  }
}

