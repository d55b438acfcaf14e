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

  test("q48 quality score components are consistent") {
    val r = TextAnalysis.q48(Seq((1L, "the data row row", 16L)).toDF("doc_id", "text", "n_chars"))
      .collect().head
    assert(r.getAs[Long]("n_tokens") == 4L)
    assert(r.getAs[Long]("n_distinct") == 3L)
    assert(r.getAs[Long]("n_stop") == 4L)     // all four are stopwords
    val q = r.getAs[Double]("quality")
    assert(q == 0.75 * 0.4 + 0.04 * 0.3 + 1.0 * 0.3)
  }
}
