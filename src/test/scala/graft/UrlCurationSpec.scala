package graft

import org.apache.spark.sql.functions._
import graft.operators.UrlCuration

/** URL/domain curation specs (q148–q151): normalization algebra on
  * adversarial hand-built URLs, blocklist/quota/dedup semantics on the
  * synthetic URL corpus. */
class UrlCurationSpec extends GraftSpec {
  import spark.implicits._

  private def norm(url: String): String =
    Seq(url).toDF("url")
      .select(UrlCuration.normalizeUrl(col("url")).as("n"))
      .head().getString(0)

  test("q148 normalization: scheme/host case, www, port, utm, fragment, slash") {
    assert(norm("HTTPS://WWW.Example.COM:443/A/b/?utm_source=x#f") ==
      "https://example.com/A/b")
    assert(norm("https://example.org/page/3?ref=home") ==
      "https://example.org/page/3?ref=home") // non-utm params survive
    assert(norm("https://example.org:80/p?utm_a=1&keep=2&utm_b=3") ==
      "https://example.org/p?keep=2")        // utm stripped, ? repaired
    assert(norm("https://www.sub.example.net/x/") ==
      "https://sub.example.net/x")           // only ONE leading www. strips
    assert(norm("https://example.com/") == "https://example.com")
  }

  test("q148 domain: registered domain = last two host labels") {
    val rows = Seq(
      "https://a.b.example.com/x",
      "https://example.org/y?q=1",
      "https://src5.net/page/1"
    ).toDF("u")
      .select(UrlCuration.domainOf(col("u")).as("d"))
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("example.com", "example.org", "src5.net"))
  }

  private lazy val docs = Tables.documents(spark, SF)

  test("q148 synthetic URLs: one per doc, derivable and re-normalizable") {
    val out = UrlCuration.q148(docs).collect()
    assert(out.length == docs.count())
    // every normalized URL is lowercase-scheme, no www., no :443, no #
    out.foreach { r =>
      val n = r.getAs[String]("url_norm")
      assert(n.startsWith("https://"), n)
      assert(!n.contains("www."), n)
      assert(!n.contains(":443"), n)
      assert(!n.contains("#"), n)
      assert(!n.contains("utm_"), n)
      assert(!n.endsWith("/"), n)
      val d = r.getAs[String]("domain")
      assert(d.count(_ == '.') == 1 && n.contains(d), s"$n / $d")
    }
    // normalization is idempotent: norm(norm(u)) == norm(u)
    val again = UrlCuration.q148(docs)
      .select(col("url_norm"),
        UrlCuration.normalizeUrl(col("url_norm")).as("twice"))
      .filter(col("url_norm") =!= col("twice"))
    assert(again.count() == 0L)
  }

  test("q149 blocklist: verdicts match a set-membership recompute") {
    val out = UrlCuration.q149(docs).collect()
    val bl = UrlCuration.DefaultBlocklist.toSet
    out.foreach { r =>
      assert(r.getAs[Boolean]("blocked") == bl(r.getAs[String]("domain")))
    }
    assert(out.exists(_.getAs[Boolean]("blocked"))) // list actually hits
  }

  test("q150 quota: no domain exceeds the cap; survivors deterministic") {
    val cap = 3
    val out = UrlCuration.q150(docs, cap)
    val per = out.groupBy(col("domain")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("domain") -> r.getAs[Long]("n"))
    per.foreach { case (d, n) => assert(n <= cap, s"$d over cap: $n") }
    // layout-invariant (deterministic hash, not rand())
    val re = UrlCuration.q150(docs.repartition(7), cap)
      .collect().map(_.toSeq).toSet
    assert(re == out.collect().map(_.toSeq).toSet)
  }

  test("q150 plan: the quota rank is WindowGroupLimit-capped (bounded per-key state)") {
    // adversarial shape: one domain holds ~all docs — the group-limit
    // pushdown is what keeps the window's per-key state at `cap`
    // instead of the domain's full row count at 100 TB
    val plan = formattedPlan(UrlCuration.q150(docs, cap = 5))
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("q151 url dedup: canonical is the min id of its group; groups consistent") {
    // synthesize enough docs that the 60-cycle produces real dup groups
    val many = (0L until 200L)
      .map(i => (i, s"text $i", s"src${i % 20}"))
      .toDF("doc_id", "text", "source")
    val out = UrlCuration.q151(many).collect()
    val byNorm = out.groupBy(_.getAs[String]("url_norm"))
    byNorm.foreach { case (_, rows) =>
      val ids = rows.map(_.getAs[Long]("doc_id"))
      val canon = rows.map(_.getAs[Long]("canon_id")).distinct
      assert(canon.toSeq == Seq(ids.min))
      assert(rows.forall(_.getAs[Long]("n_variants") == rows.length))
      rows.foreach { r =>
        val expected =
          if (r.getAs[Long]("doc_id") == ids.min) "canonical" else "dup_url"
        assert(r.getAs[String]("status") == expected)
      }
    }
    // the 60-doc cycle: doc 0 and doc 60 canonicalize identically
    val m = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("url_norm")).toMap
    assert(m(0L) == m(60L) && m(0L) == m(120L))
    assert(out.count(_.getAs[String]("status") == "dup_url") > 0)
  }

  test("q152 domain split: every doc of a domain lands on the SAME side") {
    val out = UrlCuration.q152(docs).collect()
    val byDomain = out.groupBy(_.getAs[String]("domain"))
    byDomain.foreach { case (d, rows) =>
      assert(rows.map(_.getAs[String]("split")).distinct.length == 1,
        s"domain $d straddles splits")
    }
    assert(out.map(_.getAs[String]("split")).toSet.subsetOf(
      Set("train", "valid", "test")))
    // deterministic: same corpus, any layout -> same assignment
    val re = UrlCuration.q152(docs.repartition(5)).collect().map(_.toSeq).toSet
    assert(re == out.map(_.toSeq).toSet)
  }

  test("q153 domain profile: counts and rates re-derive from q148/q151") {
    val many = (0L until 200L)
      .map(i => (i, s"text ${i % 30}", s"src${i % 20}"))
      .toDF("doc_id", "text", "source")
    val out = UrlCuration.q153(many).collect()
    val base = UrlCuration.q148(many)
      .join(many.select(col("doc_id"), col("text")), "doc_id")
      .collect()
    val byDomain = base.groupBy(_.getAs[String]("domain"))
    out.foreach { r =>
      val d = r.getAs[String]("domain")
      val rows = byDomain(d)
      val nDocs = rows.length.toLong
      val nUrls = rows.map(_.getAs[String]("url_norm")).distinct.length.toLong
      val nTexts = rows.map(_.getAs[String]("text").trim.toLowerCase)
        .distinct.length.toLong
      assert(r.getAs[Long]("n_docs") == nDocs)
      assert(r.getAs[Long]("n_urls") == nUrls)
      assert(r.getAs[Long]("n_texts") == nTexts)
      assert(r.getAs[Double]("url_dup_rate") == 1.0 - nUrls.toDouble / nDocs)
      assert(r.getAs[Double]("text_dup_rate") == 1.0 - nTexts.toDouble / nDocs)
    }
    // the 60-cycle corpus has real URL dup mass somewhere
    assert(out.exists(_.getAs[Double]("url_dup_rate") > 0.0))
  }

  test("q168 Gini: uniform domain spread scores exactly 0, skew grows it") {
    import graft.operators.UrlCuration
    // one source, doc_ids 0..5 -> domains s.com/s.org/s.net, 2 docs each
    val uniform = (0L to 5L).map(i => (i, s"text $i", "s"))
      .toDF("doc_id", "text", "source")
    val u = UrlCuration.q168(uniform).collect().head
    assert(u.getAs[Long]("n_domains") == 3L && u.getAs[Long]("n_docs") == 6L)
    assert(u.getAs[Double]("gini") == 0.0, u)
    // pile 9 more docs onto one domain (doc_id % 3 == 0 -> .com)
    val skewed = ((0L to 5L) ++ (6L to 14L).map(_ * 3)).map(i =>
      (i, s"text $i", "s")).toDF("doc_id", "text", "source")
    val sgini = UrlCuration.q168(skewed).collect().head.getAs[Double]("gini")
    assert(sgini > 0.3, s"gini=$sgini")
    // brute-force cross-check on the real table: collect counts, fold
    val docs = Tables.documents(spark, SF)
    val got = UrlCuration.q168(docs).collect().head
    val counts = UrlCuration.q148(docs).groupBy("domain").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(c => (c._2, c._1))
    val n = counts.length.toDouble
    val sx = counts.map(_._2).sum
    val sixi = counts.zipWithIndex.map { case ((_, x), i) => (i + 1) * x }.sum
    val expect = (2.0 * sixi) / (n * sx.toDouble) - (n + 1.0) / n
    assert(got.getAs[Double]("gini") == expect)
  }
}
