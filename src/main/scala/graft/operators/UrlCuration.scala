package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL / DOMAIN curation (SURVEY.md §2c) — the crawl-curation axis a
  * web-scale corpus pipeline filters on before any text-level pass:
  * URL canonicalization, URL-normalized exact dedup, domain blocklists
  * and per-domain quotas (the CCNet / RefinedWeb / FineWeb recipe
  * heads: normalize → dedup by URL → drop blocklisted domains → cap
  * any single domain's share).
  *
  * The driver's `documents` table has no URL column (TESTDATA.md), so
  * [[withUrl]] DERIVES a deterministic synthetic URL per document from
  * (source, doc_id) — messy on purpose (scheme case, www. prefixes,
  * explicit default ports, trailing slashes, tracking params,
  * fragments) so normalization has real work to do. The derivation is
  * pure engine-portable column algebra (CASE on doc_id residues +
  * concat), so every query here reproduces bit-identically in the
  * DuckDB oracle: these are oracle-exact operators, not rows-only.
  *
  * Scale shape: everything is one scan + narrow projections; the only
  * exchanges are the url_norm/domain aggregations, which carry
  * (≤120-byte key, id) rows — never text. At 100 TB the url table IS
  * the crawl index; the same plans hold with url read as a column
  * instead of derived. */
object UrlCuration {

  /** Deterministic messy synthetic URL; see object doc. Residue mix
    * chosen so variants overlap: the same (source, path) appears with
    * and without www./port/utm across doc_ids, giving q151 real
    * URL-normalized dup groups. */
  def withUrl(documents: DataFrame): DataFrame = {
    val id = col("doc_id")
    val tld = when(id % 3 === 0, "com").when(id % 3 === 1, "org")
      .otherwise("net")
    val scheme = when(id % 7 === 0, "HTTPS").otherwise("https")
    val www = when(id % 4 === 0, "www.").otherwise("")
    val port = when(id % 11 === 0, ":443").otherwise("")
    // path modulus 12: with ~20 sources and 3 tlds, doc_ids 60 apart
    // canonicalize to the SAME url — real dup groups for q151 at sf0.01+
    val path = concat(lit("/page/"), (id % 12).cast("string"))
    val slash = when(id % 6 === 0, "/").otherwise("")
    val query = when(id % 5 === 0, "?utm_source=feed&utm_campaign=crawl")
      .when(id % 5 === 1, "?ref=home").otherwise("")
    val frag = when(id % 9 === 0, "#section-2").otherwise("")
    documents.withColumn("url",
      concat(scheme, lit("://"), www, col("source"), lit("."), tld, port,
        path, slash, query, frag))
  }

  /** Canonical form of `url`: lowercase scheme + host, `www.` and
    * default-port stripped, fragment dropped, `utm_*` tracking params
    * removed (other params kept), trailing slash trimmed. Pure
    * split_part/regexp algebra from the RE2 ∩ Java-regex common subset
    * — the oracle replays it verbatim. */
  def normalizeUrl(url: Column): Column = {
    val scheme = lower(split_part(url, lit("://"), lit(1)))
    val rest = substring_index(url, "://", -1)
    val hostPort = split_part(rest, lit("/"), lit(1))
    val host = regexp_replace(
      regexp_replace(lower(hostPort), "^www\\.", ""), ":(443|80)$", "")
    // path+query+fragment = everything after the host-port segment
    val pathQF = rest.substr(length(hostPort) + lit(1), length(rest))
    val noFrag = split_part(pathQF, lit("#"), lit(1))
    // drop utm params, then repair a query string that now starts at &
    val noUtm = regexp_replace(noFrag, "[?&]utm_[^&#]*", "")
    val fixedQ = regexp_replace(noUtm, "^([^?]*)&", "$1?")
    val noSlash = regexp_replace(fixedQ, "/+(\\?|$)", "$1")
    concat(scheme, lit("://"), host, noSlash)
  }

  /** Registered domain of a normalized URL: last two host labels. */
  def domainOf(urlNorm: Column): Column = {
    val host = split_part(split_part(urlNorm, lit("://"), lit(2)),
      lit("/"), lit(1))
    val hostNoQ = split_part(host, lit("?"), lit(1))
    array_join(slice(split(hostNoQ, "\\."), -2, 2), ".")
  }

  /** q148: URL NORMALIZATION — per document, the raw synthetic URL,
    * its canonical form, and the registered domain. The primitive the
    * rest of the family (and any URL-keyed dedup at 100 TB) builds on;
    * stateless map, no exchange at all. */
  def q148(documents: DataFrame): DataFrame =
    withUrl(documents)
      .withColumn("url_norm", normalizeUrl(col("url")))
      .withColumn("domain", domainOf(col("url_norm")))
      .select(col("doc_id"), col("url"), col("url_norm"), col("domain"))
      .orderBy(col("doc_id"))

  /** q149: DOMAIN BLOCKLIST verdicts — flag every document whose
    * registered domain is blocklisted (spam/adult/SEO-farm lists in a
    * real crawl). The blocklist is a broadcast local relation (lists
    * are ≤ millions of rows — metadata next to the corpus), so the
    * verdict is a broadcast left-semi probe: one corpus scan, no
    * corpus-sized exchange. */
  def q149(documents: DataFrame,
           blocklist: Seq[String] = DefaultBlocklist): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val bl = blocklist.toDF("domain").withColumn("hit", lit(1))
    q148(documents)
      .join(broadcast(bl), Seq("domain"), "left_outer")
      .withColumn("blocked", col("hit").isNotNull)
      .select(col("doc_id"), col("domain"), col("blocked"))
      .orderBy(col("doc_id"))
  }

  val DefaultBlocklist: Seq[String] =
    Seq("src1.org", "src3.com", "src7.net", "src12.com")

  /** q150: PER-DOMAIN QUOTA — cap any one domain at `cap` documents,
    * picking survivors by the engine-portable multiplicative hash
    * (q58/q80/q91 family, its own salt) so the sample is reproducible
    * on any engine/layout/rerun, unlike rand(). One narrow shuffle on
    * domain + a WindowGroupLimit-capped rank; at 100 TB the heavy
    * domains are exactly the capped ones, so the window's per-key
    * state is bounded by `cap` via the group-limit pushdown. */
  def q150(documents: DataFrame, cap: Int = 12): DataFrame = {
    val P = 1000000007L
    val h = pmod(
      pmod(pmod(col("doc_id"), lit(P)) * lit(2654435761L), lit(P)) +
        lit(148151L), lit(P))
    val w = Window.partitionBy(col("domain")).orderBy(col("h"), col("doc_id"))
    q148(documents)
      .withColumn("h", h)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= cap)
      .select(col("doc_id"), col("domain"), col("rk"))
      .orderBy(col("domain"), col("rk"))
  }

  /** q151: URL-NORMALIZED EXACT DEDUP — the crawl-side twin of q40's
    * text dedup: documents whose URLs canonicalize identically are one
    * logical page fetched under variant URLs; keep the min-doc_id
    * fetch as canonical. Verdicts: `canonical` (first fetch of its
    * normalized URL) vs `dup_url`. The shuffle key is the normalized
    * URL string (≤ ~120 bytes) — at 100 TB swap in its xxhash64 like
    * q40's digest discipline; here the string keeps the oracle
    * portable. */
  def q151(documents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("url_norm"))
    q148(documents)
      .withColumn("canon_id", min(col("doc_id")).over(w))
      .withColumn("n_variants", count(lit(1)).over(w))
      .withColumn("status",
        when(col("doc_id") === col("canon_id"), "canonical")
          .otherwise("dup_url"))
      .select(col("doc_id"), col("url_norm"), col("canon_id"),
        col("n_variants"), col("status"))
      .orderBy(col("doc_id"))
  }

  /** q152: LEAKAGE-SAFE train/valid/test split by DOMAIN — q91's split
    * assigned at DOMAIN granularity, not per document: URL variants,
    * re-crawls, and template near-dups overwhelmingly live within one
    * domain, so a per-doc split leaks them across the train/test
    * boundary (exactly the q111 failure mode); hashing the domain puts
    * every page of a site on the SAME side. The hash is the portable
    * polynomial fingerprint over the domain STRING ([[graft.functions
    * .PolyFingerprint]], the q50 kernel — native codegen'd, mirrored
    * in the oracle as a list_reduce fold), salted, mod 100 → 80/10/10.
    * Stateless map over q148; no exchange. */
  def q152(documents: DataFrame): DataFrame = {
    val h = pmod(graft.functions.PolyFingerprint(col("domain")) +
      lit(52151L), lit(100L))
    q148(documents)
      .withColumn("split",
        when(h < 80, "train").when(h < 90, "valid").otherwise("test"))
      .select(col("doc_id"), col("domain"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** q153: per-domain CRAWL-HEALTH profile — the dashboard a crawl
    * operator reads before q149/q150 policy decisions: per domain,
    * fetch count, distinct normalized URLs, distinct normalized texts,
    * and the two dup rates (URL-variant re-fetch rate vs text-level
    * mirror/template rate — a domain can be clean on one axis and
    * pathological on the other). One scan + one map-side-combined
    * aggregate on domain; counts are exact longs, rates one double
    * divide (§6). At 100 TB count_distinct's per-group state is the
    * distinct-key set — swap in approx_count_distinct per the q24
    * sketch discipline when ±2% suffices. */
  def q153(documents: DataFrame): DataFrame =
    q148(documents)
      .join(documents.select(col("doc_id"), col("text")), "doc_id")
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("url_norm")).as("n_urls"),
        countDistinct(lower(trim(col("text")))).as("n_texts"))
      .withColumn("url_dup_rate",
        lit(1.0) - col("n_urls").cast("double") / col("n_docs").cast("double"))
      .withColumn("text_dup_rate",
        lit(1.0) - col("n_texts").cast("double") / col("n_docs").cast("double"))
      .orderBy(col("domain"))

  /** q168: domain CONCENTRATION (Gini coefficient) of the corpus —
    * how unequally documents are spread over crawl domains:
    * G = (2·Σ i·x_i)/(n·Σ x) − (n+1)/n over the ascending-sorted
    * per-domain doc counts (i = 1-based rank). The one-scalar
    * concentration dashboard number next to q121's per-source
    * diversity and q153's per-domain profile: G → 1 means a handful
    * of domains dominate the corpus (quota/blocklist work pending),
    * G → 0 means an even spread.
    *
    * Exactness (§6): x and Σ i·x_i are exact longs (rank ties broken
    * on domain), the final G is one fixed IEEE sequence → hash-exact.
    * The rank window runs over DOMAIN-count rows (already aggregated)
    * — not a corpus-width sort. */
  def q168(documents: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt"), col("domain"))
    val byDomain = q148(documents)
      .groupBy(col("domain")).agg(count(lit(1)).cast("long").as("cnt"))
      .withColumn("rk", row_number().over(w).cast("long"))
    val nD = col("n_domains").cast("double")
    byDomain
      .agg(count(lit(1)).cast("long").as("n_domains"),
        sum(col("cnt")).cast("long").as("n_docs"),
        sum(col("rk") * col("cnt")).cast("long").as("sixi"))
      .select(col("n_domains"), col("n_docs"),
        ((lit(2.0) * col("sixi").cast("double")) /
          (nD * col("n_docs").cast("double")) -
          (nD + lit(1.0)) / nD).as("gini"))
  }
}
