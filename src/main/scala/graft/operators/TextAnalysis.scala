package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (SURVEY.md §2c): language
  * ID, quality scoring, token counting, fingerprinting. Everything is a
  * codegen'd column expression — single scan, no UDFs, no shuffle except
  * where an aggregation is the point. */
object TextAnalysis {

  /** Marker lexicons for the n-gram/stopword language-ID heuristic. */
  val Lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "order", "column", "vector"),
    "es" -> Seq("fast", "spark", "customer", "filter", "sort"),
    "de" -> Seq("agg", "table", "key", "scan", "part"),
    "fr" -> Seq("join", "window", "merge", "line", "group"),
    "zh" -> Seq("stream", "row", "query", "batch", "data"))

  /** q47: language-ID — per-language stopword hit counts over tokens,
    * argmax with a deterministic tie-break cascade (lexicon order). */
  def q47(documents: DataFrame): DataFrame = {
    val toks = documents.select(col("doc_id"), col("lang"),
      explode(split(lower(trim(col("text"))), " ")).as("tok"))
    val sums = Lexicons.map { case (l, words) =>
      sum(when(col("tok").isin(words: _*), 1).otherwise(0)).as(s"s_$l")
    }
    val scores = toks.groupBy(col("doc_id"), col("lang"))
      .agg(sums.head, sums.tail: _*)
    val langs = Lexicons.map(_._1)
    val pred = langs.init.foldRight(lit(langs.last): Column) { (l, rest) =>
      val ge = langs.filter(_ != l)
        .map(o => col(s"s_$l") >= col(s"s_$o")).reduce(_ && _)
      when(ge, lit(l)).otherwise(rest)
    }
    scores
      .select((Seq(col("doc_id"), col("lang"), pred.as("pred_lang")) ++
        langs.map(l => col(s"s_$l"))): _*)
      .orderBy(col("doc_id"))
  }

  private val Stopwords = Seq("the", "a", "and", "of", "data", "row")

  /** q159 demo lexicons — tiny on purpose (a real run broadcasts a
    * SentiWordNet-class list; the PLAN is identical at any lexicon
    * size). Mirrored verbatim in the oracle SQL. */
  private val PosLexicon = Seq("fast", "value", "good", "best", "clean")
  private val NegLexicon = Seq("slow", "small", "bad", "error", "noise")

  /** q159: LEXICON SENTIMENT scoring (the Spark-at-scale sentiment
    * pipeline shape — EDBT'16, PAPERS.md): per document, positive/
    * negative lexicon hits and the normalized polarity
    * (n_pos − n_neg)/n_tokens with a ±0.05 three-way label. One scan,
    * per-row array filters against broadcast-sized lexicons, no
    * exchange at all — the cheapest possible text-signal plan; counts
    * are exact longs, the polarity is one double divide (§6), so the
    * label thresholds compare identical doubles in both engines. */
  def q159(documents: DataFrame): DataFrame = {
    val toks = split(lower(trim(col("text"))), " ")
    documents
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_pos",
        size(filter(toks, t => t.isin(PosLexicon: _*))).cast("long"))
      .withColumn("n_neg",
        size(filter(toks, t => t.isin(NegLexicon: _*))).cast("long"))
      .withColumn("sentiment",
        (col("n_pos") - col("n_neg")).cast("double") /
          col("n_tokens").cast("double"))
      .withColumn("label",
        when(col("sentiment") > 0.05, "positive")
          .when(col("sentiment") < -0.05, "negative")
          .otherwise("neutral"))
      .select(col("doc_id"), col("n_tokens"), col("n_pos"), col("n_neg"),
        col("sentiment"), col("label"))
      .orderBy(col("doc_id"))
  }

  /** q48: document quality scoring — type/token ratio, length saturation,
    * stopword ratio, combined in a fixed-order weighted sum (bit-stable
    * across engines, SURVEY.md §6). */
  def q48(documents: DataFrame): DataFrame = {
    val toks = split(trim(col("text")), " ")
    documents
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_distinct", size(array_distinct(toks)).cast("long"))
      .withColumn("n_stop",
        size(filter(toks, t => lower(t).isin(Stopwords: _*))).cast("long"))
      .withColumn("ttr", col("n_distinct").cast("double") / col("n_tokens"))
      .withColumn("len_score",
        least(lit(1.0), col("n_tokens").cast("double") / lit(100.0)))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens"))
      .withColumn("quality",
        col("ttr") * 0.4 + col("len_score") * 0.3 + col("stop_ratio") * 0.3)
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"), col("n_stop"),
        col("ttr"), col("len_score"), col("stop_ratio"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** q49: token counting — whitespace tokens and a BPE-ish regex count
    * (letter runs / digit runs / other symbols), plus chars-per-token. */
  def q49(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        size(split(trim(col("text")), " ")).cast("long").as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long")
          .as("bpe_ish_tokens"),
        col("n_chars"))
      .withColumn("chars_per_token",
        col("n_chars").cast("double") / col("ws_tokens"))
      .orderBy(col("doc_id"))

  /** q57: LATERAL VIEW-style array explode — tokens with their position
    * (posexplode), aggregated to the most common leading token. The Hive
    * `LATERAL VIEW posexplode` surface as a DataFrame generator. */
  def q57(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        posexplode(split(lower(trim(col("text"))), " ")).as(Seq("pos", "tok")))
      .filter(col("pos") === 0)
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("tok"))

  /** q54: text normalization — the cleaning pass every corpus pipeline
    * runs before dedup/tokenization: lowercase, strip non-alphanumerics,
    * collapse runs of whitespace, trim. Pure codegen'd scan. */
  def q54(documents: DataFrame): DataFrame = {
    val cleaned = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    documents
      .select(col("doc_id"), cleaned.as("clean_text"),
        size(split(cleaned, " ")).cast("long").as("clean_tokens"))
      .orderBy(col("doc_id"))
  }

  /** q67: PII scrubbing — redact emails, IPv4-ish addresses, and long
    * digit runs (phone/account numbers) before a corpus ships to
    * training. Counts come from the ORIGINAL text (all three patterns),
    * then redactions apply in a fixed order; every pattern is chosen to
    * parse identically in Java regex (Spark) and RE2 (DuckDB oracle).
    * Pure codegen'd single scan — the 100 TB shape is "one pass, no
    * shuffle", exactly like q54. */
  def q67(documents: DataFrame): DataFrame = {
    val email  = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val ipv4   = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
    val digits = "[0-9]{6,}"
    val scrubbed = regexp_replace(regexp_replace(regexp_replace(col("text"),
      email, "<EMAIL>"), ipv4, "<IP>"), digits, "<NUM>")
    documents
      .select(col("doc_id"),
        regexp_count(col("text"), lit(email)).cast("long").as("n_emails"),
        regexp_count(col("text"), lit(ipv4)).cast("long").as("n_ips"),
        regexp_count(col("text"), lit(digits)).cast("long").as("n_longnums"),
        scrubbed.as("scrubbed"))
      .orderBy(col("doc_id"))
  }

  /** q68: repetition scoring (the Gopher-style quality signal): fraction
    * of duplicated tokens, the single most frequent token's share, and
    * the fraction of duplicated word bigrams. Highly repetitive docs are
    * the classic low-quality pattern a training corpus filters out. Two
    * partial-aggregated shuffles on doc_id (tokens, bigrams) — no
    * windows, no UDFs; all ratios are one double divide (§6 float
    * discipline). */
  def q68(documents: DataFrame): DataFrame = {
    val toks = documents.select(col("doc_id"),
      explode(split(lower(trim(col("text"))), " ")).as("tok"))
    val words = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("distinct_tokens"),
        max(col("c")).as("top_c"))
    val w = documents.select(col("doc_id"),
      split(lower(trim(col("text"))), " ").as("w"))
    val bigrams = w.filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(
        transform(sequence(lit(1), size(col("w")) - 1, lit(1)), i =>
          concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1))))
        .as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"), count(lit(1)).as("distinct_bigrams"))
    // LEFT join: a one-token doc has no bigrams but must still be
    // scored (null bigram fraction), else it silently vanishes from the
    // quality report and downstream filters treat it as unscored
    words.join(bigrams, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"), col("distinct_tokens"),
        ((col("n_tokens") - col("distinct_tokens")).cast("double") / col("n_tokens"))
          .as("dup_token_frac"),
        (col("top_c").cast("double") / col("n_tokens")).as("top_token_share"),
        ((col("n_bigrams") - col("distinct_bigrams")).cast("double") / col("n_bigrams"))
          .as("dup_bigram_frac"))
      .orderBy(col("doc_id"))
  }

  /** q70: corpus mix statistics — per-source doc/token/char volumes,
    * each source's share of corpus tokens, and the resampling weight
    * that would flatten the mix to uniform (the number a data-mixing
    * pipeline feeds back into sampling). One partial-aggregated shuffle
    * on source + a broadcast of the single-row corpus total; weight is
    * computed as one double divide of exact longs. */
  def q70(documents: DataFrame): DataFrame = {
    val per = documents.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(trim(col("text")), " ")).cast("long")).as("n_tokens"),
      sum(col("n_chars").cast("long")).as("sum_chars"))
    // corpus totals: persist the ≤ #sources-row aggregate once, reduce
    // it to a single total row, and broadcast that back over the rows.
    // The corpus is still scanned exactly once (totals derive from the
    // pinned aggregate, not a second pass) and every operator in the
    // plan has defined partitioning — no single-partition WindowExec.
    val perP = per.transform(graft.Pins.pin)
    val tot = perP.agg(sum(col("n_tokens")).as("tot_tokens"),
      count(lit(1)).as("n_sources"))
    perP
      .crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("sum_chars"),
        (col("n_tokens").cast("double") / col("tot_tokens")).as("token_share"),
        (col("tot_tokens").cast("double") / (col("n_sources") * col("n_tokens")))
          .as("uniform_weight"))
      .orderBy(col("source"))
  }

  /** q75: corpus vocabulary top-k — the frequency table a tokenizer
    * training pass starts from: per token, total occurrences and
    * document frequency, top-100 by count. The global top-k plans as
    * TakeOrderedAndProject over the per-token aggregate (no full sort);
    * COUNT(DISTINCT doc_id) expands in the same aggregation framework.
    * Deterministic tie-break on the token itself. */
  def q75(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), " ")).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"), countDistinct(col("doc_id")).as("doc_freq"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(100)

  /** q157: ZIPF-SLOPE fit — least-squares α of the rank-frequency
    * power law ln(cnt) ≈ intercept − α·ln(rank) over the top-`topN`
    * vocabulary: the corpus-health scalar that flags template/spam
    * corpora (α drifts far from ~1) and gives mixing decisions a
    * single distributional number per corpus. The ONE-ROW regression
    * report downstream dashboards consume, companion to q75/q130/q140.
    *
    * Exactness (§6): both ln's go through [[graft.functions
    * .PortableLn]] (bit-identical in the oracle's lnChain replay);
    * each regression term (x, y, x·y, x²) floor-scales to 1e-9 longs
    * so Σ's are order-free integers; the slope/intercept algebra is a
    * fixed IEEE op sequence over those exact sums → hash-exact.
    *
    * Plan shape: the vocab top-N is the q75 TakeOrderedAndProject
    * (per-partition heaps, no global sort); everything after runs on
    * topN rows — the rank window is a single-partition window over
    * metadata-sized input by construction, not a scale hazard. */
  def q157(documents: DataFrame, topN: Int = 100): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("tok"))
    val vocab = documents
      .select(explode(split(lower(trim(col("text"))), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(topN)
      .withColumn("rank", row_number().over(w).cast("long"))
    val x = graft.functions.PortableLn(col("rank").cast("double"))
    val y = graft.functions.PortableLn(col("cnt").cast("double"))
    val sums = vocab
      .select(
        floor(x * lit(1.0e9)).cast("long").as("fx"),
        floor(y * lit(1.0e9)).cast("long").as("fy"),
        floor((x * y) * lit(1.0e9)).cast("long").as("fxy"),
        floor((x * x) * lit(1.0e9)).cast("long").as("fxx"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("fx")).as("sfx"), sum(col("fy")).as("sfy"),
        sum(col("fxy")).as("sfxy"), sum(col("fxx")).as("sfxx"))
    val nD  = col("n").cast("double")
    val sx  = col("sfx").cast("double") / lit(1.0e9)
    val sy  = col("sfy").cast("double") / lit(1.0e9)
    val sxy = col("sfxy").cast("double") / lit(1.0e9)
    val sxx = col("sfxx").cast("double") / lit(1.0e9)
    val slope = (nD * sxy - sx * sy) / (nD * sxx - sx * sx)
    sums.select(col("n").as("n_terms"),
      (-slope).as("alpha"),
      ((sy - slope * sx) / nD).as("intercept"))
  }

  /** q160: per-document TOKEN ENTROPY — Shannon entropy of the
    * within-doc token distribution, H = ln n − (1/n)·Σ c·ln c over the
    * per-token counts c, plus the normalized redundancy
    * 1 − H/ln(n_distinct) (1 = one token repeated, 0 = all-distinct
    * uniform). The classic information-theoretic quality signal the
    * suite's ratio heuristics (q48) and repetition detector (q68)
    * bracket from either side: low entropy flags template/spam text
    * whatever the tokens are.
    *
    * Exactness (§6): ln through [[graft.functions.PortableLn]], each
    * per-token term c·ln(c) floor-scaled to 1e-9 longs so the per-doc
    * Σ is an order-free integer sum; the final H / redundancy algebra
    * is a fixed IEEE sequence over those exact sums → hash-exact.
    * n_distinct == 1 ⇒ ln = 0; the `when` guard defines redundancy
    * there as 1.0 (fully redundant) without touching the divide.
    *
    * Plan shape: one token scan → (doc_id, tok) counts (the only
    * data-sized exchange, map-side combined) → per-doc aggregate. No
    * windows, no joins — the same exchange budget as q48. */
  def q160(documents: DataFrame): DataFrame = {
    val counts = documents
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
    val lnc = graft.functions.PortableLn(col("c").cast("double"))
    val agg = counts
      .select(col("doc_id"), col("c"),
        floor((col("c").cast("double") * lnc) * lit(1.0e9)).cast("long")
          .as("fclnc"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("n_distinct"),
        sum(col("fclnc")).as("sclnc"))
    val n = col("n_tokens").cast("double")
    agg
      .withColumn("entropy",
        graft.functions.PortableLn(n) -
          (col("sclnc").cast("double") / lit(1.0e9)) / n)
      .withColumn("redundancy",
        when(col("n_distinct") > 1L,
          lit(1.0) - col("entropy") /
            graft.functions.PortableLn(col("n_distinct").cast("double")))
          .otherwise(lit(1.0)))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("entropy"), col("redundancy"))
      .orderBy(col("doc_id"))
  }

  /** q166: RAKE KEYWORD extraction (Rose et al. 2010 — Rapid
    * Automatic Keyword Extraction): candidate phrases are maximal
    * stopword-free token runs; each word scores deg/freq (deg = Σ
    * lengths of the doc's phrases containing it, freq = its
    * occurrence count — co-occurring words outrank loners); a phrase
    * scores the sum of its word scores; top-3 phrases per doc. The
    * per-doc keyword signal a curation index builds topic facets
    * from, complementing the corpus-level q75/q89/q90 statistics.
    *
    * Exactness (§6): deg/freq are exact longs; the word score is one
    * double divide; the phrase score folds word scores IN POSITION
    * ORDER (sort_array + strict left fold, the q86/q116 idiom) —
    * fixed IEEE sequence → hash-exact. Rank ties break on phrase
    * text; bit-equal (score, phrase) duplicates are set-identical
    * whatever rank order they land in.
    *
    * Plan shape: one token scan; the phrase id is a running stopword
    * count over a PER-DOC window (bounded by doc length, no global
    * sort); word stats and the score join shuffle (doc, word) /
    * (doc, phrase) keys only. */
  def q166(documents: DataFrame, topK: Int = 3): DataFrame = {
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val toks = documents
      .select(col("doc_id"),
        posexplode(split(lower(trim(col("text"))), " ")).as(Seq("pos", "w")))
      .withColumn("stop", col("w").isin(Stopwords: _*))
      .withColumn("sid", sum(when(col("stop"), 1L).otherwise(0L)).over(wDoc))
    val words = graft.Pins.pin(
      toks.filter(!col("stop"))
        .select(col("doc_id"), col("sid"), col("pos"), col("w")))
    val plen = words.groupBy(col("doc_id"), col("sid"))
      .agg(count(lit(1)).cast("long").as("plen"))
    val wstats = words.join(plen, Seq("doc_id", "sid"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).cast("long").as("freq"),
        sum(col("plen")).cast("long").as("deg"))
      .withColumn("wscore", col("deg").cast("double") / col("freq").cast("double"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("phrase"))
    words.join(wstats.select(col("doc_id"), col("w"), col("wscore")),
        Seq("doc_id", "w"))
      .groupBy(col("doc_id"), col("sid"))
      .agg(sort_array(collect_list(struct(col("pos"), col("w"), col("wscore"))))
        .as("xs"))
      .withColumn("phrase",
        array_join(transform(col("xs"), x => x.getField("w")), " "))
      .withColumn("n_words", size(col("xs")).cast("long"))
      .withColumn("score",
        aggregate(col("xs"), lit(0.0), (a, x) => a + x.getField("wscore")))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("rank"), col("phrase"), col("n_words"),
        col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** q167: per-source CHI-SQUARED drift — Pearson's χ² of each
    * source's hashed-unigram bucket distribution against the
    * corpus-wide expectation e_b = total_b · n_s/n_total: the
    * classical significance-flavored companion to q132's L1 drift
    * and q117's DSIR log-ratios, and the per-source "is this source
    * even the same language as the rest of the mix" gate. χ²/n is
    * comparable across sources of different sizes.
    *
    * Exactness (§6): all counts exact longs (zero-observation
    * buckets included via the source × corpus-bucket grid); each
    * bucket term is a fixed IEEE sequence and the per-source fold
    * runs in bucket order (sort_array + strict left fold, ≤ `buckets`
    * structs per source — bounded) → hash-exact.
    *
    * Plan shape: one token scan → (source, bucket) counts (the only
    * data-sized exchange, 8-byte-ish keys, map-side combined);
    * everything after runs on source×buckets rows. */
  def q167(documents: DataFrame, buckets: Int = 64): DataFrame = {
    val sb = graft.Pins.pin(
      documents
        .select(col("source"),
          explode(split(lower(trim(col("text"))), " ")).as("tok"))
        .select(col("source"),
          pmod(graft.functions.PolyFingerprint(col("tok")),
            lit(buckets.toLong)).as("b"))
        .groupBy(col("source"), col("b"))
        .agg(count(lit(1)).cast("long").as("o")))
    val cb = sb.groupBy(col("b")).agg(sum(col("o")).cast("long").as("cb"))
    val ns = sb.groupBy(col("source")).agg(sum(col("o")).cast("long").as("ns"))
    val nt = sb.agg(sum(col("o")).cast("long").as("nt"))
    val od = col("o").cast("double")
    val e = (col("cb").cast("double") * col("ns").cast("double")) /
      col("nt").cast("double")
    ns.crossJoin(broadcast(cb))
      .join(sb, Seq("source", "b"), "left_outer")
      .crossJoin(broadcast(nt))
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .withColumn("term", (od - e) * (od - e) / e)
      .groupBy(col("source"), col("ns"))
      .agg(sort_array(collect_list(struct(col("b"), col("term")))).as("xs"))
      .withColumn("chi2",
        aggregate(col("xs"), lit(0.0), (a, x) => a + x.getField("term")))
      .select(col("source"), col("ns").as("n_tokens"), col("chi2"),
        (col("chi2") / col("ns").cast("double")).as("chi2_norm"))
      .orderBy(col("source"))
  }

  /** q140: HEAVY-HITTER tokens via the native Misra-Gries sketch
    * ([[graft.functions.FreqSketch]], fn06) — q75's question answered
    * the way a 100 TB corpus can afford: q75's exact table shuffles
    * one row per DISTINCT TOKEN (the vocabulary — unbounded, long-tail
    * heavy); the sketch keeps ≤ `capacity` counters per partial, so
    * the exchange carries capacity-sized summaries regardless of
    * vocabulary size, and the Mergeable-Summaries merge makes the
    * result partitioning-independent in its GUARANTEE (any token with
    * true count > n/(capacity+1) is present; est ≤ true ≤ est+err).
    * Output: top-`topK` reported tokens with their lower-bound
    * estimate and the sketch's data-dependent error mass. rows-only
    * (sketch contents depend on merge order for sub-threshold tokens);
    * the spec pins the MG guarantee against exact counts at several
    * partitionings. */
  def q140(documents: DataFrame, capacity: Int = 256,
           topK: Int = 32): DataFrame = {
    val sk = documents
      .select(explode(split(lower(trim(col("text"))), " ")).as("tok"))
      .agg(graft.functions.FreqSketch(col("tok"), capacity).as("sk"))
    sk.select(posexplode(col("sk")).as(Seq("rank", "hh")))
      .filter(col("rank") < topK)
      .select((col("rank") + 1).cast("long").as("rank"), col("hh.token").as("token"),
        col("hh.est").as("est"), col("hh.err").as("err"))
      .orderBy(col("rank"))
  }

  /** q141: per-source QUALITY CALIBRATION — z-normalize each doc's q48
    * quality against its OWN source's distribution, so scores compare
    * across sources whose raw quality profiles differ (a 0.6 from a
    * curated source and a 0.6 from a crawl mean different things; the
    * mixing/quota stages q102/q128/q135 consume calibrated scores when
    * sources must compete fairly). Deliberately NOT a per-source
    * percent_rank window: sources are few and large (the q118 lesson —
    * a 20-partition window over a 100 TB corpus is 20 giant
    * single-task sorts); the z-form needs ONE map-side-combined
    * aggregate (count + fixed-point sum + sum of squares per source),
    * a sources-sized broadcast join back, and zero windows.
    *
    * Float discipline (§6): per-source moments accumulate as
    * 1e-8-resolution longs (exact, order-free — the q121/q122 fixed-
    * point pattern), so mean/variance/z are bit-identical in both
    * engines. Degenerate source (no score spread) ⇒ cal_z NULL; the
    * guard is var > 1e-6, not > 0, because the fixed-point floors
    * leave ~1e-8 residual variance on an all-identical source (both
    * engines compute the identical residual — the threshold only has
    * to sit above it and below any real spread). */
  def q141(documents: DataFrame): DataFrame = {
    val q = q48(documents).select(col("doc_id"), col("quality"))
      .join(documents.select(col("doc_id"), col("source")), "doc_id")
    val stats = q.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(floor(col("quality") * lit(1.0e8)).cast("long")).as("s1"),
        sum(floor(col("quality") * col("quality") * lit(1.0e8)).cast("long"))
          .as("s2"))
      .withColumn("src_mean",
        (col("s1").cast("double") / lit(1.0e8)) / col("n_docs").cast("double"))
      .withColumn("src_var",
        (col("s2").cast("double") / lit(1.0e8)) / col("n_docs").cast("double") -
          col("src_mean") * col("src_mean"))
      .select(col("source"), col("n_docs"), col("src_mean"), col("src_var"))
    q.join(broadcast(stats), "source")
      .withColumn("cal_z",
        when(col("src_var") > lit(1.0e-6),
          (col("quality") - col("src_mean")) / sqrt(col("src_var"))))
      .select(col("doc_id"), col("source"), col("quality"),
        col("src_mean"), col("cal_z"))
      .orderBy(col("doc_id"))
  }

  /** q144: NEYMAN-OPTIMAL sampling allocation — how many docs to
    * sample from each source when the total audit/eval budget is
    * fixed: n_h ∝ N_h·σ_h (stratum size × quality-score spread), the
    * classic survey-sampling result that minimizes the estimator
    * variance of the corpus-mean quality. Proportional sampling (q58)
    * over-samples big uniform sources and starves small noisy ones;
    * this is the report a curation team reads before spending an
    * annotation budget. One map-side-combined moment aggregate (the
    * q141 fixed-point discipline — count/sum/sumsq as 1e-8-resolution
    * longs), then everything is sources-sized. The N_h·σ_h products
    * re-quantize to 1e-6 longs before the denominator sum so the
    * total is order-free exact and the allocation is bit-identical in
    * both engines; a zero-variance stratum gets allocation 0 (one doc
    * tells you everything a thousand would), and an allocation caps at
    * the stratum's population. */
  def q144(documents: DataFrame, budget: Long = graft.Oracles.NeymanBudget): DataFrame = {
    val q = q48(documents).select(col("doc_id"), col("quality"))
      .join(documents.select(col("doc_id"), col("source")), "doc_id")
    val stats = q.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(floor(col("quality") * lit(1.0e8)).cast("long")).as("s1"),
        sum(floor(col("quality") * col("quality") * lit(1.0e8)).cast("long"))
          .as("s2"))
      .withColumn("mu",
        (col("s1").cast("double") / lit(1.0e8)) / col("n_docs").cast("double"))
      .withColumn("vr",
        (col("s2").cast("double") / lit(1.0e8)) / col("n_docs").cast("double") -
          col("mu") * col("mu"))
      .withColumn("sigma_q",
        when(col("vr") > lit(1.0e-12), sqrt(col("vr"))).otherwise(lit(0.0)))
      // N_h·σ_h as an exact 1e-6 long so the total sums order-free
      .withColumn("wgt",
        floor(col("n_docs").cast("double") * col("sigma_q") * lit(1.0e6))
          .cast("long"))
    val total = stats.agg(sum(col("wgt")).as("wtot"))
    stats.crossJoin(broadcast(total))
      .withColumn("alloc_n",
        when(col("wtot") > 0,
          least(col("n_docs"),  // can't sample more than the stratum holds
            floor(lit(budget).cast("double") *
              (col("wgt").cast("double") / col("wtot").cast("double")))
              .cast("long")))
          .otherwise(lit(0L)))
      .withColumn("alloc_frac",
        col("alloc_n").cast("double") / col("n_docs").cast("double"))
      .select(col("source"), col("n_docs"), col("sigma_q"),
        col("alloc_n"), col("alloc_frac"))
      .orderBy(col("source"))
  }

  /** q76: bigram language-model statistics — P(w2 | w1) for the corpus'
    * most frequent bigrams (the classic MapReduce LM-prep job). The
    * unigram denominator is a window SUM over the bigram aggregate
    * partitioned by w1 — derived from the same single shuffle, never a
    * second corpus pass; the conditional probability is one double
    * divide of exact longs (§6). */
  def q76(documents: DataFrame): DataFrame = {
    val w = documents.select(split(lower(trim(col("text"))), " ").as("w"))
    val bi = w.filter(size(col("w")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("w")) - 1, lit(1)), i =>
        struct(element_at(col("w"), i).as("w1"),
          element_at(col("w"), i + 1).as("w2")))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val byW1 = org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))
    bi.withColumn("c1", sum(col("c12")).over(byW1))
      .withColumn("cond_p", col("c12").cast("double") / col("c1"))
      .filter(col("c12") >= 5)
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(100)
  }

  /** q85: BM25 keyword retrieval over the corpus — the ranking a
    * data-curation "find documents about X" query or a quality-weighted
    * sampling pass runs. Fixed two-term query; per-doc score is the
    * textbook Robertson/Sparck-Jones form with k1=1.2, b=0.75:
    *   Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    *   idf(t) = ln((N−df+0.5)/(df+0.5)+1).
    * Plan shape at scale: ONE token-explode scan feeds doc lengths and
    * the term tf counts (conditional aggregates, no per-term pass); the
    * three scalar corpus stats (N, avgdl, df per term) broadcast to the
    * scoring projection; global top-k plans as TakeOrderedAndProject.
    * Float discipline (§6): the score tree is written with literal
    * constants and a FIXED term order (term0 + term1), so both engines
    * fold identically; ln bit-parity over the live value range is
    * probe-verified. */
  def q85(documents: DataFrame,
          terms: (String, String) = ("data", "spark")): DataFrame = {
    val toks = documents.select(col("doc_id"),
        explode(split(lower(trim(col("text"))), " ")).as("tok"))
      .transform(graft.Pins.pin)
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val tf = toks.filter(col("tok").isin(terms._1, terms._2))
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("tok") === terms._1, 1L).otherwise(0L)).as("tf0"),
        sum(when(col("tok") === terms._2, 1L).otherwise(0L)).as("tf1"))
    val stats = dl.agg(
      count(lit(1)).cast("long").as("n_docs"),
      sum(col("dl")).cast("long").as("total_toks"))
    val dfs = tf.agg(
      sum(when(col("tf0") > 0, 1L).otherwise(0L)).as("df0"),
      sum(when(col("tf1") > 0, 1L).otherwise(0L)).as("df1"))
    // PortableLn, not functions.log: bitwise cross-engine ln — the
    // oracle replays the same double-op sequence in generated SQL
    def idf(dfc: Column, n: Column): Column =
      graft.functions.PortableLn(
        (n.cast("double") - dfc + lit(0.5)) / (dfc + lit(0.5)) + lit(1.0))
    def part(tfc: Column, idfc: Column, dlc: Column, avgdl: Column): Column =
      when(tfc > 0,
        idfc * (tfc.cast("double") * lit(2.2)) /
          (tfc + lit(1.2) * (lit(0.25) + lit(0.75) * (dlc.cast("double") / avgdl))))
        .otherwise(lit(0.0))
    val avgdl = col("total_toks").cast("double") / col("n_docs")
    tf.join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(dfs))
      .withColumn("score",
        part(col("tf0"), idf(col("df0"), col("n_docs")), col("dl"), avgdl) +
        part(col("tf1"), idf(col("df1"), col("n_docs")), col("dl"), avgdl))
      .select(col("doc_id"), col("dl"), col("tf0"), col("tf1"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(50)
  }

  /** q86: per-document unigram cross-entropy under the corpus' own
    * unigram LM — the CCNet/Gopher-style "how surprising is this text"
    * quality signal used to score and filter training data at corpus
    * scale. logp(d) = Σ_t n_{t,d} · ln(c_t/T); reported raw and
    * per-token. Plan: token explode → (doc,tok) counts joined to the
    * broadcast-scale token dictionary — the shuffles carry counts, not
    * text. Float determinism (§6): the per-doc sum folds over terms in
    * SORTED token order via sort_array + a strict left fold (a groupBy
    * SUM over doubles would be accumulation-order-nondeterministic
    * across partitions and engines); ln bit-parity is probe-verified
    * over the live c/T range. */
  def q86(documents: DataFrame): DataFrame = {
    val toks = documents.select(col("doc_id"),
        explode(split(lower(trim(col("text"))), " ")).as("tok"))
      .transform(graft.Pins.pin)
    val td = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("n"))
    val ct = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = toks.agg(count(lit(1)).as("t"))
    td.join(ct, "tok")
      .crossJoin(broadcast(total))
      .withColumn("lp", col("n") *
        graft.functions.PortableLn(col("c").cast("double") / col("t")))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("n")).cast("long").as("n_tokens"),
        sort_array(collect_list(struct(col("tok"), col("lp")))).as("xs"))
      .withColumn("logp",
        aggregate(col("xs"), lit(0.0), (acc, x) => acc + x.getField("lp")))
      .withColumn("avg_logp", col("logp") / col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("logp"), col("avg_logp"))
      .orderBy(col("doc_id"))
  }

  /** q87: token-window CHUNKING — split every document into fixed-size
    * token windows with overlap (window 64, stride 48 ⇒ 16-token
    * overlap), the preprocessing step that turns a variable-length
    * corpus into model-ready sequences (and the chunker an embedding
    * pipeline runs before q44-style indexing). One scan: the token
    * array is built once, chunk starts come from an integer `sequence`
    * explode (rows ∝ output chunks, no joins, no shuffle until the
    * output sort), `slice` materializes each window. ceil-division in
    * pure int64 (`div`) keeps both engines exact; the short tail window
    * is emitted (slice clamps), matching training practice. */
  def q87(documents: DataFrame, window: Int = 64, stride: Int = 48): DataFrame =
    chunkWindows(documents
      .select(col("doc_id"), split(lower(trim(col("text"))), " ").as("w")),
      window, stride)

  /** The chunking algebra over ANY per-doc token-array frame
    * ((doc_id, w) rows) — shared by q87 (whitespace tokens) and
    * [[q87Bpe]] (BPE subwords). */
  private[graft] def chunkWindows(toks: DataFrame, window: Int,
                                  stride: Int): DataFrame = {
    val nchunks = expr(
      s"CASE WHEN n > $window THEN (CAST(n AS BIGINT) - $window + ${stride - 1}) div $stride ELSE 0 END")
    toks
      .withColumn("n", size(col("w")))
      .withColumn("k", explode(sequence(lit(0L), nchunks, lit(1L))))
      .withColumn("chunk",
        slice(col("w"), (col("k") * stride + 1).cast("int"), lit(window)))
      .select(col("doc_id"), col("k").as("chunk_id"),
        size(col("chunk")).as("chunk_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** q87 in SUBWORD currency (q125): windows/strides measured in fn05
    * BPE subwords (a "64-token chunk" means 64 of the MODEL's tokens,
    * not 64 whitespace words that might each explode into several
    * subwords and overflow the context window). chunk_text joins
    * subwords with single spaces — lossless, since subwords never
    * contain spaces. Same one-scan shape as q87 with the broadcast
    * merge-table apply in front; the short tail window is emitted,
    * matching training practice. */
  def q87Bpe(documents: DataFrame, window: Int = 64, stride: Int = 48,
             topMerges: Int = 50): DataFrame =
    chunkWindows(
      documents.crossJoin(broadcast(bpeMergeRow(documents, topMerges)))
        .select(col("doc_id"),
          graft.functions.BpeEncode(col("text"), col("merges")).as("w")),
      window, stride)

  /** q88: deterministic corpus SHUFFLE-SHARD — assign every document a
    * shard and an in-shard position by the engine-portable
    * multiplicative hash (q58/q80 family, salted so it decorrelates
    * from their draws): the "shuffle the corpus into N training files,
    * scrambled within each" step, reproducible run-to-run, across
    * engines, and under any cluster layout (a `rand()`-ordered shuffle
    * is none of those). The rank window partitions BY SHARD, so the
    * sort is distributed — no global single-partition window at any
    * corpus size; shard count scales the parallelism. */
  def q88(documents: DataFrame, shards: Int = 32): DataFrame = {
    val h = pmod(
      pmod(col("doc_id") + lit(20260812L), lit(1000000007L)) * lit(2654435761L),
      lit(1000000007L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    documents.select(col("doc_id"), h.as("h"))
      .withColumn("shard", pmod(col("h"), lit(shards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  /** q77: sequence-length packing plan — bucket documents by token
    * count into power-of-two length classes and report volume per
    * bucket, the histogram a training pipeline uses to pack sequences
    * into fixed-length batches. Integer arithmetic end to end.
    * Parameterized on the token-count currency via [[packBuckets]]:
    * the driver form counts whitespace tokens; [[q77Bpe]] counts real
    * BPE subwords (fn05) — the currency a model's batch packer
    * actually bills in. */
  def q77(documents: DataFrame): DataFrame =
    packBuckets(documents
      .select(size(split(trim(col("text")), " ")).cast("long").as("n_tokens")))

  /** The packing histogram over ANY per-doc token-count frame
    * (`n_tokens` column) — the bucketing algebra q77 and q77Bpe
    * share. One partial-aggregated shuffle of bucket-count rows. */
  private[graft] def packBuckets(tokenCounts: DataFrame): DataFrame = {
    val n = col("n_tokens")
    val bucketLo = when(n < 16, 0L).when(n < 32, 16L).when(n < 64, 32L)
      .when(n < 128, 64L).when(n < 256, 128L).when(n < 512, 256L)
      .otherwise(512L)
    tokenCounts
      .select(n.as("n_tokens"), bucketLo.as("bucket_lo"))
      .groupBy(col("bucket_lo"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
        max(col("n_tokens")).as("max_tokens"))
      .orderBy(col("bucket_lo"))
  }

  /** q77 in SUBWORD currency (q124): the same packing histogram with
    * n_tokens = fn05 BPE subword count per document (q113's
    * n_subwords) — whitespace tokens under-bill long words and
    * over-bill punctuation runs, and a batch packer that pads to the
    * model's real sequence length wants the model's own token count.
    * Plan: q113's broadcast merge-table apply scan feeds the same
    * bucketing aggregate — no extra shuffle over q77 beyond q98's
    * alphabet²-bounded fit. */
  def q77Bpe(documents: DataFrame, topMerges: Int = 50): DataFrame =
    packBuckets(
      documents.crossJoin(broadcast(bpeMergeRow(documents, topMerges)))
        .select(size(graft.functions.BpeEncode(col("text"), col("merges")))
          .cast("long").as("n_tokens")))

  /** q80: deterministic per-key sampling — exactly `k` pseudo-random
    * docs per source (corpus curation's "cap every source at N"). The
    * sampling key is a Knuth multiplicative hash of doc_id (exact BIGINT
    * arithmetic, so the DuckDB oracle reproduces the identical sample —
    * unlike rand() or engine-specific hash functions). Because the
    * sample rank is part of the output, the plan keeps the window form
    * (TopKRewrite applies only when the rank is projected away) — but
    * Spark's WindowGroupLimit still caps the per-source sort at k rows,
    * so the heavy lifting is bounded either way; drop `rn` from a
    * caller's projection and the native top-k operator takes over. */
  def q80(documents: DataFrame, k: Int = 3): DataFrame = {
    val skey = pmod(
      pmod(col("doc_id"), lit(1000000007L)) * lit(2654435761L), lit(1000000007L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("skey"), col("doc_id"))
    documents
      .select(col("source"), col("doc_id"), skey.as("skey"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("source"), col("doc_id"), col("rn"))
      .orderBy(col("source"), col("rn"))
  }

  /** q89: per-document TF-IDF top terms — the keyword profile a
    * curation pipeline attaches to every document (topical tagging,
    * query-focused sampling, index building). One token-explode scan
    * feeds the (doc, term) counts; document frequency and the corpus
    * doc count both derive from that same aggregate (no second corpus
    * pass), with the single-row doc count broadcast back. idf uses the
    * smoothed form ln((N+1)/(df+1)) + 1, [[graft.functions.PortableLn]]
    * for cross-engine bit parity (§6); the per-doc top-3 window is
    * capped by WindowGroupLimit, so per-doc state never exceeds k.
    * Ranking by score is deterministic because scores are bit-identical
    * in both engines; ties break on the token. */
  def q89(documents: DataFrame, k: Int = 3): DataFrame = {
    val td = documents
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      .transform(graft.Pins.pin)
    val df = td.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nd = td.agg(countDistinct(col("doc_id")).as("n_docs"))
    val idf = graft.functions.PortableLn(
      (col("n_docs").cast("double") + lit(1.0)) /
        (col("df").cast("double") + lit(1.0))) + lit(1.0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("tok"))
    td.join(df, "tok")
      .crossJoin(broadcast(nd))
      .withColumn("score", col("tf").cast("double") * idf)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk"), col("tok"), col("tf"), col("df"),
        col("score"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** q90: PMI token co-occurrence over a bounded vocabulary — the
    * collocation statistics a phrase-mining / tokenizer-merge pass
    * computes. The vocabulary is capped at the top-`vocab` corpus
    * tokens (broadcast), so per-document pair expansion is bounded by
    * vocab² regardless of document length — the standard way a
    * co-occurrence job stays shuffle-bounded at corpus scale. Pairs are
    * document-level (distinct tokens, a<b ordering); counts are exact
    * longs; pmi = ln(c_ab·D / (c_a·c_b)) with one fixed expression tree
    * through [[graft.functions.PortableLn]] (§6).
    *
    * Pair generation is one shuffle on doc_id: the token stream is
    * hash-partitioned by doc_id ONCE (the (doc_id, tok) aggregate and
    * the per-doc collect_set both reuse that clustering — partitioning
    * on doc_id satisfies clustering on (doc_id, tok)), the ≤`vocab`
    * surviving tokens of each document are collected into a sorted
    * array, and the C(v_d, 2) ordered pairs explode from the array in
    * place — no doc_id self-join (which re-shuffled `vdt` twice and
    * re-derived it from `dt` on both sides). The pair aggregation
    * partial-aggregates map-side; the corpus doc count is a plain count
    * over documents (split() never yields an empty token array, so
    * every doc carries ≥1 token — no countDistinct double-shuffle).
    * Output is capped at the top `topPairs` pairs by c_ab. */
  def q90(documents: DataFrame, vocab: Int = 100, minPair: Long = 5L,
          topPairs: Int = 100): DataFrame = {
    val dt = documents
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), " ")).as("tok"))
      .repartition(col("doc_id"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      .transform(graft.Pins.pin)
    // pinned (r20): the tiny invariant frames were re-DERIVED from the
    // token cache once per consumer — `top` feeds vdt's broadcast in
    // two subtrees, `vdt` feeds docFreq and the pair explosion, and
    // docFreq is broadcast twice (tok_a / tok_b sides) — StageProbe:
    // five near-identical multi-second dt-cache-read aggregation
    // stages per run. All three are vocab- or doc×vocab-sized; the
    // top-k limit is deterministic (cnt desc, tok tie-break), so
    // caching cannot change the selected set.
    val top = graft.Pins.pin(
      dt.groupBy(col("tok")).agg(sum(col("tf")).as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(vocab)
        .select(col("tok")))
    val vdt = graft.Pins.pin(
      dt.join(broadcast(top), "tok").select(col("doc_id"), col("tok")))
    val docFreq = graft.Pins.pin(
      vdt.groupBy(col("tok")).agg(count(lit(1)).as("c")))
    val nDocs = documents.agg(count(lit(1)).as("d"))
    val ts = col("ts")
    val pairArr = flatten(transform(ts, (a, i) =>
      transform(slice(ts, i + lit(2), size(ts)),
        b => struct(a.as("tok_a"), b.as("tok_b")))))
    val pairs = vdt
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("tok"))).as("ts"))
      .select(explode(pairArr).as("p"))
      .select(col("p.tok_a").as("tok_a"), col("p.tok_b").as("tok_b"))
      .groupBy(col("tok_a"), col("tok_b")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minPair)
    val pmi = graft.functions.PortableLn(
      (col("c_ab").cast("double") * col("d").cast("double")) /
        (col("c_a").cast("double") * col("c_b").cast("double")))
    pairs
      .join(broadcast(docFreq.select(col("tok").as("tok_a"), col("c").as("c_a"))), "tok_a")
      .join(broadcast(docFreq.select(col("tok").as("tok_b"), col("c").as("c_b"))), "tok_b")
      .crossJoin(broadcast(nDocs))
      .select(col("tok_a"), col("tok_b"), col("c_ab"), col("c_a"), col("c_b"),
        pmi.as("pmi"))
      .orderBy(col("c_ab").desc, col("tok_a"), col("tok_b"))
      .limit(topPairs)
  }

  /** q91: deterministic stratified train/valid/test split — the
    * hold-out assignment a training pipeline fixes ONCE and must be
    * able to reproduce on any engine, any cluster layout, any rerun.
    * Assignment is the engine-portable multiplicative hash of doc_id
    * (q58/q80/q88 family, its own salt) mod 100: <80 train, <90 valid,
    * else test. Reported per source×split so mix drift between splits
    * is visible at a glance. Pure integer arithmetic + one aggregation:
    * the corpus is scanned once and the only shuffle carries the
    * (source, split) partial aggregates. */
  def q91(documents: DataFrame): DataFrame = {
    val h = pmod(
      pmod(pmod(col("doc_id"), lit(1000000007L)) * lit(2654435761L),
        lit(1000000007L)) + lit(40490L),
      lit(100L))
    val split = when(h < 80, lit("train")).when(h < 90, lit("valid"))
      .otherwise(lit("test"))
    documents
      .select(col("source"), split.as("split"),
        size(org.apache.spark.sql.functions.split(trim(col("text")), " "))
          .cast("long").as("n_toks"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .orderBy(col("source"), col("split"))
  }

  /** q50: rolling polynomial fingerprint over codepoints, mod 1e9+7 —
    * a content-defined doc identity robust to storage encoding, via the
    * native [[graft.functions.PolyFingerprint]] expression (one code-
    * point loop per doc instead of a per-char string array + interpreted
    * fold). */
  def q50(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        graft.functions.PolyFingerprint(col("text")).as("fingerprint"))
      .orderBy(col("doc_id"))

  /** q98: BPE MERGE CANDIDATES — one iteration of byte-pair-encoding
    * tokenizer training: count every adjacent character pair across
    * every word occurrence in the corpus and rank the top merge
    * candidates. This is the inner loop a BPE trainer runs per merge
    * round; at corpus scale the counting pass is the expensive part and
    * it is one scan here: word explode → per-word adjacent-pair
    * `sequence` explode (`Column.substr` with a dynamic index — no
    * UDF, stays in codegen) → hash aggregation with map-side partials.
    * The shuffle carries only (pair, partial-count) rows, bounded by
    * alphabet² per partition regardless of corpus size. Pure integer
    * counts → hash-exact vs the oracle. */
  def q98(documents: DataFrame, topMerges: Int = 50): DataFrame = {
    val w = col("w")
    val pairArr = transform(sequence(lit(1), length(w) - lit(1)),
      i => struct(w.substr(i, lit(1)).as("a"),
        w.substr(i + lit(1), lit(1)).as("b")))
    documents
      .select(explode(split(lower(trim(col("text"))), " ")).as("w"))
      .filter(length(w) >= 2)
      .select(explode(pairArr).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("a"), col("b"))
      .limit(topMerges)
  }

  /** q113: BPE ENCODE — the APPLY half of the tokenizer story. Fits a
    * merge table on the corpus itself (q98's ranked pair counts, the
    * public BPE-training criterion) and tokenizes every document with
    * the native [[graft.functions.BpeEncode]] expression: per-doc
    * subword count and merge count, the real token currency that
    * packing (q77), chunking (q87) and token budgeting want in place
    * of the whitespace proxy (q49).
    *
    * Scale shape: model fit → model apply with NO driver collect —
    * the ranked merge list folds to ONE row (`collect_list` over
    * q98's ≤ `topMerges` rows, sorted inside the row by the same
    * (count desc, pair asc) criterion) and broadcasts to the apply
    * scan via crossJoin, so the model rides the plan like any other
    * broadcast dim. The merge loop runs inside whole-stage codegen;
    * the only shuffle is q98's alphabet²-bounded pair count. rows-only
    * (greedy BPE is not expressible in portable SQL); BpeEncodeSpec
    * proves the expression against an independent plain-Scala model
    * and pins greedy-order semantics. */
  /** One-row broadcastable merge table fitted on the corpus (q98's
    * ranked pairs, (count desc, pair asc) order) — the model frame
    * every BPE-apply consumer (q113, [[q77Bpe]], [[q87Bpe]])
    * crossJoin-broadcasts. */
  private[graft] def bpeMergeRow(documents: DataFrame, topMerges: Int): DataFrame =
    q98(documents, topMerges)
      .agg(collect_list(struct((-col("cnt")).as("nc"), col("a"), col("b"))).as("ms"))
      .select(transform(array_sort(col("ms")),
        s => concat(s.getField("a"), lit(" "), s.getField("b"))).as("merges"))

  def q113(documents: DataFrame, topMerges: Int = 50): DataFrame = {
    val mergeRow = bpeMergeRow(documents, topMerges)
    val norm = lower(trim(col("text")))
    documents
      .crossJoin(broadcast(mergeRow))
      .select(col("doc_id"),
        graft.functions.BpeEncode(col("text"), col("merges")).as("sw"),
        length(regexp_replace(norm, lit(" "), lit(""))).as("n_cp"))
      .select(col("doc_id"),
        size(col("sw")).cast("long").as("n_subwords"),
        (col("n_cp") - size(col("sw"))).cast("long").as("n_merges"))
      .orderBy(col("doc_id"))
  }

  /** q145: SUBWORD FERTILITY per source — the tokenizer-health report
    * read after fitting/refreshing a BPE model (q98→fn05): fertility
    * (subwords per whitespace word) is THE standard metric for how
    * well a tokenizer fits a corpus slice — a source whose fertility
    * is far above the corpus mean is paying more context window per
    * word (wrong language for the vocab, code, noisy text), the
    * signal that drives per-source vocab budgets or a refit. Per
    * source: word volume, fn05 subword volume, fertility, merge rate
    * (fraction of adjacent code-point pairs the model merged — 0 means
    * the vocab does nothing for this source), and chars per subword.
    * Plan: the same one-pass broadcast-merge-table encode as q113,
    * then ONE map-side-combined aggregate to sources-sized rows.
    * rows-only (greedy BPE is not portable SQL — q113's gate); the
    * spec pins the algebra against q113's per-doc counts and plants a
    * vocab-mismatched source. */
  def q145(documents: DataFrame, topMerges: Int = 50): DataFrame = {
    val mergeRow = bpeMergeRow(documents, topMerges)
    val norm = lower(trim(col("text")))
    documents
      .crossJoin(broadcast(mergeRow))
      .select(col("source"),
        size(split(norm, " ")).cast("long").as("n_words"),
        size(graft.functions.BpeEncode(col("text"), col("merges")))
          .cast("long").as("n_subwords"),
        length(regexp_replace(norm, lit(" "), lit(""))).cast("long").as("n_cp"))
      .groupBy(col("source"))
      .agg(sum(col("n_words")).as("n_words"),
        sum(col("n_subwords")).as("n_subwords"),
        sum(col("n_cp")).as("n_codepoints"))
      .withColumn("fertility",
        col("n_subwords").cast("double") / col("n_words").cast("double"))
      .withColumn("merge_rate",
        (col("n_codepoints") - col("n_subwords")).cast("double") /
          col("n_codepoints").cast("double"))
      .withColumn("chars_per_subword",
        col("n_codepoints").cast("double") / col("n_subwords").cast("double"))
      .select(col("source"), col("n_words"), col("n_subwords"),
        col("fertility"), col("merge_rate"), col("chars_per_subword"))
      .orderBy(col("source"))
  }

  /** q146: COMPRESSIBILITY quality signal — per-doc gzip ratio, the
    * Gopher/MassiveText heuristic: highly compressible text is
    * repetitive template/spam (q68 measures token-level repetition;
    * this catches byte-level structure n-gram stats miss — long-range
    * repeats, encoded blobs, boilerplate markup), and NEAR-incompressible
    * "text" is often not text at all (base64, minified bundles) — both
    * tails get flagged. Deflate runs partition-local inside
    * mapPartitions (one reused Deflater per partition, the Multimodal
    * batching discipline); bytes never shuffle — only (doc_id, sizes,
    * ratio, verdict) rows come out. Deflate's fixed header skews
    * ratios high on very short docs — the thresholds are tuned for
    * document-length text, not tweets. rows-only (no gzip in portable
    * SQL); the spec plants repetitive / diverse / random-blob docs. */
  def q146(spark: org.apache.spark.sql.SparkSession, documents: DataFrame,
           minRatio: Double = 0.25, maxRatio: Double = 0.8): DataFrame =
    compressScored(spark, documents, minRatio, maxRatio)
      .drop("text")
      .orderBy(col("doc_id"))

  /** The q146 kernel without the batch-report ordering — streaming-
    * legal (stateless mapPartitions + projection), shared with st24's
    * ingest gate so stream and batch verdicts cannot drift. Keeps the
    * text column so a gate can land admitted docs intact. */
  private[graft] def compressScored(spark: org.apache.spark.sql.SparkSession,
                                    documents: DataFrame, minRatio: Double,
                                    maxRatio: Double): DataFrame = {
    import spark.implicits._
    documents.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
        val buf = new Array[Byte](8192)
        // Deflater holds NATIVE memory: end() it when the partition is
        // exhausted (st24 runs this every micro-batch — leaking it per
        // task would accumulate unreleased native buffers for the life
        // of the stream, invisible to the JVM heap).
        new Iterator[(Long, String, Long, Long)] {
          def hasNext: Boolean = {
            val h = it.hasNext
            if (!h) d.end()
            h
          }
          def next(): (Long, String, Long, Long) = {
            val (id, text) = it.next()
            val raw = text.getBytes("UTF-8")
            d.reset(); d.setInput(raw); d.finish()
            var comp = 0L
            while (!d.finished()) comp += d.deflate(buf)
            (id, text, raw.length.toLong, comp)
          }
        }
      }
      .toDF("doc_id", "text", "raw_bytes", "gz_bytes")
      .withColumn("gz_ratio",
        col("gz_bytes").cast("double") / col("raw_bytes").cast("double"))
      .withColumn("verdict",
        when(col("gz_ratio") < minRatio, lit("too_compressible"))
          .when(col("gz_ratio") > maxRatio, lit("incompressible"))
          .otherwise(lit("ok")))
  }

  /** q100: FEATURE HASHING (the hashing trick) — fixed-width token-count
    * featurization: every token maps to one of `buckets` feature slots
    * via the engine-portable polynomial fingerprint (the q50 hash, a
    * native codegen'd expression), counts aggregate per (doc, bucket).
    * This is the cheap featurizer a quality classifier or clustering
    * pre-pass runs over the corpus when a learned embedding is too
    * expensive — vocabulary-free, so no dictionary broadcast and no OOV
    * handling at any corpus size. Output is the SPARSE long form
    * (doc_id, bucket, cnt): downstream trainers consume it directly and
    * the shuffle carries ≤ `buckets` rows per document. One scan, one
    * map-side-combined aggregation; pure integer arithmetic → hash-exact
    * on any engine that can fold the same polynomial. */
  def q100(documents: DataFrame, buckets: Int = 16): DataFrame =
    documents
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), " ")).as("tok"))
      .select(col("doc_id"),
        pmod(graft.functions.PolyFingerprint(col("tok")),
          lit(buckets.toLong)).as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("doc_id"), col("bucket"))

  /** q101: BOILERPLATE n-gram report — the RefinedWeb/C4-style signal
    * for template text: a word-3-gram that appears in many documents
    * (nav bars, license headers, cookie banners) is boilerplate, and a
    * document dominated by such grams is template spam. Per document:
    * distinct 3-grams, how many are corpus-common (doc frequency ≥
    * `minDf`), and the boilerplate fraction a filter would threshold on.
    *
    * Plan shape at scale: the distinct-gram set is computed ROW-LOCALLY
    * (array_distinct over the token array — no explode before the
    * dedup), so the (doc_id, g) stream the aggregations see is already
    * per-doc-distinct. One shuffle on g builds the doc-frequency table;
    * the join back is on g again (AQE reuses the partitioning) and the
    * per-doc rollup partial-aggregates map-side. Shuffles carry
    * (doc_id, gram) pairs — never documents. Docs under 3 tokens have
    * no grams and drop out (same rule in the oracle). Counts are exact
    * longs; the fraction is one double divide (§6). */
  def q101(documents: DataFrame, minDf: Long = 5L): DataFrame = {
    val grams = graft.operators.Dedup.shingles(documents)
      .transform(graft.Pins.pin)
    val df = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
    grams.join(df, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") >= minDf, 1L).otherwise(0L)).as("n_boiler"))
      .withColumn("boiler_frac",
        col("n_boiler").cast("double") / col("n_grams"))
      .select(col("doc_id"), col("n_grams"), col("n_boiler"),
        col("boiler_frac"))
      .orderBy(col("doc_id"))
  }

  /** q102: MIX RESAMPLING to a target distribution — the data-mixing
    * step that takes q70's diagnosis and actually executes it: compute
    * each source's deterministic keep-rate for a UNIFORM target mix
    * (rate_s = min(1, (total/n_sources)/n_s)) and down-sample every
    * over-represented source with the engine-portable multiplicative
    * hash (q58/q80/q91 family, its own salt) — reproducible on any
    * engine, any layout, any rerun, unlike rand()-based sampling.
    * Reports per source: size before, the keep-rate applied, and the
    * achieved sample size.
    *
    * Plan shape at scale: ONE corpus scan persists the narrow
    * (source, h) projection; per-source counts aggregate from it
    * (partial map-side), the ≤#sources-row rate table broadcasts back
    * over the same projection, and the achieved-count aggregate is a
    * second partial-agg over cached rows — the corpus itself is never
    * re-read and never shuffled (only (source, h) pairs move). The
    * rate is one double divide of exact longs; the keep test
    * h < rate·P is the same double product in both engines (§6). */
  def q102(documents: DataFrame): DataFrame = {
    val P = 1000000007L
    val h = pmod(
      pmod(pmod(col("doc_id"), lit(P)) * lit(2654435761L), lit(P)) +
        lit(77003L), lit(P))
    val proj = documents.select(col("source"), h.as("h"))
      .transform(graft.Pins.pin)
    val per = proj.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .transform(graft.Pins.pin)
    val tot = per.agg(sum(col("n_docs")).as("tot"),
      count(lit(1)).as("n_sources"))
    val rates = per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        least(lit(1.0), col("tot").cast("double") /
          (col("n_sources") * col("n_docs")).cast("double")).as("keep_rate"))
    proj.join(broadcast(rates), "source")
      .groupBy(col("source"))
      .agg(first(col("n_docs")).as("n_docs"),
        first(col("keep_rate")).as("keep_rate"),
        sum(when(col("h").cast("double") < col("keep_rate") * lit(P.toDouble),
          1L).otherwise(0L)).as("n_sampled"))
      .orderBy(col("source"))
  }

  /** q104: LINEAR QUALITY SCORER over hashed features — the cheap
    * trained-classifier shape (fastText/logistic-regression quality
    * gates ala CCNet/C4) run as pure SQL arithmetic: every token maps
    * to one of 16 hashed buckets (the q100 featurizer), each bucket
    * carries a fixed signed weight, and a document's score is the
    * weight-sum normalized by length; `keep` is the sign gate. Weights
    * here are a deterministic hash of the bucket id — the PLUMBING is
    * the operator (swap in learned weights via the `weights` column
    * expression without touching the plan).
    *
    * Float discipline (§6): the accumulation is INTEGER — per-token
    * weight numerators sum exactly (order-independent, partial-agg
    * map-side, constant per-group state), and the only float op is the
    * final single divide score_num/(P·n_tokens). That makes a float
    * score hash-exact across engines with no sorted-fold crutch — the
    * 100 TB form and the audit form are the SAME plan. One token scan,
    * one partial-aggregated shuffle on doc_id. */
  def q104(documents: DataFrame, buckets: Int = 16): DataFrame = {
    val P = 1000000007L
    val bucket = pmod(graft.functions.PolyFingerprint(col("tok")),
      lit(buckets.toLong))
    val w = pmod((col("bucket") + lit(1L)) * lit(2654435761L), lit(P)) -
      lit((P - 1) / 2)
    documents
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), " ")).as("tok"))
      .select(col("doc_id"), bucket.as("bucket"))
      .select(col("doc_id"), w.as("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("score_num"))
      .withColumn("score", col("score_num").cast("double") /
        (lit(P.toDouble) * col("n_tokens").cast("double")))
      .withColumn("keep", col("score") > 0.0)
      .select(col("doc_id"), col("n_tokens"), col("score_num"),
        col("score"), col("keep"))
      .orderBy(col("doc_id"))
  }

  /** q106: per-SOURCE corpus profile — the length-distribution summary
    * a curation dashboard shows per data source: doc count, token
    * volume, mean/median/p90 document length, and the short-doc
    * fraction a length floor would drop. q59's profiling idea applied
    * to the corpus mix (q70's volumes + distribution shape).
    *
    * One scan, one partial-aggregated shuffle on source. The exact
    * percentiles hold per-group state ∝ DISTINCT doc lengths (bounded
    * by the max token count, not by group row count) — safe at corpus
    * scale; swap `percentile` for `percentile_approx` if doc lengths
    * were unbounded. Means are one double divide of exact longs;
    * percentile interpolation is the same (n−1)·p rule in both
    * engines (§6, proven by q23). */
  def q106(documents: DataFrame, shortTokens: Int = 20): DataFrame = {
    val n = size(split(trim(col("text")), " ")).cast("long")
    documents
      .select(col("source"), n.as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).as("n_tokens"),
        expr("percentile(n, 0.5)").as("median_tokens"),
        expr("percentile(n, 0.9)").as("p90_tokens"),
        sum(when(col("n") < shortTokens, 1L).otherwise(0L)).as("n_short"))
      .withColumn("mean_tokens",
        col("n_tokens").cast("double") / col("n_docs"))
      .withColumn("short_frac",
        col("n_short").cast("double") / col("n_docs"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("mean_tokens"), col("median_tokens"), col("p90_tokens"),
        col("short_frac"))
      .orderBy(col("source"))
  }

  /** q107: cross-SPLIT decontamination — the train/test leakage check a
    * pipeline runs after q91 fixes the hold-out: for every TEST-split
    * document, how many of its distinct 3-grams also occur anywhere in
    * the TRAIN split (Lee et al.'s eval-contamination concern, applied
    * to the corpus' own splits). Complements q69: there the probe set
    * is a small benchmark and BROADCASTS; here the train side is ~80%
    * of the corpus, so the gram match is a SHUFFLE equi-join on the
    * gram — distinct train grams are one hash shuffle on g, the test
    * stream joins on the same key (partitioning reused), and the
    * per-doc rollup partial-aggregates. Nothing is ever driver-side or
    * broadcast-sized. Split assignment recomputes q91's pure hash of
    * doc_id on the gram stream — a projection, not a join. */
  def q107(documents: DataFrame): DataFrame = {
    val P = 1000000007L
    def h(c: Column) = pmod(
      pmod(pmod(c, lit(P)) * lit(2654435761L), lit(P)) + lit(40490L),
      lit(100L))
    val sg = graft.operators.Dedup.shingles(documents)
      .withColumn("h", h(col("doc_id")))
      .transform(graft.Pins.pin)
    val trainG = sg.filter(col("h") < 80)
      .select(col("g")).distinct().withColumn("hit", lit(1))
    sg.filter(col("h") >= 90)
      .join(trainG, Seq("g"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("leaked"))
      .withColumn("leak_frac",
        col("leaked").cast("double") / col("n_grams"))
      .orderBy(col("doc_id"))
  }

  /** q99: BIGRAM-LM CROSS-ENTROPY — per-document average negative
    * log-probability under an add-one-smoothed bigram language model
    * trained on the corpus itself (the KenLM-style perplexity quality
    * filter CCNet runs; q86 is the unigram version). nll(w1,w2) =
    * -ln((c(w1,w2)+1) / (c(w1)+V)).
    *
    * Plan: one token scan feeds everything. Adjacent pairs come from a
    * `lead` window partitioned BY DOC (distributed at any corpus
    * size); the bigram and unigram tables aggregate from the same
    * cached scan. The unigram stats join onto the bigram table first —
    * that shuffle is vocab²-bounded — so the token stream itself
    * shuffles once, on (tok, tok2). Float determinism (§6): the
    * per-doc sum folds in POSITION order via sort_array + strict left
    * fold; ln goes through [[graft.functions.PortableLn]] (bit parity
    * probe-verified over the live range by the q85/q86 family). Docs
    * with fewer than two tokens have no bigrams and drop out — same
    * rule in both engines. */
  def q99(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"),
        posexplode(split(lower(trim(col("text"))), " ")).as(Seq("pos", "tok")))
      .transform(graft.Pins.pin)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val pairs = toks
      .withColumn("tok2", lead(col("tok"), 1).over(w))
      .filter(col("tok2").isNotNull)
      .transform(graft.Pins.pin)
    val big = pairs.groupBy(col("tok"), col("tok2")).agg(count(lit(1)).as("c12"))
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val vsz = toks.agg(countDistinct(col("tok")).as("v"))
    val stats = big.join(uni, "tok")
    val nll = -graft.functions.PortableLn(
      (col("c12").cast("double") + lit(1.0)) /
        (col("c1").cast("double") + col("v").cast("double")))
    pairs.join(stats, Seq("tok", "tok2"))
      .crossJoin(broadcast(vsz))
      .withColumn("nll", nll)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        sort_array(collect_list(struct(col("pos"), col("nll")))).as("xs"))
      .withColumn("nll_sum",
        aggregate(col("xs"), lit(0.0), (a, x) => a + x.getField("nll")))
      .select(col("doc_id"), col("n_bigrams"), col("nll_sum"),
        (col("nll_sum") / col("n_bigrams").cast("double")).as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  /** q116: multi-query BM25 SEARCH — the serving half of q85. q85
    * scores one fixed query against the corpus; this takes a BATCH of
    * queries (`query_id`, `terms: array<string>`) and returns the
    * top-`k` documents per query, the shape a retrieval-augmented
    * curation pass ("pull the best docs for each of these 10k topics")
    * actually runs.
    *
    * Plan shape at scale: ONE token-explode scan feeds doc lengths and
    * term frequencies. The query vocabulary (distinct terms across all
    * queries) broadcasts into the tf filter, so the per-doc tf table is
    * |docs containing a query term| × |terms| — never the full corpus
    * posting list. Per-term document frequencies and the two scalar
    * corpus stats broadcast back into the scoring join; per-query top-k
    * plans as a rank-≤-k window (WindowGroupLimit pushes the limit
    * map-side). Shuffles carry (query_id, doc_id, double) rows.
    *
    * Float determinism (§6): a query's per-term contributions fold in
    * QUERY-POSITION order via sort_array + strict left fold (the q86
    * idiom), never a nondeterministic SUM, so both engines add the same
    * doubles in the same order; ln goes through
    * [[graft.functions.PortableLn]]. Docs matching no query term drop
    * out (inner join) — same rule in the oracle. */
  def q116(documents: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val toks = documents.select(col("doc_id"),
        explode(split(lower(trim(col("text"))), " ")).as("tok"))
      .transform(graft.Pins.pin)
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).cast("long").as("n_docs"),
      sum(col("dl")).cast("long").as("total_toks"))
    val qterms = queries.select(col("query_id"),
        posexplode(col("terms")).as(Seq("pos", "term")))
      .transform(graft.Pins.pin)
    val vocab = qterms.select(col("term")).distinct()
    val tf = toks.join(broadcast(vocab), toks("tok") === vocab("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    bm25Tail(qterms, tf, dfs, dl, stats, k)
  }

  /** The BM25 scoring tail shared by q116 (live corpus statistics) and
    * the s14 persisted index ([[Bm25Index.search]] feeds it the SAME
    * four shapes loaded from lake tables — bit parity by construction).
    * Inputs: qterms (query_id, pos, term), tf (doc_id, term, tf), dfs
    * (term, df), dl (doc_id, dl), stats one row (n_docs, total_toks).
    * idf derives here at query time, so index appends that change df/N
    * re-price every term automatically. */
  private[graft] def bm25Tail(qterms: DataFrame, tf: DataFrame,
                              dfs: DataFrame, dl: DataFrame,
                              stats: DataFrame, k: Int): DataFrame = {
    val avgdl = col("total_toks").cast("double") / col("n_docs")
    val idf = graft.functions.PortableLn(
      (col("n_docs").cast("double") - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)) + lit(1.0))
    val contrib = idf * (col("tf").cast("double") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) *
        (col("dl").cast("double") / avgdl)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    qterms.join(tf, "term")
      .join(broadcast(dfs), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("c", contrib)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_hit"),
        sort_array(collect_list(struct(col("pos"), col("c")))).as("xs"))
      .withColumn("score",
        aggregate(col("xs"), lit(0.0), (a, x) => a + x.getField("c")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("n_hit"),
        col("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** q117: DSIR importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling") — score every raw
    * document by how target-domain-like its hashed-unigram profile is:
    *   weight(d) = Σ_b n_b(d) · ( ln p̂_target(b) − ln p̂_raw(b) )
    * over `buckets` hashed feature buckets, Laplace-smoothed
    * ((count+1)/(total+B)) so empty target cells stay finite. The
    * top-`topN` docs by weight are the importance-resampled selection a
    * pretraining mix would promote.
    *
    * Plan shape at scale: one token scan → per-(doc, bucket) counts
    * (the only data-sized shuffle, 8-byte bucket keys); the target and
    * raw bucket distributions are ≤ `buckets` rows each and fold into
    * ONE broadcast log-ratio table, so scoring is a map-side broadcast
    * join. The per-doc fold runs in bucket order (sort_array + strict
    * left fold, q86 idiom) — deterministic doubles in both engines.
    * Hashing is the engine-portable [[graft.functions.PolyFingerprint]]
    * mod `buckets` (q100's oracle twin). Selection is NOT a global rank
    * window (that would funnel every row through one partition): the
    * top-N ids come from orderBy+limit — TakeOrderedAndProject, a
    * per-partition N-heap + driver merge of N rows — and broadcast back
    * as a membership flag. */
  /** Hashed-unigram bucket stream (doc_id [, extra cols], b) — the
    * shared feature derivation for the DSIR fit and apply halves. */
  private def dsirBuckets(docs: DataFrame, buckets: Int,
                          extra: Seq[String]): DataFrame = {
    val cols = (Seq("doc_id") ++ extra).map(col)
    docs.select(cols :+
        explode(split(lower(trim(col("text"))), " ")).as("tok"): _*)
      .select(cols :+ pmod(graft.functions.PolyFingerprint(col("tok")),
        lit(buckets.toLong)).as("b"): _*)
  }

  /** DSIR fit: the ≤`buckets`-row Laplace-smoothed log-likelihood-ratio
    * table ln p̂_target − ln p̂_raw over a pre-bucketed (source, b)
    * stream. Fit ONCE, broadcast everywhere — batch q117 and the st16
    * streaming gate share this exact code path. */
  private def dsirLogRatiosFromBuckets(toks: DataFrame, targetSource: String,
                                       buckets: Int): DataFrame = {
    val raw = toks.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tgt = toks.filter(col("source") === targetSource)
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    // buckets absent from the target corpus smooth to ct=0 via the
    // left join
    raw.join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(toks.agg(
        count(lit(1)).cast("long").as("r_total"))))
      .crossJoin(broadcast(toks.filter(col("source") === targetSource)
        .agg(count(lit(1)).cast("long").as("t_total"))))
      .select(col("b"),
        (graft.functions.PortableLn(
          (coalesce(col("ct"), lit(0L)).cast("double") + lit(1.0)) /
            (col("t_total").cast("double") + lit(buckets.toDouble))) -
          graft.functions.PortableLn(
            (col("cr").cast("double") + lit(1.0)) /
              (col("r_total").cast("double") + lit(buckets.toDouble))))
          .as("lr"))
  }

  /** DSIR fit over a reference corpus with a `source` column. */
  def dsirFit(reference: DataFrame,
              targetSource: String = graft.Oracles.DsirTargetSource,
              buckets: Int = graft.Oracles.DsirBuckets): DataFrame =
    dsirLogRatiosFromBuckets(
      dsirBuckets(reference, buckets, Seq("source")), targetSource, buckets)

  /** DSIR apply: per-doc importance weight from a fitted log-ratio
    * table — one map-side broadcast join, per-doc fold in bucket order
    * (deterministic doubles, §6). */
  def dsirApply(docs: DataFrame, lr: DataFrame,
                buckets: Int = graft.Oracles.DsirBuckets): DataFrame =
    dsirScoreFromBuckets(dsirBuckets(docs, buckets, Nil), lr)

  private def dsirScoreFromBuckets(toks: DataFrame, lr: DataFrame): DataFrame =
    toks.groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(lr), "b")
      .withColumn("c", col("n").cast("double") * col("lr"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).cast("long").as("n_tokens"),
        sort_array(collect_list(struct(col("b"), col("c")))).as("xs"))
      .withColumn("weight",
        aggregate(col("xs"), lit(0.0), (a, x) => a + x.getField("c")))
      .select(col("doc_id"), col("n_tokens"), col("weight"))

  def q117(documents: DataFrame,
           targetSource: String = graft.Oracles.DsirTargetSource,
           buckets: Int = graft.Oracles.DsirBuckets,
           topN: Int = graft.Oracles.DsirTopN): DataFrame = {
    // one token scan serves both the fit and the apply (persisted
    // bucket stream with the source column carried through)
    val toks = dsirBuckets(documents, buckets, Seq("source"))
      .transform(graft.Pins.pin)
    val lr = dsirLogRatiosFromBuckets(toks, targetSource, buckets)
    val scored = dsirScoreFromBuckets(toks.select(col("doc_id"), col("b")), lr)
      .transform(graft.Pins.pin)
    val top = scored.orderBy(col("weight").desc, col("doc_id"))
      .limit(topN).select(col("doc_id").as("keep_id"))
    scored.join(broadcast(top), scored("doc_id") === col("keep_id"), "left")
      .withColumn("keep", col("keep_id").isNotNull)
      .select(col("doc_id"), col("n_tokens"), col("weight"), col("keep"))
      .orderBy(col("doc_id"))
  }

  /** q118: perplexity BUCKETING (CCNet, Wenzek et al. 2020) — score every
    * document by its unigram-LM average log-probability (q86) and split
    * each LANGUAGE into head / middle / tail by comparing the score
    * against that language's tertile CUTOFFS. CCNet keeps head+middle
    * and drops (or down-weights) tail; the bucket column is that
    * verdict. Per-language cutoffs, not a global cut, because perplexity
    * scales differ by language — the whole point of CCNet's buckets.
    *
    * Plan shape at scale (r9 rewrite): q86 does the heavy lifting; this
    * adds one broadcast join for the language column, ONE
    * partial-aggregated shuffle to compute per-lang cutoff scores
    * (lang-count rows), and a broadcast join assigning buckets by
    * comparison. No window over a corpus-sized partition anywhere — the
    * r8 form's per-lang ntile(3) sorted |docs|/|langs| rows in a single
    * task, which at 10¹¹ docs is a tens-of-billions-row one-task sort.
    *
    * Exact/default split (q92/q97/q114 convention): `exact = true` (the
    * driver-registered audit form) computes cutoffs with interpolated
    * `percentile` — per-lang state ∝ distinct scores, the honest audit
    * cost — and is hash-exact vs DuckDB's `quantile_cont` (same
    * p·(n−1) rule, §6). The DEFAULT uses `percentile_approx` (bounded
    * sketch state), the form a 100 TB corpus runs.
    *
    * Float discipline at the boundary: the two engines' interpolation
    * can differ in the last ulp when p·(n−1) lands within ulps of an
    * integer (p = 1/3 with (n−1) ≡ 0 mod 3 puts the cutoff within ulps
    * of a DATA value), so buckets compare floor-scaled longs —
    * floor(score·10⁸) ≥ floor(cutoff·10⁸) — making an ulp of cutoff
    * disagreement invisible unless a score·10⁸ lands exactly on the
    * straddled integer (measure-zero for ln-derived doubles). Scores
    * themselves are bit-identical cross-engine (q86 is hash-exact).
    * Ties at a cutoff land in the same bucket — deterministic, no
    * order dependence. Tertile sizes are ~n/3 rather than ntile's
    * exact n/3±1; for a filtering verdict the by-value boundary is the
    * better semantics anyway (equal scores get equal verdicts). */
  /** q120: TEMPERATURE-scaled source sampling — the multilingual /
    * multi-source mixing rule (XLM, mBART: p_s ∝ n_s^α, α < 1 flattens
    * the source distribution so small sources are not drowned): per
    * source, mix weight q_s = n_s^α / Σ n_s^α, sampling rate
    * min(1, budget·q_s / n_s), and a deterministic per-doc keep via the
    * q58/q91 Knuth multiplicative hash against floor(rate·10^6) — the
    * same integer-threshold idiom, so the verdict is reproducible and
    * partition-layout-invariant.
    *
    * n^α computes as portableExp(α · portableLn(n)) — the portable pair
    * closes pow with cross-engine bit parity (§6), and the Σ n_s^α fold
    * runs in source order (q86 idiom). Plan shape: one corpus scan for
    * the per-source counts (broadcast-sized: sources are 10s–100s at
    * any corpus volume), everything per-doc is a broadcast join + one
    * integer hash — no second scan, no data-sized shuffle. */
  def q120(documents: DataFrame, alpha: Double = graft.Oracles.MixAlpha,
           budget: Long = graft.Oracles.MixBudget): DataFrame =
    tempMixApply(documents, tempMixRates(documents, alpha, budget))
      .orderBy(col("doc_id"))

  /** Fit half of q120: the per-source rate table (source, src_docs,
    * mix_weight, rate, thresh) — sources-sized (10s–100s rows), so it
    * broadcasts. Streaming fits this ONCE from a static reference
    * ([[graft.streaming.Streams.startTempMixGate]]) and every
    * micro-batch applies the same thresholds — stream and batch
    * verdicts bit-identical. */
  def tempMixRates(reference: DataFrame, alpha: Double,
                   budget: Long): DataFrame = {
    val counts = reference.groupBy(col("source"))
      .agg(count(lit(1)).as("src_docs"))
    val powed = counts.withColumn("w",
      graft.functions.PortableExp(lit(alpha) *
        graft.functions.PortableLn(col("src_docs").cast("double"))))
    val tot = powed
      .agg(sort_array(collect_list(struct(col("source"), col("w")))).as("xs"))
      .select(aggregate(col("xs"), lit(0.0),
        (a, x) => a + x.getField("w")).as("tot"))
    powed.crossJoin(broadcast(tot))
      .withColumn("mix_weight", col("w") / col("tot"))
      .withColumn("rate", least(lit(1.0),
        lit(budget.toDouble) * col("mix_weight") /
          col("src_docs").cast("double")))
      .withColumn("thresh",
        floor(col("rate") * lit(1000000.0)).cast("long"))
      .select(col("source"), col("src_docs"), col("mix_weight"),
        col("rate"), col("thresh"))
  }

  /** Apply half of q120: deterministic per-doc keep via the q91 Knuth
    * hash against the fitted integer thresholds — a broadcast join +
    * one integer hash per doc, stateless. */
  def tempMixApply(docs: DataFrame, rates: DataFrame): DataFrame = {
    val h = pmod(
      pmod(pmod(col("doc_id"), lit(1000000007L)) * lit(2654435761L),
        lit(1000000007L)) + lit(graft.Oracles.MixSalt),
      lit(1000000L))
    docs.select(col("doc_id"), col("source"))
      .join(broadcast(rates), "source")
      .withColumn("keep", h < col("thresh"))
      .select(col("doc_id"), col("source"), col("src_docs"),
        col("mix_weight"), col("rate"), col("keep"))
  }

  /** q121: per-source DIVERSITY profile — the templated/low-diversity
    * source detector every corpus audit runs: unigram Shannon entropy
    * H = −Σ p·ln p, type-token ratio V/N, and the Zipf slope (OLS of
    * ln freq on ln rank — natural text ≈ −1; boilerplate/templated
    * sources flatten or cliff). Complements q106 (length stats only).
    *
    * Cross-engine determinism WITHOUT per-source ordered folds: each
    * per-token term (−p·ln p, ln r, ln f, products) is a fixed double
    * sequence over [[graft.functions.PortableLn]] outputs, then
    * floor-scaled to an exact LONG (entropy ×1e12 — Σ ≤ H_max·1e12 ≈
    * 2e13; Zipf moments ×1e8 — Σ(ln r)² ≤ V(ln V)²·1e8 ≈ 3.4e18 at a
    * 1e8-term vocab, inside int64), so the per-source SUMs are
    * order-independent integer arithmetic and the final doubles are
    * one short shared op sequence. Scale shape: one token-explode
    * shuffle to (source, token) with map-side combine; everything
    * after is VOCAB-sized, never corpus-sized; the rank window
    * partitions by source over vocab rows (bounded by language
    * vocabulary, not corpus volume — ~1e8 rows worst case, int64-safe
    * by the bound above). Escape hatch if a tokenization ever made
    * vocab NOT small (e.g. byte n-grams): replace `row_number` with a
    * two-stage rank — per-partition `row_number` within
    * (source, partition) + a broadcast per-partition row-count offset
    * (the q118-style aggregate-then-broadcast shape) — so no single
    * task ever sorts a source's full vocabulary. Not wired in: at the
    * declared vocab bounds the one-task sort is ~GBs, and the
    * two-stage form costs an extra shuffle every run. */
  def q121(documents: DataFrame): DataFrame = {
    import graft.functions.PortableLn
    val tf = documents
      .select(col("source"),
        explode(split(lower(trim(col("text"))), " ")).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val st = tf.groupBy(col("source"))
      .agg(sum(col("cnt")).as("tot"), count(lit(1)).as("vocab"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("cnt").desc, col("tok"))
    val ranked = tf
      .withColumn("rnk", row_number().over(w).cast("long"))
      .join(broadcast(st), "source")
      .withColumn("p", col("cnt").cast("double") / col("tot").cast("double"))
      .withColumn("lnp", PortableLn(col("p")))
      .withColumn("lnr", PortableLn(col("rnk").cast("double")))
      .withColumn("lny", PortableLn(col("cnt").cast("double")))
    val sums = ranked
      .select(col("source"), col("tot"), col("vocab"),
        floor(-(col("p") * col("lnp")) * lit(1.0e12)).cast("long").as("e12"),
        floor(col("lnr") * lit(1.0e8)).cast("long").as("x8"),
        floor(col("lny") * lit(1.0e8)).cast("long").as("y8"),
        floor(col("lnr") * col("lny") * lit(1.0e8)).cast("long").as("xy8"),
        floor(col("lnr") * col("lnr") * lit(1.0e8)).cast("long").as("xx8"))
      .groupBy(col("source"), col("tot"), col("vocab"))
      .agg(sum("e12").as("se"), sum("x8").as("sx"), sum("y8").as("sy"),
        sum("xy8").as("sxy"), sum("xx8").as("sxx"))
    sums
      .withColumn("vd", col("vocab").cast("double"))
      .withColumn("sxd", col("sx").cast("double") / lit(1.0e8))
      .withColumn("syd", col("sy").cast("double") / lit(1.0e8))
      .withColumn("sxyd", col("sxy").cast("double") / lit(1.0e8))
      .withColumn("sxxd", col("sxx").cast("double") / lit(1.0e8))
      .withColumn("den",
        col("vd") * col("sxxd") - col("sxd") * col("sxd"))
      .select(col("source"), col("tot").as("n_tokens"), col("vocab"),
        (col("vd") / col("tot").cast("double")).as("ttr"),
        (col("se").cast("double") / lit(1.0e12)).as("entropy"),
        // single-vocab source → 0/0; NULL beats ANSI throw / NaN
        when(col("den") =!= 0.0,
          (col("vd") * col("sxyd") - col("sxd") * col("syd")) / col("den"))
          .as("zipf_slope"))
      .orderBy(col("source"))
  }

  def q118(documents: DataFrame, exact: Boolean = false): DataFrame = {
    // scored feeds BOTH the cutoff aggregate and the bucket join. No
    // persist: both consumers live in the ONE returned plan, so
    // ReuseExchange dedupes the identical q86 exchange subtrees — the
    // expensive token-stream map side runs once and only the cheap
    // post-shuffle reduction replays per consumer. (A persist here
    // leaked one sf-sized cache per invocation in long-lived sessions
    // because a lazy operator has no post-action hook to release it.)
    val scored = q86(documents)
      .join(documents.select(col("doc_id"), col("lang")), "doc_id")
    val cuts =
      if (exact)
        scored.groupBy(col("lang")).agg(
          expr("percentile(avg_logp, CAST(1 AS DOUBLE)/3)").as("c_lo"),
          expr("percentile(avg_logp, CAST(2 AS DOUBLE)/3)").as("c_hi"))
      else
        scored.groupBy(col("lang")).agg(
          expr("percentile_approx(avg_logp, CAST(1 AS DOUBLE)/3, 10000)").as("c_lo"),
          expr("percentile_approx(avg_logp, CAST(2 AS DOUBLE)/3, 10000)").as("c_hi"))
    scored.join(broadcast(cuts), "lang")
      .withColumn("s8", floor(col("avg_logp") * lit(1.0e8)).cast("long"))
      .withColumn("tertile",
        when(col("s8") >= floor(col("c_hi") * lit(1.0e8)).cast("long"), 1L)
          .when(col("s8") >= floor(col("c_lo") * lit(1.0e8)).cast("long"), 2L)
          .otherwise(3L))
      .withColumn("bucket",
        when(col("tertile") === 1L, "head")
          .when(col("tertile") === 2L, "middle")
          .otherwise("tail"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("avg_logp"), col("tertile"), col("bucket"))
      .orderBy(col("doc_id"))
  }

  /** q128: per-source QUALITY QUOTA — keep the top `quota` documents
    * of every source ranked by the q48 quality score, the per-domain
    * cap a crawl-curation pipeline applies so no single site/source
    * floods the training mix with its worst pages (the complement of
    * q80's RANDOM per-key sample: here the quota keeps each source's
    * BEST documents, deterministically).
    *
    * Ranking discipline (§6): the q48 score is a fixed-order IEEE
    * double, bit-identical cross-engine, but the rank key floor-scales
    * it to a long anyway (q118's trick) — integer ordering keys keep
    * the oracle comparison trivially exact AND let the TopKRewrite
    * rule replace the rank window with the native bounded-heap
    * [[graft.plans.TopKPerKeyExec]] (the rule bails on floating-point
    * ordering keys because NormalizeFloatingNumbers rewrites them):
    * per-source partial heaps of `quota` rows run BEFORE the exchange,
    * so shuffle volume is quota·sources, not the corpus — the property
    * that makes a per-domain cap runnable over 100 TB with millions of
    * domains. The rewrite requires the rank column to be projected
    * away, which is why the output is the kept SET (source, doc_id,
    * quality), not ranked rows — a consumer that wants ranks re-ranks
    * the quota·sources-sized result, not the corpus. Ties break by
    * doc_id, so the kept set is reproducible anywhere. */
  /** q129: deterministic PACKING ASSIGNMENT — the executable half of
    * the q77/q124 packing story: assign every document to a concrete
    * (shard, bin, offset) so fixed-capacity training rows can be
    * materialized, not just histogrammed. Docs ride q88's
    * deterministic shard hash, and WITHIN a shard a next-fit packer
    * walks the hash order (the order a shard writer consumes anyway):
    * a doc opens a new bin when it would overflow `capacity`; a doc
    * longer than `capacity` occupies a bin alone (overflow bin —
    * `offset = 0 && n_tokens > capacity`, the chunker q87/q125 is the
    * upstream fix for those).
    *
    * Scale shape: ONE shuffle (hash repartition by shard), then the
    * packer is a sequential per-partition walk — inherently serial
    * within a shard (each bin decision depends on the previous), which
    * is why this is a justified `mapPartitions`: the sequence is
    * shard-local, shards are the parallelism unit, and no state
    * crosses partitions. Deterministic end to end (hash order + greedy
    * walk), so the same corpus packs identically anywhere — the
    * reproducibility contract q88/q91 establish. */
  def q129(documents: DataFrame, shards: Int = 32,
           capacity: Int = 256): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val h = pmod(
      pmod(col("doc_id") + lit(20260812L), lit(1000000007L)) * lit(2654435761L),
      lit(1000000007L))
    documents
      .select(col("doc_id"),
        size(split(trim(col("text")), " ")).cast("long").as("n_tokens"),
        h.as("h"))
      .withColumn("shard", pmod(col("h"), lit(shards.toLong)))
      .select(col("shard"), col("h"), col("doc_id"), col("n_tokens"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("h"), col("doc_id"))
      .as[(Long, Long, Long, Long)]
      .mapPartitions { it =>
        var curShard = -1L
        var bin = 0L
        var fill = 0L
        it.map { case (shard, _, docId, n) =>
          if (shard != curShard) { curShard = shard; bin = 0L; fill = 0L }
          else if (fill > 0L && fill + n > capacity) { bin += 1L; fill = 0L }
          val off = fill
          fill += n
          (docId, shard, bin, off, n)
        }
      }
      .toDF("doc_id", "shard", "bin", "offset", "n_tokens")
      .orderBy(col("shard"), col("bin"), col("offset"))
  }

  /** q130: VOCABULARY-GROWTH / novelty curve — how much NEW vocabulary
    * each tranche of the corpus contributes (Heaps-law curve): the
    * crawl-exhaustion diagnostic a data team reads before paying for
    * another ingest round (a flattening curve means new data is
    * re-treading old vocabulary). Doc-id space splits into `buckets`
    * value-based tranches (integer arithmetic against the broadcast
    * max id — NO global ntile window, the q118 lesson); each distinct
    * token attributes to the tranche of its FIRST appearance.
    *
    * Scale shape: the token stream aggregates once on tok (map-side
    * combined min/count), everything after is ≤ buckets rows; the
    * cumulative-vocab window orders `buckets` rows, not the corpus. */
  def q130(documents: DataFrame, buckets: Int = 10): DataFrame = {
    val toks = documents.select(col("doc_id"),
      explode(split(lower(trim(col("text"))), " ")).as("tok"))
    val mx = documents.agg(max(col("doc_id")).cast("long").as("mx"))
    def bucketOf(name: String): Column =
      expr(s"($name * $buckets) div (mx + 1)")
    val firstSeen = toks.groupBy(col("tok"))
      .agg(min(col("doc_id")).as("first_doc"))
      .crossJoin(broadcast(mx))
      .groupBy(bucketOf("first_doc").as("bucket"))
      .agg(count(lit(1)).as("new_tokens"))
    val volume = toks.crossJoin(broadcast(mx))
      .groupBy(bucketOf("doc_id").as("bucket"))
      .agg(count(lit(1)).as("token_volume"))
    val nDocs = documents.crossJoin(broadcast(mx))
      .groupBy(bucketOf("doc_id").as("bucket"))
      .agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    nDocs
      .join(volume, Seq("bucket"), "left_outer")
      .join(firstSeen, Seq("bucket"), "left_outer")
      .select(col("bucket"), col("n_docs"),
        coalesce(col("token_volume"), lit(0L)).as("token_volume"),
        coalesce(col("new_tokens"), lit(0L)).as("new_tokens"))
      .withColumn("cum_vocab", sum(col("new_tokens")).over(w))
      .withColumn("novelty_rate",
        col("new_tokens").cast("double") / col("token_volume").cast("double"))
      .orderBy(col("bucket"))
  }

  def q128(documents: DataFrame, quota: Int = graft.Oracles.SourceQuota): DataFrame = {
    val toks = split(trim(col("text")), " ")
    val scored = documents
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_distinct", size(array_distinct(toks)).cast("long"))
      .withColumn("n_stop",
        size(filter(toks, t => lower(t).isin(Stopwords: _*))).cast("long"))
      .withColumn("ttr", col("n_distinct").cast("double") / col("n_tokens"))
      .withColumn("len_score",
        least(lit(1.0), col("n_tokens").cast("double") / lit(100.0)))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens"))
      .withColumn("quality",
        col("ttr") * 0.4 + col("len_score") * 0.3 + col("stop_ratio") * 0.3)
      .withColumn("q8", floor(col("quality") * lit(1e8)).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("q8").desc, col("doc_id"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= quota)
      .select(col("source"), col("doc_id"), col("quality"))
      .orderBy(col("source"), col("doc_id"))
  }

  /** q137: deterministic WEIGHTED sampling WITHOUT replacement —
    * Efraimidis–Spirakis A-Res (IPL 2006): draw `n` documents with
    * inclusion probability proportional to their q48 quality by
    * ranking on key = ln(u)/w with u a per-doc uniform — the top-n
    * keys ARE a weighted sample without replacement. The sampling
    * step quality-aware mixes want when q135's hard greedy cut is too
    * blunt (greedy takes ONLY the best docs; weighted sampling keeps
    * diversity while still favoring quality — the soft/hard pair,
    * like q120 temperature vs q128 quota).
    *
    * Deterministic and engine-portable: u derives from the
    * pre-reduced Knuth-multiply hash of doc_id (the q58/q80/q91
    * discipline — reproduce-anywhere sampling), ln goes through
    * [[graft.functions.PortableLn]], and the top-n is orderBy+limit —
    * TakeOrderedAndProject (per-partition n-heaps + driver merge of n
    * rows), never a global sort or rank window. Same corpus, same
    * sample, any cluster. */
  def q137(documents: DataFrame, n: Int = graft.Oracles.WeightedSampleN): DataFrame = {
    import graft.functions.PortableLn
    val P = 1000000007L
    val h = pmod(pmod(pmod(col("doc_id"), lit(P)) * lit(2654435761L), lit(P)),
      lit(1000000000L))
    val toks = split(trim(col("text")), " ")
    documents
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_distinct", size(array_distinct(toks)).cast("long"))
      .withColumn("n_stop",
        size(filter(toks, t => lower(t).isin(Stopwords: _*))).cast("long"))
      .withColumn("quality",
        (col("n_distinct").cast("double") / col("n_tokens")) * 0.4 +
          least(lit(1.0), col("n_tokens").cast("double") / lit(100.0)) * 0.3 +
          (col("n_stop").cast("double") / col("n_tokens")) * 0.3)
      .withColumn("u", (h.cast("double") + lit(1.0)) / lit(1.0e9)) // (0, 1]
      .withColumn("sample_key", PortableLn(col("u")) / col("quality"))
      .orderBy(col("sample_key").desc, col("doc_id"))
      .limit(n)
      .select(col("doc_id"), col("quality"), col("sample_key"))
      .orderBy(col("sample_key").desc, col("doc_id"))
  }

  /** q135: TOKEN-BUDGET corpus selection — "give me the best `budget`
    * tokens": keep the highest-quality documents (q48's deterministic
    * score, floor-scaled to an exact long rank key — the q128 idiom)
    * until the whitespace-token budget fills; the final assembly step
    * a training run executes once curation is done ("the best 1B
    * tokens of this lake"), and the greedy dual of q128 (q128 caps
    * per source, q135 caps the total). A document is selected iff the
    * budget was not yet exhausted when its turn came in the global
    * (q8 desc, doc_id) order — so the boundary document may overshoot
    * the budget (training practice: truncation is the packer's job,
    * q129's overflow bins).
    *
    * Two plans, provably identical output: `exact = true` is the
    * audit form — a global running-sum window, ONE task at any scale
    * (the q118 hazard, opt-in only). The DEFAULT buckets the rank key
    * at 1e4 resolution: per-bucket token sums aggregate map-side
    * (≤ 1e4 rows — the only window runs on that bounded frame), a
    * broadcast verdict keeps whole buckets strictly under the budget
    * line, drops whole buckets past it, and ONLY the single boundary
    * bucket pays a bucket-local running sum. Same total order, same
    * prefix, bit-identical rows — which is why the driver registers
    * the SCALE form and still oracle-checks it against the plain
    * window-cumsum SQL. Degenerate case: a corpus whose quality mass
    * collapses into one 1e-4 slice makes the boundary bucket
    * corpus-sized — use the audit form or a finer step there. */
  def q135(documents: DataFrame, budget: Long = graft.Oracles.TokenBudget,
           exact: Boolean = false): DataFrame = {
    val toks = split(trim(col("text")), " ")
    val scored = documents
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_distinct", size(array_distinct(toks)).cast("long"))
      .withColumn("n_stop",
        size(filter(toks, t => lower(t).isin(Stopwords: _*))).cast("long"))
      .withColumn("quality",
        (col("n_distinct").cast("double") / col("n_tokens")) * 0.4 +
          least(lit(1.0), col("n_tokens").cast("double") / lit(100.0)) * 0.3 +
          (col("n_stop").cast("double") / col("n_tokens")) * 0.3)
      .withColumn("q8", floor(col("quality") * lit(1.0e8)).cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("quality"), col("q8"))
    val selected =
      if (exact) {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("q8").desc, col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        scored.withColumn("cum", sum(col("n_tokens")).over(w))
          .filter(col("cum") - col("n_tokens") < budget)
      } else {
        val b = scored.withColumn("bucket", expr("q8 div 10000"))
        val wb = org.apache.spark.sql.expressions.Window
          .orderBy(col("bucket").desc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        // ≤ 1e4 rows: the only unpartitioned window in the default plan
        val verdict = b.groupBy(col("bucket")).agg(sum(col("n_tokens")).as("btoks"))
          .withColumn("cum", sum(col("btoks")).over(wb))
          .withColumn("base", col("cum") - col("btoks"))
          .select(col("bucket"), col("base"),
            when(col("cum") <= budget, lit("all"))
              .when(col("base") >= budget, lit("none"))
              .otherwise(lit("part")).as("v"))
        val withV = b.join(broadcast(verdict), "bucket")
        val wpart = org.apache.spark.sql.expressions.Window
          .partitionBy(col("bucket")).orderBy(col("q8").desc, col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        withV.filter(col("v") === "all")
          .unionAll(withV.filter(col("v") === "part")
            .withColumn("lcum", sum(col("n_tokens")).over(wpart))
            .filter(col("base") + col("lcum") - col("n_tokens") < budget)
            .drop("lcum"))
      }
    selected
      .orderBy(col("q8").desc, col("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("quality"))
  }

  /** q132: corpus token-distribution DRIFT — the statistical complement
    * of q110's row-level snapshot diff: q110 says WHICH docs changed
    * between two corpus versions, q132 says whether the LANGUAGE
    * changed — KL divergence KL(new ‖ old) between the snapshots'
    * smoothed unigram distributions, with the top-K tokens by absolute
    * contribution (the "what drifted" attribution a curation team
    * reads when a crawler update / new source / dedup-threshold change
    * shifts the mix — the distribution-shift check run before the new
    * snapshot is allowed to train). Additive smoothing λ over the
    * UNION vocabulary keeps both distributions strictly positive (and
    * summing to 1), so tokens that vanished or appeared contribute
    * finitely instead of ±∞.
    *
    * Float discipline (§6): ln via [[graft.functions.PortableLn]]; the
    * headline KL total is the q121 fixed-point trick — per-token
    * contributions floor-scale to 1e-12-resolution longs whose SUM is
    * order-free exact, so both engines add the same integers (int64
    * holds it to ~1e6-token vocabularies; past that, shard the sum by
    * token range). Ranking ties break on the exact long then token.
    *
    * Scale shape: one map-side-combined token count per side (the only
    * corpus-sized stage), then everything is vocab-sized: the full
    * outer join, the one-row totals broadcast, the KL aggregate, and a
    * TakeOrdered top-K. Both consumers of the joined counts live in
    * the ONE returned plan, so ReuseExchange dedupes the count
    * exchanges (q118's lesson — no persist to leak). */
  def q132(oldCorpus: DataFrame, newCorpus: DataFrame, topK: Int = 50,
           lambda: Double = 0.5): DataFrame = {
    import graft.functions.PortableLn
    def counts(c: DataFrame, out: String) = c
      .select(explode(split(lower(trim(col("text"))), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as(out))
    val joined = counts(oldCorpus, "n_old")
      .join(counts(newCorpus, "n_new"), Seq("tok"), "full_outer")
      .select(col("tok"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val tot = joined.agg(
      sum(col("n_old")).cast("long").as("t_old"),
      sum(col("n_new")).cast("long").as("t_new"),
      count(lit(1)).as("v"))
    val per = joined.crossJoin(broadcast(tot))
      .withColumn("p_old",
        (col("n_old").cast("double") + lit(lambda)) /
          (col("t_old").cast("double") + lit(lambda) * col("v").cast("double")))
      .withColumn("p_new",
        (col("n_new").cast("double") + lit(lambda)) /
          (col("t_new").cast("double") + lit(lambda) * col("v").cast("double")))
      .withColumn("contrib",
        col("p_new") * PortableLn(col("p_new") / col("p_old")))
      .withColumn("c12", floor(col("contrib") * lit(1.0e12)).cast("long"))
    val kl = per.agg(
      (sum(col("c12")).cast("double") / lit(1.0e12)).as("kl_total"))
    per
      .orderBy(abs(col("c12")).desc, col("tok"))
      .limit(topK)
      .crossJoin(broadcast(kl))
      .select(col("tok"), col("n_old"), col("n_new"),
        col("p_old"), col("p_new"), col("contrib"), col("kl_total"))
      // re-derive the rank key (c12 was projected away): same exact long
      .orderBy(abs(floor(col("contrib") * lit(1.0e12)).cast("long")).desc,
        col("tok"))
  }

  /** q178: GOPHER-STYLE RULE FILTER (Rae et al. 2021, "Scaling Language
    * Models: … Gopher", Appendix A1.1 — the public heuristic-filter
    * recipe most curation stacks start from): per document, the five
    * rule measurements and their pass/fail flags —
    *  - r_len:   word count within [minWords, maxWords];
    *  - r_wlen:  mean word length within [3, 10] characters;
    *  - r_alpha: ≥ 80% of words contain an alphabetic character;
    *  - r_stop:  at least 2 stopword hits (the q48 stopword list);
    *  - r_sym:   symbol-to-word ratio ('#' or '...') ≤ 0.1;
    * plus the conjunction `pass`. Complements q48's continuous quality
    * score (model-ish signal) with the hard rule gate run FIRST in a
    * real pipeline — q65's funnel admits docs, this says WHY each
    * failed.
    *
    * Exactness (§6): every count is an exact long (word count, summed
    * word lengths via an integer fold, filtered-array sizes, regexp
    * occurrence counts); the two ratios are single IEEE divides over
    * identical longs, so the threshold compares agree bit-for-bit with
    * the oracle. Plan: one codegen'd scan, no exchange at all — the
    * cheapest plan class there is; at 100 TB this is a linear pass
    * that pushes only (doc_id + flags) upstream. */
  def q178(documents: DataFrame, minWords: Int = 50,
           maxWords: Int = 100000): DataFrame = {
    val toks = split(trim(col("text")), " ")
    documents
      .withColumn("n_words", size(toks).cast("long"))
      .withColumn("sum_wlen",
        aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long")))
      .withColumn("n_alpha",
        size(filter(toks, t => t.rlike("[a-z]"))).cast("long"))
      .withColumn("n_stop",
        size(filter(toks, t => lower(t).isin(Stopwords: _*))).cast("long"))
      .withColumn("n_sym",
        regexp_count(col("text"), lit("#|\\.\\.\\.")).cast("long"))
      .withColumn("mean_wlen",
        col("sum_wlen").cast("double") / col("n_words").cast("double"))
      .withColumn("alpha_frac",
        col("n_alpha").cast("double") / col("n_words").cast("double"))
      .withColumn("sym_ratio",
        col("n_sym").cast("double") / col("n_words").cast("double"))
      .withColumn("r_len",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("r_wlen", col("mean_wlen") >= 3.0 && col("mean_wlen") <= 10.0)
      .withColumn("r_alpha", col("alpha_frac") >= 0.8)
      .withColumn("r_stop", col("n_stop") >= 2L)
      .withColumn("r_sym", col("sym_ratio") <= 0.1)
      .withColumn("pass", col("r_len") && col("r_wlen") && col("r_alpha") &&
        col("r_stop") && col("r_sym"))
      .select(col("doc_id"), col("n_words"), col("mean_wlen"),
        col("alpha_frac"), col("n_stop"), col("sym_ratio"),
        col("r_len"), col("r_wlen"), col("r_alpha"), col("r_stop"),
        col("r_sym"), col("pass"))
      .orderBy(col("doc_id"))
  }

  /** q179: DATA-CONSTRAINED EPOCH SCHEDULE (Muennighoff et al. 2023,
    * "Scaling Data-Constrained Language Models" — repeating data up to
    * ~4 epochs is near-free): given a token budget of
    * `budgetFactor × corpus tokens` split EQUALLY across sources, how
    * many epochs (repeat passes, capped at `maxEpochs`) each source
    * runs and how many tokens it actually serves. The planning read
    * between measuring the mix (q70/q106) and materializing it
    * (q102/q120/q137): small sources repeat until the cap, large ones
    * serve a partial pass, and `util` < 1 flags budget the cap left
    * unservable.
    *
    * Exactness (§6): ALL of it is integer arithmetic — per-source token
    * sums are longs, `target = budget div n_sources`,
    * `epochs = min(maxEpochs, ceildiv(target, tokens))` via
    * `(target + tokens − 1) div tokens`, `served = min(target,
    * epochs·tokens)` — so every column but the one final `util` divide
    * is hash-exact by construction. Plan: one map-side-combined
    * per-source aggregate (the only corpus-sized stage) + a one-row
    * broadcast of the global budget. */
  def q179(documents: DataFrame, budgetFactor: Int = 2,
           maxEpochs: Int = 4): DataFrame = {
    val perSource = documents
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(trim(col("text")), " ")).cast("long")).as("tokens"))
    val globals = perSource.agg(
      sum(col("tokens")).cast("long").as("total_tokens"),
      count(lit(1)).cast("long").as("n_sources"))
    perSource.crossJoin(broadcast(globals))
      .withColumn("target_tokens",
        expr(s"(total_tokens * $budgetFactor) div n_sources"))
      .withColumn("epochs",
        least(lit(maxEpochs.toLong),
          expr("(target_tokens + tokens - 1) div tokens")))
      .withColumn("served_tokens",
        least(col("target_tokens"), col("epochs") * col("tokens")))
      .withColumn("util",
        col("served_tokens").cast("double") / col("target_tokens").cast("double"))
      .select(col("source"), col("n_docs"), col("tokens"),
        col("target_tokens"), col("epochs"), col("served_tokens"), col("util"))
      .orderBy(col("source"))
  }

  /** q181: DOMAIN REWEIGHTING by multiplicative weights (the DoReMi
    * idea — Xie et al. 2023, "DoReMi: Optimizing Data Mixtures Speeds
    * Up Language Model Pretraining" — with the proxy-model loss
    * replaced by a corpus-computable hardness signal): per-source
    * EXCESS loss (average negative unigram logprob above the easiest
    * source's, the q86 estimator aggregated per source) drives
    * `iters` rounds of `w ← w·(1 + η·excess)` then renormalize —
    * upweighting the domains the corpus model finds hardest, the
    * standard mixture-tuning step between q70's descriptive mix and
    * q102/q120's samplers.
    *
    * Exactness (the SIXTH oracle-exact iterative operator, after
    * q154/q155/q165/q175/q180): the only floats are PortableLn and
    * ONE multiply per (source, token-type) term, immediately
    * floor-scaled to 1e-9-nat longs whose sums are order-free (the
    * zipf idiom) — so the per-source loss is an exact long, and every
    * round is pure integer multiply/divide (`div` ≡ DuckDB `//` on
    * the non-negative domain) → bit-identical by induction. The
    * renormalize is the PRECISE q180 form `raw·TotScale div Σraw`, so
    * Σw lands in (TotScale − sources, TotScale] every round and the
    * final fractions sum to 1 − O(sources/TotScale).
    *
    * Overflow bound: TotScale=1e8 keeps the renormalize multiply under
    * 2⁶³ as long as any single raw ≤ 9.2e10 — i.e. a per-round
    * multiplier up to 920×, which needs a 920-NAT excess loss; real
    * corpora sit under 30 nats. Σraw needs sources·raw < 2⁶³ — fine
    * past a million sources.
    *
    * Plan: corpus-sized work is the ONE (source, tok) aggregate
    * (map-side combined; the unigram stats ct/tt are q86's); every
    * round after that runs on the sources-sized weight table — joins
    * against a broadcast one-row total, localCheckpoint per round
    * cutting lineage, exchanges bounded by #sources forever. */
  def q181(documents: DataFrame, iters: Int = 5): DataFrame = {
    val TotScale = 100000000L // Σw target, 1e8
    val toks = graft.Pins.pin(documents.select(col("source"),
      explode(split(lower(trim(col("text"))), " ")).as("tok")))
    val st = toks.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("n"))
    val ct = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = toks.agg(count(lit(1)).as("t"))
    val loss = st.join(ct, "tok")
      .crossJoin(broadcast(total))
      .withColumn("lp9", floor(col("n").cast("double") *
        graft.functions.PortableLn(col("c").cast("double") / col("t")) *
        lit(1.0e9)).cast("long"))
      .groupBy(col("source"))
      .agg(sum(col("n")).cast("long").as("tokens"),
        sum(col("lp9")).cast("long").as("lp9sum"))
      .withColumn("loss", expr("(-lp9sum) div tokens"))
      .select(col("source"), col("tokens"), col("loss"))
    val mins = loss.agg(min(col("loss")).as("lmin"),
      count(lit(1)).cast("long").as("ns"))
    val base = graft.Pins.pin(loss.crossJoin(broadcast(mins))
      .withColumn("e", expr("(loss - lmin) div 1000"))
      .select(col("source"), col("tokens"), col("loss"), col("e"),
        expr(s"$TotScale div ns").as("w0")))
    var w = Ckpt.cut(base.select(col("source"), col("w0").as("w")))
    for (_ <- 1 to iters) {
      val raw = w.join(base.select(col("source"), col("e")), "source")
        .select(col("source"), expr("(w * (1000000L + e)) div 1000000L").as("raw"))
      val s = raw.agg(sum(col("raw")).cast("long").as("S"))
      w = raw.crossJoin(broadcast(s))
        .select(col("source"),
          expr(s"(raw * $TotScale) div S").as("w"))
        .transform(Ckpt.cut(_))
    }
    base.select(col("source"), col("tokens"), col("loss"))
      .join(w, "source")
      .withColumn("weight_frac", col("w").cast("double") / lit(1.0e8))
      .select(col("source"), col("tokens"), col("loss"),
        col("w").as("weight"), col("weight_frac"))
      .orderBy(col("source"))
  }

  /** q187: VOCABULARY RICHNESS per source — how much vocabulary a
    * source has, and how much more a bigger crawl of it would yield.
    * Reports observed distinct tokens (`vocab`), hapax/dis legomena
    * (`f1`/`f2`), the bias-corrected Chao1 richness estimate
    * (Chao 1984: V + f1·(f1−1)/(2·(f2+1)), integer floor — defined
    * even when f2 = 0), and the Good–Turing unseen-probability mass
    * f1/N (Gale & Sampson 1995) as a ×1e8 long. The crawl-budgeting
    * read: a source whose chao1 ≫ vocab (high unseen mass) still pays
    * for more crawling; one where chao1 ≈ vocab is exhausted.
    *
    * All integer arithmetic → hash-exact. Plan: one (source, tok)
    * map-side-combined aggregate (the q86 shape — partial counts
    * combine before the shuffle, so the exchange carries vocab-sized
    * data, not corpus-sized), then a sources-sized rollup. At 100 TB
    * the (source, tok) grid is the only big intermediate and it is
    * exactly the token-frequency table every other vocab operator
    * (q75/q130/q132) already materializes. */
  def q187(documents: DataFrame): DataFrame = {
    val tc = documents
      .select(col("source"),
        explode(split(lower(trim(col("text"))), " ")).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
    tc.groupBy(col("source"))
      .agg(sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("vocab"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).cast("long").as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).cast("long").as("f2"))
      .withColumn("chao1",
        col("vocab") + expr("(f1 * (f1 - 1)) div (2 * (f2 + 1))"))
      .withColumn("unseen_mass_e8", expr("(f1 * 100000000L) div n_tokens"))
      .select(col("source"), col("n_tokens"), col("vocab"), col("f1"),
        col("f2"), col("chao1"), col("unseen_mass_e8"))
      .orderBy(col("source"))
  }

  /** q189: EXACT TWO-SAMPLE KOLMOGOROV–SMIRNOV drift, each source vs
    * the rest of the corpus, over the document-length (`n_chars`)
    * distribution — the distributional complement to q167's χ² token
    * drift: χ² sees WHICH tokens shifted, KS sees that a source's
    * length SHAPE diverged (truncation, boilerplate padding, extractor
    * regressions all move length first). D = sup|F_src − F_rest| is
    * computed exactly in integers by cross-multiplying the two ECDF
    * numerators: ks_num = max|c_src·n_rest − c_rest·n_src| over the
    * merged value grid, reported with the scaled statistic
    * ks_e8 = ks_num·1e8/(n_src·n_rest). All longs → hash-exact.
    *
    * Plan: the corpus collapses to a (source, n_chars) count table in
    * one map-side-combined aggregate; the ECDF grid is
    * sources × distinct-lengths (stats-domain-sized, NOT corpus-sized
    * — lengths are bounded by the length domain), built by
    * broadcasting the distinct-value list, so at 100 TB nothing
    * corpus-sized is shuffled twice and the window runs over the tiny
    * grid partitioned by source. */
  def q189(documents: DataFrame): DataFrame = {
    val counts = graft.Pins.pin(
      documents.groupBy(col("source"), col("n_chars"))
        .agg(count(lit(1)).as("c")))
    val srcTot = counts.groupBy(col("source"))
      .agg(sum(col("c")).cast("long").as("n_src"))
    val tot = counts.agg(sum(col("c")).cast("long").as("n_all"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_chars"))
    val gw = org.apache.spark.sql.expressions.Window.orderBy(col("n_chars"))
    val gcum = counts.groupBy(col("n_chars")).agg(sum(col("c")).as("vc"))
      .withColumn("cum_all", sum(col("vc")).over(gw).cast("long"))
      .select(col("n_chars"), col("cum_all"))
    val grid = srcTot.crossJoin(broadcast(gcum.select(col("n_chars"))))
      .join(counts, Seq("source", "n_chars"), "left_outer")
      .na.fill(0L, Seq("c"))
      .withColumn("cum_src", sum(col("c")).over(w).cast("long"))
      .join(broadcast(gcum), Seq("n_chars"))
      .crossJoin(broadcast(tot))
    grid.select(col("source"), col("n_src"),
        (col("n_all") - col("n_src")).as("n_rest"),
        abs(col("cum_src") * (col("n_all") - col("n_src")) -
          (col("cum_all") - col("cum_src")) * col("n_src")).as("d"))
      .groupBy(col("source"), col("n_src"), col("n_rest"))
      .agg(max(col("d")).cast("long").as("ks_num"))
      // single-source corpus: n_rest = 0, the statistic is undefined —
      // report 0 instead of an ANSI divide error
      .withColumn("ks_e8", when(col("n_rest") === 0L, lit(0L))
        .otherwise(expr("(ks_num * 100000000L) div (n_src * n_rest)")))
      .orderBy(col("source"))
  }

  /** q194: TOKEN BURSTINESS — per token, the variance-to-mean ratio
    * (dispersion index) of its per-document count over the WHOLE
    * corpus (zero-docs included): Poisson-ish content words sit near
    * D ≈ 1, template/boilerplate tokens concentrate in few docs and
    * read D ≫ 1 (Church & Gale 1995 burstiness) — the TOKEN-level
    * lens on what q101 detects per doc and q68 within a doc.
    * D = (N·Σc² − (Σc)²)/(N·Σc) with zero-docs contributing only via
    * N, so the per-doc count table never needs zero rows. df/n/Σc²
    * are exact longs, D is ONE fixed IEEE divide over them →
    * hash-exact. Squares stay inside a long for n < ~3·10⁹ token
    * occurrences per type; a 100 TB deployment lifts the two products
    * to DECIMAL(38,0) (same algebra) or computes per shard.
    *
    * Plan: (doc, tok) count then (tok) rollup — both map-side
    * combined, the same two-exchange shape as q187; the one-row doc
    * count broadcasts. */
  def q194(documents: DataFrame, minCount: Long = 20L): DataFrame = {
    val nDocs = documents.agg(count(lit(1)).cast("long").as("nd"))
    documents
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).cast("long").as("df"),
        sum(col("c")).cast("long").as("n"),
        sum(col("c") * col("c")).cast("long").as("s2"))
      .filter(col("n") >= minCount)
      .crossJoin(broadcast(nDocs))
      .withColumn("dispersion",
        (col("nd") * col("s2") - col("n") * col("n")).cast("double") /
          (col("nd") * col("n")).cast("double"))
      .select(col("tok"), col("df"), col("n"), col("s2"), col("dispersion"))
      .orderBy(col("tok"))
  }

  /** q196: CONDITIONAL BIGRAM ENTROPY per source — H(next|current) =
    * −Σ p(u,v)·ln p(v|u) over the source's bigram table: the
    * next-token-predictability read that q160's unigram entropy
    * cannot make (template/boilerplate text keeps a rich vocabulary
    * yet reads LOW conditional entropy because every token determines
    * its successor — the q194 burstiness signal seen through an
    * information lens; the q99/q86 per-doc complement at source
    * grain). MLE conditionals: p(v|u) = c(u,v)/c(u·) with c(u·) the
    * bigram-head marginal, so p is exact-rational and u-always-
    * followed-by-v contributes exactly 0. Oracle-exact via the fixed-
    * point entropy idiom: each term floor-scaled to a 1e-9-nat LONG
    * before the order-free sum, ln = [[graft.functions.PortableLn]]
    * (lnChain replays it in DuckDB), one readability divide at the
    * end.
    *
    * Plan: one (source, u, v) map-side-combined bigram count is the
    * only corpus-sized exchange; the head marginal and source total
    * are rollups of it; the entropy sum runs over the bigram-type
    * table. The per-doc lead() window shuffles doc-keyed positions
    * once — the q99 shape. */
  def q196(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("source"), col("doc_id"),
        posexplode(split(lower(trim(col("text"))), " ")).as(Seq("pos", "tok")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val big = graft.Pins.pin(toks
      .withColumn("tok2", lead(col("tok"), 1).over(w))
      .filter(col("tok2").isNotNull)
      .groupBy(col("source"), col("tok"), col("tok2"))
      .agg(count(lit(1)).cast("long").as("c12")))
    val uni = big.groupBy(col("source"), col("tok"))
      .agg(sum(col("c12")).cast("long").as("c1"))
    val tot = big.groupBy(col("source"))
      .agg(sum(col("c12")).cast("long").as("n"))
    big.join(uni, Seq("source", "tok"))
      .join(broadcast(tot), Seq("source"))
      .withColumn("t9", floor(
        (col("c12").cast("double") / col("n").cast("double")) *
          graft.functions.PortableLn(
            col("c12").cast("double") / col("c1").cast("double")) *
          lit(1.0e9)).cast("long"))
      .groupBy(col("source"), col("n"))
      .agg((-sum(col("t9"))).cast("long").as("h_cond_e9"))
      .select(col("source"), col("n").as("n_bigrams"), col("h_cond_e9"),
        (col("h_cond_e9").cast("double") / lit(1.0e9)).as("h_cond_nats"))
      .orderBy(col("source"))
  }

  /** The fn07 lexicon model q199 defaults to: q47's marker lexicons
    * compiled into [[graft.functions.LinearModel]] weights — built
    * once, reused by every q199 plan. */
  lazy val DefaultLangModel: graft.functions.LinearModel =
    graft.functions.LinearModel.fromLexicons(Lexicons)

  /** q199: MODEL-BASED language ID — q47's decision recomputed through
    * the fn07 broadcast-weights linear classifier ([[graft.functions
    * .ModelPredict]]): per document, the argmax class of a
    * bucket-hashed linear model whose default weights compile q47's
    * marker lexicons (spec-pinned equal to the heuristic), and whose
    * PRODUCTION weights are a `LinearModel.load`ed fastText-class
    * file — the CCNet/FineWeb-style model upgrade with zero operator
    * changes. One codegen'd scan, weights broadcast with the plan, no
    * shuffle but the output sort. rows-only: the bucket hashing is not
    * portably SQL-expressible (q114 collision contract); the parity
    * spec vs oracle-exact q47 carries the correctness argument. */
  def q199(documents: DataFrame,
           model: graft.functions.LinearModel = DefaultLangModel): DataFrame =
    documents.select(col("doc_id"), col("lang"),
      graft.functions.ModelPredict(col("text"), model).as("pred_lang"))
      .orderBy(col("doc_id"))

  /** q199 `trained=true` variant (r15): instead of COMPILING q47's
    * lexicons into weights, FIT them — [[graft.functions.LinearModel
    * .fit]] trains softmax weights on `train`'s texts against any
    * label column (weak labels from q47 itself in the self-supervised
    * shape, or human/provider labels when they exist), then scores
    * `documents` through the ordinary q199 plan. The train/serve split
    * is the caller's (q91/q170 make one); the trainer's full-batch
    * fixed-point gradient makes the fitted weights deterministic, so
    * this composes into the driver-gated pipelines without breaking
    * reproducibility. */
  def q199Trained(documents: DataFrame, train: DataFrame,
                  labelCol: String = "pred_lang",
                  buckets: Long = 1L << 17, iters: Int = 30): DataFrame =
    q199(documents,
      graft.functions.LinearModel.fit(train, "text", labelCol, buckets,
        useBigrams = false, iters = iters))

  /** q190: VOCABULARY COVERAGE BY RANK — what fraction of corpus token
    * OCCURRENCES the top-k most frequent token types cover, at
    * k ∈ {100, 1000, 10000}: the tokenizer-vocab-sizing read (how big
    * must the vocab be before the OOV tail is negligible) and the
    * corpus-level complement of q130's per-doc growth curve. Rank
    * order is (count desc, token) — fully deterministic.
    *
    * Scale: the top-k cut uses orderBy(...).limit(maxK), which Spark
    * plans as TakeOrderedAndProject — a per-partition bounded heap +
    * driver merge of 32 heaps of maxK rows, NOT a global sort of the
    * vocab table. The cumulative window then runs over ≤ maxK rows
    * (metadata-sized by construction). The only corpus-sized work is
    * the one map-side-combined (tok) count. Integer ×1e8 floor
    * division → hash-exact. */
  def q190(documents: DataFrame, ks: Seq[Int] = Seq(100, 1000, 10000))
      : DataFrame = {
    val tc = documents
      .select(explode(split(lower(trim(col("text"))), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .transform(graft.Pins.pin)
    val total = tc.agg(sum(col("c")).cast("long").as("n_total"))
    val maxK = ks.max
    val top = tc.orderBy(col("c").desc, col("tok")).limit(maxK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c").desc, col("tok"))
    val ranked = top
      .withColumn("rk", row_number().over(w))
      .withColumn("cum", sum(col("c")).over(w).cast("long"))
    val kdf = documents.sparkSession
      .createDataFrame(ks.map(k => Tuple1(k))).toDF("k")
    // coverage saturates when k exceeds the vocabulary: take the
    // deepest rank ≤ k (cum is monotone, so max(cum) is that rank's)
    ranked.join(broadcast(kdf), col("rk") <= col("k"))
      .groupBy(col("k"))
      .agg(max(col("rk")).cast("long").as("vocab_used"),
        max(col("cum")).cast("long").as("covered"))
      .crossJoin(broadcast(total))
      .select(col("k"), col("vocab_used"), col("covered"), col("n_total"),
        expr("(covered * 100000000L) div n_total").as("coverage_e8"))
      .orderBy(col("k"))
  }
}
