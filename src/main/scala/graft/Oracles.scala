package graft

/** DuckDB oracle SQL mirroring each SparkEntry query (SURVEY.md §6).
  *
  * Float discipline, shared with the Spark side:
  *  - money sums:  CAST(ROUND(SUM(CAST(x AS DECIMAL(18,4))),2) AS DOUBLE)
  *    (exact, order-independent, identical bits in both engines)
  *  - means:       CAST(SUM(decimal) AS DOUBLE)/COUNT(*)  (one fp divide)
  *  - dot/cosine:  strict left fold — list_reduce(list_prepend(0.0, …))
  *    mirrors Spark's `aggregate` sequential fold
  *  - DuckDB-only type quirks normalized: SUM(int)→CAST BIGINT,
  *    rank/ntile→CAST INT, len()→CAST BIGINT, events.ts→CAST TIMESTAMP.
  */
object Oracles {
  /** q109/q110 derivation constants — referenced by BOTH the
    * SparkEntry derivations and the oracle SQL below (interpolated),
    * so a change on either side can't silently break the pairing. */
  val IngestBatchMod = 5L  // q109: batch = doc_id % 5 == 0, corpus = rest
  val TokenBudget = 10000L // q135: whitespace-token selection budget
  val NeymanBudget = 200L  // q144: total sample-size budget to allocate
  val WeightedSampleN = 100 // q137: weighted-sample size
  val DiffOldDropMod = 7L  // q110: "old" snapshot drops every 7th doc
  val DiffNewDropMod = 5L  // q110: "new" snapshot drops every 5th doc
  val DiffUpperMod = 11L   // q110: "new" upper-cases every 11th's text

  /** q126 derivation constants: q109's corpus/batch split plus planted
    * re-ingests so all three statuses exist at sf0.01 (the natural
    * corpus has no exact dups there) — corpus docs with
    * doc_id % BloomReingestMod == BloomReingestRem re-enter the batch
    * as id+BloomIdOffsetA copies (→ dup_corpus) and every
    * BloomDupBatchMod-th doc enters twice (id+BloomIdOffsetB copy →
    * dup_batch). */
  val BloomReingestMod = 7L
  val BloomReingestRem = 3L
  val BloomDupBatchMod = 15L
  val BloomIdOffsetA = 1000000000L
  val BloomIdOffsetB = 2000000000L

  /** q128 per-source quality quota (docs kept per source). */
  val SourceQuota = 20

  /** q169 semantic-decontamination threshold and benchmark split
    * (vec_id < this = the benchmark set). */
  final val SemDecontamTau = 0.9
  final val SemBenchIds = 10L

  /** q171 shard-rebalance geometry: N → M shards, vnodes per shard. */
  final val ShardN = 16
  final val ShardM = 20
  final val ShardVnodes = 8

  /** q177 SemDeDup within-cluster cosine threshold (q46's pair
    * threshold, so the two dedups are comparable). */
  final val SemDedupTau = 0.4

  /** q179 epoch schedule: budget = factor × corpus tokens, epoch cap. */
  final val EpochBudgetFactor = 2
  final val EpochMaxEpochs = 4

  /** q180 HITS round count and integer-renormalization scale. */
  final val HitsIters = 5
  final val HitsScale = 1000000L

  /** q181 multiplicative-weights round count (Σw target 1e10 and the
    * η divisor 1e3 are literals inside both engines' round algebra). */
  final val ReweightIters = 5

  /** q182 contamination threshold — a doc whose q69 trigram overlap
    * with the benchmark exceeds this is billed to the contamination
    * stage (after rules and dedup). */
  final val RejectContamTau = 0.2

  /** q183 k-anonymity floor: an (event_type, hour) equivalence class
    * with fewer distinct users than this is marked `suppress`. */
  final val KAnonK = 5

  /** q185 l-diversity floor: a k-anonymous class whose sensitive
    * attribute takes fewer than this many distinct values is
    * `homogeneous` — releasable size-wise but value-disclosing. */
  final val LDivL = 3

  /** q114/q115/q119 span length — the operator defaults AND the
    * oracle window arithmetic derive from this one value. */
  val SpanK = 5

  /** q116's driver query batch — SparkEntry builds the DataFrame from
    * this and the oracle interpolates it as VALUES, so the two sides
    * cannot drift. */
  val Bm25Queries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("data", "spark"),
    2L -> Seq("fast", "join", "scan"),
    3L -> Seq("customer", "vector", "stream"))
  private def bm25QueryValues: String =
    Bm25Queries.flatMap { case (q, ts) =>
      ts.zipWithIndex.map { case (t, p) => (q, p, t) }
    }.zipWithIndex.map {
      case ((q, p, t), 0) => s"(CAST($q AS BIGINT), CAST($p AS INTEGER), '$t')"
      case ((q, p, t), _) => s"($q, $p, '$t')"
    }.mkString(", ")

  /** The full BM25 ranking CTE chain (qt … bm25ranked) shared verbatim
    * by the q116 oracle (top-10 cut) and the q161 hybrid-RRF oracle
    * (top-`HybridDepth` text list) — the Q41Sql sharing pattern, so the
    * two oracles cannot drift from each other. */
  private lazy val bm25RankedCtes: String =
    s"""qt(query_id, pos, term) AS (VALUES $bm25QueryValues),
       toks AS (SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok FROM documents),
       dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
       stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dl) AS BIGINT) AS total_toks FROM dl),
       tf AS (SELECT doc_id, tok AS term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
         WHERE tok IN (SELECT DISTINCT term FROM qt) GROUP BY doc_id, tok),
       dfs AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
       pre AS (SELECT qt.query_id, qt.pos, tf.doc_id, tf.tf, dfs.df, dl.dl,
           s.n_docs, s.total_toks
         FROM qt JOIN tf ON qt.term = tf.term JOIN dfs ON qt.term = dfs.term
         JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s),
       ${lnChain("lnidf", "pre",
          Seq("query_id", "pos", "doc_id", "tf", "df", "dl", "n_docs", "total_toks"),
          Seq("(CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0" -> "idf"))},
       contrib AS (SELECT query_id, pos, doc_id,
           idf * (CAST(tf AS DOUBLE) * 2.2)
             / (tf + 1.2 * (0.25 + 0.75 *
                 (CAST(dl AS DOUBLE) / (CAST(total_toks AS DOUBLE) / n_docs)))) AS c
         FROM lnidf),
       per AS (SELECT query_id, doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit,
           list_sort(list(struct_pack(pos := pos, c := c))) AS xs
         FROM contrib GROUP BY query_id, doc_id),
       folded AS (SELECT query_id, doc_id, n_hit,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(xs, s -> struct_extract(s, 'c'))), (a, b) -> a + b) AS score
         FROM per),
       bm25ranked AS (SELECT query_id,
           CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY score DESC, doc_id) AS BIGINT) AS "rank",
           doc_id, n_hit, score FROM folded)"""

  /** q161 list depth — SparkEntry passes the same value to
    * Similarity.q161 and the oracle interpolates it, so the two sides
    * cannot drift. */
  val HybridDepth = 50

  /** q162 minimizer window / candidate threshold — SparkEntry passes
    * these to Dedup.q162 and the oracle interpolates them. */
  val MinimizerW = 4
  val MinimizerShared = 2

  /** q117/st16 DSIR parameters, shared with the oracle SQL. */
  val DsirTargetSource = "src0"
  val DsirBuckets = 64
  val DsirTopN = 100

  /** q120 temperature-mix parameters (α, doc budget, hash salt),
    * shared with the oracle SQL. */
  val MixAlpha = 0.7
  val MixBudget = 200L
  val MixSalt = 59359L

  private def msum(x: String) =
    s"CAST(ROUND(SUM(CAST($x AS DECIMAL(18,4))),2) AS DOUBLE)"

  // ---- portable ln: the DuckDB replay of GraftMath.portableLn ----
  // Same constants, same op order → same bits as the Spark side on
  // every input (601 703-point sweep, zero mismatches). See
  // functions/GraftMath.scala for the algorithm and the measurement
  // that rules out any libm-based parity.
  private val LnS2  = "1.4142135623730951"   // = 2*LnS05 exactly
  private val LnS05 = "0.7071067811865476"
  private val LnHi  = "0.6931471803691238"
  private val LnLo  = "1.9082149292705877e-10"
  private def lnHorner(t2: String): String =
    s"1.0 + $t2*(0.3333333333333333 + $t2*(0.2 + $t2*(0.14285714285714285 + " +
    s"$t2*(0.1111111111111111 + $t2*(0.09090909090909091 + $t2*(0.07692307692307693 + " +
    s"$t2*(0.06666666666666667 + $t2*(0.058823529411764705 + $t2*(0.05263157894736842 + " +
    s"$t2*(0.047619047619047616 + $t2*0.043478260869565216))))))))))"

  private val ExpInvLn2 = "1.4426950408889634"
  private def expHorner(r: String): String =
    s"1.0 + $r*(1.0 + $r*(0.5 + $r*(0.16666666666666666 + $r*(0.041666666666666664 + " +
    s"$r*(0.008333333333333333 + $r*(0.001388888888888889 + $r*(0.0001984126984126984 + " +
    s"$r*(2.48015873015873e-05 + $r*(2.7557319223985893e-06 + $r*(2.755731922398589e-07 + " +
    s"$r*(2.505210838544172e-08 + $r*(2.08767569878681e-09 + $r*(1.6059043836821613e-10 + " +
    s"$r*(1.1470745597729725e-11 + $r*(7.647163731819816e-13 + " +
    s"$r*4.779477332387385e-14)))))))))))))))"

  /** exp twin of [[lnChain]] — replays GraftMath.portableExp in SQL:
    * `{p}_e1 … {p}_e3, {p}` with outName = portable-exp(xExpr).
    * k = floor(x/ln2 + 1/2) (floor in both engines — SQL round() is
    * half-away, Java's is half-up, so neither is shared), r via the
    * split ln2, 16-term Horner, exact 2^k scale. 500 409-point sweep:
    * zero cross-engine mismatches. */
  private def expChain(p: String, src: String, carry: Seq[String],
                       ins: Seq[(String, String)]): String = {
    val c = if (carry.isEmpty) "" else carry.mkString(", ") + ", "
    def g(i: Int, s: String) = s"e$i$s"
    def sel(body: Int => String) = ins.indices.map(body).mkString(", ")
    s"""${p}_e1 AS (SELECT $c${sel(i => s"${ins(i)._1} AS ${g(i, "x")}")} FROM $src),
       ${p}_e2 AS (SELECT $c${sel(i => s"${g(i, "x")}, floor(${g(i, "x")} * $ExpInvLn2 + 0.5) AS ${g(i, "kd")}")} FROM ${p}_e1),
       ${p}_e3 AS (SELECT $c${sel(i => s"${g(i, "kd")}, (${g(i, "x")} - ${g(i, "kd")} * $LnHi) - ${g(i, "kd")} * $LnLo AS ${g(i, "r")}")} FROM ${p}_e2),
       $p AS (SELECT $c${sel(i => s"pow(2.0, ${g(i, "kd")}) * (${expHorner(g(i, "r"))}) AS ${ins(i)._2}")} FROM ${p}_e3)"""
  }

  /** Emits a CTE chain `{p}_l1 … {p}_l7, {p}` computing, for each
    * (xExpr → outName) in `ins`, outName = portable-ln(xExpr) with
    * xExpr evaluated against `src` (which may be a join); `carry`
    * columns pass through to the final CTE `{p}`. Canonicalization
    * seeds k from floor(log2(x)) — the two exact halve/double steps
    * absorb any ±1 seed difference vs the Spark side's getExponent,
    * landing both engines on the identical (k, m). */
  private def lnChain(p: String, src: String, carry: Seq[String],
                      ins: Seq[(String, String)]): String = {
    val c = if (carry.isEmpty) "" else carry.mkString(", ") + ", "
    def g(i: Int, s: String) = s"g$i$s"
    def sel(body: Int => String) = ins.indices.map(body).mkString(", ")
    def canon(m: String, k: String, mOut: String, kOut: String) =
      s"CASE WHEN $m >= $LnS2 THEN $m/2.0 WHEN $m < $LnS05 THEN $m*2.0 ELSE $m END AS $mOut, " +
      s"CASE WHEN $m >= $LnS2 THEN $k+1 WHEN $m < $LnS05 THEN $k-1 ELSE $k END AS $kOut"
    s"""${p}_l1 AS (SELECT $c${sel(i => s"${ins(i)._1} AS ${g(i, "x")}")} FROM $src),
       ${p}_l2 AS (SELECT $c${sel(i => s"${g(i, "x")}, CAST(floor(log2(${g(i, "x")})) AS BIGINT) AS ${g(i, "kr")}")} FROM ${p}_l1),
       ${p}_l3 AS (SELECT $c${sel(i => s"${g(i, "kr")}, ${g(i, "x")} / pow(2.0, CAST(${g(i, "kr")} AS DOUBLE)) AS ${g(i, "mr")}")} FROM ${p}_l2),
       ${p}_l4 AS (SELECT $c${sel(i => canon(g(i, "mr"), g(i, "kr"), g(i, "m1"), g(i, "k1")))} FROM ${p}_l3),
       ${p}_l5 AS (SELECT $c${sel(i => canon(g(i, "m1"), g(i, "k1"), g(i, "m"), g(i, "k")))} FROM ${p}_l4),
       ${p}_l6 AS (SELECT $c${sel(i => s"${g(i, "k")}, (${g(i, "m")} - 1.0)/(${g(i, "m")} + 1.0) AS ${g(i, "t")}")} FROM ${p}_l5),
       ${p}_l7 AS (SELECT $c${sel(i => s"${g(i, "k")}, ${g(i, "t")}, ${g(i, "t")}*${g(i, "t")} AS ${g(i, "t2")}")} FROM ${p}_l6),
       $p AS (SELECT $c${sel(i => s"CAST(${g(i, "k")} AS DOUBLE)*$LnHi + (CAST(${g(i, "k")} AS DOUBLE)*$LnLo + 2.0*(${g(i, "t")}*(${lnHorner(g(i, "t2"))}))) AS ${ins(i)._2}")} FROM ${p}_l7)"""
  }

  /** q41's SQL, shared verbatim by the q64 cluster oracle's pair CTE.
    * The query panel bound interpolates from [[operators.Similarity
    * .QueryPanel]] — one definition on both engines (changing the
    * panel size on the Spark side alone can no longer silently desync
    * the oracle). */
  private val Q44Sql =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         n AS (SELECT vec_id, v,
           sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(v, x -> x*x)), (a,b) -> a+b)) AS norm FROM e),
         p AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(1,65), i -> q.v[i]*c.v[i])), (a,b) -> a+b)
             / (q.norm * c.norm) AS cos
           FROM n q JOIN n c ON q.vec_id <> c.vec_id
           WHERE q.vec_id < ${operators.Similarity.QueryPanel}),
         r AS (SELECT qid, nid, cos,
           CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS INT) AS rk
           FROM p)
         SELECT qid, nid, cos, rk FROM r WHERE rk <= 5 ORDER BY qid, rk"""

  private val Q95Sql =
    """WITH toks AS (SELECT source, string_split(lower(trim(text)), ' ') AS w
           FROM documents),
         raw AS (SELECT source, unnest(list_distinct(list_transform(
             range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
           FROM toks WHERE len(w) >= 3),
         grams AS (SELECT DISTINCT source, g FROM raw),
         sizes AS (SELECT source, COUNT(*) AS n FROM grams GROUP BY source),
         cm AS (SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS common
           FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source
           GROUP BY a.source, b.source)
         SELECT source_a, source_b, common, sa.n AS na, sb.n AS nb,
           CAST(common AS DOUBLE)/(sa.n + sb.n - common) AS jaccard
         FROM cm JOIN sizes sa ON sa.source = source_a
                 JOIN sizes sb ON sb.source = source_b
         ORDER BY source_a, source_b"""

  private val Q41Sql =
    """WITH toks AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents),
       grams AS (SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
         FROM toks WHERE len(w) >= 3),
       sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
       cm AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
         FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
         GROUP BY a.doc_id, b.doc_id)
       SELECT doc_a, doc_b, common, sa.n AS na, sb.n AS nb,
         CAST(common AS DOUBLE)/(sa.n + sb.n - common) AS jaccard
       FROM cm JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
       WHERE CAST(common AS DOUBLE)/(sa.n + sb.n - common) > 0.8
       ORDER BY doc_a, doc_b"""
  /** q162's SQL, shared verbatim by the q184 sketch-eval oracle. */
  private val MinimizerSql =
    s"""WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS wd
           FROM documents WHERE len(string_split(lower(trim(text)), ' ')) >= 3),
         g AS (SELECT doc_id, unnest(list_transform(range(1, len(wd)-1),
             i -> struct_pack(pos := i - 1,
               g := wd[i] || ' ' || wd[i+1] || ' ' || wd[i+2]))) AS s
           FROM t),
         ph AS (SELECT doc_id,
             struct_extract(s, 'pos') AS pos,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(struct_extract(s, 'g'), ''),
                 c -> CAST(unicode(c) AS BIGINT))),
               (h, c) -> (h*31 + c) % 1000000007) AS h
           FROM g),
         mz AS (SELECT DISTINCT doc_id,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND ${MinimizerW - 1} FOLLOWING) AS mz
           FROM ph),
         sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_min
           FROM mz GROUP BY doc_id),
         pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS shared
           FROM mz a JOIN mz b ON a.mz = b.mz AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id)
         SELECT doc_a, doc_b, shared, sa.n_min AS n_a, sb.n_min AS n_b,
           CAST(shared AS DOUBLE) / CAST(least(sa.n_min, sb.n_min) AS DOUBLE)
             AS containment
         FROM pairs JOIN sizes sa ON sa.doc_id = doc_a
           JOIN sizes sb ON sb.doc_id = doc_b
         WHERE shared >= $MinimizerShared
         ORDER BY doc_a, doc_b"""

  private val Q46Sql =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       n AS (SELECT vec_id, v,
         sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(v, x -> x*x)), (a,b) -> a+b)) AS norm FROM e),
       p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(range(1,65), i -> a.v[i]*b.v[i])), (x,y) -> x+y)
           / (a.norm * b.norm) AS cos
         FROM n a JOIN n b ON a.vec_id < b.vec_id)
       SELECT id_a, id_b, cos FROM p WHERE cos > 0.4 ORDER BY id_a, id_b"""

  private val disc =
    "CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"

  val sql: Map[String, String] = Map(
    "q01_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         ${msum("l_quantity")} AS sum_qty,
         ${msum("l_extendedprice")} AS sum_base_price,
         CAST(ROUND(SUM($disc),2) AS DOUBLE) AS sum_disc_price,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)/COUNT(*) AS avg_qty,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
         FROM lineitem WHERE l_quantity >= 45 AND l_discount > 0.05
         ORDER BY l_orderkey, l_linenumber""",

    "q03_join_agg" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         CAST(ROUND(SUM($disc),2) AS DOUBLE) AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
           AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 20""",

    "q04_semijoin" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
           AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q05_multijoin" ->
      s"""SELECT n_name, CAST(ROUND(SUM($disc),2) AS DOUBLE) AS revenue
         FROM region, nation, customer, orders, lineitem, supplier
         WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey
           AND c_nationkey = n_nationkey AND o_custkey = c_custkey
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
           AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
           AND s_nationkey = c_nationkey
         GROUP BY n_name ORDER BY revenue DESC, n_name""",

    "q06_selective_agg" ->
      """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))),2) AS DOUBLE) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
           AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""",

    "q07_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",

    "q08_outer_join" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
           SELECT c_custkey, COUNT(o_orderkey) AS c_count
           FROM customer LEFT OUTER JOIN orders
             ON c_custkey = o_custkey AND o_orderstatus <> 'F'
           GROUP BY c_custkey)
         GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",

    "q09_distinct" ->
      """SELECT l_returnflag,
         COUNT(DISTINCT l_partkey) AS distinct_parts,
         COUNT(DISTINCT l_suppkey) AS distinct_supps,
         COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q10_topk" ->
      """SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""",

    "q11_having" ->
      s"""SELECT l_suppkey, total_qty FROM (
           SELECT l_suppkey, ${msum("l_quantity")} AS total_qty
           FROM lineitem GROUP BY l_suppkey)
         WHERE total_qty > 15000.0 ORDER BY l_suppkey""",

    "q12_case_pivot" ->
      """SELECT l_linestatus,
         CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
         CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
         FROM orders JOIN lineitem
           ON o_orderkey = l_orderkey AND l_shipdate >= o_orderdate
         GROUP BY l_linestatus ORDER BY l_linestatus""",

    "q13_scalar_subquery" ->
      s"""SELECT ${msum("l_extendedprice")} AS total_small_qty_price
         FROM lineitem JOIN part ON p_partkey = l_partkey
         JOIN (SELECT l_partkey AS t_partkey,
                      CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)/COUNT(*)*0.2 AS qty_threshold
               FROM lineitem GROUP BY l_partkey) t ON l_partkey = t_partkey
         WHERE p_brand = 'Brand#23' AND l_quantity < qty_threshold""",

    "q14_in_subquery" ->
      s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
         ${msum("l_quantity")} AS total_qty
         FROM customer, orders, lineitem
         WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
                              HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 120)
           AND c_custkey = o_custkey AND o_orderkey = l_orderkey
         GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",

    "q15_union" ->
      s"""SELECT src, COUNT(*) AS n, ${msum("v")} AS total FROM (
           SELECT 'order' AS src, o_totalprice AS v FROM orders WHERE o_orderstatus = 'O'
           UNION ALL
           SELECT 'line' AS src, l_extendedprice AS v FROM lineitem WHERE l_returnflag = 'R')
         GROUP BY src ORDER BY src""",

    "q16_intersect_except" ->
      """SELECT 'both' AS tag, COUNT(*) AS n FROM (
           SELECT l_partkey FROM lineitem WHERE l_returnflag='R'
           INTERSECT
           SELECT l_partkey FROM lineitem WHERE l_returnflag='A')
         UNION ALL
         SELECT 'only_r' AS tag, COUNT(*) AS n FROM (
           SELECT l_partkey FROM lineitem WHERE l_returnflag='R'
           EXCEPT
           SELECT l_partkey FROM lineitem WHERE l_returnflag='A')
         ORDER BY tag""",

    "q17_rollup" ->
      s"""SELECT n_name, c_mktsegment, COUNT(*) AS n_cust, ${msum("c_acctbal")} AS total_bal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY ROLLUP(n_name, c_mktsegment)
         ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""",

    "q18_cube" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ${msum("l_quantity")} AS total_qty
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "q19_grouping_sets" ->
      s"""SELECT o_orderstatus, o_orderpriority,
         CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
         CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
         COUNT(*) AS n, ${msum("o_totalprice")} AS total
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, g_status, g_prio""",

    "q20_cte_selfjoin" ->
      """WITH s AS (SELECT s_suppkey, s_nationkey FROM supplier)
         SELECT a.s_suppkey AS s1, b.s_suppkey AS s2, n_name
         FROM s a JOIN s b ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
         JOIN nation ON a.s_nationkey = n_nationkey
         ORDER BY s1, s2""",

    "q21_string_funcs" ->
      """SELECT p_partkey, UPPER(p_name) AS uname, SUBSTRING(p_name, 1, 4) AS pfx,
         CAST(LENGTH(p_name) AS BIGINT) AS name_len,
         CONCAT_WS('/', p_brand, p_type) AS brand_type,
         REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS devoweled
         FROM part WHERE REGEXP_MATCHES(p_name, '(gold|blue)')
         ORDER BY p_partkey""",

    "q22_date_funcs" ->
      s"""SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
         CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
         COUNT(*) AS n, ${msum("o_totalprice")} AS total
         FROM orders GROUP BY yr, mo ORDER BY yr, mo""",

    "q23_percentile" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty,
         COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q25_sql_interface" ->
      s"""WITH revenue AS (
           SELECT l_suppkey AS supplier_no,
             CAST(ROUND(SUM($disc),2) AS DOUBLE) AS total_revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, total_revenue
         FROM supplier JOIN revenue ON s_suppkey = supplier_no
         WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
         ORDER BY s_suppkey""",

    "q26_corr_exists" ->
      s"""WITH na AS (SELECT c_nationkey AS n_key,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)/COUNT(*) AS avg_bal
           FROM customer GROUP BY c_nationkey)
         SELECT c_nationkey, COUNT(*) AS n_cust, ${msum("c_acctbal")} AS total_bal
         FROM customer JOIN na ON c_nationkey = n_key
         WHERE c_acctbal > avg_bal
           AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY c_nationkey ORDER BY c_nationkey""",

    "q27_window_range" ->
      """SELECT o_custkey, o_orderkey,
         CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderkey
           RANGE BETWEEN 50 PRECEDING AND CURRENT ROW),2) AS DOUBLE) AS range_sum
         FROM orders ORDER BY o_custkey, o_orderkey""",

    "q28_first_last" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
         FIRST_VALUE(o_totalprice) OVER w AS cheapest,
         LAST_VALUE(o_totalprice)  OVER w AS priciest,
         NTH_VALUE(o_totalprice, 2) OVER w AS second_cheapest
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY o_custkey, o_orderkey""",

    "q29_pivot" ->
      """SELECT l_linestatus,
         CAST(ROUND(SUM(CASE WHEN l_returnflag='A' THEN CAST(l_quantity AS DECIMAL(18,4)) END),2) AS DOUBLE) AS A,
         CAST(ROUND(SUM(CASE WHEN l_returnflag='N' THEN CAST(l_quantity AS DECIMAL(18,4)) END),2) AS DOUBLE) AS N,
         CAST(ROUND(SUM(CASE WHEN l_returnflag='R' THEN CAST(l_quantity AS DECIMAL(18,4)) END),2) AS DOUBLE) AS R
         FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",

    "q30_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk, drnk, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(RANK()       OVER w AS INT) AS rnk,
             CAST(DENSE_RANK() OVER w AS INT) AS drnk,
             CAST(ROW_NUMBER() OVER w AS INT) AS rn
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey))
         WHERE rnk <= 3 ORDER BY o_custkey, rnk, o_orderkey""",

    "q31_window_running" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))) OVER (
           PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
           ROWS UNBOUNDED PRECEDING),2) AS DOUBLE) AS running_value
         FROM events ORDER BY user_id, ts, event_id""",

    "q32_window_lag" ->
      """SELECT event_id, user_id,
         epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(LAG(CAST(ts AS TIMESTAMP), 1) OVER (
           PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)) AS gap_us
         FROM events ORDER BY user_id, event_id""",

    "q33_window_ntile" ->
      s"""SELECT decile, COUNT(*) AS n, ${msum("o_totalprice")} AS total FROM (
           SELECT o_totalprice,
             CAST(NTILE(10) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS decile
           FROM orders)
         GROUP BY decile ORDER BY decile""",

    "q34_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
         f AS (SELECT user_id, event_id, ts,
           CASE WHEN LAG(ts,1) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(LAG(ts,1) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS is_new
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT user_id, event_id,
           CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
         FROM f ORDER BY user_id, event_id""",

    "q35_session_stats" ->
      """WITH e AS (SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events),
         f AS (SELECT user_id, event_id, value, ts,
           CASE WHEN LAG(ts,1) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(LAG(ts,1) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS is_new
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (SELECT user_id, event_id, value, ts,
           CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
           FROM f)
         SELECT user_id, session_seq, COUNT(*) AS n_events,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))),2) AS DOUBLE) AS total_value
         FROM s GROUP BY user_id, session_seq ORDER BY user_id, session_seq""",

    "q36_event_funnel" ->
      """SELECT COUNT(*) AS converted_users FROM (
           SELECT user_id,
             MIN(CASE WHEN event_type='signup'   THEN CAST(ts AS TIMESTAMP) END) AS fs,
             MAX(CASE WHEN event_type='purchase' THEN CAST(ts AS TIMESTAMP) END) AS lp
           FROM events GROUP BY user_id)
         WHERE fs IS NOT NULL AND lp > fs""",

    "q37_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
         COUNT(*) AS n FROM events GROUP BY k_mod ORDER BY k_mod""",

    "q38_time_window" ->
      s"""SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS win_start,
         event_type, COUNT(*) AS n, ${msum("value")} AS total_value
         FROM events GROUP BY win_start, event_type
         ORDER BY win_start, event_type""",

    "q39_session_window" ->
      """WITH e AS (SELECT user_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events),
         f AS (SELECT user_id, value, ts,
           CASE WHEN LAG(ts,1) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(LAG(ts,1) OVER w) >= 1800000000
                THEN 1 ELSE 0 END AS is_new
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         s AS (SELECT user_id, value, ts,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
             ROWS UNBOUNDED PRECEDING) AS session_seq
           FROM f)
         SELECT user_id, MIN(ts) AS s_start, COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))),2) AS DOUBLE) AS total_value
         FROM s GROUP BY user_id, session_seq ORDER BY user_id, s_start""",

    "q56_native_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders)
         WHERE rn <= 3 ORDER BY o_custkey, o_totalprice DESC, o_orderkey""",

    "q60_asof_join" ->
      """WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
         t AS (SELECT user_id, event_id, event_type, ts,
           CASE WHEN event_type = 'view' THEN ts END AS view_ts FROM e),
         f AS (SELECT user_id, event_id, event_type, ts,
           LAST_VALUE(view_ts IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS asof_view_ts
           FROM t)
         SELECT user_id, event_id, ts AS buy_ts, asof_view_ts
         FROM f WHERE event_type = 'purchase'
         ORDER BY user_id, event_id""",

    "q61_interval_join" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
         v AS (SELECT user_id, ts AS view_ts FROM e WHERE event_type = 'view'),
         b AS (SELECT user_id AS buy_user, ts AS buy_ts FROM e WHERE event_type = 'purchase')
         SELECT user_id, view_ts, buy_ts
         FROM v JOIN b ON user_id = buy_user
           AND buy_ts >= view_ts AND buy_ts <= view_ts + INTERVAL 1 HOUR
         ORDER BY user_id, view_ts, buy_ts""",

    "q66_json_struct" ->
      """SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
         COUNT(CAST(json_extract_string(props, '$.k') AS INT)) AS k_present
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q40_dedup_exact" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
         FROM documents GROUP BY lower(trim(text)) ORDER BY keep_id""",

    "q41_dedup_ngram_jaccard" -> Q41Sql,

    // same shingle construction as q41, aggregated per SOURCE; exact
    // long counts, one double divide (§6 single-divide discipline)
    // mirrors q114's two explicit aggregation stages (per-(span,doc)
    // occurrences, then the per-span rollup) so n_occ stays BIGINT on
    // both engines — DuckDB's bare SUM would widen to HUGEINT
    "q114_repeated_spans" ->
      s"""WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
           FROM documents),
         pos AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - ${SpanK - 1})) AS i
           FROM t WHERE len(w) >= $SpanK),
         wins AS (SELECT doc_id, array_to_string(w[i:i+${SpanK - 1}], ' ') AS span FROM pos),
         perdoc AS (SELECT span, doc_id, COUNT(*) AS occ
           FROM wins GROUP BY span, doc_id)
         SELECT span, COUNT(*) AS n_docs, CAST(SUM(occ) AS BIGINT) AS n_occ
         FROM perdoc GROUP BY span HAVING COUNT(*) >= 2
         ORDER BY n_occ DESC, span LIMIT 50""",

    // q115 mirrors q114's window algebra plus a per-span doc_count
    // window; fractions divide two exactly-representable counts, so
    // the double is bit-identical on both engines
    "q115_span_fraction" ->
      s"""WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
           FROM documents),
         pos AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - ${SpanK - 1})) AS i
           FROM t WHERE len(w) >= $SpanK),
         wins AS (SELECT doc_id, array_to_string(w[i:i+${SpanK - 1}], ' ') AS span FROM pos),
         perdoc AS (SELECT span, doc_id, COUNT(*) AS occ
           FROM wins GROUP BY span, doc_id),
         spanstats AS (SELECT doc_id, occ,
             COUNT(*) OVER (PARTITION BY span) AS n_docs FROM perdoc)
         SELECT doc_id,
           CAST(SUM(occ) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN n_docs >= 2 THEN occ ELSE 0 END) AS BIGINT) AS n_repeated,
           CAST(SUM(CASE WHEN n_docs >= 2 THEN occ ELSE 0 END) AS DOUBLE)
             / CAST(SUM(occ) AS DOUBLE) AS frac_repeated
         FROM spanstats GROUP BY doc_id ORDER BY doc_id""",

    // n^α = portable-exp(α · portable-ln(n)); Σ n_s^α folds in source
    // order; keep via the q91 Knuth hash against floor(rate·10^6)
    "q120_temperature_mix" ->
      s"""WITH counts AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS src_docs
           FROM documents GROUP BY source),
         ${lnChain("lnsrc", "counts", Seq("source", "src_docs"),
            Seq("CAST(src_docs AS DOUBLE)" -> "lnv"))},
         pre AS (SELECT source, src_docs, $MixAlpha * lnv AS ax FROM lnsrc),
         ${expChain("powed", "pre", Seq("source", "src_docs"),
            Seq("ax" -> "w"))},
         tot AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(list_sort(list(struct_pack(source := source, w := w))),
               s -> struct_extract(s, 'w'))), (a, b) -> a + b) AS tot
           FROM powed),
         rates AS (SELECT source, src_docs, w / t.tot AS mix_weight,
             least(1.0, $MixBudget.0 * (w / t.tot) / CAST(src_docs AS DOUBLE)) AS rate,
             CAST(floor(least(1.0, $MixBudget.0 * (w / t.tot) / CAST(src_docs AS DOUBLE))
               * 1000000.0) AS BIGINT) AS thresh
           FROM powed CROSS JOIN tot t)
         SELECT d.doc_id, d.source, r.src_docs, r.mix_weight, r.rate,
           ((((d.doc_id % 1000000007) * 2654435761) % 1000000007 + $MixSalt)
             % 1000000) < r.thresh AS keep
         FROM documents d JOIN rates r ON d.source = r.source
         ORDER BY d.doc_id""",

    // per-token terms floor-scale to exact LONGs (entropy ×1e12, Zipf
    // moments ×1e8) so the per-source sums are order-independent
    // integer arithmetic — no ordered fold needed; ln via the portable
    // chain, finals are one shared double-op sequence
    "q121_source_diversity" ->
      s"""WITH tf AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM (SELECT source, unnest(string_split(lower(trim(text)), ' ')) AS tok
                 FROM documents)
           GROUP BY source, tok),
         st AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS tot,
             CAST(COUNT(*) AS BIGINT) AS vocab FROM tf GROUP BY source),
         ranked AS (SELECT f.source, f.cnt, s.tot, s.vocab,
             CAST(row_number() OVER (PARTITION BY f.source
               ORDER BY f.cnt DESC, f.tok) AS BIGINT) AS rnk,
             CAST(f.cnt AS DOUBLE) / CAST(s.tot AS DOUBLE) AS p
           FROM tf f JOIN st s ON f.source = s.source),
         ${lnChain("lns", "ranked", Seq("source", "tot", "vocab", "p"),
            Seq("p" -> "lnp", "CAST(rnk AS DOUBLE)" -> "lnr",
              "CAST(cnt AS DOUBLE)" -> "lny"))},
         terms AS (SELECT source, tot, vocab,
             CAST(floor(-(p * lnp) * 1.0e12) AS BIGINT) AS e12,
             CAST(floor(lnr * 1.0e8) AS BIGINT) AS x8,
             CAST(floor(lny * 1.0e8) AS BIGINT) AS y8,
             CAST(floor(lnr * lny * 1.0e8) AS BIGINT) AS xy8,
             CAST(floor(lnr * lnr * 1.0e8) AS BIGINT) AS xx8
           FROM lns),
         sums AS (SELECT source, tot, vocab,
             CAST(SUM(e12) AS BIGINT) AS se, CAST(SUM(x8) AS BIGINT) AS sx,
             CAST(SUM(y8) AS BIGINT) AS sy, CAST(SUM(xy8) AS BIGINT) AS sxy,
             CAST(SUM(xx8) AS BIGINT) AS sxx
           FROM terms GROUP BY source, tot, vocab),
         fin AS (SELECT source, tot, vocab, CAST(vocab AS DOUBLE) AS vd,
             CAST(sx AS DOUBLE) / 1.0e8 AS sxd,
             CAST(sy AS DOUBLE) / 1.0e8 AS syd,
             CAST(sxy AS DOUBLE) / 1.0e8 AS sxyd,
             CAST(sxx AS DOUBLE) / 1.0e8 AS sxxd, se
           FROM sums)
         SELECT source, tot AS n_tokens, vocab,
           vd / CAST(tot AS DOUBLE) AS ttr,
           CAST(se AS DOUBLE) / 1.0e12 AS entropy,
           CASE WHEN vd * sxxd - sxd * sxd <> 0.0
             THEN (vd * sxyd - sxd * syd) / (vd * sxxd - sxd * sxd)
             ELSE NULL END AS zipf_slope
         FROM fin ORDER BY source""",

    // exact-dup collapse (min-id rep per identical normalized text),
    // then q41's prefix machinery verbatim — df window, (df, g) rank,
    // n − ceil(t·n) + 1 prefix — rolled up per blocking shingle; the
    // 0.8 casts to DOUBLE so ceil sees the same IEEE product as Spark
    "q123_prefix_skew" ->
      """WITH m AS (SELECT doc_id, text,
           MIN(doc_id) OVER (PARTITION BY lower(trim(text))) AS rep
           FROM documents),
         reps AS (SELECT doc_id, text FROM m WHERE doc_id = rep),
         toks AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM reps),
         grams AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
           FROM toks WHERE len(w) >= 3),
         win AS (SELECT doc_id, g,
             COUNT(*) OVER (PARTITION BY g) AS df,
             COUNT(*) OVER (PARTITION BY doc_id) AS n
           FROM grams),
         ranked AS (SELECT doc_id, g, n,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY df, g) AS pos
           FROM win),
         prefix AS (SELECT doc_id, g FROM ranked
           WHERE pos <= n - CEIL(CAST(0.8 AS DOUBLE) * n) + 1),
         blocks AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS block_docs
           FROM prefix GROUP BY g),
         tot AS (SELECT CAST(SUM(block_docs) AS BIGINT) AS total_rows FROM blocks)
         SELECT g, block_docs,
           CAST(block_docs AS DOUBLE) / total_rows AS share,
           CAST(block_docs * (block_docs - 1) // 2 AS BIGINT) AS cand_pairs
         FROM blocks CROSS JOIN tot
         ORDER BY block_docs DESC, g LIMIT 10""",

    // all statistics via floor-scaled exact-long sums (q121 idiom):
    // centroid dim sums x1e8, d-squared moments x1e6 — order-independent
    // in both engines, no per-group collect; sqrt is IEEE-exact
    "q122_embed_outliers" ->
      """WITH b AS (SELECT vec_id, label,
           CAST(embedding[1] AS DOUBLE) AS x0, CAST(embedding[2] AS DOUBLE) AS x1,
           CAST(embedding[3] AS DOUBLE) AS x2, CAST(embedding[4] AS DOUBLE) AS x3
           FROM embeddings),
         cent AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
             CAST(SUM(CAST(floor(x0 * 1.0e8) AS BIGINT)) AS BIGINT) AS sx0,
             CAST(SUM(CAST(floor(x1 * 1.0e8) AS BIGINT)) AS BIGINT) AS sx1,
             CAST(SUM(CAST(floor(x2 * 1.0e8) AS BIGINT)) AS BIGINT) AS sx2,
             CAST(SUM(CAST(floor(x3 * 1.0e8) AS BIGINT)) AS BIGINT) AS sx3
           FROM b GROUP BY label),
         cm AS (SELECT label,
             (CAST(sx0 AS DOUBLE) / 1.0e8) / CAST(n_vecs AS DOUBLE) AS m0,
             (CAST(sx1 AS DOUBLE) / 1.0e8) / CAST(n_vecs AS DOUBLE) AS m1,
             (CAST(sx2 AS DOUBLE) / 1.0e8) / CAST(n_vecs AS DOUBLE) AS m2,
             (CAST(sx3 AS DOUBLE) / 1.0e8) / CAST(n_vecs AS DOUBLE) AS m3
           FROM cent),
         scored AS (SELECT b.vec_id, b.label,
             (b.x0 - cm.m0) * (b.x0 - cm.m0) + (b.x1 - cm.m1) * (b.x1 - cm.m1)
               + (b.x2 - cm.m2) * (b.x2 - cm.m2) + (b.x3 - cm.m3) * (b.x3 - cm.m3)
               AS dist2
           FROM b JOIN cm ON b.label = cm.label),
         mo AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(floor(dist2 * 1.0e6) AS BIGINT)) AS BIGINT) AS s1,
             CAST(SUM(CAST(floor(dist2 * dist2 * 1.0e6) AS BIGINT)) AS BIGINT) AS s2
           FROM scored GROUP BY label),
         ms AS (SELECT label, n, s2,
             (CAST(s1 AS DOUBLE) / 1.0e6) / CAST(n AS DOUBLE) AS mu FROM mo),
         mv AS (SELECT label, mu,
             (CAST(s2 AS DOUBLE) / 1.0e6) / CAST(n AS DOUBLE) - mu * mu AS vr
           FROM ms)
         SELECT s.vec_id, s.label, s.dist2,
           CASE WHEN m.vr > 0.0 THEN (s.dist2 - m.mu) / sqrt(m.vr)
             ELSE NULL END AS z,
           CASE WHEN m.vr > 0.0
             THEN (s.dist2 - m.mu) / sqrt(m.vr) > 3.0
             ELSE FALSE END AS is_outlier
         FROM scored s JOIN mv m ON s.label = m.label
         ORDER BY s.vec_id""",

    // token coverage via the bounded ROWS window (positions are dense,
    // so a k-1-row frame == a k-position frame); rebuild preserves the
    // normalized token stream exactly (empty tokens round-trip)
    "q119_span_scrub" ->
      s"""WITH d AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents),
         starts AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS s,
             array_to_string(w[CAST(i AS INT):CAST(i AS INT)+${SpanK - 1}], ' ') AS span
           FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - ${SpanK - 1})) AS i
                 FROM d WHERE len(w) >= $SpanK)),
         rep AS (SELECT span FROM starts GROUP BY span
                 HAVING COUNT(DISTINCT doc_id) >= 2),
         marked AS (SELECT st.doc_id, st.s FROM starts st JOIN rep USING (span)),
         toks AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, w[CAST(i AS INT)] AS tok
           FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i FROM d)),
         flags AS (SELECT t.doc_id, t.pos, t.tok,
             CASE WHEN m.s IS NULL THEN 0 ELSE 1 END AS rep
           FROM toks t LEFT JOIN marked m ON t.doc_id = m.doc_id AND t.pos = m.s),
         cov AS (SELECT doc_id, pos, tok,
             MAX(rep) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN ${SpanK - 1} PRECEDING AND CURRENT ROW) AS covered
           FROM flags),
         kept AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
             string_agg(tok, ' ' ORDER BY pos) AS clean_text
           FROM cov WHERE covered = 0 GROUP BY doc_id),
         nt AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM d)
         SELECT nt.doc_id, nt.n_tokens,
           CAST(nt.n_tokens - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed,
           CAST(nt.n_tokens - COALESCE(k.n_kept, 0) AS DOUBLE) / nt.n_tokens
             AS removed_frac,
           COALESCE(k.clean_text, '') AS clean_text
         FROM nt LEFT JOIN kept k ON nt.doc_id = k.doc_id ORDER BY nt.doc_id""",

    // qt VALUES mirrors SparkEntry's literal 3-query batch verbatim;
    // per-query contributions fold in query-position order (q86 idiom);
    // idf ln via the portable chain (bitwise == Spark's PortableLn)
    "q116_bm25_search" ->
      s"""WITH $bm25RankedCtes
         SELECT query_id, "rank", doc_id, n_hit, score FROM bm25ranked
         WHERE "rank" <= 10 ORDER BY query_id, "rank"""",

    // hash twin = q100's (h*31+c mod 1e9+7) chain, then mod 64 buckets;
    // per-doc fold runs in bucket order; top-100 keep set via LIMIT
    "q117_dsir" ->
      s"""WITH toks AS (SELECT doc_id, source,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(tok, ''),
                 c -> CAST(unicode(c) AS BIGINT))),
               (h, c) -> (h*31 + c) % 1000000007) % $DsirBuckets AS b
           FROM (SELECT doc_id, source,
               unnest(string_split(lower(trim(text)), ' ')) AS tok FROM documents)),
         raw AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM toks GROUP BY b),
         tgt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS ct FROM toks
           WHERE source = '$DsirTargetSource' GROUP BY b),
         rt AS (SELECT CAST(COUNT(*) AS BIGINT) AS r_total FROM toks),
         tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t_total FROM toks WHERE source = '$DsirTargetSource'),
         prelr AS (SELECT raw.b, COALESCE(tgt.ct, 0) AS ct, raw.cr,
             tt.t_total, rt.r_total
           FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN rt CROSS JOIN tt),
         ${lnChain("lnlr", "prelr", Seq("b"), Seq(
           s"(CAST(ct AS DOUBLE) + 1.0) / (CAST(t_total AS DOUBLE) + $DsirBuckets.0)" -> "lt",
           s"(CAST(cr AS DOUBLE) + 1.0) / (CAST(r_total AS DOUBLE) + $DsirBuckets.0)" -> "lraw"))},
         lr AS (SELECT b, lt - lraw AS lr FROM lnlr),
         db AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY doc_id, b),
         per AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens,
             list_sort(list(struct_pack(b := db.b, c := CAST(db.n AS DOUBLE) * lr.lr))) AS xs
           FROM db JOIN lr ON db.b = lr.b GROUP BY doc_id),
         folded AS (SELECT doc_id, n_tokens,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(xs, s -> struct_extract(s, 'c'))), (a, x) -> a + x) AS weight
           FROM per),
         top AS (SELECT doc_id FROM folded ORDER BY weight DESC, doc_id LIMIT $DsirTopN)
         SELECT f.doc_id, f.n_tokens, f.weight, (t.doc_id IS NOT NULL) AS keep
         FROM folded f LEFT JOIN top t ON f.doc_id = t.doc_id ORDER BY f.doc_id""",

    // q86's per-doc logprob verbatim, then per-language tertile CUTOFF
    // scores (quantile_cont == Spark exact `percentile`, §6) assigned by
    // floor-scaled comparison — mirrors q118's broadcast-cutoff plan
    "q118_perplexity_buckets" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok FROM documents),
         td AS (SELECT doc_id, tok, COUNT(*) AS n FROM toks GROUP BY doc_id, tok),
         ct AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
         tt AS (SELECT COUNT(*) AS t FROM toks),
         terms0 AS (SELECT td.doc_id, td.tok, td.n,
             CAST(ct.c AS DOUBLE) / tt.t AS pr
           FROM td JOIN ct ON td.tok = ct.tok CROSS JOIN tt),
         ${lnChain("lnp", "terms0", Seq("doc_id", "tok", "n"), Seq("pr" -> "lnpr"))},
         terms AS (SELECT doc_id, tok, n, n * lnpr AS lp FROM lnp),
         per AS (SELECT doc_id,
             CAST(SUM(n) AS BIGINT) AS n_tokens,
             list_sort(list(struct_pack(tok := tok, lp := lp))) AS xs
           FROM terms GROUP BY doc_id),
         folded AS (SELECT doc_id, n_tokens,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(xs, s -> struct_extract(s, 'lp'))), (a, b) -> a + b) AS logp
           FROM per),
         scored AS (SELECT f.doc_id, d.lang, f.n_tokens,
             f.logp / f.n_tokens AS avg_logp
           FROM folded f JOIN documents d ON f.doc_id = d.doc_id),
         cuts AS (SELECT lang,
             quantile_cont(avg_logp, CAST(1 AS DOUBLE)/3) AS c_lo,
             quantile_cont(avg_logp, CAST(2 AS DOUBLE)/3) AS c_hi
           FROM scored GROUP BY lang),
         binned AS (SELECT s.doc_id, s.lang, s.n_tokens, s.avg_logp,
             CASE WHEN CAST(floor(s.avg_logp * 1.0e8) AS BIGINT)
                    >= CAST(floor(c.c_hi * 1.0e8) AS BIGINT) THEN 1
                  WHEN CAST(floor(s.avg_logp * 1.0e8) AS BIGINT)
                    >= CAST(floor(c.c_lo * 1.0e8) AS BIGINT) THEN 2
                  ELSE 3 END AS tertile
           FROM scored s JOIN cuts c ON s.lang = c.lang)
         SELECT doc_id, lang, n_tokens, avg_logp, CAST(tertile AS BIGINT) AS tertile,
           CASE WHEN tertile = 1 THEN 'head' WHEN tertile = 2 THEN 'middle'
             ELSE 'tail' END AS bucket
         FROM binned ORDER BY doc_id""",

    "q95_source_overlap" -> Q95Sql,

    // q147's sketch cannot hash-match a portable oracle, but its audit
    // claim can: exact q95 stats + the prediction that every pair's
    // bottom-k estimate lands within 3 sigma (the spark side computes
    // the verdict from the real sketch; the oracle expects TRUE)
    "q147_overlap_sketch" ->
      s"""SELECT source_a, source_b, common, na, nb, jaccard,
           TRUE AS within_3sigma
         FROM ($Q95Sql) ORDER BY source_a, source_b""",

    // q112's banding volume contract, engine-independently: every
    // distinct normalized text with >= 3 tokens emits exactly one
    // banding row per band
    "q112_band_skew" ->
      """WITH reps AS (SELECT DISTINCT lower(trim(text)) AS t FROM documents),
         sh AS (SELECT COUNT(*) AS n FROM reps
                WHERE len(string_split(t, ' ')) >= 3)
         SELECT CAST(16 AS BIGINT) AS bands,
                CAST(n AS BIGINT) AS n_shingled_reps,
                CAST(16 * n AS BIGINT) AS n_banding_rows,
                TRUE AS volume_ok, TRUE AS share_bounds_ok
         FROM sh""",

    // a clip's synth audio is a pure function of its top-8 token SET
    // ((count desc, token) ranking; voices sum order-insensitively),
    // so the q204 pair count == doc pairs with equal top-8 sets —
    // computable from the token rollup on both engines; the offset/
    // run verdicts are predicted-TRUE (q112Driver pattern)
    "q204_audio_overlap" ->
      """WITH toks AS (SELECT doc_id,
             unnest(string_split(lower(trim(text)), ' ')) AS tok
           FROM documents),
         tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
         rk AS (SELECT doc_id, tok,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, tok) AS rn
           FROM tc),
         sig AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY tok) AS s
           FROM rk WHERE rn <= 8 GROUP BY doc_id),
         g AS (SELECT s, COUNT(*) AS m FROM sig GROUP BY s)
         SELECT CAST(COALESCE(SUM(m * (m - 1) // 2), 0) AS BIGINT) AS n_pairs,
           TRUE AS offsets_zero_ok, TRUE AS full_run_ok
         FROM g""",

    // the scrub partitions each normalized text into kept + cut chars,
    // so length(scrubbed) == n_chars - cut_chars per doc; DuckDB
    // computes n_chars independently and the identities are
    // predicted-TRUE (q112Driver pattern)
    // q206: the q203 length identity in SAMPLES — every synth clip is
    // exactly AudioSamples long, the scrub partitions it into kept +
    // cut samples, and the identities are predicted-TRUE verdicts
    // (q112Driver pattern); the scrubbed audio itself stays
    // Multimodal.q206AudioScrub
    "q206_audio_scrub" ->
      s"""SELECT doc_id,
           CAST(${graft.operators.Multimodal.AudioSamples} AS BIGINT) AS n_samples,
           TRUE AS len_ok, TRUE AS cut_bounds_ok
         FROM documents ORDER BY doc_id""",

    "q203_substr_scrub" ->
      """SELECT doc_id, CAST(length(lower(trim(text))) AS BIGINT) AS n_chars,
           TRUE AS len_ok, TRUE AS cut_bounds_ok
         FROM documents ORDER BY doc_id""",

    // q212: the q206 identity in FRAMES minus the clip-length constant
    // (frame counts derive from a custom checksum DuckDB cannot
    // reproduce): the scrub partitions each clip into kept + cut
    // frames, so the identities are predicted-TRUE verdicts — an
    // interval-walk bug hash-mismatches at the gate
    "q212_video_scrub" ->
      """SELECT doc_id, TRUE AS len_ok, TRUE AS cut_bounds_ok
         FROM documents ORDER BY doc_id""",

    // q209: same aggregate over the ORIGINAL parquet the Spark side
    // computes over its partitioned-ORC copy — equality proves the ORC
    // round-trip lossless (types, nulls, multi-byte text)
    "q209_orc_roundtrip" ->
      """SELECT lang, source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(length(text)) AS BIGINT) AS sum_text_len,
           min(doc_id) AS min_id,
           max(doc_id) AS max_id
         FROM documents
         WHERE n_chars > 200
         GROUP BY lang, source
         ORDER BY lang, source""",

    // q213: the q209 oracle verbatim — the Spark side computes the
    // same aggregate over its lang-partitioned STORED AS AVRO copy
    // (s30), so equality proves the Avro SerDe round-trip lossless
    "q213_avro_roundtrip" ->
      """SELECT lang, source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(length(text)) AS BIGINT) AS sum_text_len,
           min(doc_id) AS min_id,
           max(doc_id) AS max_id
         FROM documents
         WHERE n_chars > 200
         GROUP BY lang, source
         ORDER BY lang, source""",

    // winnowChars emits >= 1 fingerprint for every normalized text of
    // >= gram chars, so distinct fingerprinted reps == distinct
    // normalized texts with length >= gram — the independent DuckDB
    // count; the verdict flags are predicted-TRUE (q112Driver pattern).
    // gram/minLen interpolate from the Dedup constants (one definition
    // on both engines)
    "q202_winnow_skew" ->
      s"""WITH reps AS (SELECT DISTINCT lower(trim(text)) AS t FROM documents),
         e AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM reps
               WHERE length(t) >= ${operators.Dedup.SubstrGram})
         SELECT CAST(${operators.Dedup.SubstrGram} AS BIGINT) AS gram,
                CAST(${operators.Dedup.SubstrMinLen} AS BIGINT) AS min_len,
                n AS n_reps_eligible, n AS n_docs_fingerprinted,
                TRUE AS coverage_ok, TRUE AS share_bounds_ok
         FROM e""",

    // same pair set as q41, collapsed to connected components: the
    // recursive transitive closure mirrors graft's iterative min-label
    // propagation exactly (both converge to min id per component)
    "q64_dedup_clusters" ->
      s"""WITH RECURSIVE pairs AS ($Q41Sql),
         e AS (SELECT doc_a AS u, doc_b AS v FROM pairs
               UNION SELECT doc_b, doc_a FROM pairs),
         reach(u, v) AS (
           SELECT u, v FROM e
           UNION
           SELECT r.u, e2.v FROM reach r JOIN e e2 ON r.v = e2.u WHERE e2.v <> r.u)
         SELECT u AS doc_id, LEAST(u, MIN(v)) AS label
         FROM reach GROUP BY u ORDER BY doc_id""",

    "q65_clean_corpus" ->
      s"""WITH RECURSIVE pairs AS ($Q41Sql),
         e AS (SELECT doc_a AS u, doc_b AS v FROM pairs
               UNION SELECT doc_b, doc_a FROM pairs),
         reach(u, v) AS (
           SELECT u, v FROM e
           UNION
           SELECT r.u, e2.v FROM reach r JOIN e e2 ON r.v = e2.u WHERE e2.v <> r.u),
         losers AS (SELECT u AS doc_id FROM reach GROUP BY u
                    HAVING LEAST(u, MIN(v)) <> u),
         norm AS (SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS clean_text,
           CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS BIGINT) AS clean_tokens
           FROM documents),
         keep1 AS (SELECT MIN(doc_id) AS keep_id FROM norm GROUP BY clean_text)
         SELECT doc_id, clean_text, clean_tokens FROM norm
         WHERE doc_id IN (SELECT keep_id FROM keep1)
           AND doc_id NOT IN (SELECT doc_id FROM losers)
           AND clean_tokens >= 5
         ORDER BY doc_id""",

    "q44_ann_cosine_topk" -> Q44Sql,

    // q193's recall numerators are hyperplane/centroid-dependent, but
    // the REPORT's deterministic half is portable: the panel size and
    // truth-pair count come from the oracle-exact q44 plan, and the
    // Similarity.RecallFloors per-method floors become predicted-TRUE
    // verdicts — an index whose recall degrades below its floor is now
    // a hash mismatch, not a silent quality loss. The method list
    // interpolates from RecallFloors (one definition on both engines;
    // r15 extended it to every serving path — six as of r17's hnsw)
    "q193_ann_recall" ->
      s"""WITH topk AS ($Q44Sql),
         t AS (SELECT CAST(COUNT(DISTINCT qid) AS BIGINT) AS n_queries,
                      CAST(COUNT(*) AS BIGINT) AS n_truth FROM topk),
         m AS (SELECT * FROM (VALUES ${operators.Similarity.RecallFloors
             .keys.toSeq.sorted.map(k => s"('$k')").mkString(", ")}) v(method))
         SELECT m.method, n_queries, n_truth, TRUE AS floor_ok FROM m, t
         ORDER BY method""",

    "q82_ann_search_exact" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         n AS (SELECT vec_id, v,
           sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(v, x -> x*x)), (a,b) -> a+b)) AS norm FROM e),
         p AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(1,65), i -> q.v[i]*c.v[i])), (a,b) -> a+b)
             / (q.norm * c.norm) AS cos
           FROM n q JOIN n c ON c.vec_id >= ${operators.Similarity.QueryPanel}
           WHERE q.vec_id < ${operators.Similarity.QueryPanel}),
         r AS (SELECT qid, nid, cos,
           CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS INT) AS rk
           FROM p)
         SELECT qid, nid, cos, rk FROM r WHERE rk <= 5 ORDER BY qid, rk""",

    "q46_embed_dedup" -> Q46Sql,

    // q46's pair set collapsed to connected components — identical
    // recursive transitive closure to the q64 oracle (both converge to
    // min id per component)
    "q96_embed_clusters" ->
      s"""WITH RECURSIVE vpairs AS ($Q46Sql),
         vedges AS (SELECT id_a AS u, id_b AS v FROM vpairs
               UNION SELECT id_b, id_a FROM vpairs),
         reach(u, v) AS (
           SELECT u, v FROM vedges
           UNION
           SELECT r.u, e2.v FROM reach r JOIN vedges e2 ON r.v = e2.u WHERE e2.v <> r.u)
         SELECT u AS vec_id, LEAST(u, MIN(v)) AS label
         FROM reach GROUP BY u ORDER BY vec_id""",

    "q47_langid" ->
      """WITH toks AS (SELECT doc_id, lang, unnest(string_split(lower(trim(text)), ' ')) AS tok FROM documents),
         s AS (SELECT doc_id, lang,
           CAST(SUM(CASE WHEN tok IN ('the','a','order','column','vector') THEN 1 ELSE 0 END) AS BIGINT) AS s_en,
           CAST(SUM(CASE WHEN tok IN ('fast','spark','customer','filter','sort') THEN 1 ELSE 0 END) AS BIGINT) AS s_es,
           CAST(SUM(CASE WHEN tok IN ('agg','table','key','scan','part') THEN 1 ELSE 0 END) AS BIGINT) AS s_de,
           CAST(SUM(CASE WHEN tok IN ('join','window','merge','line','group') THEN 1 ELSE 0 END) AS BIGINT) AS s_fr,
           CAST(SUM(CASE WHEN tok IN ('stream','row','query','batch','data') THEN 1 ELSE 0 END) AS BIGINT) AS s_zh
           FROM toks GROUP BY doc_id, lang)
         SELECT doc_id, lang,
           CASE WHEN s_en>=s_es AND s_en>=s_de AND s_en>=s_fr AND s_en>=s_zh THEN 'en'
                WHEN s_es>=s_en AND s_es>=s_de AND s_es>=s_fr AND s_es>=s_zh THEN 'es'
                WHEN s_de>=s_en AND s_de>=s_es AND s_de>=s_fr AND s_de>=s_zh THEN 'de'
                WHEN s_fr>=s_en AND s_fr>=s_es AND s_fr>=s_de AND s_fr>=s_zh THEN 'fr'
                ELSE 'zh' END AS pred_lang,
           s_en, s_es, s_de, s_fr, s_zh
         FROM s ORDER BY doc_id""",

    "q48_quality_score" ->
      """WITH b AS (SELECT doc_id,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(trim(text), ' '))) AS BIGINT) AS n_distinct,
           CAST(len(list_filter(string_split(trim(text), ' '),
             t -> lower(t) IN ('the','a','and','of','data','row'))) AS BIGINT) AS n_stop
           FROM documents),
         r AS (SELECT *,
           CAST(n_distinct AS DOUBLE)/n_tokens AS ttr,
           least(1.0, CAST(n_tokens AS DOUBLE)/100.0) AS len_score,
           CAST(n_stop AS DOUBLE)/n_tokens AS stop_ratio
           FROM b)
         SELECT doc_id, n_tokens, n_distinct, n_stop, ttr, len_score, stop_ratio,
           ttr*0.4 + len_score*0.3 + stop_ratio*0.3 AS quality
         FROM r ORDER BY doc_id""",

    "q49_token_count" ->
      """SELECT doc_id,
         CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS ws_tokens,
         CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_ish_tokens,
         n_chars,
         CAST(n_chars AS DOUBLE)/CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS chars_per_token
         FROM documents ORDER BY doc_id""",

    "q57_lateral_explode" ->
      """WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ')[1] AS tok
           FROM documents)
         SELECT tok, COUNT(*) AS n_docs FROM t
         GROUP BY tok HAVING COUNT(*) >= 2
         ORDER BY n_docs DESC, tok""",

    "q59_profile_stats" ->
      """SELECT l_returnflag, COUNT(*) AS n,
         MIN(l_extendedprice) AS min_price,
         MAX(l_extendedprice) AS max_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)/COUNT(*) AS mean_price,
         sqrt((CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
               - CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                 * CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*))
              / (COUNT(*) - 1)) AS stddev_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q63_integrity_checks" ->
      """SELECT * FROM (
           SELECT 'dup_custkey' AS check_name, COUNT(*) AS violations FROM (
             SELECT c_custkey FROM customer GROUP BY c_custkey HAVING COUNT(*) > 1)
           UNION ALL
           SELECT 'orphan_orders', COUNT(*) FROM orders
             WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
           UNION ALL
           SELECT 'orphan_lineitems', COUNT(*) FROM lineitem
             WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
           UNION ALL
           SELECT 'neg_quantity', COUNT(*) FROM lineitem WHERE l_quantity < 0
           UNION ALL
           SELECT 'bad_discount', COUNT(*) FROM lineitem
             WHERE l_discount < 0 OR l_discount > 1)
         ORDER BY check_name""",

    "q54_text_normalize" ->
      """SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS clean_text,
         CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS BIGINT) AS clean_tokens
         FROM documents ORDER BY doc_id""",

    "q50_fingerprint" ->
      """SELECT doc_id,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(text, ''), c -> CAST(unicode(c) AS BIGINT))),
           (h, c) -> (h*31 + c) % 1000000007) AS fingerprint
         FROM documents ORDER BY doc_id""",

    // counts from the ORIGINAL text, replacements applied in the same
    // fixed order as the Spark side (email → ip → digit runs)
    "q67_pii_scrub" ->
      """SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT) AS n_emails,
         CAST(len(regexp_extract_all(text, '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ips,
         CAST(len(regexp_extract_all(text, '[0-9]{6,}')) AS BIGINT) AS n_longnums,
         regexp_replace(regexp_replace(regexp_replace(text,
           '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
           '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g'),
           '[0-9]{6,}', '<NUM>', 'g') AS scrubbed
         FROM documents ORDER BY doc_id""",

    "q68_repetition" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok FROM documents),
         wc AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok),
         w AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                 CAST(COUNT(*) AS BIGINT) AS distinct_tokens,
                 CAST(MAX(c) AS BIGINT) AS top_c
               FROM wc GROUP BY doc_id),
         splits AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents),
         bg AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
                  i -> w[i] || ' ' || w[i+1])) AS g
                FROM splits WHERE len(w) >= 2),
         bc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g),
         b AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
                 CAST(COUNT(*) AS BIGINT) AS distinct_bigrams
               FROM bc GROUP BY doc_id)
         SELECT w.doc_id, n_tokens, distinct_tokens,
           CAST(n_tokens - distinct_tokens AS DOUBLE)/n_tokens AS dup_token_frac,
           CAST(top_c AS DOUBLE)/n_tokens AS top_token_share,
           CAST(n_bigrams - distinct_bigrams AS DOUBLE)/n_bigrams AS dup_bigram_frac
         FROM w LEFT JOIN b ON w.doc_id = b.doc_id ORDER BY w.doc_id""",

    // the grams CTEs mirror Q41Sql's shingling (distinct word-3-grams)
    "q69_contamination" ->
      """WITH bt AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
                     FROM documents WHERE source = 'src0'),
         bgrams AS (SELECT DISTINCT unnest(list_distinct(list_transform(
             range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
           FROM bt WHERE len(w) >= 3),
         ct AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
                FROM documents WHERE source <> 'src0'),
         cgrams AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
           FROM ct WHERE len(w) >= 3),
         sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams FROM cgrams GROUP BY doc_id),
         hits AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS hit_grams
                  FROM cgrams JOIN bgrams USING (g) GROUP BY doc_id)
         SELECT s.doc_id, n_grams,
           COALESCE(hit_grams, CAST(0 AS BIGINT)) AS hit_grams,
           CAST(COALESCE(hit_grams, 0) AS DOUBLE)/n_grams AS contamination
         FROM sizes s LEFT JOIN hits h ON s.doc_id = h.doc_id ORDER BY s.doc_id""",

    "q70_mix_stats" ->
      """WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
           FROM documents GROUP BY source),
         tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_sources FROM per)
         SELECT source, n_docs, n_tokens, sum_chars,
           CAST(n_tokens AS DOUBLE)/tot_tokens AS token_share,
           CAST(tot_tokens AS DOUBLE)/(n_sources * n_tokens) AS uniform_weight
         FROM per, tot ORDER BY source""",

    // the salt is an internal rewrite — the oracle is the PLAIN join
    "q71_salted_join" ->
      s"""SELECT s_nationkey, COUNT(*) AS n_items,
         ${msum("l_extendedprice")} AS revenue
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY s_nationkey ORDER BY s_nationkey""",

    // exact decimal moments, ONE double expression (q59 discipline);
    // quantity/discount stay small so int64-backed decimals never
    // overflow in DuckDB
    "q72_corr_moments" ->
      """WITH m AS (SELECT l_returnflag, COUNT(*) AS n,
           SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sx,
           SUM(CAST(l_discount AS DECIMAL(18,4))) AS sy,
           SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS sxy,
           SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS sxx,
           SUM(CAST(l_discount AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS syy
         FROM lineitem GROUP BY l_returnflag),
         m2 AS (SELECT l_returnflag, n,
           CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE) AS num,
           CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) AS dx,
           CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE) AS dy
         FROM m)
         SELECT l_returnflag, n,
           CASE WHEN dx > 0 AND dy > 0 THEN num / (SQRT(dx) * SQRT(dy)) END AS corr_qty_disc
         FROM m2 ORDER BY l_returnflag""",

    "q73_gapfill_locf" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
         hourly AS (SELECT user_id, date_trunc('hour', ts) AS h,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS hour_value
           FROM e GROUP BY user_id, date_trunc('hour', ts)),
         spans AS (SELECT user_id, date_trunc('hour', MIN(ts)) AS h0,
             date_trunc('hour', MAX(ts)) AS h1 FROM e GROUP BY user_id),
         spine AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
           FROM spans)
         SELECT s.user_id, s.h, hour_value,
           last_value(hour_value IGNORE NULLS) OVER (PARTITION BY s.user_id ORDER BY s.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
         FROM spine s LEFT JOIN hourly ON s.user_id = hourly.user_id AND s.h = hourly.h
         ORDER BY s.user_id, s.h""",

    "q74_embed_quantize" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM e),
         sc AS (SELECT vec_id, v,
             CASE WHEN amax > 0.0 THEN amax/127.0 ELSE 1.0 END AS scale FROM s),
         q AS (SELECT vec_id, v, scale,
             list_transform(v, x -> CAST(round(x/scale) AS INT)) AS qv FROM sc)
         SELECT vec_id, scale,
           CAST(list_sum(qv) AS BIGINT) AS qv_sum,
           list_min(qv) AS qv_min,
           list_max(qv) AS qv_max,
           CAST(len(qv) AS INT) AS qv_n,
           sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(1, len(qv)+1),
               i -> (CAST(qv[i] AS DOUBLE)*scale - v[i])*(CAST(qv[i] AS DOUBLE)*scale - v[i]))),
             (a,b) -> a+b) / len(qv)) AS rmse
         FROM q ORDER BY vec_id""",

    "q58_stratified_sample" ->
      """WITH s AS (SELECT o_orderstatus,
           ((o_orderkey % 1000000007) * 2654435761) % 1000000007 AS h FROM orders)
         SELECT o_orderstatus, COUNT(*) AS n_sampled FROM s
         WHERE h < CASE o_orderstatus WHEN 'O' THEN 100000000
                   WHEN 'F' THEN 500000003 ELSE 1000000007 END
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q84_dedup_editdist" ->
      """WITH toks AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents),
         grams AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
           FROM toks WHERE len(w) >= 3),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
         cm AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
           FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id),
         pairs AS (SELECT doc_a, doc_b
           FROM cm JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
           WHERE CAST(common AS DOUBLE)/(sa.n + sb.n - common) > 0.5),
         v AS (SELECT p.doc_a, p.doc_b,
             CAST(levenshtein(da.text, db.text) AS BIGINT) AS dist,
             1.0 - CAST(levenshtein(da.text, db.text) AS DOUBLE)
               / GREATEST(length(da.text), length(db.text)) AS edit_sim
           FROM pairs p
           JOIN documents da ON da.doc_id = p.doc_a
           JOIN documents db ON db.doc_id = p.doc_b)
         SELECT doc_a, doc_b, dist, edit_sim FROM v
         WHERE edit_sim >= 0.8 ORDER BY doc_a, doc_b""",

    "q85_bm25" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok FROM documents),
         dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
         tf AS (SELECT doc_id,
             CAST(SUM(CASE WHEN tok = 'data' THEN 1 ELSE 0 END) AS BIGINT) AS tf0,
             CAST(SUM(CASE WHEN tok = 'spark' THEN 1 ELSE 0 END) AS BIGINT) AS tf1
           FROM toks WHERE tok IN ('data', 'spark') GROUP BY doc_id),
         stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS total_toks FROM dl),
         dfs AS (SELECT CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
             CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1 FROM tf),
         pre AS (SELECT tf.doc_id, CAST(dl.dl AS BIGINT) AS dl, tf.tf0, tf.tf1,
             d.df0, d.df1, s.n_docs, s.total_toks
           FROM tf JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s CROSS JOIN dfs d),
         ${lnChain("lnidf", "pre",
            Seq("doc_id", "dl", "tf0", "tf1", "n_docs", "total_toks"), Seq(
           "(CAST(n_docs AS DOUBLE) - df0 + 0.5) / (df0 + 0.5) + 1.0" -> "idf0",
           "(CAST(n_docs AS DOUBLE) - df1 + 0.5) / (df1 + 0.5) + 1.0" -> "idf1"))},
         scored AS (SELECT doc_id, dl, tf0, tf1,
             (CASE WHEN tf0 > 0 THEN
               idf0 * (CAST(tf0 AS DOUBLE) * 2.2)
                 / (tf0 + 1.2 * (0.25 + 0.75 *
                     (CAST(dl AS DOUBLE) / (CAST(total_toks AS DOUBLE) / n_docs))))
               ELSE 0.0 END)
             + (CASE WHEN tf1 > 0 THEN
               idf1 * (CAST(tf1 AS DOUBLE) * 2.2)
                 / (tf1 + 1.2 * (0.25 + 0.75 *
                     (CAST(dl AS DOUBLE) / (CAST(total_toks AS DOUBLE) / n_docs))))
               ELSE 0.0 END) AS score
           FROM lnidf)
         SELECT doc_id, dl, tf0, tf1, score FROM scored
         ORDER BY score DESC, doc_id LIMIT 50""",

    "q86_unigram_logprob" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok FROM documents),
         td AS (SELECT doc_id, tok, COUNT(*) AS n FROM toks GROUP BY doc_id, tok),
         ct AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
         tt AS (SELECT COUNT(*) AS t FROM toks),
         terms0 AS (SELECT td.doc_id, td.tok, td.n,
             CAST(ct.c AS DOUBLE) / tt.t AS pr
           FROM td JOIN ct ON td.tok = ct.tok CROSS JOIN tt),
         ${lnChain("lnp", "terms0", Seq("doc_id", "tok", "n"), Seq("pr" -> "lnpr"))},
         terms AS (SELECT doc_id, tok, n, n * lnpr AS lp FROM lnp),
         per AS (SELECT doc_id,
             CAST(SUM(n) AS BIGINT) AS n_tokens,
             list_sort(list(struct_pack(tok := tok, lp := lp))) AS xs
           FROM terms GROUP BY doc_id),
         folded AS (SELECT doc_id, n_tokens,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(xs, s -> struct_extract(s, 'lp'))), (a,b) -> a+b) AS logp
           FROM per)
         SELECT doc_id, n_tokens, logp, logp / n_tokens AS avg_logp
         FROM folded ORDER BY doc_id""",

    "q87_chunk_windows" ->
      """WITH d AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents),
         n AS (SELECT doc_id, w, len(w) AS n FROM d),
         k AS (SELECT doc_id, w,
             unnest(range(0, (CASE WHEN n > 64 THEN (n - 64 + 47) // 48 ELSE 0 END) + 1)) AS k
           FROM n)
         SELECT doc_id, k AS chunk_id,
           CAST(len(w[(k*48+1):(k*48+64)]) AS INT) AS chunk_tokens,
           array_to_string(w[(k*48+1):(k*48+64)], ' ') AS chunk_text
         FROM k ORDER BY doc_id, chunk_id""",

    "q88_shuffle_shard" ->
      """WITH h AS (SELECT doc_id,
           (((doc_id + 20260812) % 1000000007) * 2654435761) % 1000000007 AS h
           FROM documents),
         s AS (SELECT doc_id, h, h % 32 AS shard FROM h)
         SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos
         FROM s ORDER BY shard, pos""",

    "q75_vocab_topk" ->
      """SELECT tok, COUNT(*) AS cnt, COUNT(DISTINCT doc_id) AS doc_freq
         FROM (SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok
               FROM documents)
         GROUP BY tok ORDER BY cnt DESC, tok LIMIT 100""",

    "q76_bigram_lm" ->
      """WITH w AS (SELECT string_split(lower(trim(text)), ' ') AS w FROM documents),
         bi AS (SELECT unnest(list_transform(range(1, len(w)),
             i -> struct_pack(w1 := w[i], w2 := w[i+1]))) AS b
           FROM w WHERE len(w) >= 2),
         c AS (SELECT b.w1 AS w1, b.w2 AS w2, COUNT(*) AS c12 FROM bi GROUP BY b.w1, b.w2),
         c2 AS (SELECT w1, w2, c12,
             CAST(SUM(c12) OVER (PARTITION BY w1) AS BIGINT) AS c1 FROM c)
         SELECT w1, w2, c12, c1, CAST(c12 AS DOUBLE) / c1 AS cond_p
         FROM c2 WHERE c12 >= 5
         ORDER BY c12 DESC, w1, w2 LIMIT 100""",

    "q77_pack_buckets" ->
      """WITH d AS (SELECT CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
           FROM documents),
         b AS (SELECT n_tokens,
             CASE WHEN n_tokens < 16 THEN 0 WHEN n_tokens < 32 THEN 16
                  WHEN n_tokens < 64 THEN 32 WHEN n_tokens < 128 THEN 64
                  WHEN n_tokens < 256 THEN 128 WHEN n_tokens < 512 THEN 256
                  ELSE 512 END AS bucket_lo FROM d)
         SELECT CAST(bucket_lo AS BIGINT) AS bucket_lo, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
         FROM b GROUP BY bucket_lo ORDER BY bucket_lo""",

    "q78_funnel3" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
         s AS (SELECT user_id, MIN(ts) AS ts1 FROM e WHERE event_type = 'signup' GROUP BY user_id),
         c AS (SELECT e.user_id, MIN(e.ts) AS ts2 FROM e JOIN s ON e.user_id = s.user_id
               WHERE e.event_type = 'click' AND e.ts > s.ts1 GROUP BY e.user_id),
         p AS (SELECT e.user_id, MIN(e.ts) AS ts3 FROM e JOIN c ON e.user_id = c.user_id
               WHERE e.event_type = 'purchase' AND e.ts > c.ts2 GROUP BY e.user_id)
         SELECT (SELECT COUNT(*) FROM s) AS n_signup,
                (SELECT COUNT(*) FROM c) AS n_click,
                (SELECT COUNT(*) FROM p) AS n_purchase,
                CASE WHEN (SELECT COUNT(*) FROM s) > 0
                  THEN CAST((SELECT COUNT(*) FROM c) AS DOUBLE) / (SELECT COUNT(*) FROM s) END AS rate_click,
                CASE WHEN (SELECT COUNT(*) FROM c) > 0
                  THEN CAST((SELECT COUNT(*) FROM p) AS DOUBLE) / (SELECT COUNT(*) FROM c) END AS rate_purchase""",

    "q81_skew_report" ->
      """WITH k AS (SELECT l_suppkey AS key, COUNT(*) AS n_rows
           FROM lineitem GROUP BY l_suppkey),
         t AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total_rows FROM k)
         SELECT key, n_rows, CAST(n_rows AS DOUBLE)/total_rows AS share
         FROM k, t ORDER BY n_rows DESC, key LIMIT 10""",

    // identical Knuth-hash ordering in both engines → identical sample
    "q80_per_key_sample" ->
      """WITH s AS (SELECT source, doc_id,
           ((doc_id % 1000000007) * 2654435761) % 1000000007 AS skey FROM documents),
         r AS (SELECT source, doc_id,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY skey, doc_id) AS rn
           FROM s)
         SELECT source, doc_id, rn FROM r WHERE rn <= 3
         ORDER BY source, rn""",

    // media payload = UTF-8 bytes of text (the mediaTable stand-in);
    // md5 of a varchar hashes its UTF-8 bytes in both engines
    "q79_binary_dedup" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_count,
         CAST(MIN(octet_length(encode(text))) AS BIGINT) AS payload_bytes
         FROM documents GROUP BY md5(text) ORDER BY keep_id""",

    // smoothed idf ln((N+1)/(df+1))+1 via the portable-ln chain (§6)
    // over the live range (§6, probe-verified with q85/q86)
    "q89_tfidf" ->
      s"""WITH td AS (SELECT doc_id, tok, COUNT(*) AS tf
           FROM (SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok
                 FROM documents)
           GROUP BY doc_id, tok),
         dfr AS (SELECT tok, COUNT(*) AS df FROM td GROUP BY tok),
         nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM td),
         pre AS (SELECT td.doc_id, td.tok, td.tf, dfr.df, n.n_docs
           FROM td JOIN dfr ON td.tok = dfr.tok CROSS JOIN nd n),
         ${lnChain("lnidf", "pre", Seq("doc_id", "tok", "tf", "df"), Seq(
           "(CAST(n_docs AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0)" -> "lidf"))},
         scored AS (SELECT doc_id, tok, tf, df,
             CAST(tf AS DOUBLE) * (lidf + 1.0) AS score
           FROM lnidf),
         r AS (SELECT doc_id, tok, tf, df, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, tok)
               AS BIGINT) AS rk
           FROM scored)
         SELECT doc_id, rk, tok, tf, df, score FROM r
         WHERE rk <= 3 ORDER BY doc_id, rk""",

    "q90_pmi_cooccur" ->
      s"""WITH dt AS (SELECT doc_id, tok, COUNT(*) AS tf
           FROM (SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok
                 FROM documents)
           GROUP BY doc_id, tok),
         top AS (SELECT tok FROM
           (SELECT tok, SUM(tf) AS cnt FROM dt GROUP BY tok
            ORDER BY cnt DESC, tok LIMIT 100)),
         vdt AS (SELECT dt.doc_id, dt.tok FROM dt JOIN top ON dt.tok = top.tok),
         cf AS (SELECT tok, COUNT(*) AS c FROM vdt GROUP BY tok),
         nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS d FROM dt),
         pr AS (SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*) AS c_ab
           FROM vdt a JOIN vdt b ON a.doc_id = b.doc_id AND a.tok < b.tok
           GROUP BY a.tok, b.tok HAVING COUNT(*) >= 5),
         pre AS (SELECT pr.tok_a, pr.tok_b, pr.c_ab, ca.c AS c_a, cb.c AS c_b, n.d
           FROM pr JOIN cf ca ON ca.tok = pr.tok_a
                   JOIN cf cb ON cb.tok = pr.tok_b CROSS JOIN nd n),
         ${lnChain("lnpmi", "pre", Seq("tok_a", "tok_b", "c_ab", "c_a", "c_b"), Seq(
           "(CAST(c_ab AS DOUBLE) * CAST(d AS DOUBLE)) / (CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE))" -> "pmi"))}
         SELECT tok_a, tok_b, c_ab, c_a, c_b, pmi FROM lnpmi
         ORDER BY c_ab DESC, tok_a, tok_b LIMIT 100""",

    // same Knuth multiplicative hash as q58/q80/q88, its own salt —
    // identical integer arithmetic in both engines → identical split
    "q91_train_split" ->
      """WITH s AS (SELECT source,
           CASE WHEN (((doc_id % 1000000007) * 2654435761) % 1000000007 + 40490) % 100 < 80
                THEN 'train'
                WHEN (((doc_id % 1000000007) * 2654435761) % 1000000007 + 40490) % 100 < 90
                THEN 'valid'
                ELSE 'test' END AS split,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_toks
           FROM documents)
         SELECT source, split, COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens
         FROM s GROUP BY source, split ORDER BY source, split""",

    // q122 fixed-point idiom: floor-scaled 1e-8-granular longs, integer
    // SUM (order-free == Spark's partial-aggregated sum), one double
    // divide — bit-identical across engines with constant group state
    "q92_embed_centroids" ->
      """WITH b AS (SELECT label,
           CAST(embedding[1] AS DOUBLE) AS x0, CAST(embedding[2] AS DOUBLE) AS x1,
           CAST(embedding[3] AS DOUBLE) AS x2, CAST(embedding[4] AS DOUBLE) AS x3
           FROM embeddings)
         SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           (CAST(SUM(CAST(floor(x0 * 100000000.0) AS BIGINT)) AS DOUBLE)
             / 100000000.0) / CAST(COUNT(*) AS DOUBLE) AS mean_0,
           (CAST(SUM(CAST(floor(x1 * 100000000.0) AS BIGINT)) AS DOUBLE)
             / 100000000.0) / CAST(COUNT(*) AS DOUBLE) AS mean_1,
           (CAST(SUM(CAST(floor(x2 * 100000000.0) AS BIGINT)) AS DOUBLE)
             / 100000000.0) / CAST(COUNT(*) AS DOUBLE) AS mean_2,
           (CAST(SUM(CAST(floor(x3 * 100000000.0) AS BIGINT)) AS DOUBLE)
             / 100000000.0) / CAST(COUNT(*) AS DOUBLE) AS mean_3
         FROM b GROUP BY label ORDER BY label""",

    // upper-triangle Gram cells; q122 fixed-point idiom (floor-scaled
    // 1e-6-granular longs, order-free integer SUM, one double divide)
    // == Spark's partial-aggregated fixed-point sum bit-for-bit. The
    // test embeddings are 64-dim; Spark derives d from the data.
    "q97_gram_matrix" ->
      """WITH p AS (SELECT CAST(ii.i AS BIGINT) AS i,
             CAST(jj.j AS BIGINT) AS j,
             CAST(embedding[CAST(ii.i AS INT) + 1] AS DOUBLE) *
               CAST(embedding[CAST(jj.j AS INT) + 1] AS DOUBLE) AS prod
           FROM embeddings
           CROSS JOIN (SELECT unnest(range(0, 64)) AS i) ii
           CROSS JOIN (SELECT unnest(range(0, 64)) AS j) jj
           WHERE jj.j >= ii.i)
         SELECT i, j,
           CAST(SUM(CAST(floor(prod * 1000000.0) AS BIGINT)) AS DOUBLE)
             / 1000000.0 AS gram
         FROM p GROUP BY i, j ORDER BY i, j""",

    // adjacent char pairs per word occurrence; substr is character-based
    // and 1-indexed in both engines; range(1, len) = 1..len-1
    "q98_bpe_merges" ->
      """WITH w AS (SELECT unnest(string_split(lower(trim(text)), ' ')) AS w
                    FROM documents),
         p AS (SELECT substr(w, CAST(i AS INT), 1) AS a,
                      substr(w, CAST(i AS INT) + 1, 1) AS b
               FROM (SELECT w, unnest(range(1, len(w))) AS i
                     FROM w WHERE len(w) >= 2))
         SELECT a, b, COUNT(*) AS cnt FROM p GROUP BY a, b
         ORDER BY cnt DESC, a, b LIMIT 50""",

    // add-one-smoothed bigram nll; position-sorted strict fold per doc;
    // ln via the portable chain — bitwise == Spark on every input (§6)
    "q99_bigram_logprob" ->
      s"""WITH d AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS l
                    FROM documents),
         pr AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
                  l[CAST(i AS INT)] AS tok, l[CAST(i AS INT) + 1] AS tok2
                FROM (SELECT doc_id, l, unnest(range(1, len(l))) AS i
                      FROM d WHERE len(l) >= 2)),
         uni AS (SELECT tok, COUNT(*) AS c1
                 FROM (SELECT unnest(l) AS tok FROM d) GROUP BY tok),
         big AS (SELECT tok, tok2, COUNT(*) AS c12 FROM pr GROUP BY tok, tok2),
         vs AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
                FROM (SELECT unnest(l) AS tok FROM d)),
         pre AS (SELECT pr.doc_id, pr.pos,
             (CAST(big.c12 AS DOUBLE) + 1.0) /
                 (CAST(uni.c1 AS DOUBLE) + CAST(vs.v AS DOUBLE)) AS arg
           FROM pr JOIN big ON pr.tok = big.tok AND pr.tok2 = big.tok2
                   JOIN uni ON pr.tok = uni.tok CROSS JOIN vs),
         ${lnChain("lnb", "pre", Seq("doc_id", "pos"), Seq("arg" -> "lnarg"))},
         sc AS (SELECT doc_id, pos, -lnarg AS nll FROM lnb),
         g AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             list_sort(list(struct_pack(pos := pos, nll := nll))) AS xs
           FROM sc GROUP BY doc_id),
         f AS (SELECT doc_id, n_bigrams,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(xs, s -> struct_extract(s, 'nll'))),
               (a,b) -> a+b) AS nll_sum
           FROM g)
         SELECT doc_id, n_bigrams, nll_sum,
           nll_sum / CAST(n_bigrams AS DOUBLE) AS avg_nll
         FROM f ORDER BY doc_id""",

    // the q50 polynomial fold per token, bucketed mod 16; fingerprint is
    // non-negative so % == pmod
    "q100_feature_hash" ->
      """WITH t AS (SELECT doc_id,
             unnest(string_split(lower(trim(text)), ' ')) AS tok
           FROM documents),
         h AS (SELECT doc_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(tok, ''),
                 c -> CAST(unicode(c) AS BIGINT))),
               (h, c) -> (h*31 + c) % 1000000007) % 16 AS bucket
           FROM t)
         SELECT doc_id, bucket, COUNT(*) AS cnt FROM h
         GROUP BY doc_id, bucket ORDER BY doc_id, bucket""",

    // distinct 3-grams are built row-locally (list_distinct) exactly as
    // the Spark side does before any explode; docs <3 tokens drop out
    "q101_boilerplate" ->
      """WITH toks AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
                       FROM documents),
         grams AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
           FROM toks WHERE len(w) >= 3),
         df AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS df FROM grams GROUP BY g)
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN df.df >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
           CAST(SUM(CASE WHEN df.df >= 5 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS boiler_frac
         FROM grams JOIN df USING(g)
         GROUP BY doc_id ORDER BY doc_id""",

    // q58/q80/q91 multiplicative-hash family, salt 77003; doc_id >= 0 so
    // % == pmod; keep test is the same double product both engines
    "q102_mix_resample" ->
      """WITH p AS (SELECT source,
             (((doc_id % 1000000007) * 2654435761) % 1000000007 + 77003)
               % 1000000007 AS h
           FROM documents),
         c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
               FROM p GROUP BY source),
         t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS tot,
                      CAST(COUNT(*) AS BIGINT) AS n_sources FROM c),
         r AS (SELECT source, n_docs,
             least(1.0, CAST(tot AS DOUBLE) / CAST(n_sources * n_docs AS DOUBLE))
               AS keep_rate
           FROM c CROSS JOIN t)
         SELECT r.source, r.n_docs, r.keep_rate,
           CAST(SUM(CASE WHEN CAST(p.h AS DOUBLE) < r.keep_rate * 1000000007.0
             THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
         FROM p JOIN r USING(source)
         GROUP BY r.source, r.n_docs, r.keep_rate
         ORDER BY r.source""",

    // q44's ordered-fold cosine, extended with neighbor labels and a
    // majority vote; ties break (votes DESC, nlabel) in both engines
    "q103_knn_label" ->
      """WITH e AS (SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         n AS (SELECT vec_id, label, v,
           sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(v, x -> x*x)), (a,b) -> a+b)) AS norm FROM e),
         p AS (SELECT q.vec_id AS qid, c.vec_id AS nid, c.label AS nlabel,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(1,65), i -> q.v[i]*c.v[i])), (a,b) -> a+b)
             / (q.norm * c.norm) AS cos
           FROM n q JOIN n c ON q.vec_id <> c.vec_id WHERE q.vec_id < 50),
         r AS (SELECT qid, nlabel, cos,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rk
           FROM p),
         v AS (SELECT qid, nlabel, CAST(COUNT(*) AS BIGINT) AS votes
           FROM r WHERE rk <= 5 GROUP BY qid, nlabel),
         m AS (SELECT qid, nlabel, votes,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY votes DESC, nlabel)
             AS vrk FROM v)
         SELECT m.qid, emb.label AS true_label, m.nlabel AS pred_label, m.votes
         FROM m JOIN embeddings emb ON m.qid = emb.vec_id
         WHERE m.vrk = 1 ORDER BY m.qid""",

    // q100's polynomial-fingerprint bucket, deterministic signed weight
    // ((b+1)*A mod P) - (P-1)/2; INTEGER accumulation so the one float
    // divide at the end is hash-exact with no sorted-fold crutch
    "q104_quality_hash_lr" ->
      """WITH t AS (SELECT doc_id,
             unnest(string_split(lower(trim(text)), ' ')) AS tok
           FROM documents),
         b AS (SELECT doc_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(tok, ''),
                 c -> CAST(unicode(c) AS BIGINT))),
               (h, c) -> (h*31 + c) % 1000000007) % 16 AS bucket
           FROM t),
         w AS (SELECT doc_id,
             ((bucket + 1) * 2654435761) % 1000000007 - 500000003 AS w FROM b),
         s AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                      CAST(SUM(w) AS BIGINT) AS score_num
               FROM w GROUP BY doc_id)
         SELECT doc_id, n_tokens, score_num,
           CAST(score_num AS DOUBLE) / (1000000007.0 * CAST(n_tokens AS DOUBLE))
             AS score,
           CAST(score_num AS DOUBLE) / (1000000007.0 * CAST(n_tokens AS DOUBLE))
             > 0.0 AS keep
         FROM s ORDER BY doc_id""",

    // q64's recursive-CTE clusters + q48's quality expression (same
    // fixed-order weighted sum); survivor = argmax quality, tie doc_id
    "q105_canonical_pick" ->
      s"""WITH RECURSIVE pairs AS ($Q41Sql),
         e AS (SELECT doc_a AS u, doc_b AS v FROM pairs
               UNION SELECT doc_b, doc_a FROM pairs),
         reach(u, v) AS (
           SELECT u, v FROM e
           UNION
           SELECT r.u, e2.v FROM reach r JOIN e e2 ON r.v = e2.u WHERE e2.v <> r.u),
         cl AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS label
                FROM reach GROUP BY u),
         qb AS (SELECT doc_id,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(string_split(trim(text), ' '))) AS BIGINT)
               AS n_distinct,
             CAST(len(list_filter(string_split(trim(text), ' '),
               t -> lower(t) IN ('the','a','and','of','data','row'))) AS BIGINT)
               AS n_stop
           FROM documents),
         qual AS (SELECT doc_id,
             (CAST(n_distinct AS DOUBLE)/n_tokens)*0.4 +
             least(1.0, CAST(n_tokens AS DOUBLE)/100.0)*0.3 +
             (CAST(n_stop AS DOUBLE)/n_tokens)*0.3 AS quality
           FROM qb),
         rk AS (SELECT cl.label, cl.doc_id, qual.quality,
             ROW_NUMBER() OVER (PARTITION BY cl.label
               ORDER BY qual.quality DESC, cl.doc_id) AS rn
           FROM cl JOIN qual USING(doc_id)),
         m AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_members
               FROM cl GROUP BY label)
         SELECT rk.label, rk.doc_id AS survivor, m.n_members,
           rk.quality AS best_quality
         FROM rk JOIN m USING(label) WHERE rk.rn = 1 ORDER BY rk.label""",

    // exact percentiles: quantile_cont == Spark `percentile` (the
    // (n-1)·p interpolation rule, proven cross-engine by q23)
    "q106_source_profile" ->
      """WITH d AS (SELECT source,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n
           FROM documents)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mean_tokens,
           quantile_cont(n, 0.5) AS median_tokens,
           quantile_cont(n, 0.9) AS p90_tokens,
           CAST(SUM(CASE WHEN n < 20 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS short_frac
         FROM d GROUP BY source ORDER BY source""",

    // q91's split hash recomputed on the gram stream; distinct train
    // grams LEFT JOIN onto test-doc grams, per-doc rollup
    "q107_split_decontam" ->
      """WITH toks AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
                       FROM documents),
         grams AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
           FROM toks WHERE len(w) >= 3),
         sg AS (SELECT doc_id, g,
             (((doc_id % 1000000007) * 2654435761) % 1000000007 + 40490) % 100
               AS h
           FROM grams),
         tg AS (SELECT DISTINCT g FROM sg WHERE h < 80),
         te AS (SELECT doc_id, sg.g FROM sg WHERE h >= 90)
         SELECT te.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN tg.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS leaked,
           CAST(SUM(CASE WHEN tg.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS leak_frac
         FROM te LEFT JOIN tg ON te.g = tg.g
         GROUP BY te.doc_id ORDER BY te.doc_id""",

    // md5 hex of the normalized text in both engines; the split
    // constant is shared with the SparkEntry derivation
    "q109_incremental_dedup" ->
      s"""WITH corpus AS (SELECT md5(lower(trim(text))) AS dg FROM documents
                         WHERE doc_id % $IngestBatchMod <> 0),
         ingested AS (SELECT DISTINCT dg, 1 AS hit FROM corpus),
         b AS (SELECT doc_id, md5(lower(trim(text))) AS dg FROM documents
               WHERE doc_id % $IngestBatchMod = 0),
         r AS (SELECT b.doc_id, b.dg, ingested.hit,
             ROW_NUMBER() OVER (PARTITION BY b.dg ORDER BY b.doc_id) AS rn
           FROM b LEFT JOIN ingested USING(dg))
         SELECT doc_id, dg,
           CASE WHEN hit IS NOT NULL THEN 'dup_corpus'
                WHEN rn > 1 THEN 'dup_batch'
                ELSE 'new' END AS status
         FROM r ORDER BY doc_id""",

    // snapshot derivations share their mod constants with SparkEntry;
    // diff by md5
    "q110_corpus_diff" ->
      s"""WITH o AS (SELECT doc_id, md5(text) AS dg FROM documents
                    WHERE doc_id % $DiffOldDropMod <> 0),
         n AS (SELECT doc_id,
             md5(CASE WHEN doc_id % $DiffUpperMod = 0 THEN upper(text) ELSE text END) AS dg
           FROM documents WHERE doc_id % $DiffNewDropMod <> 0)
         SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.dg IS NULL THEN 'added'
                WHEN n.dg IS NULL THEN 'removed'
                WHEN o.dg = n.dg THEN 'unchanged'
                ELSE 'modified' END AS status
         FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
         ORDER BY doc_id""",

    // the bloom prefilter moves work, never answers (false positives
    // die in the verify join, false negatives cannot exist) — so the
    // oracle is the PLAIN q109 logic over the q126 batch derivation;
    // split + plant constants shared with SparkEntry
    "q126_bloom_dedup" ->
      s"""WITH corpus AS (SELECT md5(lower(trim(text))) AS dg FROM documents
                         WHERE doc_id % $IngestBatchMod <> 0),
         ingested AS (SELECT DISTINCT dg, 1 AS hit FROM corpus),
         b AS (SELECT doc_id, md5(lower(trim(text))) AS dg FROM documents
               WHERE doc_id % $IngestBatchMod = 0
               UNION ALL
               SELECT doc_id + $BloomIdOffsetA, md5(lower(trim(text))) FROM documents
               WHERE doc_id % $BloomReingestMod = $BloomReingestRem
                 AND doc_id % $IngestBatchMod <> 0
               UNION ALL
               SELECT doc_id + $BloomIdOffsetB, md5(lower(trim(text))) FROM documents
               WHERE doc_id % $BloomDupBatchMod = 0),
         r AS (SELECT b.doc_id, b.dg, ingested.hit,
             ROW_NUMBER() OVER (PARTITION BY b.dg ORDER BY b.doc_id) AS rn
           FROM b LEFT JOIN ingested USING(dg))
         SELECT doc_id, dg,
           CASE WHEN hit IS NOT NULL THEN 'dup_corpus'
                WHEN rn > 1 THEN 'dup_batch'
                ELSE 'new' END AS status
         FROM r ORDER BY doc_id""",

    "q127_dup_profile" ->
      """WITH pd AS (SELECT source, md5(lower(trim(text))) AS dg, COUNT(*) AS n
                    FROM documents GROUP BY 1, 2),
         sp AS (SELECT dg, COUNT(*) AS n_sources FROM pd GROUP BY 1)
         SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_texts,
           CAST(SUM(n - 1) AS BIGINT) AS n_dup_docs,
           CAST(SUM(n - 1) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS dup_frac,
           CAST(MAX(n) AS BIGINT) AS max_cluster,
           CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_clusters,
           CAST(SUM(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cross_texts
         FROM pd JOIN sp USING(dg) GROUP BY source ORDER BY source""",

    // q48's quality expression verbatim; the rank key floor-scales the
    // (bit-identical) double to a long so ordering is integer in both
    // engines — quota constant shared with SparkEntry
    "q128_quota_topk" ->
      s"""WITH b AS (SELECT doc_id, source,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(trim(text), ' '))) AS BIGINT) AS n_distinct,
           CAST(len(list_filter(string_split(trim(text), ' '),
             t -> lower(t) IN ('the','a','and','of','data','row'))) AS BIGINT) AS n_stop
           FROM documents),
         r AS (SELECT doc_id, source,
           CAST(n_distinct AS DOUBLE)/n_tokens AS ttr,
           least(1.0, CAST(n_tokens AS DOUBLE)/100.0) AS len_score,
           CAST(n_stop AS DOUBLE)/n_tokens AS stop_ratio
           FROM b),
         q AS (SELECT doc_id, source,
           ttr*0.4 + len_score*0.3 + stop_ratio*0.3 AS quality FROM r),
         rk AS (SELECT source, doc_id, quality,
           ROW_NUMBER() OVER (PARTITION BY source
             ORDER BY CAST(floor(quality * 1e8) AS BIGINT) DESC, doc_id) AS rk
           FROM q)
         SELECT source, doc_id, quality FROM rk WHERE rk <= $SourceQuota
         ORDER BY source, doc_id""",

    // value-based doc-id tranches against the max id (integer div in
    // both engines — no ntile window anywhere); each distinct token
    // attributes to its first-appearance tranche
    "q130_vocab_growth" ->
      """WITH t AS (SELECT doc_id,
             unnest(string_split(lower(trim(text)), ' ')) AS tok
           FROM documents),
         mx AS (SELECT MAX(doc_id) AS mx FROM documents),
         fs AS (SELECT tok, MIN(doc_id) AS first_doc FROM t GROUP BY tok),
         nt AS (SELECT (first_doc * 10) // (mx + 1) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS new_tokens FROM fs, mx GROUP BY 1),
         tv AS (SELECT (doc_id * 10) // (mx + 1) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS token_volume FROM t, mx GROUP BY 1),
         dc AS (SELECT (doc_id * 10) // (mx + 1) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents, mx GROUP BY 1)
         SELECT dc.bucket, n_docs,
           COALESCE(token_volume, 0) AS token_volume,
           COALESCE(new_tokens, 0) AS new_tokens,
           CAST(SUM(COALESCE(new_tokens, 0)) OVER (ORDER BY dc.bucket
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab,
           CAST(COALESCE(new_tokens, 0) AS DOUBLE) /
             CAST(token_volume AS DOUBLE) AS novelty_rate
         FROM dc LEFT JOIN tv USING(bucket) LEFT JOIN nt USING(bucket)
         ORDER BY dc.bucket""",

    // q132: drift between the q110 snapshot derivations. The KL total
    // is the q121 fixed-point sum (floor to 1e-12 longs — order-free
    // exact); ln goes through the shared lnChain; ranking ties break
    // on the exact long then token.
    "q132_token_drift" ->
      s"""WITH o AS (SELECT unnest(string_split(lower(trim(text)), ' ')) AS tok
           FROM documents WHERE doc_id % $DiffOldDropMod <> 0),
         nw AS (SELECT unnest(string_split(lower(trim(
             CASE WHEN doc_id % $DiffUpperMod = 0 THEN upper(text) ELSE text END)), ' ')) AS tok
           FROM documents WHERE doc_id % $DiffNewDropMod <> 0),
         oc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_old FROM o GROUP BY tok),
         nc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_new FROM nw GROUP BY tok),
         j AS (SELECT COALESCE(oc.tok, nc.tok) AS tok,
             COALESCE(n_old, 0) AS n_old, COALESCE(n_new, 0) AS n_new
           FROM oc FULL OUTER JOIN nc ON oc.tok = nc.tok),
         t AS (SELECT CAST(SUM(n_old) AS BIGINT) AS t_old,
             CAST(SUM(n_new) AS BIGINT) AS t_new, COUNT(*) AS v FROM j),
         p0 AS (SELECT tok, n_old, n_new,
             (CAST(n_old AS DOUBLE) + 0.5) / (CAST(t_old AS DOUBLE) + 0.5 * CAST(v AS DOUBLE)) AS p_old,
             (CAST(n_new AS DOUBLE) + 0.5) / (CAST(t_new AS DOUBLE) + 0.5 * CAST(v AS DOUBLE)) AS p_new
           FROM j CROSS JOIN t),
         ${lnChain("lnp", "p0", Seq("tok", "n_old", "n_new", "p_old", "p_new"),
           Seq("p_new / p_old" -> "lnr"))},
         c AS (SELECT tok, n_old, n_new, p_old, p_new,
             p_new * lnr AS contrib,
             CAST(floor(p_new * lnr * 1.0e12) AS BIGINT) AS c12
           FROM lnp),
         k AS (SELECT CAST(SUM(c12) AS DOUBLE) / 1.0e12 AS kl_total FROM c)
         SELECT tok, n_old, n_new, p_old, p_new, contrib, kl_total
         FROM c CROSS JOIN k
         ORDER BY abs(c12) DESC, tok LIMIT 50""",

    // q133: the funnel's stage populations are exactly the q65 oracle's
    // CTEs — the report just counts them, so its equivalence argument
    // is q65's
    "q133_clean_funnel" ->
      s"""WITH RECURSIVE pairs AS ($Q41Sql),
         e AS (SELECT doc_a AS u, doc_b AS v FROM pairs
               UNION SELECT doc_b, doc_a FROM pairs),
         reach(u, v) AS (
           SELECT u, v FROM e
           UNION
           SELECT r.u, e2.v FROM reach r JOIN e e2 ON r.v = e2.u WHERE e2.v <> r.u),
         losers AS (SELECT u AS doc_id FROM reach GROUP BY u
                    HAVING LEAST(u, MIN(v)) <> u),
         norm AS (SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS clean_text,
           CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS BIGINT) AS clean_tokens
           FROM documents),
         keep1 AS (SELECT MIN(doc_id) AS keep_id FROM norm GROUP BY clean_text),
         ex AS (SELECT doc_id, clean_tokens FROM norm
                WHERE doc_id IN (SELECT keep_id FROM keep1)),
         nd AS (SELECT doc_id, clean_tokens FROM ex
                WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
         qf AS (SELECT doc_id, clean_tokens FROM nd WHERE clean_tokens >= 5),
         u AS (
           SELECT CAST(1 AS BIGINT) AS stage_id, 'ingest' AS stage,
             CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(clean_tokens) AS BIGINT) AS n_tokens FROM norm
           UNION ALL SELECT 2, 'exact_dedup', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(clean_tokens) AS BIGINT) FROM ex
           UNION ALL SELECT 3, 'near_dedup', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(clean_tokens) AS BIGINT) FROM nd
           UNION ALL SELECT 4, 'quality_floor', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(clean_tokens) AS BIGINT) FROM qf),
         l AS (SELECT stage_id, stage, n_docs, n_tokens,
             LAG(n_docs) OVER (ORDER BY stage_id) AS prev FROM u)
         SELECT stage_id, stage, n_docs, n_tokens,
           CASE WHEN prev IS NULL THEN CAST(0 AS BIGINT)
                ELSE prev - n_docs END AS dropped_docs,
           CASE WHEN prev IS NULL THEN 0.0
                ELSE CAST(prev - n_docs AS DOUBLE) / CAST(prev AS DOUBLE) END AS drop_frac
         FROM l ORDER BY stage_id""",

    // q135: the oracle is the plain window-cumsum form; the engine's
    // registered SCALE plan (bucketed verdicts + boundary-bucket local
    // sum) selects the identical prefix of the same total order, so
    // the two agree bit-for-bit
    "q135_token_budget" ->
      s"""WITH b AS (SELECT doc_id,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(trim(text), ' '))) AS BIGINT) AS n_distinct,
           CAST(len(list_filter(string_split(trim(text), ' '),
             t -> lower(t) IN ('the','a','and','of','data','row'))) AS BIGINT) AS n_stop
           FROM documents),
         r AS (SELECT doc_id, n_tokens,
           (CAST(n_distinct AS DOUBLE)/n_tokens)*0.4 +
             least(1.0, CAST(n_tokens AS DOUBLE)/100.0)*0.3 +
             (CAST(n_stop AS DOUBLE)/n_tokens)*0.3 AS quality
           FROM b),
         s AS (SELECT *, CAST(floor(quality * 1.0e8) AS BIGINT) AS q8 FROM r),
         c AS (SELECT *, SUM(n_tokens) OVER (ORDER BY q8 DESC, doc_id
             ROWS UNBOUNDED PRECEDING) AS cum FROM s)
         SELECT doc_id, n_tokens, quality FROM c
         WHERE cum - n_tokens < $TokenBudget
         ORDER BY q8 DESC, doc_id""",

    // q136: the oracle is the PLAIN non-equi range join — the engine's
    // bin-blocked equi-join plan must produce the identical match set
    "q136_range_join" ->
      """WITH p AS (SELECT event_id AS point_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS x
           FROM events WHERE event_type = 'view'),
         i AS (SELECT event_id AS interval_id,
             epoch_us(CAST(ts AS TIMESTAMP)) - 300000000 AS lo,
             epoch_us(CAST(ts AS TIMESTAMP)) + 300000000 AS hi
           FROM events WHERE event_type = 'purchase')
         SELECT point_id, interval_id FROM p JOIN i
           ON x >= lo AND x <= hi
         ORDER BY point_id, interval_id""",

    // q137: Efraimidis–Spirakis keys over the q48 quality weights; u
    // from the shared Knuth-multiply hash, ln via the shared chain
    "q137_weighted_sample" ->
      s"""WITH b AS (SELECT doc_id,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(trim(text), ' '))) AS BIGINT) AS n_distinct,
           CAST(len(list_filter(string_split(trim(text), ' '),
             t -> lower(t) IN ('the','a','and','of','data','row'))) AS BIGINT) AS n_stop
           FROM documents),
         r AS (SELECT doc_id,
           (CAST(n_distinct AS DOUBLE)/n_tokens)*0.4 +
             least(1.0, CAST(n_tokens AS DOUBLE)/100.0)*0.3 +
             (CAST(n_stop AS DOUBLE)/n_tokens)*0.3 AS quality
           FROM b),
         s0 AS (SELECT doc_id, quality,
           (CAST(((doc_id % 1000000007) * 2654435761) % 1000000007 % 1000000000 AS DOUBLE) + 1.0) / 1.0e9 AS u
           FROM r),
         ${lnChain("lnp", "s0", Seq("doc_id", "quality"), Seq("u" -> "lnu"))},
         k AS (SELECT doc_id, quality, lnu / quality AS sample_key FROM lnp)
         SELECT doc_id, quality, sample_key FROM k
         ORDER BY sample_key DESC, doc_id LIMIT $WeightedSampleN""",

    // q141: per-source z-calibration of the q48 quality score; moments
    // accumulate as 1e-8 fixed-point longs (order-free exact) so
    // mean/variance/z are bit-identical across engines
    "q141_source_calibrate" ->
      """WITH b AS (SELECT doc_id, source,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(trim(text), ' '))) AS BIGINT) AS n_distinct,
           CAST(len(list_filter(string_split(trim(text), ' '),
             t -> lower(t) IN ('the','a','and','of','data','row'))) AS BIGINT) AS n_stop
           FROM documents),
         r AS (SELECT doc_id, source,
           (CAST(n_distinct AS DOUBLE)/n_tokens)*0.4 +
             least(1.0, CAST(n_tokens AS DOUBLE)/100.0)*0.3 +
             (CAST(n_stop AS DOUBLE)/n_tokens)*0.3 AS quality
           FROM b),
         st AS (SELECT source, COUNT(*) AS n_docs,
             SUM(CAST(floor(quality * 1.0e8) AS BIGINT)) AS s1,
             SUM(CAST(floor(quality * quality * 1.0e8) AS BIGINT)) AS s2
           FROM r GROUP BY source),
         m AS (SELECT source, n_docs,
             (CAST(s1 AS DOUBLE)/1.0e8) / CAST(n_docs AS DOUBLE) AS src_mean,
             (CAST(s2 AS DOUBLE)/1.0e8) / CAST(n_docs AS DOUBLE) -
               ((CAST(s1 AS DOUBLE)/1.0e8) / CAST(n_docs AS DOUBLE)) *
               ((CAST(s1 AS DOUBLE)/1.0e8) / CAST(n_docs AS DOUBLE)) AS src_var
           FROM st)
         SELECT r.doc_id, r.source, r.quality, m.src_mean,
           CASE WHEN m.src_var > 1.0e-6
                THEN (r.quality - m.src_mean) / sqrt(m.src_var) END AS cal_z
         FROM r JOIN m ON r.source = m.source
         ORDER BY r.doc_id""",

    // q142: retention cohort matrix — first-activity week per user,
    // distinct returning users per (cohort, week offset), retention
    // fraction against the offset-0 cohort size
    "q142_retention" ->
      """WITH e AS (SELECT user_id,
             CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
           FROM events),
         c AS (SELECT user_id, min(wk) AS cohort_week FROM e GROUP BY user_id),
         cells AS (SELECT c.cohort_week,
             CAST(date_diff('day', c.cohort_week, e.wk) // 7 AS INT) AS week_offset,
             COUNT(DISTINCT e.user_id) AS n_users
           FROM e JOIN c ON e.user_id = c.user_id
           GROUP BY 1, 2),
         sz AS (SELECT cohort_week, n_users AS cohort_size FROM cells
           WHERE week_offset = 0)
         SELECT cells.cohort_week, cells.week_offset, cells.n_users,
           sz.cohort_size,
           CAST(cells.n_users AS DOUBLE) / CAST(sz.cohort_size AS DOUBLE)
             AS retention
         FROM cells JOIN sz ON cells.cohort_week = sz.cohort_week
         ORDER BY cells.cohort_week, cells.week_offset""",

    // q143: per-benchmark-item containment (the q69 gram machinery,
    // denominator flipped to the benchmark item's gram count)
    "q143_bench_containment" ->
      """WITH bt AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
                     FROM documents WHERE source = 'src0'),
         bgrams AS (SELECT doc_id AS bench_id, unnest(list_distinct(list_transform(
             range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
           FROM bt WHERE len(w) >= 3),
         bsizes AS (SELECT bench_id, CAST(COUNT(*) AS BIGINT) AS bench_grams
           FROM bgrams GROUP BY bench_id),
         ct AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
                FROM documents WHERE source <> 'src0'),
         cgrams AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
           FROM ct WHERE len(w) >= 3),
         hits AS (SELECT bench_id, doc_id, CAST(COUNT(*) AS BIGINT) AS shared_grams
                  FROM cgrams JOIN bgrams USING (g) GROUP BY bench_id, doc_id)
         SELECT h.bench_id, h.doc_id, h.shared_grams, s.bench_grams,
           CAST(h.shared_grams AS DOUBLE) / s.bench_grams AS containment
         FROM hits h JOIN bsizes s ON h.bench_id = s.bench_id
         WHERE CAST(h.shared_grams AS DOUBLE) / s.bench_grams >= 0.5
         ORDER BY h.bench_id, h.doc_id""",

    // q144: Neyman allocation over the q48 quality spread; moments and
    // the N_h·σ_h weights are fixed-point longs so the denominator sum
    // is order-free exact
    "q144_neyman_alloc" ->
      s"""WITH b AS (SELECT doc_id, source,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(trim(text), ' '))) AS BIGINT) AS n_distinct,
           CAST(len(list_filter(string_split(trim(text), ' '),
             t -> lower(t) IN ('the','a','and','of','data','row'))) AS BIGINT) AS n_stop
           FROM documents),
         r AS (SELECT doc_id, source,
           (CAST(n_distinct AS DOUBLE)/n_tokens)*0.4 +
             least(1.0, CAST(n_tokens AS DOUBLE)/100.0)*0.3 +
             (CAST(n_stop AS DOUBLE)/n_tokens)*0.3 AS quality
           FROM b),
         st AS (SELECT source, COUNT(*) AS n_docs,
             SUM(CAST(floor(quality * 1.0e8) AS BIGINT)) AS s1,
             SUM(CAST(floor(quality * quality * 1.0e8) AS BIGINT)) AS s2
           FROM r GROUP BY source),
         m AS (SELECT source, n_docs,
             (CAST(s2 AS DOUBLE)/1.0e8) / CAST(n_docs AS DOUBLE) -
               ((CAST(s1 AS DOUBLE)/1.0e8) / CAST(n_docs AS DOUBLE)) *
               ((CAST(s1 AS DOUBLE)/1.0e8) / CAST(n_docs AS DOUBLE)) AS vr
           FROM st),
         g AS (SELECT source, n_docs,
             CASE WHEN vr > 1.0e-12 THEN sqrt(vr) ELSE 0.0 END AS sigma_q
           FROM m),
         w AS (SELECT source, n_docs, sigma_q,
             CAST(floor(CAST(n_docs AS DOUBLE) * sigma_q * 1.0e6) AS BIGINT) AS wgt
           FROM g),
         t AS (SELECT SUM(wgt) AS wtot FROM w)
         SELECT w.source, w.n_docs, w.sigma_q,
           CASE WHEN t.wtot > 0
                THEN least(w.n_docs, CAST(floor($NeymanBudget *
                  (CAST(w.wgt AS DOUBLE) / CAST(t.wtot AS DOUBLE))) AS BIGINT))
                ELSE CAST(0 AS BIGINT) END AS alloc_n,
           CAST(CASE WHEN t.wtot > 0
                THEN least(w.n_docs, CAST(floor($NeymanBudget *
                  (CAST(w.wgt AS DOUBLE) / CAST(t.wtot AS DOUBLE))) AS BIGINT))
                ELSE CAST(0 AS BIGINT) END AS DOUBLE) / CAST(w.n_docs AS DOUBLE)
             AS alloc_frac
         FROM w, t ORDER BY w.source""",

    // q148–q151 URL/domain curation. The synthetic URL + normalization
    // algebra mirrors UrlCuration.withUrl/normalizeUrl/domainOf exactly
    // (same residues, same regex subset); UrlNormCte is the shared
    // prefix so the four oracles cannot drift from each other.
    "q148_url_normalize" ->
      s"""$UrlNormCte
         SELECT doc_id, url, url_norm, domain FROM nrm ORDER BY doc_id""",

    // blocklist literals = UrlCuration.DefaultBlocklist
    "q149_domain_blocklist" ->
      s"""$UrlNormCte
         SELECT doc_id, domain,
           domain IN ('src1.org', 'src3.com', 'src7.net', 'src12.com')
             AS blocked
         FROM nrm ORDER BY doc_id""",

    // per-domain quota 12, survivors by the multiplicative hash
    // (salt 148151 = UrlCuration.q150)
    "q150_domain_quota" ->
      s"""$UrlNormCte,
         sel AS (SELECT doc_id, domain,
             (((doc_id % 1000000007) * 2654435761) % 1000000007 + 148151)
               % 1000000007 AS h
           FROM nrm),
         rk AS (SELECT doc_id, domain,
             CAST(ROW_NUMBER() OVER (PARTITION BY domain ORDER BY h, doc_id)
               AS BIGINT) AS rk
           FROM sel)
         SELECT doc_id, domain, rk FROM rk WHERE rk <= 12
         ORDER BY domain, rk""",

    "q151_url_dedup" ->
      s"""$UrlNormCte
         SELECT doc_id, url_norm,
           MIN(doc_id) OVER (PARTITION BY url_norm) AS canon_id,
           COUNT(*) OVER (PARTITION BY url_norm) AS n_variants,
           CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY url_norm)
                THEN 'canonical' ELSE 'dup_url' END AS status
         FROM nrm ORDER BY doc_id""",

    // domain-granular split: the q50 polynomial fingerprint folded over
    // the DOMAIN string (same list_reduce form as q50's oracle), salted
    // 52151, mod 100 -> 80/10/10
    "q152_domain_split" ->
      s"""$UrlNormCte,
         s AS (SELECT doc_id, domain,
             (list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(string_split(domain, ''),
                  c -> CAST(unicode(c) AS BIGINT))),
                (h, c) -> (h*31 + c) % 1000000007) + 52151) % 100 AS hh
           FROM nrm)
         SELECT doc_id, domain,
           CASE WHEN hh < 80 THEN 'train'
                WHEN hh < 90 THEN 'valid'
                ELSE 'test' END AS split
         FROM s ORDER BY doc_id""",

    "q153_domain_profile" ->
      s"""$UrlNormCte
         SELECT n.domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT n.url_norm) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT lower(trim(d.text))) AS BIGINT) AS n_texts,
           CAST(1.0 AS DOUBLE) -
             CAST(COUNT(DISTINCT n.url_norm) AS DOUBLE) /
             CAST(COUNT(*) AS DOUBLE) AS url_dup_rate,
           CAST(1.0 AS DOUBLE) -
             CAST(COUNT(DISTINCT lower(trim(d.text))) AS DOUBLE) /
             CAST(COUNT(*) AS DOUBLE) AS text_dup_rate
         FROM nrm n JOIN documents d USING(doc_id)
         GROUP BY n.domain ORDER BY n.domain""",

    // fixed-iteration fixed-point PageRank — ten UNROLLED chained CTEs
    // (DuckDB recursion cannot aggregate per step); each iteration's
    // contribution floor-scales to 1e-12 longs so the sum is order-free
    // and every round is bit-identical to Spark's (Graphs.pagerank)
    "q154_domain_pagerank" -> pageRankSql,

    // synchronous LPA, five unrolled rounds, min-label ties — integer
    // counts + string labels, no floats (Graphs.labelProp)
    "q165_domain_communities" -> lpaSql,

    // BFS k-hop distances, unrolled relax-and-min rounds (Graphs.q175)
    "q175_khop_distances" -> bfsSql,

    // per-source dedup savings: q40's normalized-text identity, first
    // doc_id keeps; one double divide
    "q176_dedup_savings" ->
      """WITH r AS (SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lower(trim(text))
               ORDER BY doc_id) AS rk
           FROM documents)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_bytes,
           CAST(SUM(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_docs,
           CAST(SUM(CASE WHEN rk > 1 THEN n_chars ELSE 0 END) AS BIGINT)
             AS dup_bytes,
           CAST(SUM(CASE WHEN rk > 1 THEN n_chars ELSE 0 END) AS DOUBLE)
             / CAST(SUM(n_chars) AS DOUBLE) AS savings_pct
         FROM r GROUP BY source ORDER BY source""",

    // fixed-round Lloyd's with integer-domain distances — five UNROLLED
    // rounds; argmin compares longs, means are q122 fixed-point, empty
    // clusters COALESCE to the previous centroid (KMeans.q155)
    "q155_kmeans" -> kmeansAssignSql,

    "q191_cluster_purity" -> kmeansPuritySql,

    "q192_cluster_nmi" -> kmeansNmiSql,

    // per-cluster health profile over the SAME unrolled assignment
    "q156_cluster_profile" -> kmeansProfileSql,

    // SemDeDup: the unrolled k-means assignment + within-cluster
    // pairwise strict-fold cosine; dup_of = min earlier id above tau
    "q177_semdedup" -> semDedupSql,

    // Gopher rule filter: exact longs (word count, integer length
    // fold, filtered sizes, regexp counts), two IEEE divides
    "q178_gopher_rules" ->
      """WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS toks,
             text FROM documents),
         b AS (SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(toks, t -> CAST(len(t) AS BIGINT))),
               (a, x) -> a + x) AS sum_wlen,
             CAST(len(list_filter(toks,
               t -> regexp_matches(t, '[a-z]'))) AS BIGINT) AS n_alpha,
             CAST(len(list_filter(toks,
               t -> lower(t) IN ('the','a','and','of','data','row')))
               AS BIGINT) AS n_stop,
             CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS BIGINT)
               AS n_sym
           FROM w),
         r AS (SELECT doc_id, n_words,
             CAST(sum_wlen AS DOUBLE) / CAST(n_words AS DOUBLE) AS mean_wlen,
             CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE) AS alpha_frac,
             n_stop,
             CAST(n_sym AS DOUBLE) / CAST(n_words AS DOUBLE) AS sym_ratio
           FROM b)
         SELECT doc_id, n_words, mean_wlen, alpha_frac, n_stop, sym_ratio,
           (n_words >= 50 AND n_words <= 100000) AS r_len,
           (mean_wlen >= 3.0 AND mean_wlen <= 10.0) AS r_wlen,
           (alpha_frac >= 0.8) AS r_alpha,
           (n_stop >= 2) AS r_stop,
           (sym_ratio <= 0.1) AS r_sym,
           ((n_words >= 50 AND n_words <= 100000)
             AND (mean_wlen >= 3.0 AND mean_wlen <= 10.0)
             AND (alpha_frac >= 0.8) AND (n_stop >= 2)
             AND (sym_ratio <= 0.1)) AS pass
         FROM r ORDER BY doc_id""",

    // epoch schedule: all-integer budget split (div / ceildiv / caps),
    // one final util divide
    "q179_epoch_schedule" ->
      s"""WITH s AS (SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT)
               AS tokens
           FROM documents GROUP BY source),
         g AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_sources FROM s),
         t AS (SELECT s.source, s.n_docs, s.tokens,
             (g.total_tokens * $EpochBudgetFactor) // g.n_sources
               AS target_tokens
           FROM s CROSS JOIN g),
         e AS (SELECT *, least(CAST($EpochMaxEpochs AS BIGINT),
             (target_tokens + tokens - 1) // tokens) AS epochs FROM t)
         SELECT source, n_docs, tokens, target_tokens, epochs,
           least(target_tokens, epochs * tokens) AS served_tokens,
           CAST(least(target_tokens, epochs * tokens) AS DOUBLE)
             / CAST(target_tokens AS DOUBLE) AS util
         FROM e ORDER BY source""",

    // HITS: unrolled integer-renormalized rounds over the distinct
    // directed crawl edges — no floats anywhere
    "q180_hits" -> hitsSql,

    // DoReMi-style multiplicative weights: per-source excess loss as
    // floor-scaled 1e-9-nat longs (lnChain + the zipf floor idiom),
    // then five unrolled all-integer reweight/renormalize rounds
    "q181_domain_reweight" -> domainReweightSql,

    // per-doc first-failing-stage attribution: q178's rule conjunction,
    // q64's cluster losers (recursive closure over the Q41 pair set),
    // q69's contamination divide — same sub-oracles, two left joins
    "q182_rejection_reasons" ->
      s"""WITH RECURSIVE pairs AS ($Q41Sql),
         e AS (SELECT doc_a AS u, doc_b AS v FROM pairs
               UNION SELECT doc_b, doc_a FROM pairs),
         reach(u, v) AS (
           SELECT u, v FROM e
           UNION
           SELECT r.u, e2.v FROM reach r JOIN e e2 ON r.v = e2.u WHERE e2.v <> r.u),
         losers AS (SELECT u AS doc_id FROM reach GROUP BY u
                    HAVING LEAST(u, MIN(v)) <> u),
         gw AS (SELECT doc_id, string_split(trim(text), ' ') AS toks,
             text FROM documents),
         gb AS (SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(toks, t -> CAST(len(t) AS BIGINT))),
               (a, x) -> a + x) AS sum_wlen,
             CAST(len(list_filter(toks,
               t -> regexp_matches(t, '[a-z]'))) AS BIGINT) AS n_alpha,
             CAST(len(list_filter(toks,
               t -> lower(t) IN ('the','a','and','of','data','row')))
               AS BIGINT) AS n_stop,
             CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS BIGINT)
               AS n_sym
           FROM gw),
         gp AS (SELECT doc_id,
             ((n_words >= 50 AND n_words <= 100000)
              AND (CAST(sum_wlen AS DOUBLE) / CAST(n_words AS DOUBLE) >= 3.0
                   AND CAST(sum_wlen AS DOUBLE) / CAST(n_words AS DOUBLE) <= 10.0)
              AND (CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE) >= 0.8)
              AND (n_stop >= 2)
              AND (CAST(n_sym AS DOUBLE) / CAST(n_words AS DOUBLE) <= 0.1))
               AS pass
           FROM gb),
         cbt AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
                 FROM documents WHERE source = 'src0'),
         cbg AS (SELECT DISTINCT unnest(list_distinct(list_transform(
             range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
           FROM cbt WHERE len(w) >= 3),
         cct AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
                 FROM documents WHERE source <> 'src0'),
         ccg AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
           FROM cct WHERE len(w) >= 3),
         csz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
                 FROM ccg GROUP BY doc_id),
         cht AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS hit_grams
                 FROM ccg JOIN cbg USING (g) GROUP BY doc_id),
         contam AS (SELECT s.doc_id,
             CAST(COALESCE(hit_grams, 0) AS DOUBLE) / n_grams AS contamination
           FROM csz s LEFT JOIN cht h ON s.doc_id = h.doc_id)
         SELECT d.doc_id, d.source,
           CAST(CASE WHEN NOT g.pass THEN 1
                WHEN l.doc_id IS NOT NULL THEN 2
                WHEN d.source <> 'src0'
                  AND COALESCE(c.contamination, 0.0) > $RejectContamTau THEN 3
                ELSE 0 END AS BIGINT) AS stage_id,
           CASE WHEN NOT g.pass THEN 'quality_rules'
                WHEN l.doc_id IS NOT NULL THEN 'near_dup'
                WHEN d.source <> 'src0'
                  AND COALESCE(c.contamination, 0.0) > $RejectContamTau
                  THEN 'contamination'
                ELSE 'kept' END AS reason
         FROM documents d
         JOIN gp g ON g.doc_id = d.doc_id
         LEFT JOIN losers l ON l.doc_id = d.doc_id
         LEFT JOIN contam c ON c.doc_id = d.doc_id
         ORDER BY d.doc_id""",

    // k-anonymity audit: one exact (type, hour, distinct-user) group
    // count and an integer compare — the q173 hour derivation
    "q183_k_anonymity" ->
      s"""SELECT event_type,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CASE WHEN COUNT(DISTINCT user_id) < $KAnonK THEN 'suppress'
                ELSE 'release' END AS status
         FROM events GROUP BY 1, 2 ORDER BY event_type, hour""",

    // l-diversity: the q183 class audit + an exact distinct count of
    // the sensitive attribute, verdicts in disclosure order
    "q185_l_diversity" ->
      s"""SELECT event_type,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(DISTINCT value) AS BIGINT) AS n_values,
           CASE WHEN COUNT(DISTINCT user_id) < $KAnonK THEN 'suppress'
                WHEN COUNT(DISTINCT value) < $LDivL THEN 'homogeneous'
                ELSE 'release' END AS status
         FROM events GROUP BY 1, 2 ORDER BY event_type, hour""",

    // longest contaminated run: positional grams, q107 split hash,
    // gaps-and-islands (pos - row_number constant within a run)
    "q186_contam_runs" ->
      """WITH toks AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
                       FROM documents),
         pg AS (SELECT doc_id,
             unnest(list_transform(range(1, len(w)-1),
               i -> struct_pack(pos := i - 1,
                 g := w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s,
             (((doc_id % 1000000007) * 2654435761) % 1000000007 + 40490) % 100
               AS h
           FROM toks WHERE len(w) >= 3),
         p AS (SELECT doc_id, struct_extract(s, 'pos') AS pos,
             struct_extract(s, 'g') AS g, h FROM pg),
         tg AS (SELECT DISTINCT g FROM p WHERE h < 80),
         te AS (SELECT doc_id, pos, g FROM p WHERE h >= 90),
         m AS (SELECT te.doc_id, te.pos FROM te JOIN tg ON te.g = tg.g),
         runs AS (SELECT doc_id,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           FROM m),
         rcnt AS (SELECT doc_id, grp, COUNT(*) AS cnt
           FROM runs GROUP BY doc_id, grp),
         rmax AS (SELECT doc_id, MAX(cnt) AS mr FROM rcnt GROUP BY doc_id),
         base AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
           FROM te GROUP BY doc_id)
         SELECT base.doc_id, n_grams,
           CAST(coalesce(mr, 0) AS BIGINT) AS max_run_grams,
           CAST(CASE WHEN coalesce(mr, 0) > 0 THEN mr + 2 ELSE 0 END
             AS BIGINT) AS max_run_tokens
         FROM base LEFT JOIN rmax ON base.doc_id = rmax.doc_id
         ORDER BY base.doc_id""",

    // vocabulary richness: one (source, tok) count, then Chao1
    // V + f1(f1-1)//(2(f2+1)) and Good-Turing f1/N — all integer
    "q187_vocab_richness" ->
      """WITH toks AS (SELECT source,
             unnest(string_split(lower(trim(text)), ' ')) AS tok
           FROM documents),
         tc AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
           FROM toks GROUP BY source, tok)
         SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
           CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
           CAST(COUNT(*) + (SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
               * (SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) - 1))
             // (2 * (SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) + 1))
             AS BIGINT) AS chao1,
           CAST((SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 100000000)
             // SUM(c) AS BIGINT) AS unseen_mass_e8
         FROM tc GROUP BY source ORDER BY source""",

    // duplication-aware weights: q64's recursive closure for labels,
    // singletons label = self, weight = 1e8 // cluster size
    "q188_dup_weight" ->
      s"""WITH RECURSIVE pairs AS ($Q41Sql),
         e AS (SELECT doc_a AS u, doc_b AS v FROM pairs
               UNION SELECT doc_b, doc_a FROM pairs),
         reach(u, v) AS (
           SELECT u, v FROM e
           UNION
           SELECT r.u, e2.v FROM reach r JOIN e e2 ON r.v = e2.u WHERE e2.v <> r.u),
         lab0 AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS label
           FROM reach GROUP BY u),
         docs AS (SELECT doc_id, source,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS tokens
           FROM documents),
         lab AS (SELECT d.doc_id, d.source, d.tokens,
             COALESCE(l.label, d.doc_id) AS label
           FROM docs d LEFT JOIN lab0 l ON d.doc_id = l.doc_id),
         sz AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS csize
           FROM lab GROUP BY label)
         SELECT lab.doc_id, lab.source, lab.label, sz.csize,
           CAST(100000000 // sz.csize AS BIGINT) AS weight_e8,
           lab.tokens,
           CAST(lab.tokens * (100000000 // sz.csize) AS BIGINT)
             AS eff_tokens_e8
         FROM lab JOIN sz ON lab.label = sz.label
         ORDER BY lab.doc_id""",

    // exact two-sample KS per source vs rest: integer cross-multiplied
    // ECDF numerators over the merged n_chars grid
    "q189_ks_drift" ->
      """WITH counts AS (SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS c
           FROM documents GROUP BY source, n_chars),
         vals AS (SELECT n_chars, CAST(SUM(c) AS BIGINT) AS vc
           FROM counts GROUP BY n_chars),
         gcum AS (SELECT n_chars,
             CAST(SUM(vc) OVER (ORDER BY n_chars) AS BIGINT) AS cum_all
           FROM vals),
         tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_all FROM counts),
         st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_src
           FROM counts GROUP BY source),
         grid AS (SELECT st.source, st.n_src, g.n_chars, g.cum_all,
             COALESCE(c.c, 0) AS c
           FROM st CROSS JOIN gcum g
           LEFT JOIN counts c ON c.source = st.source
             AND c.n_chars = g.n_chars),
         cums AS (SELECT source, n_src, n_chars, cum_all,
             CAST(SUM(c) OVER (PARTITION BY source ORDER BY n_chars)
               AS BIGINT) AS cum_src
           FROM grid)
         SELECT source, n_src, n_all - n_src AS n_rest,
           CAST(MAX(abs(cum_src * (n_all - n_src)
             - (cum_all - cum_src) * n_src)) AS BIGINT) AS ks_num,
           CAST(CASE WHEN n_all - n_src = 0 THEN 0
             ELSE MAX(abs(cum_src * (n_all - n_src)
               - (cum_all - cum_src) * n_src)) * 100000000
               // (n_src * (n_all - n_src)) END AS BIGINT) AS ks_e8
         FROM cums CROSS JOIN tot
         GROUP BY source, n_src, n_all ORDER BY source""",

    // conditional bigram entropy: MLE p(v|u) over the per-source
    // bigram table, 1e-9-nat floor-scaled long terms, lnChain ln
    "q196_cond_entropy" -> condEntropySql,

    // token burstiness: exact (doc, tok) then (tok) moments, one
    // fixed IEEE divide for the dispersion index
    "q194_burstiness" ->
      """WITH pd AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
           FROM (SELECT doc_id,
               unnest(string_split(lower(trim(text)), ' ')) AS tok
             FROM documents) GROUP BY doc_id, tok),
         tk AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
             CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(c * c) AS BIGINT) AS s2
           FROM pd GROUP BY tok),
         nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents)
         SELECT tok, df, n, s2,
           CAST(nd.nd * tk.s2 - tk.n * tk.n AS DOUBLE) /
             CAST(nd.nd * tk.n AS DOUBLE) AS dispersion
         FROM tk CROSS JOIN nd WHERE n >= 20 ORDER BY tok""",

    // coverage-by-rank: (count desc, tok) rank, cumulative occurrence
    // mass at the deepest rank <= k (saturates past the vocab size)
    "q190_vocab_coverage" ->
      """WITH toks AS (SELECT
             unnest(string_split(lower(trim(text)), ' ')) AS tok
           FROM documents),
         tc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
           FROM toks GROUP BY tok),
         tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM tc),
         ranked AS (SELECT
             CAST(ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS INTEGER) AS rk,
             CAST(SUM(c) OVER (ORDER BY c DESC, tok) AS BIGINT) AS cum
           FROM tc),
         ks AS (SELECT unnest([100, 1000, 10000]) AS k)
         SELECT CAST(ks.k AS INTEGER) AS k,
           CAST(MAX(rk) AS BIGINT) AS vocab_used,
           CAST(MAX(cum) AS BIGINT) AS covered,
           n_total,
           CAST(MAX(cum) * 100000000 // n_total AS BIGINT) AS coverage_e8
         FROM ks JOIN ranked ON ranked.rk <= ks.k CROSS JOIN tot
         GROUP BY ks.k, n_total ORDER BY k""",

    // Zipf slope: PortableLn via lnChain, regression terms floor-scaled
    // to 1e-9 longs (order-free sums), slope/intercept = fixed IEEE op
    // sequence mirroring TextAnalysis.q157
    "q157_zipf_fit" -> zipfSql,

    // lexicons mirror TextAnalysis.PosLexicon/NegLexicon verbatim;
    // polarity = one double divide over exact long counts
    "q159_sentiment" ->
      """WITH b AS (SELECT doc_id,
           CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(string_split(lower(trim(text)), ' '),
             t -> t IN ('fast','value','good','best','clean'))) AS BIGINT) AS n_pos,
           CAST(len(list_filter(string_split(lower(trim(text)), ' '),
             t -> t IN ('slow','small','bad','error','noise'))) AS BIGINT) AS n_neg
           FROM documents)
         SELECT doc_id, n_tokens, n_pos, n_neg,
           CAST(n_pos - n_neg AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS sentiment,
           CASE WHEN CAST(n_pos - n_neg AS DOUBLE) / CAST(n_tokens AS DOUBLE) > 0.05
                THEN 'positive'
                WHEN CAST(n_pos - n_neg AS DOUBLE) / CAST(n_tokens AS DOUBLE) < -0.05
                THEN 'negative'
                ELSE 'neutral' END AS label
         FROM b ORDER BY doc_id""",

    // skyline via the O(n^2) NOT EXISTS dominance definition — the
    // naive-but-obviously-correct form; the engine ships the
    // order-statistics plan (Relational.skyline2d), same answer
    "q158_skyline" ->
      """WITH b AS (SELECT doc_id,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(trim(text), ' '))) AS BIGINT) AS n_distinct,
           CAST(len(list_filter(string_split(trim(text), ' '),
             t -> lower(t) IN ('the','a','and','of','data','row'))) AS BIGINT) AS n_stop
           FROM documents),
         r AS (SELECT doc_id, n_tokens,
           (CAST(n_distinct AS DOUBLE)/n_tokens)*0.4 +
             least(1.0, CAST(n_tokens AS DOUBLE)/100.0)*0.3 +
             (CAST(n_stop AS DOUBLE)/n_tokens)*0.3 AS quality
           FROM b)
         SELECT doc_id, n_tokens, quality FROM r t
         WHERE NOT EXISTS (SELECT 1 FROM r o
           WHERE o.n_tokens >= t.n_tokens AND o.quality >= t.quality
             AND (o.n_tokens > t.n_tokens OR o.quality > t.quality))
         ORDER BY doc_id""",

    // per-doc Shannon entropy: c·ln(c) terms floor-scaled to 1e-9
    // longs (order-free per-doc sums), both ln's via lnChain — mirrors
    // TextAnalysis.q160's fixed IEEE sequence exactly
    "q160_token_entropy" ->
      s"""WITH toks AS (SELECT doc_id,
             unnest(string_split(lower(trim(text)), ' ')) AS tok
           FROM documents),
         cnt AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
           FROM toks GROUP BY doc_id, tok),
         ${lnChain("clc", "cnt", Seq("doc_id", "c"),
            Seq("CAST(c AS DOUBLE)" -> "lnc"))},
         ag AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(SUM(CAST(floor((CAST(c AS DOUBLE) * lnc) * 1000000000.0)
               AS BIGINT)) AS BIGINT) AS sclnc
           FROM clc GROUP BY doc_id),
         ${lnChain("dln", "ag",
            Seq("doc_id", "n_tokens", "n_distinct", "sclnc"),
            Seq("CAST(n_tokens AS DOUBLE)" -> "lnn",
                "CAST(n_distinct AS DOUBLE)" -> "lnd"))},
         e AS (SELECT doc_id, n_tokens, n_distinct,
             lnn - (CAST(sclnc AS DOUBLE) / 1000000000.0)
               / CAST(n_tokens AS DOUBLE) AS entropy,
             lnd
           FROM dln)
         SELECT doc_id, n_tokens, n_distinct, entropy,
           CASE WHEN n_distinct > 1 THEN 1.0 - entropy / lnd
                ELSE 1.0 END AS redundancy
         FROM e ORDER BY doc_id""",

    // hybrid RRF: the shared bm25RankedCtes text list fused with the
    // exact-cosine list of the query's anchor embedding; fusion term
    // order (text + vector) mirrors Similarity.q161 exactly
    "q161_hybrid_rrf" ->
      s"""WITH $bm25RankedCtes,
         tr AS (SELECT query_id, doc_id, "rank" AS r_text
           FROM bm25ranked WHERE "rank" <= $HybridDepth),
         e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         n AS (SELECT vec_id, v,
           sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(v, x -> x*x)), (a,b) -> a+b)) AS norm FROM e),
         p AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(1,65), i -> q.v[i]*c.v[i])), (a,b) -> a+b)
             / (q.norm * c.norm) AS cos
           FROM n q CROSS JOIN n c
           WHERE q.vec_id IN (SELECT DISTINCT query_id FROM qt)),
         vr0 AS (SELECT qid, nid, CAST(ROW_NUMBER() OVER (PARTITION BY qid
             ORDER BY cos DESC, nid) AS BIGINT) AS r_vec FROM p),
         vr AS (SELECT qid AS query_id, nid AS doc_id, r_vec
           FROM vr0 WHERE r_vec <= $HybridDepth),
         fused AS (SELECT COALESCE(tr.query_id, vr.query_id) AS query_id,
             COALESCE(tr.doc_id, vr.doc_id) AS doc_id, tr.r_text, vr.r_vec
           FROM tr FULL OUTER JOIN vr
             ON tr.query_id = vr.query_id AND tr.doc_id = vr.doc_id),
         sc AS (SELECT query_id, doc_id, r_text, r_vec,
             (CASE WHEN r_text IS NOT NULL
                   THEN 1.0 / (60.0 + CAST(r_text AS DOUBLE)) ELSE 0.0 END)
             + (CASE WHEN r_vec IS NOT NULL
                     THEN 1.0 / (60.0 + CAST(r_vec AS DOUBLE)) ELSE 0.0 END) AS rrf
           FROM fused),
         rk AS (SELECT query_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY rrf DESC, doc_id) AS BIGINT) AS "rank",
             doc_id, r_text, r_vec, rrf FROM sc)
         SELECT query_id, "rank", doc_id, r_text, r_vec, rrf FROM rk
         WHERE "rank" <= 10 ORDER BY query_id, "rank"""",

    // minimizer sketch: q50's poly hash per positional 3-gram, window
    // min over w consecutive hashes (tail suffixes included, like the
    // Spark frame), distinct per doc, equi-join candidates
    "q162_minimizer_neardup" -> MinimizerSql,

    // sketch calibration: exact q41 pairs vs q162 minimizer pairs,
    // one full-outer pair join + a one-row conditional-sum report;
    // guarded divides mirror the registered plan's `when` exactly
    "q184_sketch_eval" ->
      s"""WITH ex AS ($Q41Sql),
         sk AS ($MinimizerSql),
         exp AS (SELECT doc_a, doc_b FROM ex),
         skp AS (SELECT doc_a, doc_b FROM sk),
         j AS (SELECT (e.doc_a IS NOT NULL) AS in_exact,
                      (s.doc_a IS NOT NULL) AS in_sketch
               FROM exp e FULL OUTER JOIN skp s
                 ON e.doc_a = s.doc_a AND e.doc_b = s.doc_b),
         agg AS (SELECT
             CAST(SUM(CASE WHEN in_exact THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
             CAST(SUM(CASE WHEN in_sketch THEN 1 ELSE 0 END) AS BIGINT) AS n_sketch,
             CAST(SUM(CASE WHEN in_exact AND in_sketch THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN in_sketch AND NOT in_exact THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN in_exact AND NOT in_sketch THEN 1 ELSE 0 END) AS BIGINT) AS fn
           FROM j)
         SELECT n_exact, n_sketch, tp, fp, fn,
           CASE WHEN n_sketch > 0
                THEN CAST(tp AS DOUBLE) / CAST(n_sketch AS DOUBLE) END AS precision,
           CASE WHEN n_exact > 0
                THEN CAST(tp AS DOUBLE) / CAST(n_exact AS DOUBLE) END AS recall
         FROM agg""",

    // novelty: Q41-style distinct 3-grams -> poly hash -> doc
    // frequency -> per-doc unique fraction; one double divide
    "q163_ngram_novelty" ->
      """WITH toks AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents),
         grams AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
           FROM toks WHERE len(w) >= 3),
         h AS (SELECT doc_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(g, ''),
                 c -> CAST(unicode(c) AS BIGINT))),
               (h, c) -> (h*31 + c) % 1000000007) AS h
           FROM grams),
         dfq AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS df FROM h GROUP BY h),
         per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
           FROM h JOIN dfq USING(h) GROUP BY doc_id)
         SELECT doc_id, n_grams, n_novel,
           CAST(n_novel AS DOUBLE) / CAST(n_grams AS DOUBLE) AS novelty
         FROM per ORDER BY doc_id""",

    // RAKE: stopword-boundary phrases via a running per-doc window
    // count, deg/freq word scores, position-ordered phrase fold —
    // mirrors TextAnalysis.q166 (stopword list = Stopwords verbatim)
    "q166_rake_keywords" ->
      """WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS wd
           FROM documents),
         tok AS (SELECT doc_id, unnest(list_transform(range(1, len(wd)+1),
             i -> struct_pack(pos := i - 1, w := wd[i]))) AS s FROM t),
         tk AS (SELECT doc_id, struct_extract(s,'pos') AS pos,
             struct_extract(s,'w') AS w FROM tok),
         st AS (SELECT doc_id, pos, w,
             (w IN ('the','a','and','of','data','row')) AS stop FROM tk),
         sids AS (SELECT doc_id, pos, w, stop,
             SUM(CASE WHEN stop THEN 1 ELSE 0 END) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS UNBOUNDED PRECEDING) AS sid
           FROM st),
         words AS (SELECT doc_id, sid, pos, w FROM sids WHERE NOT stop),
         plen AS (SELECT doc_id, sid, CAST(COUNT(*) AS BIGINT) AS plen
           FROM words GROUP BY doc_id, sid),
         wstats AS (SELECT wo.doc_id, wo.w, CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(plen) AS BIGINT) AS deg
           FROM words wo JOIN plen p
             ON wo.doc_id = p.doc_id AND wo.sid = p.sid
           GROUP BY wo.doc_id, wo.w),
         ws AS (SELECT doc_id, w,
             CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE) AS wscore
           FROM wstats),
         ph AS (SELECT wo.doc_id, wo.sid,
             list_sort(list(struct_pack(pos := wo.pos, w := wo.w,
               wscore := ws.wscore))) AS xs
           FROM words wo JOIN ws
             ON wo.doc_id = ws.doc_id AND wo.w = ws.w
           GROUP BY wo.doc_id, wo.sid),
         sc AS (SELECT doc_id, sid,
             array_to_string(list_transform(xs,
               s -> struct_extract(s, 'w')), ' ') AS phrase,
             CAST(len(xs) AS BIGINT) AS n_words,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(xs, s -> struct_extract(s, 'wscore'))),
               (a, b) -> a + b) AS score
           FROM ph),
         rk AS (SELECT doc_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
               ORDER BY score DESC, phrase) AS BIGINT) AS "rank",
             phrase, n_words, score FROM sc)
         SELECT doc_id, "rank", phrase, n_words, score FROM rk
         WHERE "rank" <= 3 ORDER BY doc_id, "rank"""",

    // chi-squared drift: q117's hash-bucket twin, full source×bucket
    // grid (zero-observation buckets count), bucket-ordered fold
    "q167_chi2_drift" ->
      s"""WITH toks AS (SELECT source,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(tok, ''),
                 c -> CAST(unicode(c) AS BIGINT))),
               (h, c) -> (h*31 + c) % 1000000007) % $DsirBuckets AS b
           FROM (SELECT source,
               unnest(string_split(lower(trim(text)), ' ')) AS tok
             FROM documents)),
         sb AS (SELECT source, b, CAST(COUNT(*) AS BIGINT) AS o
           FROM toks GROUP BY source, b),
         cb AS (SELECT b, CAST(SUM(o) AS BIGINT) AS cb FROM sb GROUP BY b),
         nsrc AS (SELECT source, CAST(SUM(o) AS BIGINT) AS ns
           FROM sb GROUP BY source),
         nt AS (SELECT CAST(SUM(o) AS BIGINT) AS nt FROM sb),
         terms AS (SELECT g.source, g.ns, g.b,
             COALESCE(sb.o, 0) AS o, g.cb, nt.nt
           FROM (SELECT nsrc.source, nsrc.ns, cb.b, cb.cb
                 FROM nsrc CROSS JOIN cb) g
           LEFT JOIN sb ON sb.source = g.source AND sb.b = g.b
           CROSS JOIN nt),
         t2 AS (SELECT source, ns, b,
             (CAST(o AS DOUBLE) -
               (CAST(cb AS DOUBLE)*CAST(ns AS DOUBLE))/CAST(nt AS DOUBLE))
             * (CAST(o AS DOUBLE) -
               (CAST(cb AS DOUBLE)*CAST(ns AS DOUBLE))/CAST(nt AS DOUBLE))
             / ((CAST(cb AS DOUBLE)*CAST(ns AS DOUBLE))/CAST(nt AS DOUBLE))
               AS term
           FROM terms),
         folded AS (SELECT source, ns,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(list_sort(list(struct_pack(b := b,
                 term := term))), s -> struct_extract(s, 'term'))),
               (a, x) -> a + x) AS chi2
           FROM t2 GROUP BY source, ns)
         SELECT source, ns AS n_tokens, chi2,
           chi2 / CAST(ns AS DOUBLE) AS chi2_norm
         FROM folded ORDER BY source""",

    // Gini over per-domain doc counts; rank ties break on domain,
    // every sum integer until the one fixed IEEE tail
    "q168_domain_gini" ->
      s"""$UrlNormCte,
         bd AS (SELECT domain, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM nrm GROUP BY domain),
         rk AS (SELECT domain, cnt,
             CAST(ROW_NUMBER() OVER (ORDER BY cnt, domain) AS BIGINT) AS rk
           FROM bd),
         s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_domains,
             CAST(SUM(cnt) AS BIGINT) AS n_docs,
             CAST(SUM(rk * cnt) AS BIGINT) AS sixi
           FROM rk)
         SELECT n_domains, n_docs,
           (2.0 * CAST(sixi AS DOUBLE)) /
             (CAST(n_domains AS DOUBLE) * CAST(n_docs AS DOUBLE))
           - (CAST(n_domains AS DOUBLE) + 1.0) / CAST(n_domains AS DOUBLE)
             AS gini
         FROM s""",

    // semantic decontamination: exact max-cosine vs the broadcast
    // benchmark set (vec_id < SemBenchIds), q44's fold + tie-on-bid
    "q169_semantic_decontam" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         n AS (SELECT vec_id, v,
           sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(v, x -> x*x)), (a,b) -> a+b)) AS norm FROM e),
         p AS (SELECT c.vec_id, b.vec_id AS bid,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(range(1,65), i -> c.v[i]*b.v[i])), (a,x) -> a+x)
               / (c.norm * b.norm) AS cos
           FROM n c CROSS JOIN n b
           WHERE c.vec_id >= $SemBenchIds AND b.vec_id < $SemBenchIds),
         r AS (SELECT vec_id, bid, cos,
             ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY cos DESC, bid) AS rk FROM p)
         SELECT vec_id, bid AS nearest_bench, cos AS max_cos,
           CASE WHEN cos > $SemDecontamTau THEN 'contaminated'
                ELSE 'clean' END AS status
         FROM r WHERE rk = 1 ORDER BY vec_id""",

    // temporal split + embargo, integer-derived cutoffs; leak audit =
    // train∩test distinct users
    "q170_temporal_split" ->
      """WITH e AS (SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         b AS (SELECT MIN(us) AS lo, MAX(us) AS hi FROM e),
         t AS (SELECT user_id, us,
             CASE WHEN us < lo + ((hi - lo) * 7) // 10 THEN 'train'
                  WHEN us < lo + ((hi - lo) * 8) // 10 THEN 'embargo'
                  ELSE 'test' END AS split
           FROM e CROSS JOIN b),
         leak AS (SELECT CAST(COUNT(*) AS BIGINT) AS leak_users FROM
           (SELECT DISTINCT user_id FROM t WHERE split = 'train'
            INTERSECT
            SELECT DISTINCT user_id FROM t WHERE split = 'test'))
         SELECT split, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           leak.leak_users
         FROM t CROSS JOIN leak
         GROUP BY split, leak.leak_users ORDER BY split""",

    // consistent-hash rebalance: vnode positions via the q50 char-fold
    // hash over the SAME 's:<shard>:<j>' strings, ring lookup = first
    // element of the sorted (pos, shard) list, N-ring = shards < N
    "q171_shard_rebalance" ->
      s"""WITH vn AS (SELECT s.range AS s, j.range AS j,
             (list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split('s:' || s.range || ':' || j.range, ''),
                 c -> CAST(unicode(c) AS BIGINT))),
               (h, c) -> (h*31 + c) % 1000000007)
               * 2654435761) % 1000000007 AS pos
           FROM range($ShardM) s, range($ShardVnodes) j),
         rn AS (SELECT list_sort(list(struct_pack(pos := pos, shard := CAST(s AS BIGINT)))) AS ring
           FROM vn WHERE s < $ShardN),
         rm AS (SELECT list_sort(list(struct_pack(pos := pos, shard := CAST(s AS BIGINT)))) AS ring
           FROM vn),
         d AS (SELECT
             (list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(CAST(doc_id AS VARCHAR), ''),
                 c -> CAST(unicode(c) AS BIGINT))),
               (h, c) -> (h*31 + c) % 1000000007)
               * 2654435761) % 1000000007 AS h
           FROM documents),
         a AS (SELECT h,
             h % $ShardN AS mod_old, h % $ShardM AS mod_new,
             struct_extract((CASE WHEN len(list_filter(rn.ring,
                 x -> struct_extract(x, 'pos') >= h)) > 0
               THEN list_filter(rn.ring, x -> struct_extract(x, 'pos') >= h)
               ELSE rn.ring END)[1], 'shard') AS ring_old,
             struct_extract((CASE WHEN len(list_filter(rm.ring,
                 x -> struct_extract(x, 'pos') >= h)) > 0
               THEN list_filter(rm.ring, x -> struct_extract(x, 'pos') >= h)
               ELSE rm.ring END)[1], 'shard') AS ring_new
           FROM d CROSS JOIN rn CROSS JOIN rm),
         rep AS (
           SELECT 'mod' AS strategy, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN mod_old <> mod_new THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
             CAST(SUM(CASE WHEN mod_old <> mod_new AND mod_new >= $ShardN
               THEN 1 ELSE 0 END) AS BIGINT) AS moved_to_new
           FROM a
           UNION ALL
           SELECT 'ring', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN ring_old <> ring_new THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN ring_old <> ring_new AND ring_new >= $ShardN
               THEN 1 ELSE 0 END) AS BIGINT)
           FROM a)
         SELECT strategy, n_docs, n_moved, moved_to_new,
           CAST(n_moved AS DOUBLE) / CAST(n_docs AS DOUBLE) AS moved_frac
         FROM rep ORDER BY strategy""",

    // last-touch attribution: per-purchase rank over the user-keyed
    // touch join, ties touch_us desc then touch_id desc
    "q172_attribution" ->
      """WITH e AS (SELECT event_id, user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type FROM events),
         buys AS (SELECT event_id AS purchase_id, user_id,
             us AS purchase_us FROM e WHERE event_type = 'purchase'),
         touches AS (SELECT user_id, event_id AS touch_id, us AS touch_us,
             event_type AS touch_type
           FROM e WHERE event_type IN ('view', 'click')),
         j AS (SELECT b.purchase_id, t.touch_id, t.touch_us, t.touch_type,
             ROW_NUMBER() OVER (PARTITION BY b.purchase_id
               ORDER BY t.touch_us DESC, t.touch_id DESC) AS rk
           FROM buys b JOIN touches t ON b.user_id = t.user_id
             AND t.touch_us <= b.purchase_us
             AND t.touch_us >= b.purchase_us - 3600000000)
         SELECT b.purchase_id, b.user_id, b.purchase_us, j.touch_id,
           j.touch_us, j.touch_type,
           CASE WHEN j.touch_id IS NOT NULL THEN 'attributed'
                ELSE 'unattributed' END AS status
         FROM buys b LEFT JOIN (SELECT * FROM j WHERE rk = 1) j
           USING (purchase_id)
         ORDER BY purchase_id""",

    // hourly volume anomaly: integer count moments, one fixed IEEE
    // z sequence mirroring Events.q173
    "q173_hourly_anomaly" ->
      """WITH h AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
             CAST(COUNT(*) AS BIGINT) AS n_events FROM events GROUP BY 1),
         m AS (SELECT CAST(COUNT(*) AS BIGINT) AS nh,
             CAST(SUM(n_events) AS BIGINT) AS s,
             CAST(SUM(n_events * n_events) AS BIGINT) AS ss FROM h),
         zc AS (SELECT hour, n_events,
             (CAST(n_events AS DOUBLE) - CAST(s AS DOUBLE) / CAST(nh AS DOUBLE))
             / sqrt(CAST(ss AS DOUBLE) / CAST(nh AS DOUBLE)
                 - (CAST(s AS DOUBLE) / CAST(nh AS DOUBLE))
                   * (CAST(s AS DOUBLE) / CAST(nh AS DOUBLE)) + 1e-9) AS z
           FROM h CROSS JOIN m)
         SELECT hour, n_events, z,
           CASE WHEN z > 2.0 THEN 'spike'
                WHEN z < -2.0 THEN 'drought'
                ELSE 'normal' END AS flag
         FROM zc ORDER BY hour""",

    // triangles: NAIVE canonical a<b<c triple join — a different
    // algorithm than the engine's degree-oriented plan, same counts
    "q174_triangle_count" ->
      s"""$UrlNormCte,
         d AS (SELECT doc_id, domain FROM nrm),
         bounds AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM d),
         ed AS (
           SELECT a.domain AS src, b.domain AS dst
           FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
           UNION ALL
           SELECT a.domain AS src, b.domain AS dst
           FROM d a, bounds, d b
           WHERE a.doc_id = bounds.hi AND b.doc_id = bounds.lo),
         und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           FROM ed WHERE src <> dst),
         deg AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS deg FROM
           (SELECT a AS n FROM und UNION ALL SELECT b FROM und)
           GROUP BY n),
         tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
           FROM und x JOIN und y ON y.a = x.a AND y.b > x.b
           JOIN und z ON z.a = x.b AND z.b = y.b),
         stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(deg) // 2 AS BIGINT) AS n_edges,
             CAST(SUM((deg * (deg - 1)) // 2) AS BIGINT) AS wedges
           FROM deg)
         SELECT n_nodes, n_edges, n_triangles, wedges,
           CASE WHEN wedges > 0
                THEN 3.0 * CAST(n_triangles AS DOUBLE)
                  / CAST(wedges AS DOUBLE)
                ELSE 0.0 END AS clustering
         FROM stats CROSS JOIN tri""",

    // degree assortativity: both-orientation exact long moments over
    // the same undirected crawl edge set as q174, one IEEE divide
    "q195_assortativity" ->
      s"""$UrlNormCte,
         d AS (SELECT doc_id, domain FROM nrm),
         bounds AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM d),
         ed AS (
           SELECT a.domain AS src, b.domain AS dst
           FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
           UNION ALL
           SELECT a.domain AS src, b.domain AS dst
           FROM d a, bounds, d b
           WHERE a.doc_id = bounds.hi AND b.doc_id = bounds.lo),
         und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           FROM ed WHERE src <> dst),
         deg AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS deg FROM
           (SELECT a AS n FROM und UNION ALL SELECT b FROM und)
           GROUP BY n),
         nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg),
         mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
             CAST(COUNT(*) * 2 AS BIGINT) AS m,
             CAST(SUM(da.deg + db.deg) AS BIGINT) AS sx,
             CAST(SUM(da.deg * da.deg + db.deg * db.deg) AS BIGINT) AS sxx,
             CAST(SUM(da.deg * db.deg * 2) AS BIGINT) AS sxy
           FROM und JOIN deg da ON da.n = und.a JOIN deg db ON db.n = und.b)
         SELECT n_nodes, n_edges, m, sx, sxx, sxy,
           CASE WHEN m * sxx - sx * sx = 0 THEN 0.0
             ELSE CAST(m * sxy - sx * sx AS DOUBLE)
               / CAST(m * sxx - sx * sx AS DOUBLE) END AS assortativity
         FROM mo CROSS JOIN nn"""
  )

  /** q196 oracle: per-source conditional bigram entropy — bigrams via
    * the q186 per-row list unnest, MLE conditionals, the fixed-point
    * entropy idiom (floor-scaled 1e-9-nat longs, lnChain ln). */
  private lazy val condEntropySql: String =
    s"""WITH tk AS (SELECT source,
             string_split(lower(trim(text)), ' ') AS ws
           FROM documents),
         pg AS (SELECT source,
             unnest(list_transform(range(1, len(ws)),
               i -> struct_pack(u := ws[i], v := ws[i+1]))) AS s
           FROM tk WHERE len(ws) >= 2),
         bgr AS (SELECT source, struct_extract(s, 'u') AS u,
             struct_extract(s, 'v') AS v FROM pg),
         cbig AS (SELECT source, u, v, CAST(COUNT(*) AS BIGINT) AS c12
           FROM bgr GROUP BY source, u, v),
         cuni AS (SELECT source, u, CAST(SUM(c12) AS BIGINT) AS c1
           FROM cbig GROUP BY source, u),
         ctot AS (SELECT source, CAST(SUM(c12) AS BIGINT) AS n
           FROM cbig GROUP BY source),
         cpre AS (SELECT b.source, b.c12, CAST(t.n AS DOUBLE) AS nd,
             CAST(b.c12 AS DOUBLE) / CAST(u.c1 AS DOUBLE) AS r
           FROM cbig b JOIN cuni u ON u.source = b.source AND u.u = b.u
           JOIN ctot t ON t.source = b.source),
         ${lnChain("cbln", "cpre", Seq("source", "c12", "nd"),
            Seq("r" -> "lnv"))},
         ch AS (SELECT source, CAST(-SUM(CAST(floor(
             (CAST(c12 AS DOUBLE) / nd) * lnv * 1000000000.0)
             AS BIGINT)) AS BIGINT) AS h_cond_e9
           FROM cbln GROUP BY source)
         SELECT ch.source, t.n AS n_bigrams, ch.h_cond_e9,
           CAST(ch.h_cond_e9 AS DOUBLE) / 1000000000.0 AS h_cond_nats
         FROM ch JOIN ctot t ON t.source = ch.source
         ORDER BY ch.source"""

  private lazy val zipfSql: String = {
    def ds(c: String) = s"(CAST($c AS DOUBLE) / 1000000000.0)"
    val slope =
      s"((CAST(n AS DOUBLE) * ${ds("sfxy")} - ${ds("sfx")} * ${ds("sfy")}) / " +
      s"(CAST(n AS DOUBLE) * ${ds("sfxx")} - ${ds("sfx")} * ${ds("sfx")}))"
    s"""WITH tokens AS (SELECT unnest(string_split(lower(trim(text)), ' ')) AS tok
           FROM documents),
         vc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM tokens GROUP BY tok),
         topv AS (SELECT tok, cnt FROM vc ORDER BY cnt DESC, tok LIMIT 100),
         zv AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, tok)
             AS BIGINT) AS rank, cnt FROM topv),
         ${lnChain("zln", "zv", Seq("rank", "cnt"), Seq(
            "CAST(rank AS DOUBLE)" -> "lr",
            "CAST(cnt AS DOUBLE)" -> "lc"))},
         sums AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(floor(lr * 1000000000.0) AS BIGINT)) AS BIGINT) AS sfx,
             CAST(SUM(CAST(floor(lc * 1000000000.0) AS BIGINT)) AS BIGINT) AS sfy,
             CAST(SUM(CAST(floor((lr * lc) * 1000000000.0) AS BIGINT)) AS BIGINT) AS sfxy,
             CAST(SUM(CAST(floor((lr * lr) * 1000000000.0) AS BIGINT)) AS BIGINT) AS sfxx
           FROM zln)
         SELECT n AS n_terms, -($slope) AS alpha,
           ((${ds("sfy")} - $slope * ${ds("sfx")}) / CAST(n AS DOUBLE))
             AS intercept
         FROM sums"""
  }

  /** q181 oracle: per-source average negative unigram logprob as an
    * exact long (PortableLn via lnChain; each term floor-scaled to
    * 1e-9 nats BEFORE summing, so the per-source sum is order-free —
    * the zipf idiom), then `ReweightIters` unrolled all-integer
    * multiplicative-weights rounds mirroring
    * [[graft.operators.TextAnalysis.q181]]: raw = w·(1e6+e) // 1e6,
    * renormalize raw·1e8 // Σraw (the q180 precise form). Non-negative
    * domain throughout, so DuckDB `//` ≡ Spark `div` and every round
    * is bit-identical by induction. */
  private lazy val domainReweightSql: String = {
    val head = s"""WITH toks AS (SELECT source,
             unnest(string_split(lower(trim(text)), ' ')) AS tok
           FROM documents),
         st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n
                FROM toks GROUP BY source, tok),
         ct AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
         tt AS (SELECT COUNT(*) AS t FROM toks),
         pr0 AS (SELECT st.source, st.n, CAST(ct.c AS DOUBLE) / tt.t AS pr
           FROM st JOIN ct ON st.tok = ct.tok CROSS JOIN tt),
         ${lnChain("plp", "pr0", Seq("source", "n"),
            Seq("pr" -> "lnpr"))},
         terms AS (SELECT source, n,
             CAST(floor(CAST(n AS DOUBLE) * lnpr * 1000000000.0) AS BIGINT)
               AS lp9
           FROM plp),
         lo AS (SELECT source, CAST(SUM(n) AS BIGINT) AS tokens,
             CAST(SUM(lp9) AS BIGINT) AS lp9sum
           FROM terms GROUP BY source),
         base0 AS (SELECT source, tokens, (-lp9sum) // tokens AS loss
           FROM lo),
         mn AS (SELECT MIN(loss) AS lmin,
             CAST(COUNT(*) AS BIGINT) AS ns FROM base0),
         base AS MATERIALIZED (SELECT source, tokens, loss,
             (loss - mn.lmin) // 1000 AS e
           FROM base0 CROSS JOIN mn),
         w0 AS (SELECT b.source, 100000000 // mn.ns AS w
           FROM base b CROSS JOIN mn)"""
    val rounds = (1 to ReweightIters).map { k =>
      s""",
         r$k AS MATERIALIZED (SELECT b.source,
             (w.w * (1000000 + b.e)) // 1000000 AS raw
           FROM w${k - 1} w JOIN base b ON b.source = w.source),
         s$k AS (SELECT CAST(SUM(raw) AS BIGINT) AS S FROM r$k),
         w$k AS MATERIALIZED (SELECT r.source,
             (r.raw * 100000000) // s$k.S AS w
           FROM r$k r CROSS JOIN s$k)"""
    }.mkString
    head + rounds + s"""
         SELECT b.source, b.tokens, b.loss, w.w AS weight,
           CAST(w.w AS DOUBLE) / 1.0e8 AS weight_frac
         FROM base b JOIN w$ReweightIters w ON w.source = b.source
         ORDER BY b.source"""
  }

  /** Unrolled distributed-k-means oracle mirroring
    * [[graft.operators.KMeans.q155]]: seed = k smallest vec_ids,
    * dist = Σ floor((x−c)²·1e8) longs, argmin ties on lower cluster,
    * fixed-point means, empty-cluster carry. */
  private def KmeansK = 8
  private def KmeansIters = 5
  private lazy val kmeansCoreSql: String = {
    val head = s"""WITH e AS (SELECT vec_id, CAST(ii.i AS INTEGER) AS i,
             CAST(embedding[CAST(ii.i AS INTEGER) + 1] AS DOUBLE) AS x
           FROM embeddings
           CROSS JOIN (SELECT unnest(range(0, 64)) AS i) ii),
         seed AS (SELECT vec_id,
             CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INTEGER) - 1 AS ck
           FROM embeddings ORDER BY vec_id LIMIT $KmeansK),
         c0 AS (SELECT s.ck, e.i, e.x AS c
                FROM seed s JOIN e ON e.vec_id = s.vec_id)"""
    val rounds = (1 to KmeansIters).map { r =>
      s""",
         d$r AS (SELECT e.vec_id, c.ck,
             CAST(SUM(CAST(floor((e.x - c.c) * (e.x - c.c) * 100000000.0)
               AS BIGINT)) AS BIGINT) AS dist
           FROM e JOIN c${r - 1} c ON c.i = e.i
           GROUP BY e.vec_id, c.ck),
         a$r AS (SELECT vec_id, ck FROM (
             SELECT vec_id, ck,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY dist, ck) AS rn
             FROM d$r) WHERE rn = 1),
         m$r AS (SELECT a.ck, e.i,
             (CAST(SUM(CAST(floor(e.x * 100000000.0) AS BIGINT)) AS DOUBLE)
               / 100000000.0) / CAST(COUNT(*) AS DOUBLE) AS m
           FROM a$r a JOIN e ON e.vec_id = a.vec_id
           GROUP BY a.ck, e.i),
         c$r AS (SELECT p.ck, p.i, COALESCE(m.m, p.c) AS c
           FROM c${r - 1} p LEFT JOIN m$r m
             ON m.ck = p.ck AND m.i = p.i)"""
    }.mkString
    val fin = s""",
         df AS (SELECT e.vec_id, c.ck,
             CAST(SUM(CAST(floor((e.x - c.c) * (e.x - c.c) * 100000000.0)
               AS BIGINT)) AS BIGINT) AS dist
           FROM e JOIN c$KmeansIters c ON c.i = e.i
           GROUP BY e.vec_id, c.ck),
         fin AS (SELECT vec_id, ck, dist FROM (
           SELECT vec_id, ck, dist,
             ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY dist, ck) AS rn
           FROM df) WHERE rn = 1)"""
    head + rounds + fin
  }

  /** q155 oracle: the final per-vector assignment. */
  private lazy val kmeansAssignSql: String =
    kmeansCoreSql + """
         SELECT vec_id, CAST(ck AS INTEGER) AS cluster, dist
         FROM fin ORDER BY vec_id"""

  /** q156 oracle: per-cluster profile over the same assignment. */
  private lazy val kmeansProfileSql: String =
    kmeansCoreSql + """
         SELECT CAST(ck AS INTEGER) AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           (CAST(SUM(dist) AS DOUBLE) / 100000000.0) /
             CAST(COUNT(*) AS DOUBLE) AS mean_dist,
           CAST(MAX(dist) AS BIGINT) AS max_dist
         FROM fin GROUP BY ck ORDER BY cluster"""

  /** q191 oracle: per-cluster majority-label purity over the same
    * assignment joined to the embeddings' ground-truth labels. */
  private lazy val kmeansPuritySql: String =
    kmeansCoreSql + """,
         kasg AS (SELECT f.vec_id, f.ck, emb.label
           FROM fin f JOIN embeddings emb ON emb.vec_id = f.vec_id),
         kjoint AS (SELECT ck, label, CAST(COUNT(*) AS BIGINT) AS ncl
           FROM kasg GROUP BY ck, label),
         kmaj AS (SELECT ck, label, ncl FROM (
             SELECT ck, label, ncl,
               ROW_NUMBER() OVER (PARTITION BY ck
                 ORDER BY ncl DESC, label) AS rn
             FROM kjoint) WHERE rn = 1),
         ktot AS (SELECT ck, CAST(SUM(ncl) AS BIGINT) AS n_vecs
           FROM kjoint GROUP BY ck)
         SELECT CAST(t.ck AS INTEGER) AS cluster, t.n_vecs,
           m.label AS majority_label, m.ncl AS n_majority,
           CAST((m.ncl * 100000000) // t.n_vecs AS BIGINT) AS purity_e8
         FROM ktot t JOIN kmaj m ON m.ck = t.ck
         ORDER BY cluster"""

  /** q192 oracle: NMI between the assignment and the labels — every
    * I/H term floor-scaled to a 1e-9-nat long before summing, ln via
    * [[lnChain]] (the q181/q157 fixed-point entropy idiom), final nmi
    * one fixed IEEE divide; trivial partitions report 0. */
  private lazy val kmeansNmiSql: String =
    kmeansCoreSql + s""",
         nasg AS (SELECT f.vec_id, f.ck, emb.label
           FROM fin f JOIN embeddings emb ON emb.vec_id = f.vec_id),
         njoint AS (SELECT ck, label, CAST(COUNT(*) AS BIGINT) AS ncl
           FROM nasg GROUP BY ck, label),
         ncc AS (SELECT ck, CAST(SUM(ncl) AS BIGINT) AS nc
           FROM njoint GROUP BY ck),
         nll AS (SELECT label, CAST(SUM(ncl) AS BIGINT) AS nl
           FROM njoint GROUP BY label),
         ntt AS (SELECT CAST(SUM(ncl) AS BIGINT) AS n FROM njoint),
         ipre AS (SELECT j.ncl, CAST(t.n AS DOUBLE) AS nd,
             CAST(t.n * j.ncl AS DOUBLE) / CAST(c.nc * l.nl AS DOUBLE) AS r
           FROM njoint j JOIN ncc c ON c.ck = j.ck
           JOIN nll l ON l.label = j.label CROSS JOIN ntt t),
         ${lnChain("iln", "ipre", Seq("ncl", "nd"), Seq("r" -> "lnv"))},
         it AS (SELECT CAST(SUM(CAST(floor(
             (CAST(ncl AS DOUBLE) / nd) * lnv * 1000000000.0)
             AS BIGINT)) AS BIGINT) AS i_e9 FROM iln),
         hcpre AS (SELECT c.nc, CAST(t.n AS DOUBLE) AS nd,
             CAST(c.nc AS DOUBLE) / CAST(t.n AS DOUBLE) AS r
           FROM ncc c CROSS JOIN ntt t),
         ${lnChain("hcln", "hcpre", Seq("nc", "nd"), Seq("r" -> "lnv"))},
         hc AS (SELECT CAST(-SUM(CAST(floor(
             (CAST(nc AS DOUBLE) / nd) * lnv * 1000000000.0)
             AS BIGINT)) AS BIGINT) AS hc_e9 FROM hcln),
         hlpre AS (SELECT l.nl, CAST(t.n AS DOUBLE) AS nd,
             CAST(l.nl AS DOUBLE) / CAST(t.n AS DOUBLE) AS r
           FROM nll l CROSS JOIN ntt t),
         ${lnChain("hlln", "hlpre", Seq("nl", "nd"), Seq("r" -> "lnv"))},
         hl AS (SELECT CAST(-SUM(CAST(floor(
             (CAST(nl AS DOUBLE) / nd) * lnv * 1000000000.0)
             AS BIGINT)) AS BIGINT) AS hl_e9 FROM hlln)
         SELECT t.n AS n_vecs, it.i_e9, hc.hc_e9, hl.hl_e9,
           CASE WHEN hc.hc_e9 + hl.hl_e9 = 0 THEN 0.0
             ELSE CAST(it.i_e9 AS DOUBLE) /
               ((CAST(hc.hc_e9 AS DOUBLE) + CAST(hl.hl_e9 AS DOUBLE)) / 2.0)
             END AS nmi
         FROM it CROSS JOIN hc CROSS JOIN hl CROSS JOIN ntt t"""

  /** q177 oracle: SemDeDup = the unrolled k-means assignment (`fin`)
    * plus a within-cluster pairwise strict-fold cosine; dup_of = MIN
    * earlier vec_id above tau among same-cluster partners — mirrors
    * [[graft.operators.KMeans.q177]] decision for decision. The
    * cosine is the same left-to-right `list_reduce` fold as Q46Sql,
    * so the `> tau` compares agree bit-for-bit with DotProduct. */
  private lazy val semDedupSql: String =
    kmeansCoreSql + s""",
         sv AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         sn AS (SELECT vec_id, v,
             sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(v, x -> x*x)), (a,b) -> a+b)) AS norm
           FROM sv),
         mem AS (SELECT f.vec_id, f.ck, n.v, n.norm
           FROM fin f JOIN sn n ON n.vec_id = f.vec_id),
         pr AS (SELECT a.vec_id AS ida, b.vec_id AS idb,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(range(1,65), i -> a.v[i]*b.v[i])),
               (x,y) -> x+y) / (a.norm * b.norm) AS cos
           FROM mem a JOIN mem b
             ON a.ck = b.ck AND a.vec_id < b.vec_id),
         dups AS (SELECT idb AS vec_id, MIN(ida) AS dup_of
           FROM pr WHERE cos > $SemDedupTau GROUP BY idb)
         SELECT m.vec_id, CAST(m.ck AS INTEGER) AS cluster,
           CASE WHEN d.dup_of IS NULL THEN 'keep' ELSE 'drop' END AS status,
           d.dup_of
         FROM mem m LEFT JOIN dups d ON d.vec_id = m.vec_id
         ORDER BY m.vec_id"""

  /** Unrolled PageRank oracle over the [[UrlNormCte]] domains: the
    * crawl-chain edge derivation (doc i's domain → doc i+1's domain,
    * max wraps to min) then `PageRankIters` damped rounds mirroring
    * `Graphs.pagerank`'s IEEE op sequence exactly. */
  private def PageRankIters = 10 // def: immune to object-init ordering
  /** q165 round count — SparkEntry passes the same value. `final val`
    * literal: constant-folded at compile time, so the eager `sql` map
    * sees 5 regardless of object-init order (the PageRankIters
    * lesson). */
  final val LpaIters = 5

  /** q175 hop budget. */
  final val KhopHops = 6

  /** q175: BFS relax-and-min, `KhopHops` unrolled rounds over the
    * same symmetrized edges as q165 — all integers, exact. */
  private lazy val bfsSql: String = {
    val head = UrlNormCte + """,
         d AS (SELECT doc_id, domain FROM nrm),
         bounds AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM d),
         ed AS (
           SELECT a.domain AS src, b.domain AS dst
           FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
           UNION ALL
           SELECT a.domain AS src, b.domain AS dst
           FROM d a, bounds, d b
           WHERE a.doc_id = bounds.hi AND b.doc_id = bounds.lo),
         eu AS MATERIALIZED (SELECT DISTINCT src, dst FROM
           (SELECT src, dst FROM ed
            UNION ALL SELECT dst AS src, src AS dst FROM ed)),
         d0 AS (SELECT MIN(src) AS node, CAST(0 AS BIGINT) AS dist FROM eu)"""
    val rounds = (1 to KhopHops).map { k =>
      s""",
         d$k AS MATERIALIZED (SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
             SELECT node, dist FROM d${k - 1}
             UNION ALL
             SELECT eu.dst AS node, p.dist + 1 AS dist
             FROM eu JOIN d${k - 1} p ON eu.src = p.node)
           GROUP BY node)"""
    }.mkString
    head + rounds +
      s"\n         SELECT node AS domain, dist AS hop FROM d$KhopHops ORDER BY domain"
  }

  /** q165: synchronous label propagation, five UNROLLED rounds over
    * the symmetrized q154 crawl-chain edges; counts are exact longs,
    * labels are domain strings, tie rule = max count then MIN label —
    * no floats anywhere, bit-exact by construction. */
  private lazy val lpaSql: String = {
    val head = UrlNormCte + """,
         d AS (SELECT doc_id, domain FROM nrm),
         bounds AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM d),
         ed AS (
           SELECT a.domain AS src, b.domain AS dst
           FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
           UNION ALL
           SELECT a.domain AS src, b.domain AS dst
           FROM d a, bounds, d b
           WHERE a.doc_id = bounds.hi AND b.doc_id = bounds.lo),
         eu AS MATERIALIZED (SELECT DISTINCT src, dst FROM
           (SELECT src, dst FROM ed
            UNION ALL SELECT dst AS src, src AS dst FROM ed)),
         l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM eu)"""
    val rounds = (1 to LpaIters).map { k =>
      s""",
         nl$k AS MATERIALIZED (SELECT eu.dst AS node, l.lbl, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM eu JOIN l${k - 1} l ON eu.src = l.node
           GROUP BY eu.dst, l.lbl),
         mx$k AS (SELECT node, MAX(cnt) AS mc FROM nl$k GROUP BY node),
         l$k AS (SELECT n.node, MIN(n.lbl) AS lbl FROM nl$k n
           JOIN mx$k m ON n.node = m.node AND n.cnt = m.mc
           GROUP BY n.node)"""
    }.mkString
    head + rounds +
      s"\n         SELECT node AS domain, lbl AS community FROM l$LpaIters ORDER BY domain"
  }

  private lazy val pageRankSql: String = {
    val head = UrlNormCte + """,
         d AS (SELECT doc_id, domain FROM nrm),
         bounds AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM d),
         ed AS (
           SELECT a.domain AS src, b.domain AS dst
           FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
           UNION ALL
           SELECT a.domain AS src, b.domain AS dst
           FROM d a, bounds, d b
           WHERE a.doc_id = bounds.hi AND b.doc_id = bounds.lo),
         nodes AS (SELECT DISTINCT node FROM
           (SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed)),
         nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
         outd AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS od
                  FROM ed GROUP BY src),
         r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS pr
                FROM nodes, nn)"""
    val iters = (1 to PageRankIters).map { k =>
      s""",
         c$k AS (SELECT ed.dst AS node,
             SUM(CAST(floor(r.pr / CAST(outd.od AS DOUBLE) *
               1000000000000.0) AS BIGINT)) AS s
           FROM ed JOIN r${k - 1} r ON ed.src = r.node
           JOIN outd ON ed.src = outd.src
           GROUP BY ed.dst),
         r$k AS (SELECT nodes.node,
             (CAST(1.0 AS DOUBLE) - 0.85) / nn.n +
               0.85 * (CAST(COALESCE(c$k.s, 0) AS DOUBLE) /
                 1000000000000.0) AS pr
           FROM nodes CROSS JOIN nn LEFT JOIN c$k
             ON nodes.node = c$k.node)"""
    }.mkString
    head + iters +
      s"\n         SELECT node AS domain, pr FROM r$PageRankIters ORDER BY domain"
  }

  /** q180 oracle: `HitsIters` unrolled integer-renormalized HITS
    * rounds over the DISTINCT directed crawl edges — mirrors
    * [[graft.operators.Graphs.hits]]: each half-round is an exact long
    * sum of the opposite score followed by `raw·scale // total`
    * (DuckDB `//` and Spark `div` both truncate; every value is
    * non-negative, so the rounds are bit-identical by induction with
    * no float ops anywhere). Round order matters and is preserved:
    * auth from the PREVIOUS hub, then hub from the NEW auth.
    *
    * The multi-referenced CTEs (`eu`, `nodes`, every round) are
    * `AS MATERIALIZED`: DuckDB 1.0 INLINES every CTE reference, so a
    * 5-round chain that references `eu` twice a round would expand
    * the whole URL derivation 2¹⁰ times — materialization is purely
    * an execution hint, values are unchanged. */
  private lazy val hitsSql: String = {
    val head = UrlNormCte + s""",
         d AS (SELECT doc_id, domain FROM nrm),
         bounds AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM d),
         ed AS (
           SELECT a.domain AS src, b.domain AS dst
           FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
           UNION ALL
           SELECT a.domain AS src, b.domain AS dst
           FROM d a, bounds, d b
           WHERE a.doc_id = bounds.hi AND b.doc_id = bounds.lo),
         eu AS MATERIALIZED (SELECT DISTINCT src, dst FROM ed),
         nodes AS MATERIALIZED (SELECT DISTINCT node FROM
           (SELECT src AS node FROM eu UNION ALL SELECT dst FROM eu)),
         h0 AS (SELECT node, CAST($HitsScale AS BIGINT) AS h FROM nodes)"""
    val rounds = (1 to HitsIters).map { k =>
      s""",
         ar$k AS MATERIALIZED (
           SELECT eu.dst AS node, CAST(SUM(s.h) AS BIGINT) AS raw
           FROM eu JOIN h${k - 1} s ON eu.src = s.node GROUP BY eu.dst),
         at$k AS (SELECT CAST(SUM(raw) AS BIGINT) AS t FROM ar$k),
         a$k AS MATERIALIZED (SELECT n.node,
             COALESCE((COALESCE(r.raw, CAST(0 AS BIGINT)) *
               CAST($HitsScale AS BIGINT)) // t, CAST(0 AS BIGINT)) AS a
           FROM nodes n CROSS JOIN at$k LEFT JOIN ar$k r ON n.node = r.node),
         hr$k AS MATERIALIZED (
           SELECT eu.src AS node, CAST(SUM(s.a) AS BIGINT) AS raw
           FROM eu JOIN a$k s ON eu.dst = s.node GROUP BY eu.src),
         ht$k AS (SELECT CAST(SUM(raw) AS BIGINT) AS t FROM hr$k),
         h$k AS MATERIALIZED (SELECT n.node,
             COALESCE((COALESCE(r.raw, CAST(0 AS BIGINT)) *
               CAST($HitsScale AS BIGINT)) // t, CAST(0 AS BIGINT)) AS h
           FROM nodes n CROSS JOIN ht$k LEFT JOIN hr$k r ON n.node = r.node)"""
    }.mkString
    head + rounds + s"""
         SELECT h.node AS domain, h.h AS hub, a.a AS authority
         FROM h$HitsIters h JOIN a$HitsIters a ON a.node = h.node
         ORDER BY domain"""
  }

  /** Shared URL-derivation + normalization CTE for q148–q151 — the SQL
    * mirror of [[graft.operators.UrlCuration.withUrl]] (residues) and
    * `normalizeUrl`/`domainOf` (split_part/regexp algebra). Plain
    * concatenated string (no s-interpolation) so the regex
    * backreferences stay literal. */
  // lazy: textually after `sql`, which forces it during object init
  private lazy val UrlNormCte: String =
    "WITH u AS (\n" +
    "  SELECT doc_id,\n" +
    "    (CASE WHEN doc_id % 7 = 0 THEN 'HTTPS' ELSE 'https' END) || '://' ||\n" +
    "    (CASE WHEN doc_id % 4 = 0 THEN 'www.' ELSE '' END) ||\n" +
    "    source || '.' ||\n" +
    "    (CASE WHEN doc_id % 3 = 0 THEN 'com' WHEN doc_id % 3 = 1 THEN 'org'\n" +
    "          ELSE 'net' END) ||\n" +
    "    (CASE WHEN doc_id % 11 = 0 THEN ':443' ELSE '' END) ||\n" +
    "    '/page/' || CAST(doc_id % 12 AS VARCHAR) ||\n" +
    "    (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END) ||\n" +
    "    (CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed&utm_campaign=crawl'\n" +
    "          WHEN doc_id % 5 = 1 THEN '?ref=home' ELSE '' END) ||\n" +
    "    (CASE WHEN doc_id % 9 = 0 THEN '#section-2' ELSE '' END) AS url\n" +
    "  FROM documents),\n" +
    "n AS (SELECT doc_id, url,\n" +
    "    lower(split_part(url, '://', 1)) AS scheme,\n" +
    "    substr(url, strpos(url, '://') + 3) AS rest\n" +
    "  FROM u),\n" +
    "h AS (SELECT *, split_part(rest, '/', 1) AS host_port FROM n),\n" +
    "p AS (SELECT doc_id, url, scheme,\n" +
    "    regexp_replace(regexp_replace(lower(host_port), '^www\\.', ''),\n" +
    "      ':(443|80)$', '') AS host,\n" +
    "    substr(rest, length(host_port) + 1) AS pathqf\n" +
    "  FROM h),\n" +
    "q AS (SELECT doc_id, url, scheme, host,\n" +
    "    regexp_replace(\n" +
    "      regexp_replace(\n" +
    "        regexp_replace(split_part(pathqf, '#', 1),\n" +
    "          '[?&]utm_[^&#]*', '', 'g'),\n" +
    "        '^([^?]*)&', '\\1?'),\n" +
    "      '/+(\\?|$)', '\\1') AS np\n" +
    "  FROM p),\n" +
    "nrm AS (SELECT doc_id, url,\n" +
    "    scheme || '://' || host || np AS url_norm,\n" +
    "    array_to_string(string_split(host, '.')[-2:], '.') AS domain\n" +
    "  FROM q)"
}
