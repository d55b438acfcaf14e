package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Cols._

/** Relational core of the engine: the Hive/Spark batch-SQL surface
  * (SURVEY.md §2a). Every operator is a declarative DataFrame plan so
  * Catalyst handles pushdown/pruning/join-reorder; scale notes inline.
  *
  * Reference context: /root/reference/fact-hive ships no SQL operators of
  * its own (HiveOS wrapper scripts, see h-run.sh:1); the surface below is
  * the Hive-compatible batch-SQL capability set from BASELINE.json.
  */
object Relational {

  /** q01: TPC-H Q1 shape — scan-heavy groupBy agg. Partial (map-side)
    * aggregation makes the shuffle O(groups), not O(rows): the single
    * most important property at 100 TB. */
  def q01(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        sumStable(discPrice(col("l_extendedprice"), col("l_discount"))).as("sum_disc_price"),
        meanStable(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** q02: filter + narrow projection; predicate and column pruning must
    * reach the parquet scan (verified via explain: PushedFilters). */
  def q02(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_quantity") >= 45 && col("l_discount") > 0.05)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** q03: TPC-H Q3 shape — 3-way join + agg + top-k. customer is the
    * small side (broadcast); orders⋈lineitem shuffles on orderkey. */
  def q03(customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame =
    customer.filter(col("c_mktsegment") === "BUILDING")
      .join(orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sumStable(discPrice(col("l_extendedprice"), col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(20)

  /** q04: EXISTS with a correlated inequality → left-semi join (TPC-H Q4
    * shape). Semi join ships only the probe side's keys — no row blowup. */
  def q04(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1997-10-01").cast("timestamp"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey") &&
                      col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))

  /** q05: TPC-H Q5 shape — 6-table join. Dims (region/nation/supplier)
    * are broadcast explicitly; only orders⋈lineitem shuffles. */
  def q05(region: DataFrame, nation: DataFrame, customer: DataFrame,
          orders: DataFrame, lineitem: DataFrame, supplier: DataFrame): DataFrame =
    broadcast(region.filter(col("r_name") === "ASIA"))
      .join(broadcast(nation), col("n_regionkey") === col("r_regionkey"))
      .join(customer, col("c_nationkey") === col("n_nationkey"))
      .join(orders, col("o_custkey") === col("c_custkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1997-01-01").cast("timestamp"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier),
        col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(sumStable(discPrice(col("l_extendedprice"), col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  /** q06: TPC-H Q6 — selective single-table agg; every predicate must be
    * in PushedFilters so the scan skips row groups at 100 TB. */
  def q06(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp") &&
              col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
      .agg(sumStable(dec(col("l_extendedprice")) * dec(col("l_discount"))).as("revenue"))

  /** q07: NOT EXISTS → left-anti join: customers with no urgent orders. */
  def q07(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders.filter(col("o_orderpriority") === "1-URGENT"),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** q08: TPC-H Q13 shape — left outer join + null-aware count, then a
    * second aggregation over the distribution. */
  def q08(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders.filter(col("o_orderstatus") =!= "F"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** q09: distinct aggregation — count-distinct expands to a two-phase
    * aggregate (partial on key+value) under Catalyst. */
  def q09(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("distinct_parts"),
        countDistinct(col("l_suppkey")).as("distinct_supps"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** q10: global top-k. Spark plans order-by-limit as TakeOrderedAndProject:
    * per-partition heaps, no global sort — O(k) driver memory at any SF. */
  def q10(orders: DataFrame): DataFrame =
    orders.select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)

  /** q11: HAVING — post-aggregation filter. */
  def q11(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_suppkey"))
      .agg(moneySum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 15000.0)
      .orderBy(col("l_suppkey"))

  /** q12: conditional aggregation / pivot shape (TPC-H Q12 flavor) over a
    * join with a non-equi residual predicate. */
  def q12(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders.join(lineitem, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") >= col("o_orderdate"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
          .as("high_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
          .as("low_count"))
      .orderBy(col("l_linestatus"))

  /** q13: TPC-H Q17 shape — correlated scalar subquery, expressed as an
    * aggregate-then-join so the per-part threshold is computed once
    * (shuffle on partkey) instead of per probe row. */
  def q13(part: DataFrame, lineitem: DataFrame): DataFrame = {
    val perPart = lineitem.groupBy(col("l_partkey").as("t_partkey"))
      .agg((sum(dec(col("l_quantity"))).cast("double") / count(lit(1)) * lit(0.2))
        .as("qty_threshold"))
    lineitem
      .join(broadcast(part.filter(col("p_brand") === "Brand#23")),
        col("l_partkey") === col("p_partkey"))
      .join(perPart, col("l_partkey") === col("t_partkey"))
      .filter(col("l_quantity") < col("qty_threshold"))
      .agg(moneySum(col("l_extendedprice")).as("total_small_qty_price"))
  }

  /** q14: TPC-H Q18 shape — IN over an aggregated subquery → semi join on
    * the aggregated key set. */
  def q14(customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val bigOrders = lineitem.groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("s"))
      .filter(col("s") > 120)
      .select(col("l_orderkey").as("big_orderkey"))
    orders
      .join(bigOrders, col("o_orderkey") === col("big_orderkey"), "left_semi")
      .join(customer, col("c_custkey") === col("o_custkey"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"))
      .agg(moneySum(col("l_quantity")).as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** q15: UNION ALL of heterogeneous scans + reconciling agg. */
  def q15(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders.filter(col("o_orderstatus") === "O")
      .select(lit("order").as("src"), col("o_totalprice").as("v"))
      .unionAll(lineitem.filter(col("l_returnflag") === "R")
        .select(lit("line").as("src"), col("l_extendedprice").as("v")))
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n"), moneySum(col("v")).as("total"))
      .orderBy(col("src"))

  /** q16: INTERSECT / EXCEPT set operators. */
  def q16(lineitem: DataFrame): DataFrame = {
    val r = lineitem.filter(col("l_returnflag") === "R").select(col("l_partkey"))
    val a = lineitem.filter(col("l_returnflag") === "A").select(col("l_partkey"))
    r.intersect(a).agg(count(lit(1)).as("n")).select(lit("both").as("tag"), col("n"))
      .unionAll(
        r.except(a).agg(count(lit(1)).as("n")).select(lit("only_r").as("tag"), col("n")))
      .orderBy(col("tag"))
  }

  /** q17: ROLLUP hierarchy totals (nation → segment → grand total). */
  def q17(customer: DataFrame, nation: DataFrame): DataFrame =
    customer.join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"), moneySum(col("c_acctbal")).as("total_bal"))
      .orderBy(asc_nulls_first("n_name"), asc_nulls_first("c_mktsegment"))

  /** q18: CUBE cross totals over flag × status. */
  def q18(lineitem: DataFrame): DataFrame =
    lineitem.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), moneySum(col("l_quantity")).as("total_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** q19: explicit GROUPING SETS + GROUPING() indicator columns. */
  def q19(orders: DataFrame): DataFrame =
    orders.groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq.empty),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_prio"),
        count(lit(1)).as("n"),
        moneySum(col("o_totalprice")).as("total"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"),
        col("g_status"), col("g_prio"))

  /** q20: CTE reuse + self-join — supplier pairs co-located in a nation.
    * Self-join on nationkey; dim-sized inputs broadcast. */
  def q20(supplier: DataFrame, nation: DataFrame): DataFrame = {
    val s = supplier.select(col("s_suppkey"), col("s_nationkey"))
    s.as("a")
      .join(s.as("b"), col("a.s_nationkey") === col("b.s_nationkey") &&
        col("a.s_suppkey") < col("b.s_suppkey"))
      .join(broadcast(nation), col("a.s_nationkey") === col("n_nationkey"))
      .select(col("a.s_suppkey").as("s1"), col("b.s_suppkey").as("s2"), col("n_name"))
      .orderBy(col("s1"), col("s2"))
  }

  /** q21: string expression library — all codegen'd built-ins, no UDFs. */
  def q21(part: DataFrame): DataFrame =
    part.filter(col("p_name").rlike("(gold|blue)"))
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 4).as("pfx"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"))
      .orderBy(col("p_partkey"))

  /** q22: date/time expression library — extract + truncate + diff. */
  def q22(orders: DataFrame): DataFrame =
    orders
      .groupBy(
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"))
      .agg(
        count(lit(1)).as("n"),
        moneySum(col("o_totalprice")).as("total"))
      .orderBy(col("yr"), col("mo"))

  /** q23: exact per-group median. Quantities are integer-valued so the
    * 0.5-interpolation is exact in both engines (SURVEY.md §6). */
  def q23(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** q24: HLL sketch vs exact distinct — rows-only check; the spec
    * asserts the approximation is within 5%. At 100 TB the sketch is the
    * only option that avoids a full shuffle of the distinct keys. */
  def q24(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .orderBy(col("l_returnflag"))

  /** q26: TPC-H Q22 shape — correlated scalar (per-nation mean balance)
    * + NOT EXISTS, as a broadcast of the tiny per-nation aggregate and a
    * left-anti join. The per-group mean is computed once (shuffle on
    * nationkey ≤ 25 groups), never per probe row. */
  def q26(customer: DataFrame, orders: DataFrame): DataFrame = {
    val nationAvg = customer
      .groupBy(col("c_nationkey").as("n_key"))
      .agg(meanStable(col("c_acctbal")).as("avg_bal"))
    customer
      .join(broadcast(nationAvg), col("c_nationkey") === col("n_key"))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(orders, col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"), moneySum(col("c_acctbal")).as("total_bal"))
      .orderBy(col("c_nationkey"))
  }

  /** q29: relational pivot — wide conditional aggregation with explicit
    * pivot values (explicit values keep the plan a single pass; value
    * discovery would add a distinct scan). */
  def q29(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(moneySum(col("l_quantity")))
      .orderBy(col("l_linestatus"))

  /** q63: data-quality / integrity check suite (the dbt-test shape a
    * warehouse runs after every load): key uniqueness, referential
    * integrity via anti-joins, domain-range checks — one row per check
    * with its violation count. Anti-joins ship only keys; each check is
    * a partial-aggregated count. */
  def q63(customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame = {
    def check(name: String, violations: DataFrame): DataFrame =
      violations.agg(count(lit(1)).as("violations"))
        .select(lit(name).as("check_name"), col("violations"))
    check("dup_custkey",
        customer.groupBy(col("c_custkey")).agg(count(lit(1)).as("c"))
          .filter(col("c") > 1))
      .unionAll(check("orphan_orders",
        orders.join(customer, col("o_custkey") === col("c_custkey"), "left_anti")))
      .unionAll(check("orphan_lineitems",
        lineitem.join(orders, col("l_orderkey") === col("o_orderkey"), "left_anti")))
      .unionAll(check("neg_quantity", lineitem.filter(col("l_quantity") < 0)))
      .unionAll(check("bad_discount",
        lineitem.filter(col("l_discount") < 0 || col("l_discount") > 1)))
      .orderBy(col("check_name"))
  }

  /** q62: approximate percentiles (Greenwald-Khanna sketch) next to the
    * exact values — at 100 TB the sketch aggregates in one pass with
    * bounded memory while exact percentile shuffles every value. Spec
    * asserts the approximation error; rows-only gate (sketch internals
    * are engine-specific). */
  def q62(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx_median"),
        percentile(col("l_extendedprice"), lit(0.5)).as("exact_median"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(1000)).as("approx_p95"))
      .orderBy(col("l_returnflag"))

  /** q58: stratified sampling by DETERMINISTIC key hash — the
    * corpus-curation primitive for rebalancing sources. A row survives
    * iff mulhash(key) mod P falls under its stratum's threshold
    * (P = 1e9+7, Knuth multiplicative constant — the same
    * engine-portable hash as q80), so the sample is a pure function of
    * the key: reproducible across runs, engines, AND cluster layouts —
    * unlike `sampleBy`, whose draw depends on partition-local RNG
    * streams (repartition the input and the sample changes). The inner
    * `pmod` keeps the product inside int64 for arbitrary key magnitude
    * (ANSI mode throws on overflow). Hash-exact vs the DuckDB oracle.
    * Thresholds: floor(f·P) for f = O:0.1, F:0.5, P:1.0. */
  def q58(orders: DataFrame): DataFrame = {
    val h = pmod(pmod(col("o_orderkey"), lit(1000000007L)) * lit(2654435761L),
      lit(1000000007L))
    val thr = when(col("o_orderstatus") === "O", lit(100000000L))
      .when(col("o_orderstatus") === "F", lit(500000003L))
      .otherwise(lit(1000000007L))
    orders.filter(h < thr)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy(col("o_orderstatus"))
  }

  /** q59: data-profiling statistics — min/max/mean/stddev per measure.
    * Stddev via the exact-decimal moment form sqrt((Σx² − (Σx)²/n)/(n−1))
    * so both engines fold identically (Welford vs naive accumulation
    * would differ in the last bits); decimal sums are order-independent
    * across 1000 executors. */
  def q59(lineitem: DataFrame): DataFrame = {
    val p  = dec(col("l_extendedprice"))
    // quantity squares stay within int64-backed decimals in BOTH engines
    // (price² would overflow DuckDB's DECIMAL(18) unscaled int64)
    val q  = dec(col("l_quantity"))
    val n  = count(lit(1))
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        n.as("n"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        (sum(p).cast("double") / n).as("mean_price"),
        sqrt((sum(q * q).cast("double") - sum(q).cast("double") * sum(q).cast("double") / n)
          / (n - 1)).as("stddev_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** q72: correlation profiling via exact decimal moments — the same
    * §6 discipline as q59: all five sums fold in order-independent
    * decimals (small-valued columns so DuckDB's int64-backed decimals
    * never overflow). Each exact sum converts to double FIRST and the
    * Pearson expression runs entirely in identically-ordered IEEE
    * double ops — multiplying the decimals before converting would
    * exceed precision 38 at large n and make Spark clamp scale (round)
    * where DuckDB's int128 stays exact, drifting the last ulp. Single
    * partial-aggregated shuffle. */
  def q72(lineitem: DataFrame): DataFrame = {
    val x = dec(col("l_quantity"))
    val y = dec(col("l_discount"))
    val n = count(lit(1))
    def d(name: String) = col(name).cast("double")
    // null (not an ANSI divide-by-zero error) for degenerate groups:
    // n = 1 or zero variance in either column
    val dx = d("n") * d("sxx") - d("sx") * d("sx")
    val dy = d("n") * d("syy") - d("sy") * d("sy")
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(n.as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
      .select(col("l_returnflag"), col("n"),
        when(dx > 0 && dy > 0,
          (d("n") * d("sxy") - d("sx") * d("sy")) / (sqrt(dx) * sqrt(dy)))
          .as("corr_qty_disc"))
      .orderBy(col("l_returnflag"))
  }

  /** q25: the Hive-compatible SQL-text surface — the same engine driven
    * through `spark.sql` over registered views (TPC-H Q15 shape: CTE +
    * scalar subquery over the CTE). One Catalyst plan; the CTE is
    * evaluated once per reference by the optimizer. */
  def q25(spark: org.apache.spark.sql.SparkSession,
          lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    lineitem.createOrReplaceTempView("graft_lineitem")
    supplier.createOrReplaceTempView("graft_supplier")
    spark.sql("""
      WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                 * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))),2)
                 AS DOUBLE) AS total_revenue
        FROM graft_lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue
      FROM graft_supplier JOIN revenue ON s_suppkey = supplier_no
      WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      ORDER BY s_suppkey""")
  }

  /** Generic 2-D SKYLINE (Pareto maxima: keep rows no other row beats
    * on BOTH axes with a strict win on at least one) — the classic
    * multi-criteria OLAP operator (Börzsönyi et al., ICDE'01; Spark
    * SQL integration studied in EDBT'23, see PAPERS.md).
    *
    * The naive form is an O(n²) self-join — never shipped here.
    * For two dimensions dominance collapses to order statistics:
    * a row (x, y) is skyline iff y equals its x-group's max AND
    * every STRICTLY greater x has group-max < y. Plan: one map-side-
    * combined per-x aggregate (≤ distinct-x rows), a running max over
    * the distinct-x frame ordered by x desc (single-partition window
    * over GROUP-sized input — distinct doc lengths, not the corpus),
    * then one broadcast join back: the corpus is scanned twice and
    * never self-joined, at any scale. Ties on both axes are mutually
    * non-dominating and all kept (matching NOT EXISTS semantics). */
  def skyline2d(points: DataFrame, xc: String, yc: String): DataFrame = {
    val perX = points.groupBy(col(xc)).agg(max(col(yc)).as("_maxy"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(xc).desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val th = perX.withColumn("_gtmax", max(col("_maxy")).over(w))
    points.join(broadcast(th), xc)
      .filter(col(yc) === col("_maxy") &&
        (col("_gtmax").isNull || col("_gtmax") < col(yc)))
      .drop("_maxy", "_gtmax")
  }

  /** q158: the DOCUMENT skyline — Pareto-optimal docs on
    * (n_tokens ↑, q48 quality ↑): the multi-criteria shortlist a
    * curation review samples from ("longest docs that are also the
    * highest-quality at their length"), and the suite's resident
    * skyline-operator exemplar. quality is the oracle-exact q48
    * double, so dominance comparisons agree bit-for-bit across
    * engines; the oracle verifies with the O(n²) NOT EXISTS form —
    * same answer, naive plan. */
  def q158(documents: DataFrame): DataFrame =
    skyline2d(
      TextAnalysis.q48(documents)
        .select(col("doc_id"), col("n_tokens"), col("quality")),
      "n_tokens", "quality")
      .orderBy(col("doc_id"))
}
