package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import graft.Cols._

/** Window / event-log analytics (SURVEY.md §2b): ranking, running
  * aggregates, inter-arrival gaps, gap-based sessionization, funnels,
  * JSON prop extraction.
  *
  * All windows partition by a key (user/customer) — at 100 TB each
  * partition's state fits an executor; there is no single-partition
  * global window anywhere. The one globally-ordered computation (q33's
  * NTILE decile report) runs as a distributed rank: range-repartition,
  * per-partition row_number, and a broadcast join against the
  * O(numPartitions)-row offset histogram.
  */
object Events {

  /** Normalize `events.ts` to microsecond TimestampType regardless of how
    * the parquet nano timestamps surfaced (TIMESTAMP, TIMESTAMP_NTZ, or
    * raw int64 nanos under legacy readers). */
  def withTs(events: DataFrame): DataFrame = {
    val t = events.schema("ts").dataType match {
      case LongType          => timestamp_micros(expr("ts div 1000")) // int div: no double rounding
      case TimestampNTZType  => col("ts").cast(TimestampType)
      case _                 => col("ts")
    }
    events.withColumn("ts", t)
  }

  private val byUser = Window.partitionBy(col("user_id"))
    .orderBy(col("ts"), col("event_id"))

  /** q30: rank/dense_rank/row_number — top-3 orders per customer. */
  def q30(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"))
      .filter(col("rnk") <= 3)
      .orderBy(col("o_custkey"), col("rnk"), col("o_orderkey"))
  }

  /** q31: running (cumulative) sum per user — ROWS UNBOUNDED PRECEDING. */
  def q31(events: DataFrame): DataFrame =
    withTs(events).select(
        col("event_id"), col("user_id"), col("ts"),
        round(sum(dec(col("value"))).over(byUser.rowsBetween(Window.unboundedPreceding, 0)), 2)
          .cast("double").as("running_value"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))

  /** q32: lag — inter-arrival gap per user in microseconds (exact ints,
    * no float drift between engines). */
  def q32(events: DataFrame): DataFrame =
    withTs(events).select(
        col("event_id"), col("user_id"),
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser)))
          .as("gap_us"))
      .orderBy(col("user_id"), col("event_id"))

  /** q33: NTILE decile bucketing of order values — WITHOUT the
    * single-partition global window `ntile()` would need.
    *
    * Exact global ranks are computed distributed: range-repartition on
    * the sort key, row_number within each (already range-disjoint)
    * partition, then add each partition's start offset from a
    * broadcast of the per-partition row-count histogram. Offsets come
    * from a triangular self-join over that histogram —
    * O(numShufflePartitions²) pairs of driver-scale metadata, the same
    * bookkeeping RDD.zipWithIndex keeps — so the plan survives any data
    * scale by raising partition count, and no operator anywhere needs
    * single-partition execution. The NTILE bucket is then pure arithmetic
    * on (rank, n): the first n%10 buckets take one extra row, exactly
    * SQL NTILE's front-loaded split, so the DuckDB oracle hash-matches. */
  def q33(orders: DataFrame): DataFrame = {
    val sortCols = Seq(col("o_totalprice").desc, col("o_orderkey").asc)
    // persisted: histogram and rank chain BOTH read `base`, and the pid
    // column must be identical in each — persistence makes that
    // structural instead of relying on exchange reuse / deterministic
    // range sampling across two plan branches (Verify/Bench clearCache
    // per query, so the pin doesn't outlive the query)
    val base = orders.select(col("o_totalprice"), col("o_orderkey"))
      .repartitionByRange(sortCols: _*)
      .withColumn("pid", spark_partition_id())
      .transform(graft.Pins.pin)
    val hist = base.groupBy(col("pid")).agg(count(lit(1)).as("pn"))
    // prefix-sum over the O(numShufflePartitions)-row histogram as a
    // triangular self-join (partition p's offset = Σ pn of partitions
    // before it): O(p²) pairs on metadata-sized p, every operator with
    // defined partitioning — no single-partition WindowExec anywhere in
    // the plan (an unpartitioned window here would both WARN and plan a
    // global sort exchange for 32 rows)
    val prior = hist.select(col("pid").as("ppid"), col("pn").as("ppn"))
    val offs = hist.join(prior, col("ppid") < col("pid"), "left")
      .groupBy(col("pid"), col("pn"))
      .agg(coalesce(sum(col("ppn")), lit(0L)).as("off"))
    val tot = hist.agg(sum(col("pn")).as("n_total"))
    val wLocal = Window.partitionBy(col("pid")).orderBy(sortCols: _*)
    // NTILE(10) arithmetic on exact long ranks: bucket size n div 10,
    // first n%10 buckets take one extra row (integer `div` — no float
    // rounding at any n).
    val decile = expr(
      """CASE WHEN rn <= (n_total div 10 + 1) * (n_total % 10)
              THEN (rn - 1) div (n_total div 10 + 1) + 1
              ELSE n_total % 10
                   + (rn - (n_total div 10 + 1) * (n_total % 10) - 1)
                     div greatest(n_total div 10, 1) + 1
         END""")
    base
      .withColumn("rn_local", row_number().over(wLocal))
      .join(broadcast(offs.select(col("pid"), col("off"))), "pid")
      .crossJoin(broadcast(tot))
      .withColumn("rn", col("rn_local") + col("off"))
      .withColumn("decile", decile.cast("int"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total"))
      .orderBy(col("decile"))
  }

  /** q78: three-step ordered funnel (signup → click → purchase) with
    * per-step conversion rates, in ONE scan of the events table: three
    * stacked window minima over the same user partitioning (ts1 = first
    * signup; ts2 = first click after ts1; ts3 = first purchase after
    * ts2 — each `when` condition nulls out rows before the prior step,
    * so strict ordering is structural), then one per-user reduction and
    * one global count. A join-per-step formulation re-scans the fact
    * table once per stage — at funnel-table sizes that's the whole
    * query cost. Rates null out (not ANSI-error) on empty steps. */
  def q78(events: DataFrame): DataFrame = {
    val byUserAll = Window.partitionBy(col("user_id"))
    val e = withTs(events)
      .withColumn("ts1",
        min(when(col("event_type") === "signup", col("ts"))).over(byUserAll))
      .withColumn("ts2",
        min(when(col("event_type") === "click" && col("ts") > col("ts1"), col("ts")))
          .over(byUserAll))
      .withColumn("ts3",
        min(when(col("event_type") === "purchase" && col("ts") > col("ts2"), col("ts")))
          .over(byUserAll))
    val counts = e.groupBy(col("user_id"))
      .agg(max(col("ts1")).as("ts1"), max(col("ts2")).as("ts2"), max(col("ts3")).as("ts3"))
      .agg(count(col("ts1")).as("n_signup"), count(col("ts2")).as("n_click"),
        count(col("ts3")).as("n_purchase"))
    counts.select(col("n_signup"), col("n_click"), col("n_purchase"),
      when(col("n_signup") > 0, col("n_click").cast("double") / col("n_signup"))
        .as("rate_click"),
      when(col("n_click") > 0, col("n_purchase").cast("double") / col("n_click"))
        .as("rate_purchase"))
  }

  /** q73: time-series gap-fill — the resample + last-observation-
    * carried-forward pass event analytics runs before charting/joining
    * regular series. Each user's hourly spine comes from exploding a
    * `sequence` between that user's hour-truncated min/max (both ends
    * exact hour multiples, so Spark and DuckDB's generate_series agree
    * on inclusivity); missing hours LOCF-fill with a per-user ordered
    * window. Spine size is bounded per user (span hours), the explode
    * is distributed, and the window partitions by user — no global
    * anything. */
  def q73(events: DataFrame): DataFrame = {
    val e = withTs(events)
    val hourly = e.groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(moneySum(col("value")).as("hour_value"))
    // per-user span from the (already hour-truncated) aggregate — hour
    // truncation is monotone, so min/max over hourly buckets equal the
    // truncated min/max over raw events without a second events scan
    val spans = hourly.groupBy(col("user_id"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val spine = spans.select(col("user_id"),
      explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(hourly, Seq("user_id", "h"), "left_outer")
      .select(col("user_id"), col("h"), col("hour_value"),
        last(col("hour_value"), ignoreNulls = true).over(w).as("filled_value"))
      .orderBy(col("user_id"), col("h"))
  }

  private val SessionGapUs = 1800L * 1000 * 1000 // 30 min

  /** Gap-based session ids: new session when the gap to the previous
    * event of the same user exceeds 30 min; session_seq is the running
    * count of session starts (classic lag + cumulative-sum formulation —
    * two window passes over the same user partitioning, one shuffle). */
  def sessionized(events: DataFrame): DataFrame = {
    val gap = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser))
    withTs(events)
      .withColumn("is_new", when(gap.isNull || gap > SessionGapUs, 1).otherwise(0))
      .withColumn("session_seq",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** q34: session assignment per event. */
  def q34(events: DataFrame): DataFrame =
    sessionized(events)
      .select(col("user_id"), col("event_id"), col("session_seq"))
      .orderBy(col("user_id"), col("event_id"))

  /** q35: per-session stats — events, duration, value total. */
  def q35(events: DataFrame): DataFrame =
    sessionized(events)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("dur_us"),
        moneySum(col("value")).as("total_value"))
      .orderBy(col("user_id"), col("session_seq"))

  /** q36: ordered funnel — users whose first signup precedes their last
    * purchase. One shuffle (groupBy user), conditional min/max. */
  def q36(events: DataFrame): DataFrame =
    withTs(events)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("first_signup"),
        max(when(col("event_type") === "purchase", col("ts"))).as("last_purchase"))
      .filter(col("first_signup").isNotNull &&
        col("last_purchase") > col("first_signup"))
      .agg(count(lit(1)).as("converted_users"))

  /** q27: RANGE-frame window — per customer, the sum of order values
    * within a value-range frame (all orders whose orderkey is within 50
    * of the current one). RANGE frames bound by VALUE, not row count —
    * the semantics ROWS frames can't express. */
  def q27(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderkey")).rangeBetween(-50L, 0L)
    orders.select(
        col("o_custkey"), col("o_orderkey"),
        round(sum(dec(col("o_totalprice"))).over(w), 2).cast("double")
          .as("range_sum"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** q28: first_value / last_value / nth_value over a full-partition
    * frame — each customer's cheapest, priciest and second order value. */
  def q28(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders.select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        first(col("o_totalprice")).over(w).as("cheapest"),
        last(col("o_totalprice")).over(w).as("priciest"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_cheapest"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Per-key top-k via graft's native two-phase heap operator
    * ([[graft.plans.TopKPerKeyExec]]): bounded heaps before AND after the
    * key shuffle instead of a full window sort. Registered through
    * `spark.experimental.extraStrategies` so it works in any session.
    * Output rows are best-first within each key. */
  def topKPerKey(df: org.apache.spark.sql.DataFrame, keyCols: Seq[String],
                 orderCols: Seq[(String, Boolean)], k: Int): org.apache.spark.sql.DataFrame = {
    import graft.plans.{TopKPerKeyPlan, TopKPerKeyStrategy}
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val child = df.queryExecution.analyzed
    def attr(n: String) = child.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"no column $n in ${child.output.map(_.name)}"))
    val order = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending) }
    org.apache.spark.sql.graft.ColumnBridge.ofRows(spark,
      TopKPerKeyPlan(keyCols.map(attr), order, k, child))
  }

  /** q56: top-3 orders per customer through the native operator — same
    * result as q30's row_number()<=3 (the order is total, so ranks are
    * unambiguous), but with bounded heaps instead of a partition sort. */
  def q56(orders: DataFrame): DataFrame =
    topKPerKey(
      orders.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
      Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))

  /** q39: gap-based sessionization via Spark's native `session_window`
    * (one aggregation, window-merge semantics: a new session starts when
    * the inter-event gap is ≥ 30 min). Complements the lag+cumsum
    * formulation of q34/q35 and is the same operator Structured
    * Streaming uses for watermarked session state. */
  def q39(events: DataFrame): DataFrame =
    withTs(events)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), moneySum(col("value")).as("total_value"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("n_events"), col("total_value"))
      .orderBy(col("user_id"), col("s_start"))

  /** q60: as-of join — for every purchase, the most recent view at or
    * before it by the same user. Composed Spark-first (SURVEY §4 option
    * a): one union + one window pass per user, no range join blowup —
    * `last(ignoreNulls)` carries the latest view timestamp forward over
    * the event-time order. Shuffles ONCE on user_id. */
  def q60(events: DataFrame): DataFrame = {
    val e = withTs(events)
    val tagged = e.select(col("user_id"), col("ts"), col("event_id"),
      when(col("event_type") === "view", col("ts")).as("view_ts"),
      col("event_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("asof_view_ts", last(col("view_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts").as("buy_ts"),
        col("asof_view_ts"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** q66: JSON → typed struct (from_json with an explicit schema) — the
    * schema-on-read path that lets Catalyst prune/push on JSON fields
    * instead of re-parsing per extraction like q37's get_json_object. */
  def q66(events: DataFrame): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.IntegerType)))
    events
      .select(from_json(col("props"), schema).as("p"), col("event_type"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("p.k")).as("sum_k"),
        count(col("p.k")).as("k_present"))
      .orderBy(col("event_type"))
  }

  /** q37: JSON prop extraction (schema-on-read over the props column). */
  def q37(events: DataFrame): DataFrame =
    events
      .select((get_json_object(col("props"), "$.k").cast("int") % 10).as("k_mod"))
      .groupBy(col("k_mod"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("k_mod"))

  /** Generic POINT-IN-INTERVAL join WITHOUT an equi key, made
    * shuffle-joinable by BIN BLOCKING — the classic fix for the plan
    * Spark otherwise produces for a pure range predicate
    * (BroadcastNestedLoopJoin if one side is small, a cartesian
    * filter if neither is): every interval explodes into the
    * fixed-width bins it overlaps, every point maps to its ONE bin,
    * and the match becomes a hash equi-join on bin followed by the
    * exact bounds filter. No dedup is needed — a point can meet an
    * interval only in the point's own bin. True floor-division
    * binning (x − pmod(x, w)) div w, so negative domains bin
    * consistently.
    *
    * Scale: shuffle ∝ |points| + Σ(span/w) interval replicas — pick
    * `binWidth` near the typical span so replication stays O(1) per
    * interval; a degenerate giant interval costs span/w replicas
    * (cap spans upstream, or union a broadcast side-channel for the
    * handful of whales — the q71 salting argument applied to ranges).
    *
    * `points`: (point_id, x); `intervals`: (interval_id, lo, hi),
    * bounds inclusive. */
  def rangeJoinBinned(points: DataFrame, intervals: DataFrame,
                      binWidth: Long): DataFrame = {
    def binOf(c: org.apache.spark.sql.Column) =
      ((c - pmod(c, lit(binWidth))) / lit(binWidth)).cast("long")
    val ib = intervals.withColumn("bin",
      explode(sequence(binOf(col("lo")), binOf(col("hi")))))
    val pb = points.withColumn("bin", binOf(col("x")))
    pb.join(ib, Seq("bin"))
      .filter(col("x") >= col("lo") && col("x") <= col("hi"))
      .select(col("point_id"), col("x"), col("interval_id"),
        col("lo"), col("hi"))
  }

  /** q136: incident-window RANGE JOIN over the event log — which VIEW
    * events (any user — deliberately NO equi key) fall inside the
    * ±`windowUs` incident window around each PURCHASE: the forensics
    * query "what else was happening around the conversions" that a
    * pure range predicate answers with a nested-loop plan and
    * [[rangeJoinBinned]] answers with a hash join. Oracle is the
    * plain non-equi join (DuckDB can afford it at test SF); the spec
    * additionally asserts the binned plan contains a real equi join
    * and no nested-loop/cartesian node. */
  def q136(events: DataFrame, windowUs: Long = 300000000L,
           binWidth: Long = 600000000L): DataFrame = {
    val e = withTs(events)
    val points = e.filter(col("event_type") === "view")
      .select(col("event_id").as("point_id"),
        unix_micros(col("ts")).as("x"))
    val intervals = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("interval_id"),
        (unix_micros(col("ts")) - windowUs).as("lo"),
        (unix_micros(col("ts")) + windowUs).as("hi"))
    rangeJoinBinned(points, intervals, binWidth)
      .select(col("point_id"), col("interval_id"))
      .orderBy(col("point_id"), col("interval_id"))
  }

  /** q142: RETENTION COHORTS — the classic product-analytics matrix:
    * users grouped by their first-activity week (the cohort), each
    * later week reporting how many came back (`n_users`) and what
    * fraction of the cohort that is (`retention`). Plan shape at any
    * scale: one map-side-combined min-aggregate for each user's cohort
    * week, one shuffle join back on user_id (co-partitioned with the
    * aggregate — AQE plans it against the same exchange), one
    * count-distinct aggregate on (cohort, offset), and a weeks-sized
    * broadcast of cohort sizes (offset-0 rows) for the denominator.
    * No windows, nothing corpus-sized on one task. Week offsets use
    * integer day arithmetic (datediff/7 — exact in both engines);
    * retention is one double divide of exact longs (§6). */
  def q142(events: DataFrame): DataFrame = {
    val e = withTs(events)
      .select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("wk"))
    val cohorts = e.groupBy(col("user_id"))
      .agg(min(col("wk")).as("cohort_week"))
    val cells = e.join(cohorts, "user_id")
      .select(col("cohort_week"),
        (datediff(col("wk"), col("cohort_week")) / 7).cast("int")
          .as("week_offset"),
        col("user_id"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    val sizes = cells.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users").as("cohort_size"))
    cells.join(broadcast(sizes), "cohort_week")
      .withColumn("retention",
        col("n_users").cast("double") / col("cohort_size").cast("double"))
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        col("cohort_size"), col("retention"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** q172: LAST-TOUCH ATTRIBUTION — every purchase attributed to the
    * LATEST view/click by the same user within the preceding hour
    * (the standard marketing/behavior attribution join, and the
    * event-analytics sibling of q60's as-of join: as-of with a
    * lookback horizon and a type filter). Purchases with no touch in
    * the window report `unattributed` — the rows a funnel audit
    * actually reads.
    *
    * Plan shape: one user-keyed equi-join between the purchase and
    * touch streams with the time predicate as a residual filter, then
    * a per-purchase rank window — pairs are bounded by per-user
    * activity (the q36 funnel class), never corpus×corpus. Ties
    * (same touch ts) break on higher event_id, then the rank window
    * is fully deterministic. */
  def q172(events: DataFrame, lookbackUs: Long = 3600L * 1000000L): DataFrame = {
    val e = withTs(events).select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("us"), col("event_type"))
    val buys = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("us").as("purchase_us"))
    val touches = e.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("us").as("touch_us"), col("event_type").as("touch_type"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("purchase_id"))
      .orderBy(col("touch_us").desc, col("touch_id").desc)
    val attributed = buys.join(touches,
        buys("user_id") === touches("user_id") &&
        col("touch_us") <= col("purchase_us") &&
        col("touch_us") >= col("purchase_us") - lookbackUs)
      .select(col("purchase_id"), buys("user_id"), col("purchase_us"),
        col("touch_id"), col("touch_us"), col("touch_type"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).drop("rk")
    buys.join(attributed.select(col("purchase_id"), col("touch_id"),
        col("touch_us"), col("touch_type")), Seq("purchase_id"), "left_outer")
      .withColumn("status",
        when(col("touch_id").isNotNull, "attributed")
          .otherwise("unattributed"))
      .select(col("purchase_id"), col("user_id"), col("purchase_us"),
        col("touch_id"), col("touch_us"), col("touch_type"), col("status"))
      .orderBy(col("purchase_id"))
  }

  /** q173: HOURLY VOLUME ANOMALY flags — events-per-hour z-scored
    * against the corpus's own hourly mean/variance, |z| > 2 flagged:
    * the pipeline-monitoring read that catches a stalled producer
    * (missing hours score low) or a replay storm (spikes score high)
    * before any content-level check would. Counts and Σc² are exact
    * longs; mean/var/z are one fixed IEEE sequence over those sums →
    * hash-exact. The hour aggregate is map-side combined; the
    * one-row moments frame broadcasts back. */
  def q173(events: DataFrame, zMax: Double = 2.0): DataFrame = {
    val hours = withTs(events)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).cast("long").as("n_events"))
    val m = hours.agg(count(lit(1)).cast("long").as("nh"),
      sum(col("n_events")).cast("long").as("s"),
      sum(col("n_events") * col("n_events")).cast("long").as("ss"))
    val nhD = col("nh").cast("double")
    val mean = col("s").cast("double") / nhD
    val variance = col("ss").cast("double") / nhD - mean * mean
    hours.crossJoin(broadcast(m))
      .withColumn("z",
        (col("n_events").cast("double") - mean) /
          sqrt(variance + lit(1e-9)))
      .withColumn("flag",
        when(col("z") > zMax, "spike")
          .when(col("z") < -zMax, "drought")
          .otherwise("normal"))
      .select(col("hour"), col("n_events"), col("z"), col("flag"))
      .orderBy(col("hour"))
  }

  /** q170: TEMPORAL train/test SPLIT with an EMBARGO gap — the
    * time-series ML-hygiene operator: train = first 70% of the event
    * time range, embargo = next 10% (DROPPED — events too close to
    * the boundary leak near-future information into training), test
    * = the rest; plus the entity-leakage audit (users present in BOTH
    * train and test — the cross-contamination a per-event split
    * ignores and a per-user split over-corrects). Cutoffs derive from
    * the data's own µs range with INTEGER arithmetic (`div`), so the
    * assignment is exact in both engines.
    *
    * Plan shape: one scan + a broadcast one-row bounds frame; the
    * leakage audit is two distinct-user sets joined on user_id —
    * user-sized, not event-sized. */
  def q170(events: DataFrame): DataFrame = {
    val e = withTs(events)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val bounds = e.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
    val tagged = e.crossJoin(broadcast(bounds))
      .withColumn("cut1", col("lo") + expr("((hi - lo) * 7) div 10"))
      .withColumn("cut2", col("lo") + expr("((hi - lo) * 8) div 10"))
      .withColumn("split",
        when(col("us") < col("cut1"), "train")
          .when(col("us") < col("cut2"), "embargo")
          .otherwise("test"))
      .transform(graft.Pins.pin)
    val leak = tagged.filter(col("split") === "train")
      .select(col("user_id")).distinct()
      .join(tagged.filter(col("split") === "test")
        .select(col("user_id")).distinct(), "user_id")
      .agg(count(lit(1)).cast("long").as("leak_users"))
    tagged.groupBy(col("split"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        countDistinct(col("user_id")).cast("long").as("n_users"))
      .crossJoin(broadcast(leak))
      .orderBy(col("split"))
  }

  /** q183: K-ANONYMITY AUDIT (Sweeney 2002) over the event stream —
    * the privacy gate a behavioral dataset passes before it ships to
    * training or analytics: group events by their QUASI-IDENTIFIER
    * tuple (event_type × event hour — the released attributes an
    * adversary could join on), count DISTINCT users per equivalence
    * class, and mark classes with fewer than k users `suppress` —
    * releasing them would let those rows be re-identified by anyone
    * who knows one member's type+hour. The standard k-anonymity
    * verdict at class granularity; generalization (coarser hours,
    * merged types) is the remediation loop a curator runs until the
    * suppress mass is acceptable.
    *
    * Exactness: counts are exact longs, the verdict one integer
    * compare — hash-exact. Plan: ONE map-side-combined aggregate over
    * (type, hour); the distinct-user count shuffles (type, hour,
    * user) tuples, bounded by events not users — the same shape as
    * q173's hourly profile, scale-stable at any corpus size. */
  def q183(events: DataFrame, k: Int = 5): DataFrame =
    withTs(events)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        countDistinct(col("user_id")).cast("long").as("n_users"))
      .withColumn("status",
        when(col("n_users") < k, lit("suppress")).otherwise(lit("release")))
      .orderBy(col("event_type"), col("hour"))

  /** q185: L-DIVERSITY AUDIT (Machanavajjhala et al. 2007) — the
    * disclosure check k-anonymity ([[q183]]) cannot make: a class can
    * hold k distinct users yet carry ONE sensitive value, so releasing
    * it discloses every member's attribute even though no row
    * re-identifies. Per (event_type × hour) equivalence class: exact
    * distinct users AND exact distinct sensitive values (the event's
    * `value` column stands in for the sensitive attribute), verdict in
    * disclosure order — `suppress` (class under k users), else
    * `homogeneous` (k-anonymous but under l distinct values — the
    * homogeneity attack), else `release`. The remediation ladder is
    * the q183 one plus value generalization (bucketed sensitive
    * values) for homogeneous classes.
    *
    * Exactness: two exact distinct counts + two integer compares →
    * hash-exact. Plan: same single map-side-combined aggregate shape
    * as q183; the distinct shuffle carries (type, hour, user, value)
    * tuples, bounded by events. */
  def q185(events: DataFrame, k: Int = 5, l: Int = 3): DataFrame =
    withTs(events)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        countDistinct(col("user_id")).cast("long").as("n_users"),
        countDistinct(col("value")).cast("long").as("n_values"))
      .withColumn("status",
        when(col("n_users") < k, lit("suppress"))
          .when(col("n_values") < l, lit("homogeneous"))
          .otherwise(lit("release")))
      .orderBy(col("event_type"), col("hour"))
}
