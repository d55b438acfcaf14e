package graft

import java.sql.Timestamp
import java.time.Instant
import graft.operators.Events

/** Planted-data specs for event analytics (§2b) not already pinned by
  * planted tests elsewhere (most event queries are oracle-covered; these
  * check ordering semantics the oracle's aggregate can't isolate). */
class EventsSpec extends GraftSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, iso: String, typ: String) =
    (id, user, Timestamp.from(Instant.parse(iso)), typ, 1.0)

  test("q78 funnel counts only strictly ordered signup -> click -> purchase") {
    val rows = Seq(
      // user 1: full ordered funnel
      ev(1, 1, "2026-01-01T10:00:00Z", "signup"),
      ev(2, 1, "2026-01-01T10:05:00Z", "click"),
      ev(3, 1, "2026-01-01T10:10:00Z", "purchase"),
      // user 2: click BEFORE signup, purchase after — click step not reached
      ev(4, 2, "2026-01-01T09:00:00Z", "click"),
      ev(5, 2, "2026-01-01T10:00:00Z", "signup"),
      ev(6, 2, "2026-01-01T11:00:00Z", "purchase"),
      // user 3: signup + click, purchase before the click — not counted
      ev(7, 3, "2026-01-01T10:00:00Z", "signup"),
      ev(8, 3, "2026-01-01T10:30:00Z", "purchase"),
      ev(9, 3, "2026-01-01T11:00:00Z", "click"),
      // user 4: purchase only — no funnel entry
      ev(10, 4, "2026-01-01T10:00:00Z", "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val r = Events.q78(rows).collect().head
    assert(r.getAs[Long]("n_signup") == 3L)
    assert(r.getAs[Long]("n_click") == 2L)     // users 1 and 3
    assert(r.getAs[Long]("n_purchase") == 1L)  // only user 1 is ordered
    assert(r.getAs[Double]("rate_click") == 2.0 / 3)
    assert(r.getAs[Double]("rate_purchase") == 1.0 / 2)
  }

  test("q136 binned range join == naive non-equi join, and plans a real equi join") {
    import org.apache.spark.sql.functions.col
    // intervals spanning 1 and 3+ bins, points on exact bounds, a
    // point in two overlapping intervals, points in no interval
    val points = Seq(
      (1L, 5L), (2L, 10L), (3L, 25L), (4L, 99L), (5L, 40L), (6L, 250L)
    ).toDF("point_id", "x")
    val intervals = Seq(
      (100L, 10L, 30L),   // spans bins 0..3 at w=10 (10..30)
      (101L, 25L, 99L),   // overlaps 100 at 25..30; spans many bins
      (102L, 300L, 310L)  // matches nothing
    ).toDF("interval_id", "lo", "hi")
    val binned = Events.rangeJoinBinned(points, intervals, binWidth = 10L)
      .select(col("point_id"), col("interval_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals,
        col("x") >= col("lo") && col("x") <= col("hi")).collect()
      .map(r => (r.getAs[Long]("point_id"), r.getAs[Long]("interval_id"))).toSet
    assert(binned == naive)
    assert(binned == Set((2L, 100L), (3L, 100L), (3L, 101L), (4L, 101L),
      (5L, 101L)))
    // the binned plan is a hash/sort-merge EQUI join — never the
    // nested-loop/cartesian Spark gives a bare range predicate
    val plan = formattedPlan(
      Events.rangeJoinBinned(points, intervals, binWidth = 10L))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
    assert(plan.contains("Join") || plan.contains("HashJoin"))
    // negative domain bins consistently (true floor division)
    val negP = Seq((7L, -15L)).toDF("point_id", "x")
    val negI = Seq((200L, -20L, -10L)).toDF("interval_id", "lo", "hi")
    assert(Events.rangeJoinBinned(negP, negI, 10L).count() == 1L)
  }

  test("q73 hour_value is null exactly on gap hours, filled_value carries forward") {
    val rows = Seq(
      ev(1, 9, "2026-01-01T10:15:00Z", "view"),
      ev(2, 9, "2026-01-01T13:45:00Z", "view") // 11:00 and 12:00 are gaps
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Events.q73(rows).collect().sortBy(_.getAs[Timestamp]("h").getTime)
    assert(out.length == 4) // 10:00 .. 13:00 spine
    assert(!out(0).isNullAt(out(0).fieldIndex("hour_value")))
    assert(out(1).isNullAt(out(1).fieldIndex("hour_value")))
    assert(out(2).isNullAt(out(2).fieldIndex("hour_value")))
    assert(out.forall(r => r.getAs[Double]("filled_value") == 1.0))
  }

  test("q142 retention cohorts: planted return pattern, offset-0 full, fractions exact") {
    // 2026-01-05 and 2026-01-12 are Mondays: cohort A = users 1,2,3
    // (first seen wk0); user 1 returns wk1 and wk2, user 2 returns wk1;
    // cohort B = user 4 (first seen wk1), never returns
    val rows = Seq(
      ev(1, 1, "2026-01-05T10:00:00Z", "view"),
      ev(2, 2, "2026-01-06T10:00:00Z", "view"),
      ev(3, 3, "2026-01-07T10:00:00Z", "view"),
      ev(4, 1, "2026-01-12T10:00:00Z", "view"),
      ev(5, 2, "2026-01-13T10:00:00Z", "view"),
      ev(6, 1, "2026-01-19T10:00:00Z", "view"),
      ev(7, 4, "2026-01-14T10:00:00Z", "view"),
      // a second event of user 3 in its cohort week: no double count
      ev(8, 3, "2026-01-08T11:00:00Z", "view")
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Events.q142(rows).collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_week").toString,
        r.getAs[Int]("week_offset")) ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("cohort_size"),
          r.getAs[Double]("retention"))).toMap
    assert(out(("2026-01-05", 0)) == ((3L, 3L, 1.0)))
    assert(out(("2026-01-05", 1)) == ((2L, 3L, 2.0 / 3)))
    assert(out(("2026-01-05", 2)) == ((1L, 3L, 1.0 / 3)))
    assert(out(("2026-01-12", 0)) == ((1L, 1L, 1.0)))
    // no phantom cells: only the four planted (cohort, offset) pairs
    assert(out.size == 4)
  }

  test("q172 attribution: latest touch within the hour wins, outside-window unattributed") {
    val rows = Seq(
      ev(1, 1, "2024-01-01T10:00:00Z", "view"),
      ev(2, 1, "2024-01-01T10:30:00Z", "click"),    // latest touch
      ev(3, 1, "2024-01-01T10:45:00Z", "purchase"), // -> touch 2
      ev(4, 2, "2024-01-01T08:00:00Z", "view"),
      ev(5, 2, "2024-01-01T10:00:00Z", "purchase"), // 2h gap -> unattributed
      ev(6, 3, "2024-01-01T11:00:00Z", "purchase")  // no touches at all
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Events.q172(rows).collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        (Option(r.getAs[java.lang.Long]("touch_id")).map(_.toLong),
          r.getAs[String]("status"))).toMap
    assert(out(3L) == ((Some(2L), "attributed")), out)
    assert(out(5L) == ((None, "unattributed")), out)
    assert(out(6L) == ((None, "unattributed")), out)
  }

  test("q173 hourly anomaly: planted spike hour flags, steady hours normal") {
    val steady = (0 until 5).flatMap(h => (0 until 10).map(i =>
      ev(h * 100L + i, 1, f"2024-01-01T0$h%01d:${i * 5}%02d:00Z", "view")))
    val spike = (0 until 90).map(i =>
      ev(9000L + i, 2, f"2024-01-01T05:${i % 60}%02d:${i / 60}%02d`Z".replace("`",""), "view"))
    val rows = (steady ++ spike)
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Events.q173(rows).collect()
      .map(r => r.getAs[java.sql.Timestamp]("hour").toString ->
        (r.getAs[Long]("n_events"), r.getAs[String]("flag"))).toMap
    assert(out.size == 6)
    assert(out.exists { case (_, (n, f)) => n == 90L && f == "spike" }, out)
    assert(out.count { case (_, (_, f)) => f == "normal" } == 5, out)
  }

  test("q170 temporal split: 70/10/20 cutoffs, embargo dropped rows, leak audit") {
    // range 00:00..01:40 (100 s) -> train < 70 s, embargo < 80 s
    def at(s: Int) = f"2024-01-01T00:${s / 60}%02d:${s % 60}%02dZ"
    val rows = Seq(
      ev(1, 1, at(0), "a"), ev(2, 1, at(95), "a"),   // user 1 leaks
      ev(3, 2, at(10), "a"), ev(4, 2, at(75), "a"),  // user 2: train+embargo
      ev(5, 3, at(90), "a")                          // user 3: test only
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Events.q170(rows).collect()
      .map(r => r.getAs[String]("split") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_users"),
          r.getAs[Long]("leak_users"))).toMap
    assert(out("train") == ((2L, 2L, 1L)), out)
    assert(out("embargo") == ((1L, 1L, 1L)), out)
    assert(out("test") == ((2L, 2L, 1L)), out)
  }

  test("q183 k-anonymity: a 2-user class suppresses, a 5-user class releases") {
    // hour 00: type 'a' seen by 5 distinct users (k = 5 -> release);
    // hour 01: type 'a' seen by 2 users only (-> suppress); repeat
    // events don't help — the count is DISTINCT users
    val rows = (
      (1 to 5).map(u => ev(u.toLong, u.toLong, "2024-01-01T00:10:00Z", "a")) ++
      Seq(ev(6, 1, "2024-01-01T01:10:00Z", "a"),
        ev(7, 2, "2024-01-01T01:20:00Z", "a"),
        ev(8, 2, "2024-01-01T01:30:00Z", "a"))
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Events.q183(rows, k = 5).collect()
      .map(r => r.getAs[Timestamp]("hour").toInstant.toString ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_users"),
          r.getAs[String]("status"))).toMap
    assert(out("2024-01-01T00:00:00Z") == ((5L, 5L, "release")), out)
    assert(out("2024-01-01T01:00:00Z") == ((3L, 2L, "suppress")), out)
  }

  test("q185 l-diversity: homogeneous class caught that k-anonymity released") {
    def e(id: Long, user: Long, iso: String, v: Double) =
      (id, user, Timestamp.from(Instant.parse(iso)), "a", v)
    val rows = (
      // hour 00: 5 users, ONE sensitive value -> k passes, l fails
      (1 to 5).map(u => e(u.toLong, u.toLong, "2024-01-01T00:10:00Z", 7.0)) ++
      // hour 01: 5 users, 3 distinct values -> release
      (1 to 5).map(u => e(10 + u.toLong, u.toLong, "2024-01-01T01:10:00Z",
        (u % 3).toDouble)) ++
      // hour 02: 2 users -> suppress outranks homogeneity
      Seq(e(21, 1, "2024-01-01T02:10:00Z", 1.0),
        e(22, 2, "2024-01-01T02:20:00Z", 1.0))
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Events.q185(rows, k = 5, l = 3).collect()
      .map(r => r.getAs[Timestamp]("hour").toInstant.toString ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("n_values"),
          r.getAs[String]("status"))).toMap
    assert(out("2024-01-01T00:00:00Z") == ((5L, 1L, "homogeneous")), out)
    assert(out("2024-01-01T01:00:00Z") == ((5L, 3L, "release")), out)
    assert(out("2024-01-01T02:00:00Z") == ((2L, 1L, "suppress")), out)
  }
}
