package graft

import graft.operators.Relational
import graft.Tables._

/** Plan-shape and invariant specs for the relational core (§2a).
  * Value correctness is covered by the DuckDB oracle gate (tools/check.py);
  * these specs pin the SCALE properties: pushdown reaching the scan,
  * broadcast joins staying broadcast, top-k staying a TakeOrdered. */
class RelationalSpec extends GraftSpec {

  test("q02 pushes predicates and prunes columns at the parquet scan") {
    val plan = formattedPlan(Relational.q02(lineitem(spark, SF)))
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("GreaterThanOrEqual(l_quantity"), plan)
    // projection pruning: the scan must not read all 16 lineitem columns
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment"), readSchema)
  }

  test("q06 pushes all three range predicates into the scan") {
    val plan = formattedPlan(Relational.q06(lineitem(spark, SF)))
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("LessThan(l_quantity,24"), plan)
  }

  test("q05 keeps dimension joins broadcast (no shuffle on dims)") {
    val plan = formattedPlan(Relational.q05(region(spark, SF), nation(spark, SF),
      customer(spark, SF), orders(spark, SF), lineitem(spark, SF), supplier(spark, SF)))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q10 plans global top-k as TakeOrderedAndProject (no full sort)") {
    val plan = formattedPlan(Relational.q10(orders(spark, SF)))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q01 partial-aggregates map-side before the shuffle") {
    val plan = formattedPlan(Relational.q01(lineitem(spark, SF)))
    // two HashAggregate nodes (partial + final) around one exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("q58 stratified sample respects per-stratum fraction bounds") {
    val orders = Tables.orders(spark, SF)
    val totals = orders.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Relational.q58(orders).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_sampled")).toMap
    val fractions = Map("O" -> 0.1, "F" -> 0.5, "P" -> 1.0)
    sampled.foreach { case (k, n) =>
      val expect = totals(k) * fractions(k)
      assert(n <= totals(k))
      assert(math.abs(n - expect) <= math.max(10, expect * 0.5),
        s"stratum $k: sampled $n of ${totals(k)} (target fraction ${fractions(k)})")
    }
    assert(sampled.get("P").forall(_ == totals.getOrElse("P", 0L))) // fraction 1.0 keeps all
    // the sample is a pure function of the key: invariant under layout
    val reshuffled = Relational.q58(orders.repartition(13)).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_sampled")).toMap
    assert(reshuffled == sampled)
  }

  test("q62 approx percentile is within 2% of exact") {
    Relational.q62(lineitem(spark, SF)).collect().foreach { r =>
      val approx = r.getAs[Double]("approx_median")
      val exact  = r.getAs[Double]("exact_median")
      assert(math.abs(approx - exact) / exact <= 0.02, s"approx=$approx exact=$exact")
    }
  }

  test("q24 HLL approx distinct is within 5% of exact") {
    val rows = Relational.q24(lineitem(spark, SF)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact  = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05, s"approx=$approx exact=$exact")
    }
  }

  test("q158 skyline2d == brute-force dominance; ties on both axes kept") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val pts = Seq(
      (1L, 10L, 0.9), (2L, 20L, 0.8), (3L, 30L, 0.7),  // frontier
      (4L, 10L, 0.8),                                  // dominated by 1
      (5L, 20L, 0.8),                                  // tie with 2: kept
      (6L, 5L, 0.95),                                  // frontier (best y)
      (7L, 30L, 0.6),                                  // dominated by 3
      (8L, 30L, 0.7)                                   // tie with 3: kept
    ).toDF("doc_id", "x", "y")
    val got = graft.operators.Relational.skyline2d(pts, "x", "y")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // brute force: not dominated
    val all = pts.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val brute = all.filter { case (_, x, y) =>
      !all.exists { case (_, xa, ya) =>
        xa >= x && ya >= y && (xa > x || ya > y) }
    }.map(_._1).toSet
    assert(got == brute && got == Set(1L, 2L, 3L, 5L, 6L, 8L), s"$got vs $brute")
  }
}

