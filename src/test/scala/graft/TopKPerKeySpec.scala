package graft

import graft.operators.Events
import graft.Tables

/** Specs for the native two-phase top-k operator (plans.TopKPerKeyExec). */
class TopKPerKeySpec extends GraftSpec {
  import spark.implicits._

  test("q56 equals the window row_number formulation on real data") {
    val orders = Tables.orders(spark, SF)
    val native = Events.q56(orders).collect().toSeq
    val window = {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3).drop("rn")
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
        .collect().toSeq
    }
    assert(native == window)
  }

  test("the plan contains the two-phase exec and no window sort") {
    val df = Events.q56(Tables.orders(spark, SF))
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerKey \\[".r.findAllIn(plan).size == 2, plan) // partial + final
    assert(!plan.contains("Window"), plan)
  }

  test("ties beyond k are cut deterministically by the total order") {
    val df = Seq((1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 5.0), (1L, 13L, 5.0))
      .toDF("k", "id", "v")
    val top = Events.topKPerKey(df, Seq("k"), Seq(("v", false), ("id", true)), 3)
      .collect().map(_.getAs[Long]("id")).sorted
    assert(top.toSeq == Seq(10L, 11L, 12L))   // lowest ids win the tie-break
  }

  test("k larger than group size returns the whole group") {
    val df = Seq((1L, 1L, 1.0), (1L, 2L, 2.0)).toDF("k", "id", "v")
    val top = Events.topKPerKey(df, Seq("k"), Seq(("v", false)), 10)
    assert(top.count() == 2)
  }

  test("TopKRewrite turns row_number()<=k window-filter into the native operator") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val orders = Tables.orders(spark, SF)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val q = orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 2)
      .drop("rn")
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("TopKPerKey"), optimized)
    // and the rewrite preserves the window semantics exactly
    val viaRule = q.orderBy("o_custkey", "o_orderkey").collect().toSeq
    val native = Events.topKPerKey(
        orders.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
        Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 2)
      .orderBy("o_custkey", "o_orderkey").collect().toSeq
    assert(viaRule == native)
  }

  test("TopKRewrite bails on floating-point partition keys (0.0/-0.0 must share a group)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((0.0, 1L), (-0.0, 2L), (1.5, 3L)).toDF("k", "v")
    val w = Window.partitionBy(col("k")).orderBy(col("v"))
    val q = df.select(col("k"), col("v"), row_number().over(w).as("rn"))
      .filter(col("rn") <= 1).drop("rn")
    // vanilla path: NormalizeFloatingNumbers groups 0.0 with -0.0 → 2 rows
    assert(!q.queryExecution.optimizedPlan.toString.contains("TopKPerKey"))
    assert(q.count() == 2)
  }

  test("TopKRewrite leaves rank()-based filters alone (ties exceed k)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val orders = Tables.orders(spark, SF)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc)
    val q = orders
      .select(col("o_custkey"), col("o_orderkey"), rank().over(w).as("rnk"))
      .filter(col("rnk") <= 2).drop("rnk")
    assert(!q.queryExecution.optimizedPlan.toString.contains("TopKPerKey"))
  }

  test("unknown column names raise a named error") {
    val df = Seq((1L, 1.0)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Events.topKPerKey(df, Seq("nope"), Seq(("v", false)), 1)
    }
    assert(e.getMessage.contains("nope"))
  }
}
