package graft

import java.nio.file.Files
import graft.sources.Sources
import graft.Tables

/** Round-trip + partition-pruning specs for sources/sinks (§2d). */
class SourcesSpec extends GraftSpec {

  private def tmp(tag: String) =
    Files.createTempDirectory(s"graft-$tag").toString + "/out"

  test("s02 partitioned parquet round-trips and prunes partitions on read") {
    val orders = Tables.orders(spark, SF)
    val path = tmp("part")
    Sources.writePartitionedParquet(orders, path, Seq("o_orderstatus"))
    val back = Sources.readParquet(spark, path)
    assert(back.count() == orders.count())

    val pruned = back.filter(back("o_orderstatus") === "O")
    val plan = formattedPlan(pruned)
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"), plan)
    assert(pruned.count() ==
      orders.filter(orders("o_orderstatus") === "O").count())
  }

  test("s04 bucketed tables join without a shuffle") {
    val orders = Tables.orders(spark, SF)
    val lineitem = Tables.lineitem(spark, SF)
    Sources.writeBucketed(orders.select("o_orderkey", "o_totalprice"),
      "graft_orders_b", "o_orderkey", 4)
    Sources.writeBucketed(lineitem.select("l_orderkey", "l_quantity"),
      "graft_lineitem_b", "l_orderkey", 4)
    // force the sort-merge path so the assert proves bucket co-location,
    // not a broadcast
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_orders_b")
        .join(spark.table("graft_lineitem_b"),
          spark.table("graft_orders_b")("o_orderkey") ===
          spark.table("graft_lineitem_b")("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)   // co-located: no shuffle
      assert(joined.count() == lineitem.count()) // every line has an order
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("s03 csv round-trips with schema") {
    val nation = Tables.nation(spark, SF)
    val path = tmp("csv")
    Sources.writeCsv(nation, path)
    val back = Sources.readCsv(spark, path, nation.schema)
    assert(back.schema == nation.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("s05 orc round-trips") {
    val nation = Tables.nation(spark, SF)
    val path = tmp("orc")
    nation.write.mode("overwrite").orc(path)
    val back = spark.read.orc(path)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("s03 json round-trips with schema") {
    val region = Tables.region(spark, SF)
    val path = tmp("json")
    Sources.writeJson(region, path)
    val back = Sources.readJson(spark, path, region.schema)
    assert(back.orderBy("r_regionkey").collect().toSeq ==
      region.orderBy("r_regionkey").collect().toSeq)
  }
}
