package graft

/** Hive-compatible SQL-DDL surface: CREATE TABLE AS SELECT, INSERT,
  * views, DROP — driven entirely through spark.sql text. */
class SqlSurfaceSpec extends GraftSpec {

  test("CTAS, INSERT INTO, view, and DROP round-trip through SQL text") {
    Tables.nation(spark, SF).createOrReplaceTempView("nation_src")
    spark.sql("DROP TABLE IF EXISTS graft_ddl_nation")
    spark.sql(
      "CREATE TABLE graft_ddl_nation USING parquet AS SELECT * FROM nation_src")
    val base = spark.sql("SELECT count(*) FROM graft_ddl_nation").collect()(0).getLong(0)
    assert(base == Tables.nation(spark, SF).count())

    spark.sql(
      """INSERT INTO graft_ddl_nation
         SELECT n_nationkey + 1000, 'NATION_X', n_regionkey
         FROM nation_src WHERE n_nationkey = 0""")
    assert(spark.sql("SELECT count(*) FROM graft_ddl_nation")
      .collect()(0).getLong(0) == base + 1)

    spark.sql(
      """CREATE OR REPLACE TEMP VIEW big_nations AS
         SELECT * FROM graft_ddl_nation WHERE n_nationkey >= 1000""")
    assert(spark.sql("SELECT n_name FROM big_nations").collect()
      .map(_.getString(0)).toSeq == Seq("NATION_X"))

    spark.sql("DROP TABLE graft_ddl_nation")
    assert(!spark.catalog.tableExists("graft_ddl_nation"))
  }

  test("graft.Sql registers lake tables and answers SQL text (CLI surface)") {
    val registered = Sql.registerTables(spark, SF)
    assert(registered.toSet == Sql.TableNames.toSet) // full test lake
    val n = Sql.run(spark, SF,
      "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .collect()(0).getLong(0)
    assert(n == Tables.lineitem(spark, SF).count())
    // events view must be readable (nanos handling applied by the loader)
    assert(Sql.run(spark, SF, "SELECT max(ts) FROM events").collect().nonEmpty)
  }

  test("EXPLAIN and SHOW surfaces respond through SQL text") {
    Tables.region(spark, SF).createOrReplaceTempView("region_src")
    val explain = spark.sql("EXPLAIN SELECT count(*) FROM region_src")
      .collect()(0).getString(0)
    assert(explain.contains("Physical Plan"))
    assert(spark.sql("SHOW TABLES").collect().nonEmpty)
  }
}
