package graft

/** ddl02 — Hive-metastore DDL surface (SURVEY.md §2b): the catalog is a
  * real derby-backed Hive external metastore (GraftSession.hiveBuilder),
  * so CTAS / partitioned DDL issued through SQL text lands in persistent
  * table metadata, not the in-memory session catalog — the first thing a
  * Hive-warehouse user does. */
class HiveSurfaceSpec extends GraftSpec {

  test("ddl02: catalog implementation is the Hive external metastore") {
    assert(spark.conf.get("spark.sql.catalogImplementation") == "hive")
  }

  test("ddl02: partitioned CTAS + SHOW PARTITIONS + dynamic-partition INSERT OVERWRITE") {
    Tables.nation(spark, SF).createOrReplaceTempView("nation_src")
    spark.sql("DROP TABLE IF EXISTS graft_part_nation")
    // partitioned CTAS through SQL text — layout lands as one directory
    // per n_regionkey value under the metastore warehouse
    spark.sql(
      """CREATE TABLE graft_part_nation USING parquet
         PARTITIONED BY (n_regionkey)
         AS SELECT n_nationkey, n_name, n_regionkey FROM nation_src""")

    // persistent metadata: a metastore table, not a temp view
    val entry = spark.catalog.listTables().collect()
      .find(_.name == "graft_part_nation").get
    assert(!entry.isTemporary)

    val parts = spark.sql("SHOW PARTITIONS graft_part_nation")
      .collect().map(_.getString(0)).sorted
    assert(parts.length == 5 && parts.forall(_.startsWith("n_regionkey=")), parts.toSeq)

    // dynamic partition overwrite: rewrites ONLY the partitions the
    // insert produces (region 0 here) — every other partition's rows
    // must survive byte-identical
    spark.sql(
      """INSERT OVERWRITE TABLE graft_part_nation
         SELECT n_nationkey + 1000, upper(n_name), n_regionkey
         FROM nation_src WHERE n_regionkey = 0""")
    val after = spark.sql(
      """SELECT CAST(n_regionkey AS BIGINT), count(*) AS n,
                CAST(min(n_nationkey) AS BIGINT) AS mn
         FROM graft_part_nation GROUP BY 1""").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(after(0L)._2 >= 1000L, s"region 0 not rewritten: $after")
    assert((1L to 4L).forall(r => after(r)._2 < 1000L), s"other partitions clobbered: $after")
    assert(after.values.map(_._1).sum == Tables.nation(spark, SF).count())

    // partition pruning: a partition-key predicate must reach the scan
    // as a partition filter, not a data filter
    val plan = formattedPlan(spark.sql(
      "SELECT * FROM graft_part_nation WHERE n_regionkey = 2"))
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("n_regionkey"), plan)

    spark.sql("DROP TABLE graft_part_nation")
    assert(!spark.catalog.tableExists("graft_part_nation"))
  }

  test("ddl03: ALTER TABLE ADD COLUMNS and RENAME round-trip through SQL text") {
    Tables.region(spark, SF).createOrReplaceTempView("region_src")
    spark.sql("DROP TABLE IF EXISTS graft_alter_t")
    spark.sql("DROP TABLE IF EXISTS graft_alter_t2")
    spark.sql("CREATE TABLE graft_alter_t USING parquet AS SELECT * FROM region_src")
    spark.sql("ALTER TABLE graft_alter_t ADD COLUMNS (note STRING)")
    assert(spark.table("graft_alter_t").columns.contains("note"))
    // rows read back with the new column null-filled
    assert(spark.sql("SELECT count(*) FROM graft_alter_t WHERE note IS NULL")
      .collect()(0).getLong(0) == Tables.region(spark, SF).count())
    spark.sql("ALTER TABLE graft_alter_t RENAME TO graft_alter_t2")
    assert(!spark.catalog.tableExists("graft_alter_t"))
    assert(spark.catalog.tableExists("graft_alter_t2"))
    spark.sql("DROP TABLE graft_alter_t2")
  }

  test("ddl03: MSCK REPAIR discovers partitions written directly to the lake path") {
    val ext = java.nio.file.Files.createTempDirectory("graft-msck").toString
    Tables.nation(spark, SF).write
      .partitionBy("n_regionkey").parquet(s"$ext/t")
    spark.sql("DROP TABLE IF EXISTS graft_msck")
    // external partitioned table over files written OUTSIDE the catalog —
    // the metastore knows no partitions until MSCK REPAIR scans the path
    spark.sql(
      s"""CREATE TABLE graft_msck (n_nationkey INT, n_name STRING)
          USING parquet PARTITIONED BY (n_regionkey INT)
          LOCATION '$ext/t'""")
    assert(spark.sql("SHOW PARTITIONS graft_msck").collect().isEmpty)
    spark.sql("MSCK REPAIR TABLE graft_msck")
    assert(spark.sql("SHOW PARTITIONS graft_msck").collect().length == 5)
    assert(spark.table("graft_msck").count() == Tables.nation(spark, SF).count())
    spark.sql("DROP TABLE graft_msck")
  }

  test("ddl04: ANALYZE TABLE computes metastore statistics the optimizer can read") {
    Tables.orders(spark, SF).createOrReplaceTempView("orders_src")
    spark.sql("DROP TABLE IF EXISTS graft_stats_t")
    spark.sql("CREATE TABLE graft_stats_t USING parquet AS SELECT * FROM orders_src")
    spark.sql("ANALYZE TABLE graft_stats_t COMPUTE STATISTICS FOR COLUMNS o_orderkey, o_totalprice")
    val stats = spark.sql("DESCRIBE EXTENDED graft_stats_t")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(stats.contains("Statistics"), stats.keys.toSeq)
    val rowCount = Tables.orders(spark, SF).count()
    assert(stats("Statistics").contains(s"$rowCount rows"), stats("Statistics"))
    // column-level stats (min/max/ndv) land in the metastore too
    val colStats = spark.sql("DESCRIBE EXTENDED graft_stats_t o_orderkey")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(colStats.get("distinct_count").exists(_ != "NULL"), colStats)
    spark.sql("DROP TABLE graft_stats_t")
  }

  test("ddl11: ANALYZE stats are metastore-resident — a fresh session plans on them") {
    Tables.orders(spark, SF).createOrReplaceTempView("orders_src2")
    spark.sql("DROP TABLE IF EXISTS graft_stats_persist")
    spark.sql(
      "CREATE TABLE graft_stats_persist USING parquet AS SELECT * FROM orders_src2")
    spark.sql("ANALYZE TABLE graft_stats_persist COMPUTE STATISTICS FOR COLUMNS o_custkey")
    // fresh session state over the SAME metastore: the optimizer there
    // reads rowCount/ndv it never computed — the day-one warehouse
    // contract (stats are a table property, not session state)
    val s2 = spark.newSession()
    val stats = s2.sql("DESCRIBE EXTENDED graft_stats_persist")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val rowCount = Tables.orders(spark, SF).count()
    assert(stats.get("Statistics").exists(_.contains(s"$rowCount rows")), stats)
    val colStats = s2.sql("DESCRIBE EXTENDED graft_stats_persist o_custkey")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(colStats.get("distinct_count").exists(_ != "NULL"), colStats)
    spark.sql("DROP TABLE graft_stats_persist")
  }

  test("ddl06: CREATE VIEW persists in the metastore and survives a fresh session") {
    Tables.nation(spark, SF).createOrReplaceTempView("nation_view_src")
    spark.sql("DROP VIEW IF EXISTS graft_perm_view")
    spark.sql("DROP TABLE IF EXISTS graft_view_base")
    spark.sql(
      "CREATE TABLE graft_view_base USING parquet AS SELECT * FROM nation_view_src")
    // a PERSISTENT view: definition text lands in the metastore (unlike
    // ddl01's temp views, which die with the session state)
    spark.sql(
      """CREATE VIEW graft_perm_view AS
         SELECT n_regionkey, count(*) AS n FROM graft_view_base GROUP BY n_regionkey""")
    val s2 = spark.newSession()
    val entry = s2.catalog.listTables().collect().find(_.name == "graft_perm_view")
    assert(entry.exists(e => e.tableType == "VIEW" && !e.isTemporary), entry)
    assert(s2.sql("SELECT CAST(sum(n) AS BIGINT) FROM graft_perm_view")
      .collect()(0).getLong(0) == Tables.nation(spark, SF).count())
    // ALTER VIEW redefines in place; the new shape is what readers see
    spark.sql("ALTER VIEW graft_perm_view AS SELECT n_regionkey FROM graft_view_base")
    assert(spark.table("graft_perm_view").columns.toSeq == Seq("n_regionkey"))
    spark.sql("DROP VIEW graft_perm_view")
    spark.sql("DROP TABLE graft_view_base")
  }

  test("ddl02: CTAS metadata survives into a fresh session over the same metastore") {
    Tables.region(spark, SF).createOrReplaceTempView("region_src")
    spark.sql("DROP TABLE IF EXISTS graft_persist_region")
    spark.sql(
      "CREATE TABLE graft_persist_region USING parquet AS SELECT * FROM region_src")
    // newSession() = fresh session state (empty temp-view catalog) over
    // the SAME external metastore — the table is visible there while the
    // temp view is not, proving the metadata is metastore-resident
    val s2 = spark.newSession()
    assert(s2.catalog.tableExists("graft_persist_region"))
    assert(!s2.catalog.tableExists("region_src"))
    assert(s2.sql("SELECT count(*) FROM graft_persist_region")
      .collect()(0).getLong(0) == Tables.region(spark, SF).count())
    spark.sql("DROP TABLE graft_persist_region")
  }

  test("ddl07: Hive multi-insert — FROM src INSERT INTO t1 ... INSERT INTO t2 ...") {
    // the classic Hive one-scan fan-out: one FROM clause feeding
    // several INSERTs — the ETL shape that splits a staging table into
    // per-consumer tables without re-reading the source
    Tables.nation(spark, SF).createOrReplaceTempView("mi_src")
    spark.sql("DROP TABLE IF EXISTS graft_mi_low")
    spark.sql("DROP TABLE IF EXISTS graft_mi_high")
    spark.sql(
      "CREATE TABLE graft_mi_low  USING parquet AS SELECT * FROM mi_src WHERE 1=0")
    spark.sql(
      "CREATE TABLE graft_mi_high USING parquet AS SELECT * FROM mi_src WHERE 1=0")
    spark.sql(
      """FROM mi_src
         INSERT INTO graft_mi_low  SELECT * WHERE n_regionkey < 2
         INSERT INTO graft_mi_high SELECT * WHERE n_regionkey >= 2""")
    val low  = spark.table("graft_mi_low").collect()
    val high = spark.table("graft_mi_high").collect()
    assert(low.forall(_.getAs[Number]("n_regionkey").longValue < 2))
    assert(high.forall(_.getAs[Number]("n_regionkey").longValue >= 2))
    assert(low.length + high.length == Tables.nation(spark, SF).count())
    spark.sql("DROP TABLE graft_mi_low")
    spark.sql("DROP TABLE graft_mi_high")
  }

  test("ddl08: Hive TRANSFORM pipes rows through an external script") {
    // SELECT TRANSFORM(...) USING '<script>' — the Hive streaming-script
    // escape hatch (legacy ETL that shells out to awk/python). Rows
    // serialize tab-delimited to the script's stdin; its stdout parses
    // back as (key, value) strings. /bin/cat = identity transform.
    Tables.region(spark, SF).createOrReplaceTempView("tr_src")
    val out = spark.sql(
      """SELECT TRANSFORM(r_regionkey, r_name)
           USING '/bin/cat' AS (k, v)
         FROM tr_src""")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val exp = Tables.region(spark, SF)
      .collect().map(r => (r.getAs[Number]("r_regionkey").toString,
        r.getAs[String]("r_name"))).toSet
    assert(out == exp)
  }

  test("ddl09: SHOW CREATE TABLE emits DDL that re-creates the table faithfully") {
    spark.sql("DROP TABLE IF EXISTS graft_sct")
    spark.sql(
      """CREATE TABLE graft_sct (id BIGINT, name STRING, part INT)
         USING parquet PARTITIONED BY (part)""")
    val ddl = spark.sql("SHOW CREATE TABLE graft_sct")
      .collect().head.getString(0)
    assert(ddl.contains("graft_sct") && ddl.toLowerCase.contains("parquet"), ddl)
    assert(ddl.toLowerCase.contains("partitioned by"), ddl)
    val schema = spark.table("graft_sct").schema
    spark.sql("DROP TABLE graft_sct")
    // the emitted DDL is executable and round-trips schema + layout
    spark.sql(ddl)
    assert(spark.table("graft_sct").schema == schema)
    spark.sql("INSERT INTO graft_sct VALUES (1, 'a', 0), (2, 'b', 1)")
    assert(spark.sql("SHOW PARTITIONS graft_sct").count() == 2L)
    spark.sql("DROP TABLE graft_sct")
  }

  test("ddl09: DESCRIBE FORMATTED reports provider, location, and partitioning") {
    spark.sql("DROP TABLE IF EXISTS graft_dfmt")
    spark.sql(
      """CREATE TABLE graft_dfmt (id BIGINT, part INT)
         USING parquet PARTITIONED BY (part)""")
    val rows = spark.sql("DESCRIBE FORMATTED graft_dfmt").collect()
      .map(r => r.getString(0).trim -> r.getString(1)).toMap
    assert(rows.get("Provider").exists(_.toLowerCase.contains("parquet")), rows)
    assert(rows.get("Location").exists(_.nonEmpty), rows)
    assert(rows.contains("# Partition Information"), rows.keySet)
    assert(rows.get("Type").exists(_.contains("MANAGED")), rows)
    spark.sql("DROP TABLE graft_dfmt")
  }

  test("ddl09: CREATE TEMPORARY FUNCTION registers a JVM Hive UDF via SQL text") {
    spark.sql("CREATE TEMPORARY FUNCTION graft_tokens AS 'graft.functions.HiveTokenCount'")
    spark.sql("CREATE TEMPORARY FUNCTION graft_norm AS 'graft.functions.HiveNormalize'")
    assert(spark.sql("SELECT graft_tokens('  a b   c ')").collect().head.get(0) == 3)
    assert(spark.sql("SELECT graft_norm('  MiXeD Case ')")
      .collect().head.getString(0) == "mixed case")
    // parity with the engine's native token counting over real docs
    Tables.documents(spark, SF).createOrReplaceTempView("udf_docs")
    val diff = spark.sql(
      """SELECT count(*) FROM udf_docs
         WHERE graft_tokens(text) != size(split(trim(text), ' +'))""")
      .collect().head.getLong(0)
    assert(diff == 0L, s"$diff docs disagree with native tokenization")
    spark.sql("DROP TEMPORARY FUNCTION graft_tokens")
    spark.sql("DROP TEMPORARY FUNCTION graft_norm")
    intercept[Exception](spark.sql("SELECT graft_tokens('x')").collect())
  }

  test("ddl10: permanent functions survive catalog loss via the registry; SHOW FUNCTIONS round-trips") {
    import graft.sources.FunctionRegistry
    FunctionRegistry.createJvm(spark, "graft_perm_tokens",
      "graft.functions.HiveTokenCount")
    // SQL-body function = the Hive CREATE TEMPORARY MACRO lane,
    // catalog-resident and Catalyst-inlined
    FunctionRegistry.createSql(spark, "graft_quality_macro",
      "(x STRING) RETURNS DOUBLE RETURN length(x) * 0.1")
    val r = spark.sql(
      "SELECT graft_perm_tokens('a b c') AS n, graft_quality_macro('abcd') AS q")
      .head()
    assert(r.getInt(0) == 3 && math.abs(r.getDouble(1) - 0.4) < 1e-12, r)
    // SHOW FUNCTIONS round-trip: both visible as user functions
    val shown = spark.sql("SHOW USER FUNCTIONS").collect()
      .map(_.getString(0)).toSet
    assert(shown.exists(_.endsWith("graft_perm_tokens")), shown)
    assert(shown.exists(_.endsWith("graft_quality_macro")), shown)
    // simulate a restarted catalog: drop from the LIVE catalog only —
    // the registry file still holds the definitions
    spark.sql("DROP FUNCTION graft_perm_tokens")
    spark.sql("DROP FUNCTION graft_quality_macro")
    intercept[Exception](spark.sql("SELECT graft_perm_tokens('x')").head())
    val replayed = FunctionRegistry.replay(spark).toSet
    assert(replayed.contains("graft_perm_tokens") &&
      replayed.contains("graft_quality_macro"), replayed)
    val r2 = spark.sql(
      "SELECT graft_perm_tokens('a b c') AS n, graft_quality_macro('abcd') AS q")
      .head()
    assert(r2.getInt(0) == 3 && math.abs(r2.getDouble(1) - 0.4) < 1e-12, r2)
    // registry drop removes catalog entry AND the replay record
    FunctionRegistry.drop(spark, "graft_perm_tokens")
    FunctionRegistry.drop(spark, "graft_quality_macro")
    intercept[Exception](spark.sql("SELECT graft_perm_tokens('x')").head())
    val after = FunctionRegistry.replay(spark).toSet
    assert(!after.contains("graft_perm_tokens") &&
      !after.contains("graft_quality_macro"), after)
  }

  test("ddl12: CREATE TEMPORARY MACRO — Hive macros run as inlined SQL functions") {
    // typed-arg macro: return type inferred from the body (DOUBLE)
    spark.sql("CREATE TEMPORARY MACRO graft_sigmoid(x DOUBLE) 1.0 / (1.0 + exp(-x))")
    val v = spark.sql("SELECT graft_sigmoid(0.0) AS s").collect()(0).getDouble(0)
    assert(math.abs(v - 0.5) < 1e-12, v)
    // multi-arg with a parenthesized type (top-level comma split)
    spark.sql("CREATE TEMPORARY MACRO graft_taxed(p DECIMAL(10,2), r DOUBLE) p * (1.0 + r)")
    val t = spark.sql("SELECT graft_taxed(CAST(100.00 AS DECIMAL(10,2)), 0.2) AS t")
      .collect()(0).getDouble(0)
    assert(math.abs(t - 120.0) < 1e-9, t)
    // zero-arg macro; re-declaration REPLACES (the ddl10 idempotence)
    spark.sql("CREATE TEMPORARY MACRO graft_k() 41")
    spark.sql("CREATE TEMPORARY MACRO graft_k() 42")
    assert(spark.sql("SELECT graft_k() AS k").collect()(0).getInt(0) == 42)
    // the macro INLINES into the caller's plan: no UDF call node, the
    // body participates in constant folding like any native expression
    val plan = spark.sql("SELECT graft_k() AS k").queryExecution
      .optimizedPlan.toString
    assert(plan.contains("42"), plan)
    // string-typed inference + usage over a real table
    spark.sql("CREATE TEMPORARY MACRO graft_shout(s STRING) upper(concat(s, '!'))")
    Tables.region(spark, SF).createOrReplaceTempView("region_macro_src")
    val shouted = spark.sql(
      "SELECT graft_shout(r_name) AS x FROM region_macro_src ORDER BY x LIMIT 1")
      .collect()(0).getString(0)
    assert(shouted.endsWith("!") && shouted == shouted.toUpperCase, shouted)
    // DROP TEMPORARY MACRO removes it; IF EXISTS tolerates absence
    spark.sql("DROP TEMPORARY MACRO graft_k")
    intercept[Exception](spark.sql("SELECT graft_k()").collect())
    spark.sql("DROP TEMPORARY MACRO IF EXISTS graft_never_was")
    spark.sql("DROP TEMPORARY MACRO IF EXISTS graft_sigmoid")
    spark.sql("DROP TEMPORARY MACRO IF EXISTS graft_taxed")
    spark.sql("DROP TEMPORARY MACRO IF EXISTS graft_shout")
  }

  test("ddl09: INSERT OVERWRITE DIRECTORY exports query results to a lake path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-iod").toString
    Tables.nation(spark, SF).createOrReplaceTempView("iod_src")
    spark.sql(
      s"""INSERT OVERWRITE DIRECTORY '$dir' USING parquet
          SELECT n_nationkey, n_name FROM iod_src WHERE n_regionkey = 0""")
    val out = spark.read.parquet(dir)
    assert(out.count() == 5L)
    assert(out.columns.toSeq == Seq("n_nationkey", "n_name"))
    // OVERWRITE replaces, never appends
    spark.sql(
      s"""INSERT OVERWRITE DIRECTORY '$dir' USING parquet
          SELECT n_nationkey FROM iod_src WHERE n_regionkey = 1""")
    val again = spark.read.parquet(dir)
    assert(again.count() == 5L && again.columns.toSeq == Seq("n_nationkey"))
  }

  test("ddl09: CLUSTERED BY ... SORTED BY bucket metadata lands in the catalog") {
    spark.sql("DROP TABLE IF EXISTS graft_bkt")
    Tables.nation(spark, SF).createOrReplaceTempView("bkt_src")
    spark.sql(
      """CREATE TABLE graft_bkt USING parquet
         CLUSTERED BY (n_nationkey) SORTED BY (n_name) INTO 4 BUCKETS
         AS SELECT * FROM bkt_src""")
    val rows = spark.sql("DESCRIBE FORMATTED graft_bkt").collect()
      .map(r => r.getString(0).trim -> r.getString(1)).toMap
    assert(rows.get("Num Buckets").exists(_.trim == "4"), rows)
    assert(rows.get("Bucket Columns").exists(_.contains("n_nationkey")), rows)
    assert(rows.get("Sort Columns").exists(_.contains("n_name")), rows)
    assert(spark.table("graft_bkt").count() ==
      Tables.nation(spark, SF).count())
    spark.sql("DROP TABLE graft_bkt")
  }
}
