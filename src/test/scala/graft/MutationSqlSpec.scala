package graft

/** SQL-text row-level mutations (SURVEY.md §2 ddl05): DELETE / UPDATE /
  * MERGE INTO over v1 lake tables via RowLevelSqlRewrite — the Hive
  * warehouse user's mutation surface, executed as distributed
  * copy-on-write (stage → static INSERT OVERWRITE). The partition-
  * targeted programmatic fast path stays m02 (Sources.upsertPartitioned). */
class MutationSqlSpec extends GraftSpec {

  private def resetTables(): Unit = {
    spark.sql("DROP TABLE IF EXISTS mut_tgt")
    spark.sql("DROP TABLE IF EXISTS mut_src")
    spark.sql(
      "CREATE TABLE mut_tgt (id INT, v STRING, p STRING) USING parquet PARTITIONED BY (p)")
    spark.sql(
      "INSERT INTO mut_tgt VALUES (1,'a','x'),(2,'b','y'),(3,'c','y')")
    spark.sql("CREATE TABLE mut_src (id INT, v STRING, p STRING) USING parquet")
    spark.sql("INSERT INTO mut_src VALUES (2,'bb','y'),(3,'del','y'),(4,'d','z')")
  }

  private def rows(): Seq[(Int, String, String)] =
    spark.table("mut_tgt").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq

  test("ddl05: DELETE FROM with predicate removes rows and drains emptied partitions") {
    resetTables()
    spark.sql("DELETE FROM mut_tgt WHERE id = 1")
    assert(rows() == Seq((2, "b", "y"), (3, "c", "y")))
    // id=1 was partition x's only row — the partition must be gone from
    // metadata too (static overwrite, not a dynamic partial rewrite)
    val parts = spark.sql("SHOW PARTITIONS mut_tgt").collect().map(_.getString(0))
    assert(parts.toSeq == Seq("p=y"), parts.toSeq)
  }

  test("ddl05: DELETE with NULL-valued predicate keeps the row (three-valued logic)") {
    resetTables()
    spark.sql("INSERT INTO mut_tgt VALUES (9, NULL, 'x')")
    spark.sql("DELETE FROM mut_tgt WHERE v = 'zzz'") // NULL = 'zzz' is NULL, not true
    assert(rows().map(_._1) == Seq(1, 2, 3, 9))
  }

  test("ddl05: UPDATE with WHERE rewrites matching rows only; unconditioned UPDATE hits all") {
    resetTables()
    spark.sql("UPDATE mut_tgt SET v = upper(v) WHERE id >= 2")
    assert(rows() == Seq((1, "a", "x"), (2, "B", "y"), (3, "C", "y")))
    spark.sql("UPDATE mut_tgt SET v = concat(v, '!')")
    assert(rows().map(_._2) == Seq("a!", "B!", "C!"))
  }

  test("ddl05: MERGE INTO applies first-matching action per row class") {
    resetTables()
    spark.sql(
      """MERGE INTO mut_tgt USING mut_src s ON mut_tgt.id = s.id
         WHEN MATCHED AND s.v = 'del' THEN DELETE
         WHEN MATCHED THEN UPDATE SET v = s.v
         WHEN NOT MATCHED THEN INSERT *""")
    // 1 untouched (no source match), 2 updated, 3 deleted (guarded
    // action wins over the later unguarded UPDATE), 4 inserted
    assert(rows() == Seq((1, "a", "x"), (2, "bb", "y"), (4, "d", "z")))
  }

  test("ddl05: MERGE WHEN NOT MATCHED BY SOURCE updates/deletes unreferenced target rows") {
    resetTables()
    spark.sql(
      """MERGE INTO mut_tgt USING mut_src s ON mut_tgt.id = s.id
         WHEN NOT MATCHED BY SOURCE AND mut_tgt.id = 1 THEN UPDATE SET v = 'stale'
         WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    // 1 marked stale; 2 and 3 are matched (kept, no matched action);
    // nothing else was unmatched so nothing deleted
    assert(rows() == Seq((1, "stale", "x"), (2, "b", "y"), (3, "c", "y")))
  }

  test("ddl05: MERGE rejects a target row matching more than one source row") {
    resetTables()
    spark.sql("INSERT INTO mut_src VALUES (2,'dup','y')")
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO mut_tgt USING mut_src s ON mut_tgt.id = s.id
           WHEN MATCHED THEN UPDATE SET v = s.v""")
    }
    assert(e.getMessage.toLowerCase.contains("cardinality"), e.getMessage)
  }

  test("ddl05: DELETE works on a path-based parquet relation (no catalog entry)") {
    val dir = java.nio.file.Files.createTempDirectory("mut_path").toString + "/t"
    import spark.implicits._
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
      .write.mode("overwrite").parquet(dir)
    spark.sql(s"DELETE FROM parquet.`$dir` WHERE id = 2")
    val left = spark.read.parquet(dir).collect().map(_.getInt(0)).sorted
    assert(left.toSeq == Seq(1, 3))
  }

  test("ddl05: non-lake targets still fail with Spark's native unsupported-table error") {
    import spark.implicits._
    Seq((1, "a")).toDF("id", "v").createOrReplaceTempView("mut_view")
    // the rewrite must NOT claim this target — Spark's own error (an
    // unsupported-relation rejection) is expected to surface unchanged
    val e = intercept[Exception](spark.sql("DELETE FROM mut_view WHERE id = 1"))
    assert(e.getMessage.contains("DELETE") || e.getMessage.contains("view") ||
      e.getMessage.contains("Unexpected table relation"), e.getMessage)
  }
}
