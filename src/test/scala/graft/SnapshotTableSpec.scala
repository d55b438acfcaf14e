package graft

import java.nio.file.Files

import graft.sources.SnapshotTable
import org.apache.spark.sql.functions.col

/** s16 snapshot tables: atomic commits, time travel, rollback,
  * copy-on-write delete, compaction, expiry, and the single-writer +
  * exclusive-commit fences. */
class SnapshotTableSpec extends GraftSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-snap-$tag").toString + "/t"

  test("create/read round-trip is version 1") {
    val p = tmp("create")
    val v = SnapshotTable.create(spark, p, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    assert(v == 1L)
    assert(SnapshotTable.currentVersion(spark, p) == 1L)
    assert(SnapshotTable.read(spark, p).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a"), (2L, "b")))
    assert(SnapshotTable.history(spark, p).map(_.operation) == Seq("create"))
  }

  test("append is visible at head; time travel still reads version 1") {
    val p = tmp("append")
    SnapshotTable.create(spark, p, Seq((1L, "a")).toDF("id", "s"))
    val v2 = SnapshotTable.append(spark, p, Seq((2L, "b")).toDF("id", "s"))
    assert(v2 == 2L)
    assert(SnapshotTable.read(spark, p).count() == 2L)
    assert(SnapshotTable.read(spark, p, Some(1L)).collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    // a frame planned at v2 keeps reading v2's immutable files even
    // after the head moves (snapshot isolation for live readers)
    val pinned = SnapshotTable.read(spark, p)
    SnapshotTable.append(spark, p, Seq((3L, "c")).toDF("id", "s"))
    assert(pinned.count() == 2L)
    assert(SnapshotTable.read(spark, p).count() == 3L)
  }

  test("overwrite replaces at head, may change schema; old version keeps both") {
    val p = tmp("ovw")
    SnapshotTable.create(spark, p, Seq((1L, "a")).toDF("id", "s"))
    SnapshotTable.overwrite(spark, p,
      Seq((10L, "x", 1.5)).toDF("id", "s", "w"))
    val head = SnapshotTable.read(spark, p)
    assert(head.columns.toSeq == Seq("id", "s", "w"))
    assert(head.collect().head.getDouble(2) == 1.5)
    val v1 = SnapshotTable.read(spark, p, Some(1L))
    assert(v1.columns.toSeq == Seq("id", "s"))
    assert(v1.collect().head.getLong(0) == 1L)
  }

  test("deleteWhere is copy-on-write: gone at head, present in the past") {
    val p = tmp("del")
    SnapshotTable.create(spark, p, (1L to 10L).map(i => (i, i % 3)).toDF("id", "m"))
    SnapshotTable.deleteWhere(spark, p, "m = 0")
    assert(SnapshotTable.read(spark, p).count() == 7L)
    assert(SnapshotTable.read(spark, p).filter(col("m") === 0).count() == 0L)
    assert(SnapshotTable.read(spark, p, Some(1L)).count() == 10L)
  }

  test("rollback is a new commit that restores the old file set") {
    val p = tmp("rb")
    SnapshotTable.create(spark, p, Seq((1L, "a")).toDF("id", "s"))
    SnapshotTable.append(spark, p, Seq((2L, "b")).toDF("id", "s"))
    val v3 = SnapshotTable.rollback(spark, p, 1L)
    assert(v3 == 3L)
    assert(SnapshotTable.read(spark, p).collect().map(_.getLong(0)).toSeq == Seq(1L))
    // history keeps all three; v2 still time-travels
    assert(SnapshotTable.history(spark, p).size == 3)
    assert(SnapshotTable.read(spark, p, Some(2L)).count() == 2L)
  }

  test("compact rewrites the head into fewer files, content-identical") {
    val p = tmp("cpt")
    SnapshotTable.create(spark, p, (1L to 50L).toDF("id").repartition(8))
    val before = SnapshotTable.snapshot(spark, p, 1L).files.size
    assert(before >= 2)
    SnapshotTable.compact(spark, p, 1)
    val after = SnapshotTable.snapshot(spark, p,
      SnapshotTable.currentVersion(spark, p)).files.size
    assert(after == 1)
    assert(SnapshotTable.read(spark, p).collect().map(_.getLong(0)).sorted
      .toSeq == (1L to 50L))
    assert(SnapshotTable.read(spark, p, Some(1L)).count() == 50L)
  }

  test("expire drops old manifests and deletes now-unreferenced files") {
    val p = tmp("exp")
    SnapshotTable.create(spark, p, Seq((1L, "a")).toDF("id", "s"))
    SnapshotTable.overwrite(spark, p, Seq((2L, "b")).toDF("id", "s"))
    SnapshotTable.overwrite(spark, p, Seq((3L, "c")).toDF("id", "s"))
    val (manifests, files) = SnapshotTable.expire(spark, p, keepLast = 1)
    assert(manifests == 2 && files >= 2, (manifests, files))
    // head unaffected; expired versions are really gone
    assert(SnapshotTable.read(spark, p).collect().head.getLong(0) == 3L)
    intercept[IllegalArgumentException] {
      SnapshotTable.read(spark, p, Some(1L))
    }
    // the kept version's data files survived on disk
    val dir = new java.io.File(p, "data")
    assert(dir.listFiles().nonEmpty)
  }

  test("merge upserts by key in one atomic commit; the past keeps pre-merge rows") {
    val p = tmp("mrg")
    SnapshotTable.create(spark, p, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    SnapshotTable.merge(spark, p, Seq((2L, "B"), (3L, "c")).toDF("id", "s"),
      keyCols = Seq("id"))
    assert(SnapshotTable.read(spark, p).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "B"), (3L, "c")))
    assert(SnapshotTable.read(spark, p, Some(1L)).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }

  test("appendOptimistic: 8 lock-free concurrent writers, no row lost, linear history") {
    val p = tmp("cas")
    SnapshotTable.create(spark, p, Seq((0L, "seed")).toDF("id", "s"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writers = (1 to 8).map { i =>
      Future(SnapshotTable.appendOptimistic(spark, p,
        Seq((i.toLong, s"w$i")).toDF("id", "s")))
    }
    val versions = Await.result(Future.sequence(writers), 120.seconds)
    // every writer landed a DISTINCT version (CAS: a version number
    // can only be won once) and the head saw all of them
    assert(versions.toSet.size == 8, versions)
    assert(SnapshotTable.currentVersion(spark, p) == 9L)
    assert(SnapshotTable.read(spark, p).collect().map(_.getLong(0)).sorted
      .toSeq == (0L to 8L))
    // history is a LINEAR chain: each commit's parent is the previous
    val hist = SnapshotTable.history(spark, p)
    assert(hist.map(_.version) == (1L to 9L))
    assert(hist.drop(1).map(_.parent) == (1L to 8L))
    // every intermediate version is a consistent prefix (monotone rows)
    val sizes = (1L to 9L).map(v =>
      SnapshotTable.read(spark, p, Some(v)).count())
    assert(sizes == sizes.sorted && sizes.head == 1L && sizes.last == 9L)
  }

  test("s16 CommitArbiter seam: 8 writers race through an injected external CAS") {
    // a DynamoDB/conditional-put-style arbiter: an EXTERNAL registry
    // decides the version race, the manifest body write behind it is a
    // plain (non-atomic) overwrite — exactly the shape an object-store
    // deployment plugs in. Claims are counted so the spec can prove
    // every commit went through the seam.
    val claimed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val claims = new java.util.concurrent.atomic.AtomicInteger(0)
    object MemoryCasArbiter extends SnapshotTable.CommitArbiter {
      override def claim(f: org.apache.hadoop.fs.FileSystem,
                         p: org.apache.hadoop.fs.Path, body: String): Unit = {
        claims.incrementAndGet()
        if (!claimed.add(f.makeQualified(p).toString))
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(p.toString)
        val out = f.create(p, true) // non-atomic body write: arbiter won
        try out.write(body.getBytes("UTF-8")) finally out.close()
      }
    }
    val prev = SnapshotTable.commitArbiter
    SnapshotTable.commitArbiter = MemoryCasArbiter
    try {
      val p = tmp("arb")
      SnapshotTable.create(spark, p, Seq((0L, "seed")).toDF("id", "s"))
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val writers = (1 to 8).map { i =>
        Future(SnapshotTable.appendOptimistic(spark, p,
          Seq((i.toLong, s"w$i")).toDF("id", "s")))
      }
      val versions = Await.result(Future.sequence(writers), 120.seconds)
      assert(versions.toSet.size == 8, versions)
      assert(SnapshotTable.currentVersion(spark, p) == 9L)
      assert(SnapshotTable.read(spark, p).collect().map(_.getLong(0)).sorted
        .toSeq == (0L to 8L))
      val hist = SnapshotTable.history(spark, p)
      assert(hist.map(_.version) == (1L to 9L))
      assert(hist.drop(1).map(_.parent) == (1L to 8L))
      // every commit (create + 8 appends) claimed through the seam;
      // lost races show up as extra claims, never as lost rows
      assert(claims.get() >= 9, s"only ${claims.get()} claims")
      assert(claimed.size == 9, s"${claimed.size} distinct claims")
    } finally SnapshotTable.commitArbiter = prev
  }

  test("diff reports added/removed/changed keys between any two versions") {
    val p = tmp("diff")
    SnapshotTable.create(spark, p,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"))
    SnapshotTable.merge(spark, p,
      Seq((2L, "B"), (4L, "d")).toDF("id", "s"), keyCols = Seq("id"))
    SnapshotTable.deleteWhere(spark, p, "id = 3")
    val d = SnapshotTable.diff(spark, p, 1L, 3L, keyCols = Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(2L -> "changed", 3L -> "removed", 4L -> "added"), d)
    // unchanged keys are absent; diff of a version with itself is empty
    assert(SnapshotTable.diff(spark, p, 2L, 2L, Seq("id")).count() == 0L)
  }

  test("s17 stats: analyze once, prune files by range, incremental after append") {
    import org.apache.spark.sql.functions.col
    val p = tmp("stats")
    // range-partitioned layout -> disjoint id ranges per file
    SnapshotTable.create(spark, p,
      (1L to 400L).toDF("id").repartitionByRange(4, col("id")))
    val covered = SnapshotTable.analyze(spark, p, "id")
    assert(covered == 4, covered)
    // a narrow predicate touches a strict subset of files
    val pruned = SnapshotTable.prunedFiles(spark, p, "id", 10L, 20L)
    val all = SnapshotTable.snapshot(spark, p, 1L).files
    assert(pruned.size < all.size, s"${pruned.size} vs ${all.size}")
    // pruned read == full-scan filter
    val got = SnapshotTable.readPruned(spark, p, "id", 10L, 20L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (10L to 20L))
    // append new files: only THEY need analyzing; old stats persist
    SnapshotTable.append(spark, p, (1000L to 1100L).toDF("id"))
    assert(SnapshotTable.analyze(spark, p, "id") >= 1)
    assert(SnapshotTable.analyze(spark, p, "id") == 0) // idempotent
    assert(SnapshotTable.readPruned(spark, p, "id", 1000L, 1005L)
      .count() == 6L)
    // out-of-range predicate prunes everything
    assert(SnapshotTable.prunedFiles(spark, p, "id", 5000L, 6000L).isEmpty)
  }

  test("mv01 materialized view: stale until refresh, atomic rebuild, versioned history") {
    import graft.sources.MaterializedView
    val p = tmp("mv")
    Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 5.0))
      .toDF("id", "k", "v").createOrReplaceTempView("mv_base")
    MaterializedView.create(spark, p,
      "SELECT k, CAST(SUM(v) AS DOUBLE) AS total FROM mv_base GROUP BY k")
    MaterializedView.register(spark, p, "mv_totals")
    val v1 = spark.table("mv_totals").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(v1 == Map("a" -> 30.0, "b" -> 5.0))
    // base moves on; the MV is deliberately STALE until refreshed
    Seq((1L, "a", 10.0), (4L, "c", 7.0)).toDF("id", "k", "v")
      .createOrReplaceTempView("mv_base")
    assert(MaterializedView.read(spark, p).count() == 2L)
    val v2 = MaterializedView.refresh(spark, p)
    assert(v2 == 2L)
    MaterializedView.register(spark, p, "mv_totals")
    val after = spark.table("mv_totals").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(after == Map("a" -> 10.0, "c" -> 7.0))
    // last Tuesday's dashboard: version 1 still time-travels
    assert(MaterializedView.read(spark, p, Some(1L)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap == v1)
    assert(MaterializedView.definition(spark, p).contains("GROUP BY k"))
  }

  test("sql04: snapshot table + history + time travel through pure SQL views") {
    val p = tmp("sql")
    SnapshotTable.create(spark, p, Seq((1L, "a")).toDF("id", "s"))
    SnapshotTable.append(spark, p, Seq((2L, "b")).toDF("id", "s"))
    graft.Sql.registerSnapshot(spark, p, "snap_t", versions = Seq(1L))
    assert(spark.sql("SELECT count(*) FROM snap_t").head().getLong(0) == 2L)
    assert(spark.sql("SELECT count(*) FROM snap_t_v1").head().getLong(0) == 1L)
    val hist = spark.sql(
      "SELECT version, operation FROM snap_t_history ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(hist == Seq((1L, "create"), (2L, "append")), hist)
  }

  test("second writer refuses while the lock is held; break() recovers") {
    val p = tmp("lock")
    SnapshotTable.create(spark, p, Seq((1L, "a")).toDF("id", "s"))
    val name = SnapshotTable.lockName(spark, p)
    graft.operators.LakeLock.withWriter(spark, name) {
      val e = intercept[IllegalStateException] {
        SnapshotTable.append(spark, p, Seq((2L, "b")).toDF("id", "s"))
      }
      assert(e.getMessage.contains("SINGLE-WRITER"))
    }
    // lock released -> append proceeds
    SnapshotTable.append(spark, p, Seq((2L, "b")).toDF("id", "s"))
    assert(SnapshotTable.read(spark, p).count() == 2L)
  }

  test("s18 partitioned: values survive the path round-trip, pruning skips files") {
    val p = tmp("part")
    val d1 = Seq((1L, 10, "a"), (2L, 10, "b"), (3L, 20, "c"))
      .toDF("id", "day", "s")
    SnapshotTable.createPartitioned(spark, p, d1, Seq("day"))
    // partition column comes back typed, full rows intact
    val got = SnapshotTable.read(spark, p).orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Int]("day"), r.getAs[String]("s")))
    assert(got.toSeq == Seq((1L, 10, "a"), (2L, 10, "b"), (3L, 20, "c")))
    // a second partitioned append adds a new day
    SnapshotTable.appendPartitioned(spark, p,
      Seq((4L, 30, "d")).toDF("id", "day", "s"), Seq("day"))
    // pruning day=10: only day-10 files planned, only day-10 rows read
    val pruned = SnapshotTable.partitionPrunedFiles(spark, p, "day", Seq("10"))
    assert(pruned.nonEmpty)
    assert(pruned.forall(_.contains("day=10")), pruned)
    val all = SnapshotTable.snapshot(spark, p,
      SnapshotTable.currentVersion(spark, p)).files
    assert(pruned.size < all.size, s"no files pruned: $all")
    val rows = SnapshotTable.readPruned(spark, p, "day", Seq("10"))
      .orderBy("id").collect().map(_.getAs[Long]("id"))
    assert(rows.toSeq == Seq(1L, 2L))
    // a flat mutation keeps the table readable and pruning conservative
    SnapshotTable.deleteWhere(spark, p, "id = 2")
    val after = SnapshotTable.read(spark, p).orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Int]("day")))
    assert(after.toSeq == Seq((1L, 10), (3L, 20), (4L, 30)))
    // rewritten files carry no partition metadata -> kept for any value
    val cons = SnapshotTable.partitionPrunedFiles(spark, p, "day", Seq("999"))
    assert(cons == SnapshotTable.snapshot(spark, p,
      SnapshotTable.currentVersion(spark, p)).files)
  }

  test("locked mutation REBASES over a racing optimistic append — nothing lost") {
    val p = tmp("rebase")
    SnapshotTable.create(spark, p,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"))
    // inject a lock-free append into the one window where it can still
    // beat the locked delete to the version number (after the delete
    // plans its payload, before it publishes) — fires once
    @volatile var fired = false
    SnapshotTable.beforePublishHook = Some { _ =>
      if (!fired) {
        fired = true
        SnapshotTable.appendOptimistic(spark, p,
          Seq((4L, "d"), (2L, "dup")).toDF("id", "s"))
      }
    }
    try {
      val v = SnapshotTable.deleteWhere(spark, p, "id = 2")
      // the delete rebased: it replanned against the appended head, so
      // BOTH id=2 rows are gone and the appended id=4 row survives
      assert(v == 3L, s"expected rebase to land at v3, got $v")
      val ids = SnapshotTable.read(spark, p).collect()
        .map(_.getAs[Long]("id")).sorted.toSeq
      assert(ids == Seq(1L, 3L, 4L), s"head rows: $ids")
      assert(SnapshotTable.history(spark, p).map(_.operation) ==
        Seq("create", "append", "delete"))
    } finally SnapshotTable.beforePublishHook = None
  }

  test("st29 change feed: each appended row arrives once with its commit version") {
    val p = tmp("cdf")
    SnapshotTable.create(spark, p, Seq((1L, "a")).toDF("id", "s"))
    SnapshotTable.append(spark, p, Seq((2L, "b")).toDF("id", "s"))
    SnapshotTable.append(spark, p, Seq((3L, "c"), (4L, "d")).toDF("id", "s"))
    val feed = SnapshotTable.readChanges(spark, p, 1L, 3L).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("_commit_version"))
      .sortBy(_._1)
    assert(feed.toSeq == Seq(2L -> 2L, 3L -> 3L, 4L -> 3L))
    // from genesis the create's rows are version-1 changes
    val full = SnapshotTable.readChanges(spark, p, 0L, 3L).count()
    assert(full == 4L)
    // a mutating commit in range refuses loudly and names diff()
    SnapshotTable.deleteWhere(spark, p, "id = 1")
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.readChanges(spark, p, 1L, 4L).collect()
    }
    assert(e.getMessage.contains("diff()"), e.getMessage)
    // the append-only prefix still reads fine after the delete
    assert(SnapshotTable.readChanges(spark, p, 1L, 3L).count() == 3L)
  }

  test("s22 deletion vector: delete without rewriting data; MoR read subtracts") {
    val p = tmp("dv")
    SnapshotTable.create(spark, p,
      (1L to 100L).map(i => (i, i % 5)).toDF("id", "m"))
    val dataFiles1 = SnapshotTable.snapshot(spark, p, 1L).files
    val v2 = SnapshotTable.deleteWhereDV(spark, p, "m = 0", Seq("id"))
    val s2 = SnapshotTable.snapshot(spark, p, v2)
    // data files untouched — only DV entries were added
    assert(s2.files.filterNot(_.startsWith("dv/")).toSet == dataFiles1.toSet)
    assert(s2.files.exists(_.startsWith("dv/")), s2.files)
    assert(s2.operation == "dv-delete")
    // head subtracts; the past is intact
    assert(SnapshotTable.read(spark, p).count() == 80L)
    assert(SnapshotTable.read(spark, p).filter(col("m") === 0).count() == 0L)
    assert(SnapshotTable.read(spark, p, Some(1L)).count() == 100L)
    // logical parity with COW deleteWhere
    val q = tmp("dvcow")
    SnapshotTable.create(spark, q,
      (1L to 100L).map(i => (i, i % 5)).toDF("id", "m"))
    SnapshotTable.deleteWhere(spark, q, "m = 0")
    assert(SnapshotTable.read(spark, p).collect().map(_.toSeq).toSet ==
      SnapshotTable.read(spark, q).collect().map(_.toSeq).toSet)
    // a second DV composes on the MoR view
    SnapshotTable.deleteWhereDV(spark, p, "m <= 1", Seq("id"))
    assert(SnapshotTable.read(spark, p).count() == 60L)
    // compact materializes the subtraction and clears the DV entries
    val vc = SnapshotTable.compact(spark, p, 1)
    val sc = SnapshotTable.snapshot(spark, p, vc)
    assert(!sc.files.exists(_.startsWith("dv/")), sc.files)
    assert(SnapshotTable.read(spark, p).count() == 60L)
    // the change feed refuses a dv-delete version (not an append delta)
    intercept[IllegalArgumentException] {
      SnapshotTable.readChanges(spark, p, 1L, 2L).collect()
    }
    // stats pruning composes with DVs: pruned read == MoR filter
    SnapshotTable.analyze(spark, p, "id")
    assert(SnapshotTable.readPruned(spark, p, "id", 1L, 50L).count() ==
      SnapshotTable.read(spark, p)
        .filter(col("id").between(1L, 50L)).count())
  }

  test("s23 schema evolution: added column backfills null, no data rewrite") {
    val p = tmp("evo")
    SnapshotTable.create(spark, p, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val files1 = SnapshotTable.snapshot(spark, p, 1L).files
    val v2 = SnapshotTable.appendEvolved(spark, p,
      Seq((3L, "c", 30L)).toDF("id", "s", "extra"))
    // old files untouched — evolution is a manifest-only operation
    assert(SnapshotTable.snapshot(spark, p, v2).files.toSet
      .intersect(files1.toSet) == files1.toSet)
    val head = SnapshotTable.read(spark, p).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(head.toSeq == Seq((1L, "a", None), (2L, "b", None),
      (3L, "c", Some(30L))), head.toSeq)
    // time travel keeps version 1's narrower schema
    assert(SnapshotTable.read(spark, p, Some(1L)).columns.toSeq ==
      Seq("id", "s"))
    // retyping an existing column refuses
    intercept[IllegalArgumentException] {
      SnapshotTable.appendEvolved(spark, p,
        Seq(("4", "d", 40L)).toDF("id", "s", "extra"))
    }
    // a later plain append carries the evolved schema
    SnapshotTable.append(spark, p, Seq((5L, "e", 50L)).toDF("id", "s", "extra"))
    assert(SnapshotTable.read(spark, p).count() == 4L)
    // the change feed spans the evolution: pre-evolution deltas
    // surface null in the added column instead of failing the union
    val feed = SnapshotTable.readChanges(spark, p, 0L, 3L).collect()
      .map(r => (r.getAs[Long]("id"),
        if (r.isNullAt(r.fieldIndex("extra"))) None
        else Some(r.getAs[Long]("extra")),
        r.getAs[Long]("_commit_version"))).sortBy(_._1)
    assert(feed.toSeq == Seq((1L, None, 1L), (2L, None, 1L),
      (3L, Some(30L), 2L), (5L, Some(50L), 3L)), feed.toSeq)
  }

  test("m03 updateWhere: matching rows re-evaluate, schema stable, past intact") {
    val p = tmp("upd")
    SnapshotTable.create(spark, p,
      (1L to 10L).map(i => (i, i % 3, i * 10L)).toDF("id", "m", "v"))
    SnapshotTable.updateWhere(spark, p, "m = 0",
      Map("v" -> "v + 1000", "m" -> "99"))
    val head = SnapshotTable.read(spark, p).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(head.count(_._2 == 99L) == 3, head.toSeq)      // 3,6,9 matched
    assert(head.filter(_._2 == 99L).forall(_._3 > 1000L), head.toSeq)
    assert(head.filter(_._2 != 99L).forall(_._3 <= 100L), head.toSeq)
    assert(SnapshotTable.read(spark, p).schema ==
      SnapshotTable.read(spark, p, Some(1L)).schema)
    assert(SnapshotTable.read(spark, p, Some(1L))
      .filter(col("m") === 99).count() == 0L)
    // unknown column refuses before any write
    intercept[IllegalArgumentException] {
      SnapshotTable.updateWhere(spark, p, "m = 1", Map("nope" -> "1"))
    }
  }

  test("file-granular COW delete rewrites only stat-overlapping files") {
    val p = tmp("fgd")
    SnapshotTable.create(spark, p,
      (1L to 400L).toDF("id").repartitionByRange(4, col("id")))
    SnapshotTable.analyze(spark, p, "id")
    val before = SnapshotTable.snapshot(spark, p, 1L).files
    val touched = SnapshotTable.prunedFiles(spark, p, "id", 10L, 20L)
    assert(touched.size < before.size, s"$touched")
    SnapshotTable.deleteWhereRange(spark, p, "id", 10L, 20L)
    val after = SnapshotTable.snapshot(spark, p,
      SnapshotTable.currentVersion(spark, p)).files
    // untouched files carried over byte-identical (same manifest paths)
    val untouched = before.toSet -- touched.toSet
    assert(untouched.subsetOf(after.toSet), s"$untouched vs $after")
    assert(after.toSet.intersect(touched.toSet).isEmpty, after)
    // content parity with the logical filter
    assert(SnapshotTable.read(spark, p).collect().map(_.getLong(0)).sorted
      .toSeq == ((1L to 9L) ++ (21L to 400L)), "content")
    assert(SnapshotTable.read(spark, p, Some(1L)).count() == 400L)
  }

  test("s21 z-order: box predicates prune files a linear sort cannot") {
    // two independent dims on a 64x64 grid
    val df = (0L until 4096L).map(i => (i % 64L, i / 64L, i))
      .toDF("x", "y", "id")
    val lin = tmp("zlin"); val zed = tmp("zord")
    SnapshotTable.create(spark, lin, df)
    SnapshotTable.create(spark, zed, df)
    // linear layout: range-sorted by x alone — y spans every file
    SnapshotTable.overwrite(spark, lin,
      df.repartitionByRange(16, col("x")).sortWithinPartitions("x"))
    SnapshotTable.analyze(spark, lin, "y")
    val linPruned = SnapshotTable.prunedFiles(spark, lin, "y", 10L, 13L).size
    assert(linPruned == 16, s"linear layout should not prune on y: $linPruned")
    // z-order: every file gets a bounding BOX — both dims prune
    SnapshotTable.compactZOrder(spark, zed, "x", "y", 16)
    SnapshotTable.analyze(spark, zed, "y")
    SnapshotTable.analyze(spark, zed, "x")
    val zy = SnapshotTable.prunedFiles(spark, zed, "y", 10L, 13L).size
    val zx = SnapshotTable.prunedFiles(spark, zed, "x", 0L, 3L).size
    assert(zy < linPruned, s"z-order failed to prune on y: $zy")
    assert(zx < 16, s"z-order failed to prune on x: $zx")
    // pruned reads stay exact
    assert(SnapshotTable.readPruned(spark, zed, "y", 10L, 13L).count() == 256L)
    assert(SnapshotTable.readPruned(spark, zed, "x", 0L, 3L).count() == 256L)
    assert(SnapshotTable.read(spark, zed).count() == 4096L)
  }

  test("m03 updateWhere: every RHS and the WHERE evaluate against the OLD row") {
    val p = tmp("updold")
    SnapshotTable.create(spark, p,
      Seq((1L, 0L, 10L), (2L, 1L, 20L)).toDF("id", "m", "v"))
    // SQL UPDATE contract: with cond m=0 and SET m=99, v=v+1000, BOTH
    // assignments apply to the matching row — a sequential evaluation
    // that updates m first would see m=99, find cond false, and skip v
    SnapshotTable.updateWhere(spark, p, "m = 0",
      Map("m" -> "99", "v" -> "v + 1000"))
    val head = SnapshotTable.read(spark, p).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(head == Seq((1L, 99L, 1010L), (2L, 1L, 20L)), head)
    // swap semantics: RHS referencing another SET column reads its OLD value
    val p2 = tmp("updswap")
    SnapshotTable.create(spark, p2, Seq((1L, 7L, 8L)).toDF("id", "a", "b"))
    SnapshotTable.updateWhere(spark, p2, "id = 1", Map("a" -> "b", "b" -> "a"))
    val swapped = SnapshotTable.read(spark, p2).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(swapped == Seq((8L, 7L)), swapped)
  }

  test("m04 deleteWhereRange keeps NULL-keyed rows regardless of file layout") {
    val p = tmp("fgdnull")
    val rows = (1L to 30L).map(i => (i, Some(i): Option[Long])) ++
      Seq((31L, None: Option[Long]), (32L, None: Option[Long]))
    SnapshotTable.create(spark, p,
      rows.toDF("id", "k").repartition(1)) // nulls share the overlapping file
    SnapshotTable.analyze(spark, p, "k")
    SnapshotTable.deleteWhereRange(spark, p, "k", 10L, 20L)
    val kept = SnapshotTable.read(spark, p).collect()
      .map(_.getLong(0)).sorted.toSeq
    // rows 10–20 gone; NULL-k rows 31/32 SURVIVE (predicate is NULL, not
    // TRUE) — parity with deleteWhere("k BETWEEN 10 AND 20") COW semantics
    assert(kept == ((1L to 9L) ++ (21L to 32L)), kept)
  }
}
