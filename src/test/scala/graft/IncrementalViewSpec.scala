package graft

import java.nio.file.Files

import graft.sources.{IncrementalView, SnapshotTable}
import graft.sources.IncrementalView.Agg

/** mv02 incremental materialized views: delta-fold parity vs full
  * recompute, watermark-in-manifest atomicity, null-key groups, and
  * the mutation refusal → fullRefresh escape hatch. */
class IncrementalViewSpec extends GraftSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-imv-$tag").toString + "/t"

  private val aggs = Seq(Agg("count", "", "n"), Agg("sum", "v", "s"),
    Agg("min", "v", "mn"), Agg("max", "v", "mx"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  private def fullRecompute(base: String) = {
    import org.apache.spark.sql.functions._
    SnapshotTable.read(spark, base).groupBy("k")
      .agg(count(lit(1)).cast("long").as("n"), sum(col("v")).as("s"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
  }

  test("incremental refresh == full recompute across appends; new and untouched groups") {
    val base = tmp("base"); val mv = tmp("mv")
    SnapshotTable.create(spark, base,
      Seq(("a", 1L), ("a", 5L), ("b", 2L)).toDF("k", "v"))
    IncrementalView.create(spark, mv, base, Seq("k"), aggs)
    assert(rows(IncrementalView.read(spark, mv)) == rows(fullRecompute(base)))

    // append touches a, leaves b untouched, introduces c
    SnapshotTable.append(spark, base,
      Seq(("a", 10L), ("c", 7L)).toDF("k", "v"))
    SnapshotTable.append(spark, base, Seq(("c", 3L)).toDF("k", "v"))
    IncrementalView.refresh(spark, mv)
    val got = rows(IncrementalView.read(spark, mv))
    assert(got == rows(fullRecompute(base)), got)
    assert(got.contains(Seq("a", 3L, 16L, 1L, 10L)), got)  // merged group
    assert(got.contains(Seq("b", 1L, 2L, 2L, 2L)), got)    // untouched
    assert(got.contains(Seq("c", 2L, 10L, 3L, 7L)), got)   // new group

    // the watermark rides the view's own manifest op tag
    val head = SnapshotTable.currentVersion(spark, mv)
    assert(SnapshotTable.snapshot(spark, mv, head).operation == "imv:3")

    // base unchanged -> refresh is a no-op (same version back)
    assert(IncrementalView.refresh(spark, mv) == head)
  }

  test("null group keys fold null-safely like GROUP BY") {
    val base = tmp("nullb"); val mv = tmp("nullmv")
    SnapshotTable.create(spark, base,
      Seq((Option("a"), 1L), (Option.empty[String], 4L)).toDF("k", "v"))
    IncrementalView.create(spark, mv, base, Seq("k"), aggs)
    SnapshotTable.append(spark, base,
      Seq((Option.empty[String], 6L)).toDF("k", "v"))
    IncrementalView.refresh(spark, mv)
    val got = rows(IncrementalView.read(spark, mv))
    assert(got == rows(fullRecompute(base)), got)
    assert(got.contains(Seq(null, 2L, 10L, 4L, 6L)), got)
  }

  test("base mutation blocks incremental refresh; fullRefresh recovers") {
    val base = tmp("mutb"); val mv = tmp("mutmv")
    SnapshotTable.create(spark, base,
      Seq(("a", 1L), ("b", 2L)).toDF("k", "v"))
    IncrementalView.create(spark, mv, base, Seq("k"), aggs)
    SnapshotTable.deleteWhere(spark, base, "v = 2")
    val e = intercept[IllegalArgumentException] {
      IncrementalView.refresh(spark, mv)
    }
    assert(e.getMessage.contains("fullRefresh"), e.getMessage)
    IncrementalView.fullRefresh(spark, mv)
    assert(rows(IncrementalView.read(spark, mv)) == rows(fullRecompute(base)))
    // incremental picks back up after the rebuild reset the watermark
    SnapshotTable.append(spark, base, Seq(("a", 9L)).toDF("k", "v"))
    IncrementalView.refresh(spark, mv)
    assert(rows(IncrementalView.read(spark, mv)) == rows(fullRecompute(base)))
  }

  test("unsupported aggregate is rejected before any write") {
    val base = tmp("avgb"); val mv = tmp("avgmv")
    SnapshotTable.create(spark, base, Seq(("a", 1L)).toDF("k", "v"))
    val e = intercept[IllegalArgumentException] {
      IncrementalView.create(spark, mv, base, Seq("k"),
        Seq(Agg("avg", "v", "a")))
    }
    assert(e.getMessage.contains("sum+count"), e.getMessage)
  }

  test("mv03 static-dim enrichment join folds incrementally == full recompute") {
    import org.apache.spark.sql.functions._
    import graft.sources.IncrementalView.Dim
    val base = tmp("jbase"); val mv = tmp("jmv")
    val dimDir = tmp("jdim")
    // static dimension: nation key -> region name
    Seq((1L, "emea"), (2L, "emea"), (3L, "apac"))
      .toDF("nk", "region").write.parquet(dimDir)
    SnapshotTable.create(spark, base,
      Seq((1L, 10L), (2L, 5L), (3L, 2L)).toDF("nk", "v"))
    IncrementalView.create(spark, mv, base, Seq("region"),
      Seq(Agg("count", "", "n"), Agg("sum", "v", "s")),
      dim = Some(Dim(dimDir, "nk")))
    assert(rows(IncrementalView.read(spark, mv)) ==
      Set(Seq("emea", 2L, 15L), Seq("apac", 1L, 2L)))

    // appends fold through the join: existing region grows, and a
    // delta-only nation key maps into an existing region group
    SnapshotTable.append(spark, base, Seq((3L, 8L), (1L, 1L)).toDF("nk", "v"))
    IncrementalView.refresh(spark, mv)
    val got = rows(IncrementalView.read(spark, mv))
    assert(got == Set(Seq("emea", 3L, 16L), Seq("apac", 2L, 10L)), got)
    // parity vs full recompute through the same join
    val full = SnapshotTable.read(spark, base)
      .join(spark.read.parquet(dimDir), Seq("nk"))
      .groupBy("region")
      .agg(count(lit(1)).cast("long").as("n"), sum(col("v")).as("s"))
    assert(got == rows(full), got)
  }

  private def joinRecompute(a: String, b: String) = {
    import org.apache.spark.sql.functions._
    SnapshotTable.read(spark, a).join(SnapshotTable.read(spark, b), Seq("k"))
      .groupBy("g")
      .agg(count(lit(1)).cast("long").as("n"), sum(col("va")).as("sa"),
        min(col("vb")).as("mn"), max(col("vb")).as("mx"))
  }

  test("mv04 fact-join view: interleaved appends to BOTH bases fold == full recompute") {
    val a = tmp("f2a"); val b = tmp("f2b"); val mv = tmp("f2mv")
    // A(k, g, va) facts grouped by g; B(k, vb) facts; join on k —
    // one-to-many on purpose (a delta A row multiplies by its OLD and
    // NEW B matches, the part mv03's static dim could never exercise)
    SnapshotTable.create(spark, a,
      Seq((1L, "x", 10L), (2L, "y", 5L)).toDF("k", "g", "va"))
    SnapshotTable.create(spark, b,
      Seq((1L, 100L), (1L, 200L), (2L, 50L)).toDF("k", "vb"))
    val jAggs = Seq(Agg("count", "", "n"), Agg("sum", "va", "sa"),
      Agg("min", "vb", "mn"), Agg("max", "vb", "mx"))
    IncrementalView.createJoin(spark, mv, a, b, Seq("k"), Seq("g"), jAggs)
    assert(rows(IncrementalView.read(spark, mv)) == rows(joinRecompute(a, b)))

    // round 1: ΔA only (joins OLD B rows — the ΔA⋈B_old term alone)
    SnapshotTable.append(spark, a, Seq((1L, "x", 7L)).toDF("k", "g", "va"))
    IncrementalView.refreshJoin(spark, mv)
    assert(rows(IncrementalView.read(spark, mv)) == rows(joinRecompute(a, b)))

    // round 2: ΔB only (the A_old⋈ΔB term — and it meets round 1's A
    // row, which is now part of A_old at the advanced watermark)
    SnapshotTable.append(spark, b, Seq((2L, 60L), (3L, 9L)).toDF("k", "vb"))
    IncrementalView.refreshJoin(spark, mv)
    assert(rows(IncrementalView.read(spark, mv)) == rows(joinRecompute(a, b)))

    // round 3: BOTH move before one refresh — all three delta terms
    // fire, including ΔA⋈ΔB (new A key 3 meets new B rows for key 3
    // in the same range), plus a brand-new group key g=z
    SnapshotTable.append(spark, a,
      Seq((3L, "z", 4L), (1L, "x", 1L)).toDF("k", "g", "va"))
    SnapshotTable.append(spark, b, Seq((3L, 70L), (1L, 300L)).toDF("k", "vb"))
    val head = IncrementalView.refreshJoin(spark, mv)
    val got = rows(IncrementalView.read(spark, mv))
    assert(got == rows(joinRecompute(a, b)), got)
    assert(got.exists(_.head == "z"), got)

    // round 4: a ΔB with a NULL join key — null keys never equi-join,
    // the key-prune pre-filter takes its conservative skip branch, and
    // the fold still matches the full recompute
    SnapshotTable.append(spark, b,
      Seq((Option.empty[java.lang.Long], 80L),
        (Option(java.lang.Long.valueOf(1L)), 400L)).toDF("k", "vb"))
    val head2 = IncrementalView.refreshJoin(spark, mv)
    assert(rows(IncrementalView.read(spark, mv)) == rows(joinRecompute(a, b)))

    // both watermarks ride the ONE manifest op tag; no-op when neither
    // base moved; parity with the rebuild path
    assert(SnapshotTable.snapshot(spark, mv, head2).operation ==
      s"imv2:${SnapshotTable.currentVersion(spark, a)}:" +
      s"${SnapshotTable.currentVersion(spark, b)}")
    assert(IncrementalView.refreshJoin(spark, mv) == head2)
    IncrementalView.fullRefreshJoin(spark, mv)
    assert(rows(IncrementalView.read(spark, mv)) == rows(joinRecompute(a, b)))
  }

  test("mv04 over-threshold deltas take the shuffle join path and still == full recompute") {
    // broadcastMaxRows = 0 forces EVERY delta over the gate — the
    // st39 catch-up-after-downtime shape where a multi-commit backlog
    // must never ride a forced broadcast. Same fold, same answer; only
    // the join strategy hint differs (AQE may still broadcast at
    // runtime, which is the point: runtime sizing, not a blind hint).
    val a = tmp("f2sa"); val b = tmp("f2sb"); val mv = tmp("f2smv")
    SnapshotTable.create(spark, a,
      Seq((1L, "x", 10L), (2L, "y", 5L)).toDF("k", "g", "va"))
    SnapshotTable.create(spark, b,
      Seq((1L, 100L), (2L, 50L)).toDF("k", "vb"))
    val jAggs = Seq(Agg("count", "", "n"), Agg("sum", "va", "sa"),
      Agg("min", "vb", "mn"), Agg("max", "vb", "mx"))
    IncrementalView.createJoin(spark, mv, a, b, Seq("k"), Seq("g"), jAggs)
    // a multi-commit backlog on BOTH bases, folded by ONE refresh
    SnapshotTable.append(spark, a, Seq((1L, "x", 7L), (3L, "z", 4L)).toDF("k", "g", "va"))
    SnapshotTable.append(spark, a, Seq((2L, "y", 2L)).toDF("k", "g", "va"))
    SnapshotTable.append(spark, b, Seq((3L, 70L)).toDF("k", "vb"))
    SnapshotTable.append(spark, b, Seq((1L, 300L), (2L, 60L)).toDF("k", "vb"))
    IncrementalView.refreshJoin(spark, mv, broadcastMaxRows = 0L)
    val got = rows(IncrementalView.read(spark, mv))
    assert(got == rows(joinRecompute(a, b)), got)
    // and the gated path keeps folding incrementally afterwards
    SnapshotTable.append(spark, a, Seq((3L, "z", 1L)).toDF("k", "g", "va"))
    IncrementalView.refreshJoin(spark, mv, broadcastMaxRows = 0L)
    assert(rows(IncrementalView.read(spark, mv)) == rows(joinRecompute(a, b)))
  }

  test("mv04 refreshJoin serializes under the view refresh lock (Contended signal)") {
    val a = tmp("f2la"); val b = tmp("f2lb"); val mv = tmp("f2lmv")
    SnapshotTable.create(spark, a, Seq((1L, "x", 10L)).toDF("k", "g", "va"))
    SnapshotTable.create(spark, b, Seq((1L, 100L)).toDF("k", "vb"))
    IncrementalView.createJoin(spark, mv, a, b, Seq("k"), Seq("g"),
      Seq(Agg("count", "", "n"), Agg("sum", "va", "sa"),
        Agg("min", "vb", "mn"), Agg("max", "vb", "mx")))
    SnapshotTable.append(spark, a, Seq((1L, "x", 7L)).toDF("k", "g", "va"))
    // a concurrent refresh holder blocks this one with the DEDICATED
    // contention type (not a bare IllegalStateException), so callers
    // can skip on contention without swallowing real failures
    graft.operators.LakeLock.withWriter(spark,
      IncrementalView.refreshLock(spark, mv)) {
      intercept[graft.operators.LakeLock.Contended] {
        IncrementalView.refreshJoin(spark, mv)
      }
    }
    // released: the refresh folds the delta it was blocked from
    IncrementalView.refreshJoin(spark, mv)
    assert(rows(IncrementalView.read(spark, mv)) == rows(joinRecompute(a, b)))
  }

  test("mv04 mutation on either base blocks refreshJoin; fullRefreshJoin recovers") {
    val a = tmp("f2ma"); val b = tmp("f2mb"); val mv = tmp("f2mmv")
    SnapshotTable.create(spark, a, Seq((1L, "x", 10L)).toDF("k", "g", "va"))
    SnapshotTable.create(spark, b, Seq((1L, 100L)).toDF("k", "vb"))
    IncrementalView.createJoin(spark, mv, a, b, Seq("k"), Seq("g"),
      Seq(Agg("count", "", "n"), Agg("sum", "va", "sa"),
        Agg("min", "vb", "mn"), Agg("max", "vb", "mx")))
    SnapshotTable.deleteWhere(spark, b, "vb = 100")
    val e = intercept[IllegalArgumentException] {
      IncrementalView.refreshJoin(spark, mv)
    }
    assert(e.getMessage.contains("fullRefreshJoin"), e.getMessage)
    IncrementalView.fullRefreshJoin(spark, mv)
    assert(rows(IncrementalView.read(spark, mv)) == rows(joinRecompute(a, b)))
  }
}
