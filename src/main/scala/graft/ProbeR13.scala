package graft

import org.apache.spark.sql.DataFrame

/** Round-13 10× volume probes (SURVEY §5): q187–q190 at sf0.01 vs
  * sf0.1 (10× docs), warm best-of-2 per side like ProbeR11/R12.
  * Also measures the s22 merge-on-read contract directly: wall time
  * of `deleteWhereDV` vs COW `deleteWhere` for a 0.4%-selective
  * delete on a 1M-row snapshot table — the write-amplification gap
  * deletion vectors exist to close — and the file-prune counts a
  * 2-D box predicate gets under s21 z-order vs a linear sort.
  *
  * Not part of the driver contract — run manually per round:
  *   sbt "runMain graft.ProbeR13"
  */
object ProbeR13 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(f: => Unit): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f
        Pins.release()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.min
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val walls = scala.collection.mutable.Map[(String, String), Double]()
    for ((sf, tag) <- Seq("/root/testdata/sf0.01" -> "sf0.01",
                          "/root/testdata/sf0.1"  -> "sf0.1")) {
      val docs = Tables.documents(spark, sf)
      walls(("q187_vocab_richness", tag)) =
        time(noop(operators.TextAnalysis.q187(docs)))
      walls(("q188_dup_weight", tag)) =
        time(noop(operators.Dedup.q188(docs)))
      walls(("q189_ks_drift", tag)) =
        time(noop(operators.TextAnalysis.q189(docs)))
      walls(("q190_vocab_coverage", tag)) =
        time(noop(operators.TextAnalysis.q190(docs)))
      println(s"[probeR13] $tag done (n_doc=${docs.count()})")
    }
    println(f"[probeR13] ${"op"}%-20s ${"sf0.01"}%8s ${"sf0.1"}%8s ratio")
    for (op <- Seq("q187_vocab_richness", "q188_dup_weight",
                   "q189_ks_drift", "q190_vocab_coverage")) {
      val a = walls((op, "sf0.01")); val b = walls((op, "sf0.1"))
      println(f"[probeR13] $op%-20s $a%8.2f $b%8.2f ${b / a}%5.2fx")
    }

    // s22: DV delete vs COW delete on a 1M-row table, 0.4% selective.
    // The DV write should cost ~the tombstone write; COW rewrites the
    // whole table. Ratio is the write amplification DVs remove.
    val base = spark.range(1000000L)
      .select($"id", ($"id" % 250).as("m"), ($"id" * 31 % 9973).as("v"))
    val dvP = java.nio.file.Files.createTempDirectory("probe13-dv").toString + "/t"
    val cowP = java.nio.file.Files.createTempDirectory("probe13-cow").toString + "/t"
    sources.SnapshotTable.create(spark, dvP, base)
    sources.SnapshotTable.create(spark, cowP, base)
    // bytes the delete WRITES is the metric (wall at 1M local rows is
    // noise): COW rewrites every surviving row, DV writes only keys
    def newBytes(p: String, v: Long): Long = {
      val before = sources.SnapshotTable.snapshot(spark, p, v - 1).files.toSet
      sources.SnapshotTable.snapshot(spark, p, v).files
        .filterNot(before)
        .map(fp => new java.io.File(s"$p/$fp").length()).sum
    }
    val vDv = sources.SnapshotTable.deleteWhereDV(spark, dvP, "m = 0", Seq("id"))
    val vCow = sources.SnapshotTable.deleteWhere(spark, cowP, "m = 0")
    val (bDv, bCow) = (newBytes(dvP, vDv), newBytes(cowP, vCow))
    val nDv = sources.SnapshotTable.read(spark, dvP).count()
    val nCow = sources.SnapshotTable.read(spark, cowP).count()
    require(nDv == nCow, s"DV/COW parity broke: $nDv vs $nCow")
    println(f"[probeR13] s22 delete 0.4%% of 1M rows writes: dv ${bDv / 1024}%d KiB " +
      f"vs cow ${bCow / 1024}%d KiB (${bCow.toDouble / bDv}%.0fx write " +
      s"amplification removed), both read $nDv rows")

    // s21: file-prune counts for a 2-D box under z-order vs linear
    // sort, 1M rows over a 1024x1024 grid in 64 files.
    import org.apache.spark.sql.functions.col
    val grid = spark.range(1048576L)
      .select(($"id" % 1024).as("x"), ($"id" / 1024).as("y"), $"id")
    val linP = java.nio.file.Files.createTempDirectory("probe13-lin").toString + "/t"
    val zP = java.nio.file.Files.createTempDirectory("probe13-z").toString + "/t"
    sources.SnapshotTable.create(spark, linP,
      grid.repartitionByRange(64, col("x")).sortWithinPartitions("x"))
    sources.SnapshotTable.create(spark, zP, grid)
    sources.SnapshotTable.compactZOrder(spark, zP, "x", "y", 64)
    Seq(linP -> "linear", zP -> "zorder").foreach { case (p, tag) =>
      sources.SnapshotTable.analyze(spark, p, "x")
      sources.SnapshotTable.analyze(spark, p, "y")
      val fx = sources.SnapshotTable.prunedFiles(spark, p, "x", 0L, 63L).size
      val fy = sources.SnapshotTable.prunedFiles(spark, p, "y", 0L, 63L).size
      println(s"[probeR13] s21 $tag: 1/16-box predicate scans x=$fx/64 " +
        s"y=$fy/64 files")
    }
    spark.stop()
  }
}
