package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** mv02: INCREMENTAL materialized-view maintenance over an APPEND-ONLY
  * [[SnapshotTable]] base — the composition mv01 deliberately deferred,
  * now built from pieces that are each verified on their own: the st29
  * change feed supplies exactly the rows each base commit added, and
  * classic mergeable-aggregate algebra (count/sum/min/max — the
  * algebraic class of Gray et al.'s data-cube taxonomy) folds the
  * delta's aggregate into the stored one. Refresh cost is
  * O(delta + |view|), NEVER O(base) — at 100 TB that is the entire
  * point: a dashboard aggregate over an append-only ingest table
  * refreshes from the last few commits' files while mv01's REBUILD
  * would rescan the corpus.
  *
  * Consistency design: the view's high-watermark (the last base
  * version folded in) is stored in the VIEW's own manifest operation
  * tag (`imv:<baseVersion>`), so data and watermark commit in ONE
  * atomic s16 publish — a crash between "data written" and "watermark
  * advanced" cannot exist, and time travel on the view reproduces both
  * the numbers AND the base version they covered.
  *
  * Safety contract: the change feed REFUSES ranges containing a
  * mutating base commit (delete/merge/compact/overwrite — a file delta
  * is not a row delta there), so [[refresh]] on a mutated base fails
  * loudly naming [[fullRefresh]]; it can never silently double-count
  * or miss rows. AVG and other non-algebraic aggregates are out of
  * scope by construction — store sum+count and divide at read time.
  *
  * Null-key groups merge correctly: the old/delta join is null-safe
  * (`<=>`), matching GROUP BY's null-equality semantics. */
object IncrementalView {

  /** One aggregate column: `fn` ∈ count|sum|min|max over base column
    * `col` (ignored for count), materialized as `as`. */
  final case class Agg(fn: String, col: String, as: String)

  private def defPath(path: String) = new Path(path, "_graft_imv_def")

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** mv03: optional STATIC-DIMENSION enrichment join applied before
    * the aggregate — the SPJG view class (select-project-join-group).
    * Valid incrementally because a join against a FIXED dimension
    * distributes over union: agg(join(base ∪ delta, dim)) =
    * merge(agg(join(base, dim)), agg(join(delta, dim))). The
    * dimension is pinned by PATH at create time; repointing or
    * rewriting it silently invalidates the view (that is the static
    * contract — a changing dim needs [[fullRefresh]]). */
  final case class Dim(path: String, joinKey: String)

  private final case class Def(basePath: String, keys: Seq[String],
                               aggs: Seq[Agg], dim: Option[Dim] = None)

  /** Def-file format version header. v2 fixed the dim line's field
    * order (`dim,joinKey,path` — path last so the bounded 3-field
    * split leaves comma-containing paths intact); files WITHOUT this
    * header predate the header and carry the ambiguous order, so
    * [[readDef]] refuses them loudly instead of silently transposing
    * path and join key (r14 ADVICE). */
  private final val DefHeader = "graft-imv-v2"

  private def writeDef(spark: SparkSession, path: String, d: Def): Unit = {
    val f = fsOf(spark, path)
    require(!f.exists(defPath(path)), s"incremental view $path exists")
    // the dim line puts the PATH last so the 3-field split leaves an
    // arbitrary (comma-containing) path intact; the join key is the
    // bounded field and must stay comma-free
    d.dim.foreach(x => require(!x.joinKey.contains(","),
      s"incremental view dim join key may not contain ',': ${x.joinKey}"))
    d.aggs.foreach(a => require(a.fn != "dim",
      "aggregate fn name 'dim' collides with the dimension line tag"))
    val body = (Seq(DefHeader, d.basePath, d.keys.mkString(",")) ++
      d.dim.map(x => s"dim,${x.joinKey},${x.path}").toSeq ++
      d.aggs.map(a => s"${a.fn},${a.col},${a.as}")).mkString("\n")
    val out = f.create(defPath(path), false)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  private def readDef(spark: SparkSession, path: String): Def = {
    val f = fsOf(spark, path)
    val in = f.open(defPath(path))
    val body = try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      new String(bos.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    val allLines = body.split("\n", -1).toSeq
    require(allLines.headOption.contains(DefHeader),
      s"incremental view def at $path is not a $DefHeader file " +
        s"(got '${allLines.headOption.getOrElse("")}'): written by a " +
        "pre-versioning build whose dim field order is ambiguous — " +
        "re-create the view")
    val lines = allLines.tail
    val rest = lines.drop(2).filter(_.nonEmpty)
    val (dimLines, aggLines) = rest.partition(_.startsWith("dim,"))
    Def(lines(0), lines(1).split(",").toSeq.filter(_.nonEmpty),
      aggLines.map { l =>
        val p = l.split(",", 3); Agg(p(0), p(1), p(2))
      },
      dimLines.headOption.map { l =>
        val p = l.split(",", 3); Dim(path = p(2), joinKey = p(1))
      })
  }

  private def aggCols(aggs: Seq[Agg]): Seq[Column] = aggs.map {
    case Agg("count", _, as) => count(lit(1)).cast("long").as(as)
    case Agg("sum", c, as)   => sum(col(c)).as(as)
    case Agg("min", c, as)   => min(col(c)).as(as)
    case Agg("max", c, as)   => max(col(c)).as(as)
    case Agg(fn, _, _) => throw new IllegalArgumentException(
      s"incremental view supports count/sum/min/max (algebraic " +
      s"aggregates), not '$fn' — store the pieces (e.g. sum+count for " +
      "avg) and combine at read time")
  }

  private def aggregate(df: DataFrame, d: Def): DataFrame = {
    val enriched = d.dim match {
      case None => df
      case Some(Dim(p, k)) =>
        // dims are small by definition — ride a broadcast, never
        // shuffle the delta (or the base rebuild) for an enrichment
        df.join(broadcast(df.sparkSession.read.parquet(p)), Seq(k))
    }
    val cols = aggCols(d.aggs)
    enriched.groupBy(d.keys.map(col): _*).agg(cols.head, cols.tail: _*)
  }

  /** Merge the stored aggregate with the delta's aggregate: null-safe
    * full-outer join on the keys, then the algebraic combine per
    * column (missing side passes the other through — new groups
    * appear, untouched groups persist unchanged). */
  private def merge(old: DataFrame, delta: DataFrame, d: Def): DataFrame = {
    val o = old.alias("o")
    val n = delta.alias("n")
    val cond = d.keys.map(k => col(s"o.$k") <=> col(s"n.$k"))
      .reduce(_ && _)
    val keyCols = d.keys.map(k => coalesce(col(s"o.$k"), col(s"n.$k")).as(k))
    val mergedAggs = d.aggs.map { a =>
      val ov = col(s"o.${a.as}"); val nv = col(s"n.${a.as}")
      val combined = a.fn match {
        case "count" | "sum" => ov + nv
        case "min"           => least(ov, nv)
        case "max"           => greatest(ov, nv)
      }
      when(ov.isNull, nv).when(nv.isNull, ov).otherwise(combined).as(a.as)
    }
    o.join(n, cond, "full_outer").select(keyCols ++ mergedAggs: _*)
  }

  private def watermark(spark: SparkSession, path: String): Long = {
    val head = SnapshotTable.currentVersion(spark, path)
    val op = SnapshotTable.snapshot(spark, path, head).operation
    require(op.startsWith("imv:"),
      s"$path head v$head has operation '$op' — not an incremental view")
    op.stripPrefix("imv:").toLong
  }

  /** Create the view over `basePath` (must already exist): aggregate
    * the base head and publish as v1 tagged with the base watermark.
    * Keys must be non-empty (a global aggregate is a one-constant-key
    * view). */
  def create(spark: SparkSession, mvPath: String, basePath: String,
             keys: Seq[String], aggs: Seq[Agg],
             dim: Option[Dim] = None): Long = {
    require(keys.nonEmpty, "incremental view needs at least one group key")
    aggCols(aggs) // validate fns before any write
    val d = Def(basePath, keys, aggs, dim)
    writeDef(spark, mvPath, d)
    val baseV = SnapshotTable.currentVersion(spark, basePath)
    SnapshotTable.create(spark, mvPath,
      aggregate(SnapshotTable.read(spark, basePath, Some(baseV)), d),
      s"imv:$baseV")
  }

  /** Incremental refresh: fold every base commit past the watermark
    * into the stored aggregate via the st29 change feed. No-op (same
    * version back) when the base hasn't moved. Fails loudly — naming
    * [[fullRefresh]] — if the range contains a mutating base commit;
    * it never guesses. */
  def refresh(spark: SparkSession, mvPath: String): Long = {
    val d = readDef(spark, mvPath)
    val from = watermark(spark, mvPath)
    val baseV = SnapshotTable.currentVersion(spark, d.basePath)
    if (baseV == from) return SnapshotTable.currentVersion(spark, mvPath)
    val delta =
      try SnapshotTable.readChanges(spark, d.basePath, from, baseV)
      catch {
        case e: IllegalArgumentException => throw new IllegalArgumentException(
          s"incremental refresh of $mvPath blocked: ${e.getMessage}; " +
          "run IncrementalView.fullRefresh to rebuild from the base head",
          e)
      }
    val merged = merge(read(spark, mvPath),
      aggregate(delta.drop("_commit_version"), d), d)
    SnapshotTable.overwrite(spark, mvPath, merged, s"imv:$baseV")
  }

  /** Rebuild from the base head (the mv01 REBUILD semantics) and reset
    * the watermark — the escape hatch after base mutations. */
  def fullRefresh(spark: SparkSession, mvPath: String): Long = {
    val d = readDef(spark, mvPath)
    val baseV = SnapshotTable.currentVersion(spark, d.basePath)
    SnapshotTable.overwrite(spark, mvPath,
      aggregate(SnapshotTable.read(spark, d.basePath, Some(baseV)), d),
      s"imv:$baseV")
  }

  /** The current materialization (or any past `version` — each carries
    * the base watermark it covered in its manifest op tag). */
  def read(spark: SparkSession, mvPath: String,
           version: Option[Long] = None): DataFrame =
    SnapshotTable.read(spark, mvPath, version)
}
