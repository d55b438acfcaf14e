package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Sources & sinks (SURVEY.md §2d).
  *
  * Scale notes: partitioned parquet is the lake layout at 100 TB —
  * `partitionBy` on a low-cardinality column gives partition pruning on
  * read (Catalyst turns `WHERE part = x` into a directory prune, no
  * scan). Writers repartition by the partition columns first so each
  * task writes one file per directory instead of `tasks × partitions`
  * small files — the classic small-files failure at scale.
  */
object Sources {

  /** Partitioned parquet write: one file per partition directory. */
  def writePartitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String],
                              mode: SaveMode = SaveMode.Overwrite): Unit =
    df.repartition(partitionCols.map(df.col): _*)
      .write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV writer with header; round-trips with [[readCsv]] given the
    * original schema (CSV is schemaless — the reader must supply it;
    * timestamps serialize as ISO-8601 with µs precision). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .schema(schema)
      .csv(path)

  /** Bucketed managed-table write: rows hash into `buckets` files by
    * `bucketCol`. Two tables bucketed the same way join WITHOUT a
    * shuffle (Exchange-free sort-merge join) — the co-located-join
    * layout for repeated fact⋈fact joins at 100 TB, where the one-time
    * write-side shuffle is amortized over every downstream join. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)

  /** ORC round-trip (s05): columnar alternative to parquet with the
    * same pushdown/pruning behavior through the v2 file source. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** m01: dynamic-partition INSERT OVERWRITE to a path — replaces ONLY
    * the partition directories `df` produces, leaving every sibling
    * partition's files untouched (the Hive daily-load semantics). The
    * per-write option overrides the session default, so the helper
    * behaves the same under any session. */
  def insertOverwritePartitions(df: DataFrame, path: String,
                                partitionCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(df.col): _*)
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** m02: MERGE-style upsert into a partitioned parquet lake path —
    * graft's mutation stance for file-based tables (README §mutation):
    * parquet files are immutable, so row-level UPDATE/DELETE is
    * expressed as "rewrite exactly the partitions containing matched
    * keys". Rows in `updates` replace target rows with the same key;
    * unmatched keys append. Cost is ∝ the AFFECTED partitions (semi-join
    * prune), never the full table — the 100 TB daily-upsert shape.
    *
    * Two-phase on purpose: the merged result is staged to `staging`
    * before the dynamic overwrite, because a single-phase plan would
    * read and overwrite the same files (Spark rejects it, and a failure
    * mid-write would corrupt the partition). At warehouse scale phase 2
    * is a near-free file move per partition. */
  def upsertPartitioned(spark: SparkSession, path: String, updates: DataFrame,
                        keyCols: Seq[String], partitionCols: Seq[String],
                        staging: String): Unit = {
    val target = spark.read.parquet(path)
    val affectedParts = updates.select(partitionCols.map(updates.col): _*).distinct()
    val affected = target.join(affectedParts, partitionCols, "left_semi")
    val kept = affected.join(updates.select(keyCols.map(updates.col): _*),
      keyCols, "left_anti")
    kept.unionByName(updates).write.mode(SaveMode.Overwrite).parquet(staging)
    insertOverwritePartitions(spark.read.parquet(staging), path, partitionCols)
  }

  /** s06: small-files compaction — the nightly maintenance op that keeps
    * a streamed-into lake path scannable. Micro-batch sinks and
    * per-partition writers accrete thousands of KB-sized files; scan
    * cost then becomes per-file open overhead instead of IO. Rewrites
    * the path into ⌈bytes/target⌉ files via a staged write + atomic-ish
    * swap (never reads and overwrites the same files in one plan).
    * Returns the file count written. */
  def compact(spark: SparkSession, path: String, staging: String,
              targetBytes: Long = 128L << 20): Int = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var bytes = 0L
    while (it.hasNext) { val f = it.next(); if (f.getPath.getName.endsWith(".parquet")) bytes += f.getLen }
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(path).repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(staging)
    fs.delete(p, true)
    require(fs.rename(new Path(staging), p), s"rename $staging -> $path failed")
    n
  }

  /** s07: schema-evolution read — parquet footers under `path` may have
    * been written across schema versions (columns added over time);
    * `mergeSchema` unions them, null-filling missing columns. Kept off
    * by default on ordinary reads because footer merging is a per-file
    * cost at 100 TB — turn it on exactly where evolution happened. */
  def readParquetMergedSchema(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** JSON lines writer; round-trips with [[readJson]] + schema (schema
    * inference is an extra full scan — never infer at 100 TB). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .schema(schema)
      .json(path)
}
