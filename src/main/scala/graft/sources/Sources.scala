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
