package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** st37: TRANSPORT-HEAD conformance seam — the ck01 move applied to
  * ingestion. The declared wall on this cluster is the missing
  * spark-sql-kafka jar: every st-gate takes a post-`readStream` frame,
  * so a Kafka head was always a one-line swap, but nothing PROVED a
  * real broker drops in. This object fixes the contract the swap
  * relies on:
  *
  *   - [[TransportSchema]] is the exact schema Spark's Kafka source
  *     emits (key/value binary, topic, partition, offset, timestamp,
  *     timestampType) — the production head IS
  *     `spark.readStream.format("kafka")...` and conforms by
  *     construction;
  *   - [[docs]]/[[events]] are the ONE domain decode each pipeline
  *     family uses (JSON value payloads, event time from the
  *     transport timestamp) — a head that passes [[conformance]]
  *     feeds every doc-gate (st15–st25, st33–st35) and every
  *     windowed/watermarked aggregation (st01–st07) with zero
  *     pipeline changes;
  *   - [[conformance]] is the contract kit: schema equality, gapless
  *     strictly-increasing per-(topic, partition) offsets from 0,
  *     deterministic replay (a fresh open over the same log serves
  *     identical rows — the restart/recovery semantics checkpointed
  *     queries assume), and watermark-usable timestamps (non-null) —
  *     run it against a production head ONCE at deploy time, exactly
  *     like ck01 qualifies codec jars.
  *
  * [[FakeBrokerHead]] is the in-repo reference implementation: a
  * partitioned, offset-keyed, append-only parquet log (each append =
  * one new file, so the streaming file source discovers it as a
  * micro-batch — the file-source analog of a broker poll), writes
  * serialized under LakeLock like every other lake artifact. */
object StreamHead {

  /** The Kafka source's fixed transport schema, field for field. */
  val TransportSchema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true),
    StructField("topic", StringType, nullable = true),
    StructField("partition", IntegerType, nullable = true),
    StructField("offset", LongType, nullable = true),
    StructField("timestamp", TimestampType, nullable = true),
    StructField("timestampType", IntegerType, nullable = true)))

  private val DocSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private val EventSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Transport → documents: value bytes are UTF-8 JSON
    * `{"doc_id": …, "text": …}`; the transport timestamp rides along
    * as `ts` for gates that watermark. Works identically on a batch
    * frame (the oracle/spec path — `from_json` is engine-pure). */
  def docs(transport: DataFrame): DataFrame =
    transport.select(
      from_json(col("value").cast("string"), DocSchema).as("d"),
      col("timestamp").as("ts"))
      .select(col("d.doc_id"), col("d.text"), col("ts"))

  /** Transport → events for the windowed/watermarked family: value
    * bytes are UTF-8 JSON `{"user_id", "event_type", "value"}`, event
    * time = the transport timestamp (Kafka's log-append or producer
    * time — the stream's native watermark clock). */
  def events(transport: DataFrame): DataFrame =
    transport.select(
      from_json(col("value").cast("string"), EventSchema).as("e"),
      col("timestamp").as("ts"))
      .select(col("e.user_id"), col("e.event_type"), col("e.value"), col("ts"))

  /** Contract kit (the ck01 shape): drive a head's BATCH view of the
    * same log through the four clauses a checkpointed pipeline relies
    * on. Returns human-readable violations; empty = conformant. The
    * streaming frame itself is checked for schema + isStreaming (its
    * row-level behavior is the same scan the batch view reads). */
  def conformance(spark: SparkSession, head: TransportHead): Seq[String] = {
    val out = Seq.newBuilder[String]
    val stream = head.open(spark)
    if (!stream.isStreaming)
      out += "open() must return a STREAMING frame"
    if (stream.schema != TransportSchema)
      out += s"schema mismatch: ${stream.schema.simpleString} != " +
        TransportSchema.simpleString
    val rows = head.replay(spark)
    val replayConforms = rows.schema == TransportSchema
    if (!replayConforms)
      out += s"replay schema mismatch: ${rows.schema.simpleString}"
    // gapless, strictly-increasing offsets from 0 per (topic, partition)
    // — runs whenever the offset triple resolves, so a wrong-schema
    // head still gets its offset discipline audited
    if (Seq("topic", "partition", "offset").forall(rows.columns.contains)) {
      val bad = rows.groupBy(col("topic"), col("partition"))
        .agg(count(lit(1)).as("n"), min(col("offset")).as("lo"),
          max(col("offset")).as("hi"),
          countDistinct(col("offset")).as("nd"))
        .filter(col("lo") =!= 0L || col("hi") =!= col("n") - 1 ||
          col("nd") =!= col("n"))
        .count()
      if (bad > 0L)
        out += s"$bad (topic, partition) groups have gapped/duplicated offsets"
    }
    if (replayConforms) {
      // deterministic replay: two reads of the same log are identical
      // (binary columns compare via md5 — Row equality on Array[Byte]
      // is reference equality and would false-positive)
      def digested(df: DataFrame) = df.select(md5(col("key")).as("k"),
          md5(col("value")).as("v"), col("topic"), col("partition"),
          col("offset"), col("timestamp"))
        .orderBy(col("topic"), col("partition"), col("offset"))
        .collect().toSeq
      if (digested(rows) != digested(head.replay(spark)))
        out += "replay is not deterministic"
      // watermark-usable timestamps
      if (rows.filter(col("timestamp").isNull).count() > 0L)
        out += "null timestamps: frame is not watermark-usable"
    }
    out.result()
  }
}

/** A transport head: the streaming ingestion endpoint. `open` returns
  * the live streaming frame in [[StreamHead.TransportSchema]]; `replay`
  * returns the SAME log as a batch frame from offset 0 (the
  * earliest-offset re-read a recovering checkpointed query performs —
  * for Kafka, `spark.read.format("kafka").option("startingOffsets",
  * "earliest")`). */
trait TransportHead extends Serializable {
  def open(spark: SparkSession): DataFrame
  def replay(spark: SparkSession): DataFrame
}

/** The in-repo fake broker: partition-keyed append-only parquet log.
  * One parquet file per append (a poll batch), offsets assigned
  * contiguously per (topic, partition) under LakeLock — two producers
  * cannot interleave half-assigned offsets, matching a broker
  * partition's single-appender log semantics. */
final case class FakeBrokerHead(logDir: String, topic: String)
    extends TransportHead {

  private def lockName = "fakebroker_" +
    java.lang.Integer.toHexString(logDir.hashCode)

  /** A broker topic exists before any consumer attaches: materialize
    * the (possibly empty) log directory so open/replay on a fresh
    * topic return an empty frame instead of PATH_NOT_FOUND. */
  private def ensureDir(spark: SparkSession): Unit = {
    val p = new org.apache.hadoop.fs.Path(logDir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(p)
    ()
  }

  /** Append one poll-batch of records to `partition`; offsets continue
    * from the partition's current tail. `ts` is the broker's
    * log-append time — caller-supplied so specs are deterministic. */
  def append(spark: SparkSession, partition: Int,
             records: Seq[(Array[Byte], Array[Byte])],
             ts: java.sql.Timestamp): Unit =
    graft.operators.LakeLock.withWriter(spark, lockName) {
      import spark.implicits._
      ensureDir(spark)
      // O(log-size) max(offset) re-scan per append: acceptable for a
      // SPEC FIXTURE feeding conformance() and the st-gate tests — a
      // production head (Kafka) assigns offsets broker-side and never
      // takes this path (r17 review, documented as such)
      val base =
        try spark.read.schema(StreamHead.TransportSchema).parquet(logDir)
          .filter(col("topic") === topic && col("partition") === partition)
          .agg(max(col("offset"))).collect().head match {
            case r if r.isNullAt(0) => 0L
            case r => r.getLong(0) + 1L
          }
        catch { case _: org.apache.spark.sql.AnalysisException => 0L }
      records.zipWithIndex
        .map { case ((k, v), i) =>
          (k, v, topic, partition, base + i, ts, 0)
        }
        .toDF("key", "value", "topic", "partition", "offset",
          "timestamp", "timestampType")
        // ONE file per append: the streaming file source sees each
        // append as a discrete discovery, like a broker poll
        .coalesce(1)
        .write.mode("append").parquet(logDir)
    }

  override def open(spark: SparkSession): DataFrame = {
    ensureDir(spark)
    spark.readStream.schema(StreamHead.TransportSchema).parquet(logDir)
  }

  override def replay(spark: SparkSession): DataFrame = {
    ensureDir(spark)
    spark.read.schema(StreamHead.TransportSchema).parquet(logDir)
  }
}
