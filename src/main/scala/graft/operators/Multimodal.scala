package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2c): media as opaque binary
  * columns + typed metadata structs, batch feature extraction / resize /
  * frame sampling via `mapPartitions`.
  *
  * The codec calls are clearly-marked STUBS (no image/audio libs in this
  * container): they compute deterministic features from the raw bytes.
  * Everything Spark-side is real and is what carries to 100 TB:
  *  - media bytes never leave their partition (no shuffle of payloads);
  *  - work batches per partition exactly as a mapInPandas/Arrow path
  *    batches record batches (`Iterator.grouped(BatchSize)` = the batch
  *    boundary a real codec would amortize setup over);
  *  - frame sampling is a flatMap row expansion with the frame index in
  *    the output schema, not a driver loop.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  case class MediaMeta(media_type: String, width: Int, height: Int,
                       n_frames: Int, sample_rate: Int)
  case class MediaRow(doc_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeature(doc_id: Long, n_bytes: Long, checksum: Long,
                          width: Int, height: Int)
  case class ResizedRow(doc_id: Long, width: Int, height: Int, checksum: Long)
  case class FrameRow(doc_id: Long, frame_idx: Int, frame_checksum: Long)

  val BatchSize = 64

  private def checksum(bytes: Array[Byte], seed: Long = 0L): Long = {
    var h = seed
    var i = 0
    while (i < bytes.length) { h = (h * 131 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
    h
  }

  /** Media table: documents' text bytes standing in for media payloads,
    * with deterministic typed metadata. The payload/meta split mirrors a
    * real lake layout: prune `meta` queries never touch payload bytes. */
  def mediaTable(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    documents
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, b) =>
        val h = checksum(b)
        val mt = if (id % 3 == 0) "video" else if (id % 3 == 1) "image" else "audio"
        MediaRow(id, b, MediaMeta(mt,
          width = 16 + (h % 16).toInt, height = 16 + ((h / 16) % 16).toInt,
          n_frames = if (mt == "video") 8 + (h % 8).toInt else 1,
          sample_rate = if (mt == "audio") 16000 else 0))
      }
      .toDF()
  }

  /** q79: exact media dedup by payload hash — the first pass every
    * multimodal corpus runs (identical bytes under different doc ids).
    * Groups on md5 of the payload so the shuffle key is 16 bytes, never
    * the payload itself; the canonical row is the min doc_id. NO codec
    * involved — byte-identity dedup is codec-free, which is why it's
    * oracle-checkable while q51-q53 are not. */
  def q79(spark: SparkSession, documents: DataFrame): DataFrame =
    mediaTable(spark, documents)
      .groupBy(md5(col("payload")).as("payload_md5"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("dup_count"),
        min(length(col("payload"))).cast("long").as("payload_bytes"))
      .select(col("keep_id"), col("dup_count"), col("payload_bytes"))
      .orderBy(col("keep_id"))

  /** STUB decoder: a real deployment decodes image/audio here (JNI codec
    * or Arrow-batched Python worker). */
  private def decodeStub(id: Long, bytes: Array[Byte]): MediaFeature = {
    val h = checksum(bytes)
    MediaFeature(id, bytes.length.toLong, h,
      width = 16 + (h % 16).toInt, height = 16 + ((h / 16) % 16).toInt)
  }

  /** q51: batched per-partition feature extraction over the media table. */
  def q51(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    mediaTable(spark, documents)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>          // batch boundary =
          batch.map { case (id, b) => decodeStub(id, b) } // codec call unit
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** q52: STUB resize to a fixed target box — the decode→transform→
    * re-encode shape; output schema carries the new dims. */
  def q52Resize(spark: SparkSession, documents: DataFrame,
                maxW: Int = 16, maxH: Int = 16): DataFrame = {
    import spark.implicits._
    mediaTable(spark, documents)
      .select(col("doc_id"), col("payload"), col("meta.width"), col("meta.height"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap(_.map { case (id, b, w, h) =>
          val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
          ResizedRow(id, math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt),
            checksum(b, seed = 7L)) // STUB: re-encode checksum
        })
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** q53: frame sampling — every k-th frame of each video row expands to
    * its own output row (flatMap row expansion; frame decode STUBbed as a
    * seeded checksum). Non-video rows produce no frames. */
  def q53FrameSample(spark: SparkSession, documents: DataFrame,
                     every: Int = 4): DataFrame = {
    import spark.implicits._
    mediaTable(spark, documents)
      .filter(col("meta.media_type") === "video")
      .select(col("doc_id"), col("payload"), col("meta.n_frames"))
      .as[(Long, Array[Byte], Int)]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap(_.flatMap { case (id, b, nFrames) =>
          (0 until nFrames by every).map(f => FrameRow(id, f, checksum(b, seed = f)))
        })
      }
      .toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
  }
}
