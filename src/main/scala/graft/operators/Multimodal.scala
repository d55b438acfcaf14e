package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2c): media as opaque binary
  * columns + typed metadata, batch feature extraction via mapPartitions.
  *
  * The decode step is a clearly-marked STUB (no image/audio libs in this
  * container): it computes deterministic features from the raw bytes.
  * The Spark-side plumbing — binary column, metadata struct, partition
  * batching, output schema — is real and is what carries to 100 TB:
  * media bytes never leave their partition and are processed in batches
  * exactly as a Pandas-UDF/mapInPandas path would batch Arrow record
  * batches.
  */
object Multimodal {

  case class MediaFeature(doc_id: Long, n_bytes: Long, checksum: Long,
                          width: Int, height: Int)

  val BatchSize = 64

  /** STUB decoder: a real deployment decodes image/audio here (e.g. via
    * a JNI codec). Deterministic fake: polynomial checksum + fake dims. */
  private def decodeStub(id: Long, bytes: Array[Byte]): MediaFeature = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * 131 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
    MediaFeature(id, bytes.length.toLong, h,
      width = 16 + (h % 16).toInt, height = 16 + ((h / 16) % 16).toInt)
  }

  /** q51: binary payload (utf-8 bytes standing in for media) + metadata,
    * batched per-partition feature extraction. */
  def q51(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    documents
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>          // batch boundary =
          batch.map { case (id, b) => decodeStub(id, b) } // codec call unit
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }
}
