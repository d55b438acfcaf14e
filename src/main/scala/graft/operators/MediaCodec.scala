package graft.operators

import java.awt.image.BufferedImage

/** Pluggable media-codec seam for the multimodal operators (q51 decode
  * features, q52 resize, q53 frame sampling): the ONLY thing that
  * changes between this container (JDK ImageIO, PNG) and a production
  * deployment (an H.264/JPEG/AV1 codec jar) is which implementation of
  * this trait is passed in — the Spark-side plumbing (schema,
  * partitioning, batch shape, "payloads never shuffle") is
  * codec-independent and stays put.
  *
  * Implementations must be Serializable: the codec rides inside
  * mapPartitions closures to the executors. Keep them stateless (or
  * with lazily-initialized per-JVM state) — one instance is shared by
  * every task in the executor JVM.
  */
trait MediaCodec extends Serializable {

  /** bytes → (decoded image, container format name), or None when this
    * codec does not claim the bytes (corrupt payload or a foreign
    * format — operators fall back to byte-level features). */
  def decode(bytes: Array[Byte]): Option[(BufferedImage, String)]

  /** image → container bytes in this codec's output format. */
  def encode(img: BufferedImage): Array[Byte]
}

/** Default implementation: the JDK's ImageIO registry (PNG out) —
  * ships in java.desktop, zero new dependencies, a REAL codec. */
object ImageIoCodec extends MediaCodec {
  override def decode(bytes: Array[Byte]): Option[(BufferedImage, String)] =
    Multimodal.decodeImage(bytes)
  override def encode(img: BufferedImage): Array[Byte] =
    Multimodal.encodePng(img)
}
