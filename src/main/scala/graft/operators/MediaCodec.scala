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

/** JPEG variant of the JDK codec — a REAL lossy codec behind the same
  * seam (ImageIO's jpg writer, java.desktop). Exists so the perceptual
  * operators can be spec'd against genuine lossy re-encoding (q210:
  * a clip re-encoded frame-by-frame as JPEG must still near-dup its
  * PNG original) rather than a fake that flips bits. Decode delegates
  * to the ImageIO registry, which auto-detects the container — so a
  * corpus mixing PNG and JPEG payloads reads through either codec. */
object JpegCodec extends MediaCodec {
  override def decode(bytes: Array[Byte]): Option[(BufferedImage, String)] =
    Multimodal.decodeImage(bytes)
  override def encode(img: BufferedImage): Array[Byte] = {
    // ImageIO's jpg writer rejects images with an alpha channel —
    // normalize to RGB first (the canonical decoded form anyway)
    val rgb =
      if (img.getType == BufferedImage.TYPE_INT_RGB) img
      else {
        val c = new BufferedImage(img.getWidth, img.getHeight,
          BufferedImage.TYPE_INT_RGB)
        val g = c.createGraphics()
        g.drawImage(img, 0, 0, null); g.dispose()
        c
      }
    val bos = new java.io.ByteArrayOutputStream()
    // ImageIO.write returns false when NO registered writer claims the
    // format (a stripped/headless JRE without the jpg plugin) — fail
    // loud instead of emitting a zero-byte payload that every decode
    // would then reject as foreign bytes (the FramedCodec.decode stance)
    val wrote = javax.imageio.ImageIO.write(rgb, "jpg", bos)
    require(wrote, "no ImageIO jpg writer registered in this JRE")
    bos.toByteArray
  }
}

/** The audio half of the codec seam — same contract as [[MediaCodec]]:
  * a production deployment swaps in an AAC/Opus/MP3 codec jar here and
  * the Spark-side operators (q197 window sampling, q198 fingerprint
  * near-dup) don't change. Samples are 16-bit signed mono PCM — the
  * canonical exchange format every audio codec decodes to. */
trait AudioCodec extends Serializable {

  /** bytes → (PCM samples, sample rate, container format name), or
    * None when this codec does not claim the bytes. */
  def decode(bytes: Array[Byte]): Option[(Array[Short], Int, String)]

  /** PCM samples at `rate` Hz → container bytes. */
  def encode(samples: Array[Short], rate: Int): Array[Byte]
}

/** Default implementation: the JDK's `javax.sound.sampled` WAV
  * reader/writer (java.desktop, headless-safe, zero new dependencies —
  * a REAL container codec; 16-bit PCM round-trips bit-exactly). Only
  * COMPRESSED audio codecs (AAC/Opus/MP3) remain a dependency wall. */
object WavCodec extends AudioCodec {
  override def decode(bytes: Array[Byte]): Option[(Array[Short], Int, String)] =
    Multimodal.decodeWav(bytes)
  override def encode(samples: Array[Short], rate: Int): Array[Byte] =
    Multimodal.encodeWav(samples, rate)
}

/** The video half of the codec seam — the CONTAINER level (r15):
  * [[MediaCodec]] makes the per-frame codec pluggable, but q53's
  * length-prefixed framing was hardwired, so a production H.264/AV1
  * jar could only slot in per frame, not as the stream container it
  * actually is. This trait is the container contract: a frame
  * sequence in (canonical decoded form — BufferedImages, like 16-bit
  * PCM for audio), container bytes out, and back — decode returns
  * each frame with its IN-CONTAINER encoded size (per-frame payload
  * length here; NAL-unit size for a real stream codec). Keep
  * implementations stateless (executor-shared, the [[MediaCodec]]
  * rule). */
trait VideoCodec extends Serializable {

  /** frames → container bytes. */
  def encode(frames: Seq[BufferedImage]): Array[Byte]

  /** container bytes → a RANDOM-ACCESS clip handle, or None when this
    * codec does not claim the bytes. Random access (not a decoded
    * frame list) is deliberate: samplers read every k-th frame, and a
    * container with an index (MP4's stbl, the framed container's
    * length prefixes) can seek without paying the decode of frames
    * nobody asked for — an eager Seq made q53 decode 4× the frames it
    * sampled (measured 3.7 → 7.0 s at sf0.1). */
  def decode(bytes: Array[Byte]): Option[VideoClip]
}

/** Decoded-clip handle: frame count + per-frame decode on demand.
  * `frame(i)` returns the decoded image and the frame's IN-CONTAINER
  * encoded size (per-frame payload length here; NAL-unit size for a
  * real stream codec). */
trait VideoClip {
  def numFrames: Int
  def frame(i: Int): (BufferedImage, Long)
}

/** Default implementation: the in-repo framed container (MJPEG's
  * length-prefixed framing) over any per-frame [[MediaCodec]] — the
  * composition q53 always used, now behind the pluggable seam. The
  * container split is byte slicing (cheap, eager); per-frame image
  * decode happens only on `frame(i)`. */
final case class FramedCodec(frame: MediaCodec = ImageIoCodec)
    extends VideoCodec {
  override def encode(frames: Seq[BufferedImage]): Array[Byte] =
    Multimodal.encodeFrames(frames.map(frame.encode))
  override def decode(bytes: Array[Byte]): Option[VideoClip] = {
    val raw = Multimodal.decodeFrames(bytes)
    val perFrame = frame
    if (raw.isEmpty) None
    else Some(new VideoClip {
      override def numFrames: Int = raw.size
      override def frame(i: Int): (BufferedImage, Long) = {
        val f = raw(i)
        val (img, _) = perFrame.decode(f).getOrElse(throw
          new IllegalArgumentException(s"frame $i undecodable"))
        (img, f.length.toLong)
      }
    })
  }
}
