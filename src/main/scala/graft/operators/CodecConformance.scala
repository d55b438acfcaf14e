package graft.operators

import java.awt.image.BufferedImage

import org.apache.spark.sql.SparkSession

/** Conformance kit for the three codec seams ([[MediaCodec]],
  * [[AudioCodec]], [[VideoCodec]]) — the qualification a production
  * H.264/AAC/Opus jar runs BEFORE it is passed into the multimodal
  * operators, extracted from MultimodalSpec so deployment does not
  * require reading the engine's tests (r15 verdict #7).
  *
  * Each runner returns one [[CodecConformance.Check]] per contract
  * clause; [[CodecConformance.assertAll]] turns failures into one
  * loud exception. The clauses are exactly what the operators rely
  * on:
  *
  *  - ROUND-TRIP: encode→decode preserves dimensions/rate and content
  *    within `maxError` (0 = lossless, the PNG/WAV default; a lossy
  *    production codec declares its tolerance — q52/q93/q197 feature
  *    extraction budgets for it, q204/q205 EXACT modes require 0).
  *  - DETERMINISM: same input → byte-stable decode, twice (anchor
  *    selection and fingerprints must not wobble across retries).
  *  - FOREIGN BYTES: decode returns None — never throws — on garbage
  *    and on truncated payloads (operators fall back to byte-level
  *    features; a throwing codec kills the whole partition task).
  *  - SERIALIZABLE: the codec survives JVM serialization and works
  *    after the round-trip (it rides inside mapPartitions closures).
  *  - PARTITION INVARIANCE: decoding through a real Spark job yields
  *    identical results at any partitioning (the executor-shape
  *    contract: codecs must be stateless or per-JVM lazy).
  *  - (video) FRAMING: frame count round-trips, every frame decodes
  *    to its source content, in-container frame sizes are positive
  *    and sum to no more than the payload, and SPARSE access decodes
  *    only what is asked (the q53 random-access contract is the API
  *    shape itself; this kit checks it stays functional).
  */
object CodecConformance {

  final case class Check(name: String, pass: Boolean, detail: String = "")

  /** Throw with every failing clause listed, or return the checks. */
  def assertAll(checks: Seq[Check]): Seq[Check] = {
    val bad = checks.filterNot(_.pass)
    require(bad.isEmpty,
      s"codec conformance failed: ${bad.map(c => s"${c.name} (${c.detail})").mkString("; ")}")
    checks
  }

  // ------------------------------------------------------- fixtures

  /** Deterministic qualification content: a rendered scene (blobs +
    * gradients), a flat fill, and a per-pixel high-frequency pattern —
    * the three regimes (structured, degenerate, incompressible) where
    * codecs historically disagree. */
  private def testImages: Seq[BufferedImage] = {
    val scene = Multimodal.renderImage("codec conformance scene tokens", 24, 20)
    val flat = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) flat.setRGB(x, y, 0x336699)
    val noise = new BufferedImage(17, 13, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 13; x <- 0 until 17)
      noise.setRGB(x, y, ((x * 2654435761L + y * 40503L) & 0xffffff).toInt)
    Seq(scene, flat, noise)
  }

  private def testClips: Seq[(Array[Short], Int)] = Seq(
    (Multimodal.renderAudio("codec conformance voices", 8000, 4000), 8000),
    (Multimodal.renderAudio("another qualification clip", 16000, 2000), 16000),
    (Array.tabulate[Short](500)(i =>
      (((i * 2654435761L) % 65536) - 32768).toShort), 8000))

  private def maxPixelDelta(a: BufferedImage, b: BufferedImage): Int = {
    var worst = 0
    for (y <- 0 until a.getHeight; x <- 0 until a.getWidth) {
      val pa = a.getRGB(x, y); val pb = b.getRGB(x, y)
      for (shift <- Seq(0, 8, 16)) {
        val d = math.abs(((pa >> shift) & 0xff) - ((pb >> shift) & 0xff))
        if (d > worst) worst = d
      }
    }
    worst
  }

  private def pixels(img: BufferedImage): Array[Int] =
    img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)

  private def jvmRoundTrip[T <: Serializable](v: T): T = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(v); oos.close()
    val ois = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    ois.readObject().asInstanceOf[T]
  }

  private val garbage: Seq[Array[Byte]] = Seq(
    Array.tabulate[Byte](64)(i => (i * 37 + 11).toByte),
    Array[Byte](0x50, 0x4b, 0x03, 0x04), // zip magic — a plausible foreign container
    // a length prefix of Int.MaxValue: integer-overflow bait for
    // framing walks (p + 4 + n wraps negative — the r16 bug)
    Array[Byte](0x7f, -1, -1, -1, 0x00, 0x01),
    Array.emptyByteArray)

  // ---------------------------------------------------------- image

  def image(spark: SparkSession, codec: MediaCodec,
            maxError: Int = 0): Seq[Check] = {
    val imgs = testImages
    val rt = imgs.zipWithIndex.map { case (img, i) =>
      codec.decode(codec.encode(img)) match {
        case Some((back, fmt)) =>
          val dims = back.getWidth == img.getWidth && back.getHeight == img.getHeight
          val err = if (dims) maxPixelDelta(img, back) else Int.MaxValue
          Check(s"image round-trip #$i", dims && err <= maxError,
            s"fmt=$fmt dims=$dims maxPixelDelta=$err tol=$maxError")
        case None => Check(s"image round-trip #$i", pass = false, "decode=None")
      }
    }
    val enc = codec.encode(imgs.head)
    val det = {
      val a = codec.decode(enc).map(p => pixels(p._1).toSeq)
      val b = codec.decode(enc).map(p => pixels(p._1).toSeq)
      Check("image decode determinism", a.isDefined && a == b)
    }
    val foreign = garbage.zipWithIndex.map { case (g, i) =>
      val r = try Right(codec.decode(g)) catch { case e: Exception => Left(e) }
      Check(s"image foreign-bytes #$i returns None, never throws",
        r == Right(None), r.toString.take(120))
    } :+ {
      val trunc = enc.take(enc.length / 3)
      val r = try Right(codec.decode(trunc)) catch { case e: Exception => Left(e) }
      Check("image truncated-payload returns None, never throws",
        r == Right(None), r.toString.take(120))
    }
    val ser = {
      val c2 = jvmRoundTrip(codec)
      Check("image codec serializable + functional after round-trip",
        c2.decode(enc).exists(p => maxPixelDelta(p._1, imgs.head) <= maxError))
    }
    val dist = {
      import spark.implicits._
      val payloads = imgs.map(codec.encode)
      def dims(parts: Int): Seq[(Int, Int, Int)] = payloads.zipWithIndex
        .map { case (b, i) => (i, b) }.toDF("i", "b").repartition(parts)
        .as[(Int, Array[Byte])]
        .mapPartitions(_.map { case (i, b) =>
          val (img, _) = codec.decode(b).get
          (i, img.getWidth, img.getHeight)
        })
        .collect().sortBy(_._1).toSeq
      Check("image decode partition-invariant through a Spark job",
        dims(1) == dims(5))
    }
    rt ++ Seq(det) ++ foreign ++ Seq(ser, dist)
  }

  // ---------------------------------------------------------- audio

  def audio(spark: SparkSession, codec: AudioCodec,
            maxError: Int = 0): Seq[Check] = {
    val clips = testClips
    val rt = clips.zipWithIndex.map { case ((s, rate), i) =>
      codec.decode(codec.encode(s, rate)) match {
        case Some((back, r2, fmt)) =>
          val shape = back.length == s.length && r2 == rate
          val err = if (shape)
            s.indices.map(j => math.abs(back(j) - s(j))).max else Int.MaxValue
          Check(s"audio round-trip #$i", shape && err <= maxError,
            s"fmt=$fmt n=${back.length}/${s.length} rate=$r2/$rate maxSampleDelta=$err")
        case None => Check(s"audio round-trip #$i", pass = false, "decode=None")
      }
    }
    val enc = codec.encode(clips.head._1, clips.head._2)
    val det = {
      val a = codec.decode(enc).map(_._1.toSeq)
      val b = codec.decode(enc).map(_._1.toSeq)
      Check("audio decode determinism", a.isDefined && a == b)
    }
    val foreign = garbage.zipWithIndex.map { case (g, i) =>
      val r = try Right(codec.decode(g)) catch { case e: Exception => Left(e) }
      Check(s"audio foreign-bytes #$i returns None, never throws",
        r == Right(None), r.toString.take(120))
    }
    val ser = {
      val c2 = jvmRoundTrip(codec)
      Check("audio codec serializable + functional after round-trip",
        c2.decode(enc).exists(_._1.length == clips.head._1.length))
    }
    val dist = {
      import spark.implicits._
      val payloads = clips.map { case (s, r) => codec.encode(s, r) }
      def lens(parts: Int): Seq[(Int, Int, Int)] = payloads.zipWithIndex
        .map { case (b, i) => (i, b) }.toDF("i", "b").repartition(parts)
        .as[(Int, Array[Byte])]
        .mapPartitions(_.map { case (i, b) =>
          val (s, r, _) = codec.decode(b).get
          (i, s.length, r)
        })
        .collect().sortBy(_._1).toSeq
      Check("audio decode partition-invariant through a Spark job",
        lens(1) == lens(5))
    }
    rt ++ Seq(det) ++ foreign ++ Seq(ser, dist)
  }

  // ---------------------------------------------------------- video

  def video(spark: SparkSession, codec: VideoCodec,
            maxError: Int = 0): Seq[Check] = {
    val frames = testImages ++ testImages.map { img =>
      // second half: shifted copies so frame identity is checkable
      val b = new BufferedImage(img.getWidth, img.getHeight,
        BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        b.setRGB(x, y, img.getRGB(img.getWidth - 1 - x, y))
      b
    }
    val enc = codec.encode(frames)
    val clip = codec.decode(enc)
    val framing = Check("video frame count round-trips",
      clip.exists(_.numFrames == frames.size),
      s"got ${clip.map(_.numFrames)} want ${frames.size}")
    val content = clip match {
      case Some(c) if c.numFrames == frames.size =>
        val errs = frames.indices.map { i =>
          val (img, _) = c.frame(i)
          maxPixelDelta(img, frames(i))
        }
        Seq(Check("video every frame decodes to its source content",
          errs.forall(_ <= maxError), s"maxPixelDeltas=$errs tol=$maxError"))
      case _ => Seq(Check("video every frame decodes to its source content",
        pass = false, "undecodable or wrong count"))
    }
    val sizes = clip match {
      case Some(c) if c.numFrames == frames.size =>
        val ss = frames.indices.map(i => c.frame(i)._2)
        Seq(Check("video in-container frame sizes positive, sum <= payload",
          ss.forall(_ > 0) && ss.sum <= enc.length.toLong,
          s"sizes=$ss payload=${enc.length}"))
      case _ => Seq(Check(
        "video in-container frame sizes positive, sum <= payload",
        pass = false, "undecodable"))
    }
    val sparse = clip match {
      case Some(c) if c.numFrames >= 3 =>
        val r = try Right(c.frame(c.numFrames - 1)._1.getWidth > 0 &&
          c.frame(0)._1.getWidth > 0) catch { case e: Exception => Left(e) }
        Seq(Check("video sparse random access works out of order",
          r == Right(true), r.toString.take(120)))
      case _ => Seq(Check("video sparse random access works out of order",
        pass = false, "undecodable"))
    }
    val foreign = garbage.zipWithIndex.map { case (g, i) =>
      val r = try Right(codec.decode(g).isEmpty)
        catch { case e: Exception => Left(e) }
      Check(s"video foreign-bytes #$i returns None, never throws",
        r == Right(true), r.toString.take(120))
    }
    val ser = {
      val c2 = jvmRoundTrip(codec)
      Check("video codec serializable + functional after round-trip",
        c2.decode(enc).exists(_.numFrames == frames.size))
    }
    val dist = {
      import spark.implicits._
      def counts(parts: Int): Seq[(Int, Int)] = Seq((0, enc))
        .toDF("i", "b").repartition(parts)
        .as[(Int, Array[Byte])]
        .mapPartitions(_.map { case (i, b) =>
          (i, codec.decode(b).map(_.numFrames).getOrElse(-1))
        })
        .collect().sortBy(_._1).toSeq
      Check("video decode partition-invariant through a Spark job",
        counts(1) == counts(3))
    }
    Seq(framing) ++ content ++ sizes ++ sparse ++ foreign ++ Seq(ser, dist)
  }
}
