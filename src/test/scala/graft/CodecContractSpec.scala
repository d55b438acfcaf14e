package graft

import graft.operators.{CodecConformance, FramedCodec, ImageIoCodec, WavCodec}

/** The codec-seam conformance kit, run against the in-repo default
  * codecs — the same [[CodecConformance]] entrypoints a production
  * H.264/AAC/Opus jar is qualified with before being passed into the
  * multimodal operators. Defaults are LOSSLESS containers, so the kit
  * runs at tolerance 0; a lossy codec declares its tolerance and the
  * exact-mode operators (q204/q205) refuse anything above 0 by
  * construction (their hashes are content-exact). */
class CodecContractSpec extends GraftSpec {

  test("image seam: ImageIoCodec (PNG) passes the full conformance kit at tolerance 0") {
    val checks = CodecConformance.assertAll(
      CodecConformance.image(spark, ImageIoCodec))
    // the kit exercises every clause class: round-trip, determinism,
    // foreign bytes, serialization, distributed invariance
    assert(checks.size >= 9, checks.map(_.name))
  }

  test("audio seam: WavCodec passes the full conformance kit at tolerance 0") {
    val checks = CodecConformance.assertAll(
      CodecConformance.audio(spark, WavCodec))
    assert(checks.size >= 8, checks.map(_.name))
  }

  test("video seam: FramedCodec passes the full conformance kit at tolerance 0") {
    val checks = CodecConformance.assertAll(
      CodecConformance.video(spark, FramedCodec()))
    assert(checks.size >= 9, checks.map(_.name))
  }

  test("the kit actually rejects: a codec that throws on foreign bytes fails loudly") {
    // a minimal broken codec — decode throws instead of returning None
    // (the exact production bug the foreign-bytes clause exists for:
    // one corrupt payload would kill a whole partition task)
    object ThrowingCodec extends graft.operators.MediaCodec {
      override def decode(bytes: Array[Byte]) = {
        val d = ImageIoCodec.decode(bytes)
        if (d.isEmpty) throw new IllegalArgumentException("not an image")
        d
      }
      override def encode(img: java.awt.image.BufferedImage) =
        ImageIoCodec.encode(img)
    }
    val e = intercept[IllegalArgumentException] {
      CodecConformance.assertAll(CodecConformance.image(spark, ThrowingCodec))
    }
    assert(e.getMessage.contains("foreign-bytes"), e.getMessage)
  }
}
