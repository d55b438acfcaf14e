package graft

import graft.operators.Multimodal

/** Multimodal plumbing specs (§2c): schema, determinism, row expansion. */
class MultimodalSpec extends GraftSpec {
  import spark.implicits._

  lazy val docs = Seq(
    (0L, "a video-ish payload"), (1L, "an image-ish payload"),
    (2L, "an audio-ish payload"), (3L, "another video payload")
  ).toDF("doc_id", "text")

  test("mediaTable carries payload + typed metadata struct") {
    val mt = Multimodal.mediaTable(spark, docs)
    assert(mt.schema("meta").dataType.typeName == "struct")
    val types = mt.select("doc_id", "meta.media_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(types(0L) == "video" && types(1L) == "image" && types(2L) == "audio")
  }

  test("q51 features are deterministic and partition-independent") {
    val a = Multimodal.q51(spark, docs).collect().toSeq
    val b = Multimodal.q51(spark, docs.repartition(7)).collect().toSeq
    assert(a == b)
    assert(a.forall(_.getAs[Long]("n_bytes") > 0))
  }

  test("q52 resize never exceeds the target box") {
    val rows = Multimodal.q52Resize(spark, docs, maxW = 8, maxH = 8).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("width") <= 8 && r.getAs[Int]("height") <= 8)
    }
  }

  test("q53 frame sampling expands only video rows, every k-th frame") {
    val rows = Multimodal.q53FrameSample(spark, docs, every = 4).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == Set(0L, 3L))           // only the videos
    rows.foreach(r => assert(r.getAs[Int]("frame_idx") % 4 == 0))
  }
}
