package graft

import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode parses every synthetic blob; malformed blobs degrade to valid=false") {
    val media = Multimodal.synthMedia(spark, 500, 42L)
    val meta = Multimodal.decode(media)
    assert(meta.count() == 500)
    assert(meta.filter(_.valid).count() == 500)
    assert(meta.filter(m => m.width < 16 || m.width >= 80).count() == 0)

    val broken = Seq(
      Multimodal.Media(1L, "image", Array[Byte](1, 2, 3)),
      Multimodal.Media(2L, "image", null),
      Multimodal.Media(3L, "audio", Array.fill[Byte](20)(0))).toDS()
    val bm = Multimodal.decode(broken).collect()
    assert(bm.forall(!_.valid))
  }

  test("features are normalized fixed-width vectors") {
    val f = Multimodal.features(Multimodal.synthMedia(spark, 200, 42L)).collect()
    assert(f.forall(_.features.length == 16))
    f.foreach(x => assert(math.abs(x.features.sum - 1.0) < 1e-9))
  }

  test("frame sampling emits every stride-th frame with payload slices") {
    val media = Multimodal.synthMedia(spark, 200, 42L)
    val frames = Multimodal.sampleFrames(media, stride = 2)
    val byId = frames.collect().groupBy(_.media_id)
    val metas = Multimodal.decode(media).collect().map(m => m.media_id -> m).toMap
    byId.foreach { case (id, fs) =>
      val expect = (0 until metas(id).n_frames by 2).toSet
      assert(fs.map(_.frame_no).toSet == expect)
      assert(fs.forall(_.frame.nonEmpty))
    }
  }

  test("summary roll-up is deterministic") {
    val a = Multimodal.summary(spark, 500).collect().map(_.toString).sorted.toSeq
    val b = Multimodal.summary(spark, 500).collect().map(_.toString).sorted.toSeq
    assert(a == b)
    assert(a.size == 3) // image, audio, video
  }
}
