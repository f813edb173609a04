package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.packMedia(
    Tables.load(spark, sf, "documents").limit(60))

  test("packMedia produces binary payloads with typed metadata") {
    val rows = media.collect()
    assert(rows.length == 60)
    assert(rows.forall(_.payload.nonEmpty))
    assert(rows.map(_.kind).toSet == Set("image", "audio", "video"))
  }

  test("decode is deterministic and partition-invariant") {
    val d1 = Multimodal.decode(media).orderBy("media_id").collect()
    val d2 = Multimodal.decode(media.repartition(7))
      .orderBy("media_id").collect()
    assert(d1.toSeq == d2.toSeq)
    assert(d1.forall(r => r.n_bytes > 0))
  }

  test("extractFeatures yields unit-norm fixed-dim vectors") {
    val f = Multimodal.extractFeatures(media, 32).collect()
    assert(f.forall(_.feature.length == 32))
    f.foreach { r =>
      val n = math.sqrt(r.feature.map(x => x * x.toDouble).sum)
      assert(math.abs(n - 1.0) < 1e-3, s"norm $n for ${r.media_id}")
    }
  }

  test("sampleFrames explodes video payloads into strided blocks") {
    val frames = Multimodal.sampleFrames(media, blockSize = 16, stride = 2)
      .collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame.length <= 16))
    assert(frames.forall(_.frame_idx % 2 == 0))
  }

  test("resizeMeta caps width and preserves aspect ratio direction") {
    val r = Multimodal.resizeMeta(media, 100).collect()
    assert(r.forall(_.width <= 100))
  }
}
