package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {

  test("feature extraction: deterministic, right shapes, per-kind semantics") {
    val media = Multimodal.syntheticMedia(spark, 60)
    val codec = new StubCodec(32)
    val feats = Multimodal.extractFeatures(media, codec).collect()
    assert(feats.length == 60)
    assert(feats.forall(_.features.length == 32))
    assert(feats.filter(_.kind == "video").forall(_.frames_sampled >= 1))
    assert(feats.filter(_.kind != "video").forall(_.frames_sampled == 1))
    assert(feats.forall(f => f.out_width <= 224 && f.out_height <= 224))
    // determinism across runs
    val again = Multimodal.extractFeatures(media, codec).collect()
      .map(f => f.media_id -> f.checksum).toMap
    assert(feats.forall(f => again(f.media_id) == f.checksum))
  }

  test("resize bookkeeping preserves aspect ratio") {
    assert(Multimodal.resizeDims(640, 480) == ((224, 168)))
    assert(Multimodal.resizeDims(480, 640) == ((168, 224)))
    assert(Multimodal.resizeDims(0, 0) == ((224, 224)))
  }

  test("frame sampling matches duration * fps") {
    assert(Multimodal.framesToSample(10000, 1.0) == 10)
    assert(Multimodal.framesToSample(500, 1.0) == 1)
    assert(Multimodal.framesToSample(4000, 2.5) == 10)
  }

  test("stub codec features are a normalized byte histogram") {
    val codec = new StubCodec(8)
    val f = codec.decodeFeatures(Array[Byte](0, 8, 16, 24), "image")
    assert(math.abs(f.sum - 1.0f) < 1e-6)
    assert(f(0) == 1.0f) // all bytes fold to bucket 0 (mod 8)
  }
}
