package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

/** The stub-codec decode plumbing: schema, batch shape, determinism. */
class MultimodalSpec extends SparkSpec {

  test("decodeTable: one decoded row per document, fixed feature width") {
    val got = Multimodal.decodeTable(spark, sf0001).collect()
    assert(got.length === 500)
    assert(got.forall(_.getInt(5) === 8), "feature_dim must be 8")
    assert(got.forall(r => r.getInt(2) > 0 && r.getInt(3) > 0 && r.getInt(4) > 0))
  }

  test("stub codec is deterministic and media-type-aware") {
    val bytes = "the same payload".getBytes("UTF-8")
    val img = Multimodal.StubCodec.decode(MediaRow(1L, bytes, "image/png"))
    val img2 = Multimodal.StubCodec.decode(MediaRow(1L, bytes, "image/png"))
    val aud = Multimodal.StubCodec.decode(MediaRow(1L, bytes, "audio/wav"))
    assert(img === img2.copy(feature = img.feature), "same payload → same decode")
    assert(img.feature.toSeq === img2.feature.toSeq)
    assert(img.n_frames === 1 && aud.n_frames > 1, "type tag drives the shape")
    assert(aud.width === 1 && aud.height === 1)
  }

  test("resize: fits the target box, preserves aspect, never upscales") {
    val s = spark
    import s.implicits._
    val decoded = Seq(
      Multimodal.Decoded(1L, "image/png", 800, 600, 1, Array.fill(8)(0.5f)),
      Multimodal.Decoded(2L, "image/png", 100, 50, 1, Array.fill(8)(0.5f))).toDS()
    val got = Multimodal.resize(decoded, maxW = 400, maxH = 400).collect()
      .map(d => d.doc_id -> ((d.width, d.height))).toMap
    assert(got(1L) === ((400, 300)), "downscale preserves aspect ratio")
    assert(got(2L) === ((100, 50)), "already-fitting media is never upscaled")
  }

  test("frameSample: explicit 1→N cardinality, per-frame features, deterministic") {
    val s = spark
    import s.implicits._
    val feat = Array.tabulate(8)(_.toFloat)
    val decoded = Seq(
      Multimodal.Decoded(1L, "video/mp4", 320, 240, 10, feat),
      Multimodal.Decoded(2L, "image/png", 64, 64, 1, feat)).toDS()
    val got = Multimodal.frameSample(decoded, stride = 4).collect()
    val video = got.filter(_.doc_id == 1L).sortBy(_.frame_idx)
    assert(video.map(_.frame_idx).toSeq === Seq(0, 4, 8), "ceil(10/4)=3 sampled frames")
    assert(got.count(_.doc_id == 2L) === 1, "single-frame media yields one row")
    assert(video(1).feature.toSeq === feat.drop(4).toSeq ++ feat.take(4).toSeq,
      "per-frame feature is a deterministic function of (base, frame_idx)")
  }
}
