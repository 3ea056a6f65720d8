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
}
