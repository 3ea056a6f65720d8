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

  test("oracle ASCII contract: every document payload codepoint is < U+0080") {
    // qPhashDedupSql / qMediaPipelineSql fold unicode() CODE POINTS
    // while StubCodec.baseHash folds UTF-8 BYTES — equal only on
    // all-ASCII payloads (ADVICE r14). This pin is the contract: if
    // the fixture ever grows a non-ASCII document, fail HERE with the
    // offending doc_id, not as an opaque oracle hash mismatch.
    import org.apache.spark.sql.functions._
    val offenders = graft.sources.Ingest.table(spark, sf001, "documents")
      .filter(expr("regexp_count(text, '[^\\\\x00-\\\\x7f]') > 0"))
      .select("doc_id").limit(5).collect().map(_.getLong(0))
    assert(offenders.isEmpty,
      s"non-ASCII document payloads break the unicode()-vs-UTF-8 oracle parity: ${offenders.mkString(",")}")
  }

  test("phash dedup: planted identical payloads collide at hamming 0; distinct ones stay apart") {
    // With the avalanche-y stub codec, byte-identical payloads are the
    // constructible near-dup family (a real codec would put
    // recompressed variants at small hamming; the PLAN is identical).
    // Docs 10/40/70 share one payload; everything else is distinct.
    val dup = "the planted duplicate media payload body with enough bytes"
    val d = docsDir(Seq(
      10L -> dup, 40L -> dup, 70L -> dup,
      11L -> "a completely different first payload entirely",
      12L -> "yet another unrelated media payload body here",
      13L -> "and one more distinct payload for good measure"))
    val got = Multimodal.qPhashDedup(spark, d).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(2), r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5), r.getBoolean(6)))).toMap
    assert(got.size === 6)
    val (hex10, _, mate10, ham10, dup10) = got(10L)
    val (hex40, _, mate40, ham40, dup40) = got(40L)
    val (hex70, _, _, ham70, dup70) = got(70L)
    assert(hex10 === hex40 && hex40 === hex70, "identical payloads → identical fingerprints")
    assert(ham10 === 0L && ham40 === 0L && ham70 === 0L)
    assert(dup10 && dup40 && dup70)
    assert(mate10 === 40L, "best mate ties break to the smallest mate id")
    assert(mate40 === 10L)
    assert(got(10L)._2 >= 2L, "every family member sees the other two as candidates")
    // distinct payloads: fingerprints differ and no false dups
    val others = Seq(11L, 12L, 13L).map(got)
    assert(others.map(_._1).distinct.size === 3, "distinct payloads → distinct fingerprints")
    assert(others.forall(!_._5), "no planted false positives at hamming <= 3")
    assert(got(10L)._1.length === 16, "4 bands x 4 hex digits")
  }

  /** VERDICT r19 #6: the phash banding frontier obeys its two
    * structural laws. NESTING: a clean 2w-bit band is two clean w-bit
    * bands, so each config's candidate set CONTAINS the coarser
    * config's (counts and hits are monotone in n_bands). PIGEONHOLE:
    * h bit flips dirty ≤ h bands, so recall is exactly 10000 bp for
    * every config with n_bands > the hamming truth bound (3).
    */
  test("q_phash_banding: candidates nest with band count; pigeonhole recall is exact") {
    val rows = Multimodal.qPhashBanding(spark, sf0001)
      .orderBy(org.apache.spark.sql.functions.col("n_bands")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq === Seq(2L, 4L, 8L, 16L))
    rows.foreach { case (b, w, _, _, _, _) => assert(b * w === 64L, "bands partition the 64 bits") }
    assert(rows.map(_._5).distinct.length === 1, "union truth is one constant")
    assert(rows.map(_._3).toSeq === rows.map(_._3).toSeq.sorted,
      "candidate volume is monotone in band count (nesting)")
    assert(rows.map(_._4).toSeq === rows.map(_._4).toSeq.sorted,
      "true hits are monotone in band count (nesting)")
    rows.filter(_._1 > 3L).foreach { case (b, _, _, _, _, recall) =>
      assert(recall === 10000L,
        s"pigeonhole: $b bands must recover every hamming<=3 pair exactly")
    }
    assert(rows.head._4 <= rows.head._5,
      "the 2-band point may miss truth pairs — that shortfall is what the frontier prices")
  }
}
