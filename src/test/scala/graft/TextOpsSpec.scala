package graft

import graft.operators.TextOps

/** Edge-case behavior of the text-analysis operators (the sf-table
  * versions are oracle-checked; these cover inputs the test corpus
  * doesn't contain).
  */
class TextOpsSpec extends SparkSpec {

  private lazy val dir = docsDir(Seq(
    1L -> "the a of and to is",                      // all English stopwords
    2L -> "x",                                       // single token
    3L -> "!!! ??? ...",                             // punctuation only
    4L -> "el la de que y en el la de que",          // Spanish markers
    5L -> "中文文本",                // CJK
    6L -> "the quick brown fox jumps over the lazy dog and runs away fast"))

  test("lang_id: stopword vote + CJK detection, deterministic tie-breaks") {
    val got = TextOps.qLangId(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(got(1L) === "en")
    assert(got(4L) === "es")
    assert(got(5L) === "zh")
    assert(got(6L) === "en")
    assert(got(3L) === "en", "no markers anywhere → en by fixed tie-break order")
  }

  test("quality score: short/punct docs rejected, normal prose kept") {
    val got = TextOps.qQualityScore(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(!got(2L), "1-word doc fails the n_words >= 5 rule")
    assert(!got(3L), "punctuation-only doc fails punct_ratio < 0.2")
    assert(got(6L), "normal prose passes")
  }

  test("token count: BPE-ish regex splits punctuation, handles edge docs") {
    val got = TextOps.qTokenCount(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got(2L) === ((1L, 1L)))
    assert(got(3L)._2 === 9L, "each mark is its own BPE-ish token (3+3+3)")
    assert(got(6L)._1 === 13L, "13 whitespace tokens")
  }

  test("fingerprint: deterministic, text-sensitive, prefix-stable") {
    val a = TextOps.qFingerprint(spark, dir).collect().sortBy(_.getLong(0))
    val b = TextOps.qFingerprint(spark, dir).collect().sortBy(_.getLong(0))
    assert(a.map(_.getLong(1)).toSeq === b.map(_.getLong(1)).toSeq, "deterministic")
    assert(a.map(_.getLong(1)).distinct.length === a.length, "distinct texts → distinct fp64")
    val fpAll = a.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fpPre = a.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fpAll(2L) === fpPre(2L), "short doc: full fp equals prefix fp")
  }

  test("stratified sample: deterministic per-row verdicts, realized rates track targets") {
    val rows = TextOps.qSampleStratified(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    rows.foreach { case (id, _, bucket, pct, kept) =>
      assert(bucket === id % 100, "bucket is a pure function of the id")
      assert(kept === (bucket < pct), "verdict is exactly bucket < target")
    }
    // realized rate per stratum ≈ target (doc_id is uniform mod 100;
    // small strata wobble, so assert a generous band)
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val target = rs.head._4 / 100.0
      val realized = rs.count(_._5).toDouble / rs.size
      assert(math.abs(realized - target) < 0.15,
        f"$lang realized $realized%.2f vs target $target%.2f")
    }
    // reproducibility: a second run yields the identical verdict set
    val again = TextOps.qSampleStratified(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getBoolean(4))).toMap
    rows.foreach { case (id, _, _, _, kept) => assert(again(id) === kept) }
  }

  test("repetition: degenerate, diverse, and single-word docs score correctly") {
    val dir = docsDir(Seq(
      10L -> "a a a a a",                              // fully repetitive
      11L -> "one two three four five six seven eight nine ten eleven twelve",
      12L -> "x",                                      // no bigrams at all
      13L -> "spam spam spam something else entirely different words here now ok fine"))
    val got = TextOps.qRepetition(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5))).toMap
    assert(got(10L) === ((5L, 1.0, 1.0, 1.0, true)))
    val (n11, tw11, dw11, tb11, rep11) = got(11L)
    assert(n11 === 12L && tw11 === 1.0 / 12 && dw11 === 0.0 && tb11 === 1.0 / 11 && !rep11,
      "12 distinct words: nothing repeats, below both thresholds")
    assert(got(12L) === ((1L, 1.0, 0.0, 0.0, true)),
      "single word: top_word_frac 1.0 trips the flag; bigram frac defaults to 0")
    val (_, tw13, _, _, rep13) = got(13L)
    assert(tw13 === 3.0 / 12 && rep13, "top word 'spam' holds 25% > 20% → repetitive")
  }

  test("contamination: benchmark-overlapping docs flagged, benchmark rows excluded") {
    // doc 0 is the benchmark stratum (0 mod 97); doc 1 shares two
    // 5-gram windows with it; doc 2 shares none
    val dir = docsDir(Seq(
      0L -> "alpha beta gamma delta epsilon zeta eta theta",
      1L -> "alpha beta gamma delta epsilon zeta qq rr",
      2L -> "completely different words with no overlap at all here"))
    val rows = TextOps.qContamination(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    assert(rows.keySet === Set(1L, 2L), "benchmark docs must not appear in the output")
    assert(rows(1L) === ((4L, 2L, true)),
      "doc 1: 4 distinct 5-grams, 2 shared with the benchmark → contaminated")
    assert(rows(2L)._2 === 0L && !rows(2L)._3, "doc 2: clean")
  }

  test("mix budget: per-stratum token totals and shares sum to 1") {
    val rows = TextOps.qMixBudget(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSet === Set("en", "es", "de", "fr", "zh"))
    assert(rows.map(_._2).sum === 500L, "doc counts cover the corpus")
    rows.foreach { case (lang, n, toks, share) =>
      assert(n > 0 && toks > 0, s"$lang must have docs and tokens")
      assert(share > 0.0 && share < 1.0)
    }
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-12, "shares must sum to 1")
  }
}
