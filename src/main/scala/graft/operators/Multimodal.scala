package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2 non-query component):
  * image/audio/video payloads ride as opaque `binary` columns with
  * typed metadata; decode / feature-extract runs per-partition so a
  * real codec would amortize its init across a partition's rows.
  *
  * The codec itself is a STUB — deterministic fake decode derived from
  * the payload bytes (image/audio libraries are absent in this
  * container by design). The Spark-side plumbing — schema, typed
  * Dataset, mapPartitions batch shape, partition-level codec init —
  * is the real, tested part; swap [[StubCodec]] for a JNI/JavaCV
  * binding and nothing else changes.
  */
object Multimodal {

  /** An undecoded media row (what `q_multimodal_meta` materializes). */
  case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String)

  /** Decoded metadata + a fixed-width feature vector. */
  case class Decoded(doc_id: Long, media_type: String, width: Int, height: Int,
                     n_frames: Int, feature: Array[Float])

  /** Deterministic fake codec: "decodes" shape and a feature vector
    * from a rolling hash of the payload. A real implementation would
    * open the container format here — the signature is the contract.
    */
  object StubCodec {
    def init(): StubCodec.type = this // stands in for expensive codec init

    private def h(bytes: Array[Byte], salt: Long): Long = {
      var acc = salt
      var i = 0
      while (i < bytes.length) { acc = (acc * 1000003L + (bytes(i) & 0xff)) & 0xffffffffffffL; i += 1 }
      acc
    }

    def decode(r: MediaRow): Decoded = {
      val base = h(r.media, salt = 17L)
      val (w, ht, frames) = r.media_type match {
        case t if t.startsWith("image") => (64 + (base % 1024).toInt, 64 + ((base >> 10) % 1024).toInt, 1)
        case t if t.startsWith("audio") => (1, 1, 8000 + (base % 80000).toInt) // samples
        case _                          => (320 + (base % 640).toInt, 240 + ((base >> 10) % 480).toInt, 24 + (base % 240).toInt)
      }
      val feat = Array.tabulate(8)(i => ((h(r.media, salt = 31L + i) % 2048) / 1024.0f) - 1.0f)
      Decoded(r.doc_id, r.media_type, w, ht, frames, feat)
    }
  }

  /** Decode a media Dataset per-partition: codec init once per
    * partition, rows streamed through it — the batch shape a real
    * decoder needs. Map-only: scales linearly with executors.
    */
  def decode(ds: Dataset[MediaRow]): Dataset[Decoded] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      val codec = StubCodec.init()
      rows.map(codec.decode)
    }
  }

  /** One sampled frame of a decoded video/audio payload. */
  case class Frame(doc_id: Long, media_type: String, frame_idx: Int, feature: Array[Float])

  /** Resize: the 1→1 media transform shape (thumbnailing, sample-rate
    * conversion). The stub maps the decoded dims onto the target box
    * preserving determinism; a real codec would rescale pixels here.
    * Map-only per-partition — the transform a 100 TB image pipeline
    * runs between decode and feature extraction.
    */
  def resize(ds: Dataset[Decoded], maxW: Int, maxH: Int): Dataset[Decoded] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      val codec = StubCodec.init()
      rows.map { d =>
        val scale = math.min(1.0, math.min(maxW.toDouble / d.width, maxH.toDouble / d.height))
        d.copy(width = math.max(1, (d.width * scale).toInt),
               height = math.max(1, (d.height * scale).toInt))
      }
    }
  }

  /** Frame sampling: the 1→N explode shape (keyframe extraction,
    * audio windowing). Every `stride`-th frame becomes its own row
    * with a per-frame feature — the row-multiplying step that turns a
    * video corpus into a training-image corpus. Output cardinality is
    * explicit (ceil(n_frames/stride)), so downstream volume is
    * plannable before the job runs.
    */
  def frameSample(ds: Dataset[Decoded], stride: Int): Dataset[Frame] = {
    require(stride >= 1, s"stride must be positive, got $stride")
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      val codec = StubCodec.init()
      rows.flatMap { d =>
        (0 until d.n_frames by stride).iterator.map { i =>
          // deterministic per-frame feature: base feature rotated by
          // the frame index (a real codec would decode frame i here)
          val f = Array.tabulate(d.feature.length)(j =>
            d.feature((j + i) % d.feature.length))
          Frame(d.doc_id, d.media_type, i, f)
        }
      }
    }
  }

  /** End-to-end: build the media frame (as `q_multimodal_meta` does),
    * decode it, return metadata + feature summary.
    */
  def decodeTable(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = graft.sources.Ingest.table(s, dir, "documents")
      .select(
        col("doc_id"),
        col("text").cast("binary").as("media"),
        when(col("doc_id") % 3 === 0, "image/png")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("media_type"))
      .as[MediaRow]
    decode(media)
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
        col("n_frames"), size(col("feature")).as("feature_dim"))
  }

  /** SURVEY §2 row 117 — the whole media pipeline as one queryable
    * plan: synthesize media columns, decode (per-partition codec
    * init), resize into a 512×512 box, frame-sample with a
    * per-modality stride (images decode to 1 frame; audio "frames"
    * are samples, so the stride is sample-rate-sized — output
    * cardinality stays plannable per the [[frameSample]] contract),
    * then roll the frame corpus up per media type. Fully hash-checked
    * (VERDICT r9 #5): the stub codec is deterministic byte arithmetic,
    * so [[qMediaPipelineSql]] mirrors it — the typed mapPartitions
    * path stays the real plumbing under test, the oracle replays its
    * arithmetic. Per-stage semantics are additionally spec-tested in
    * MultimodalSpec.
    *
    * Shape at scale: every stage is map-only; the ONLY shuffle is the
    * final |media_type|-sized rollup. The 1→N frame explosion happens
    * inside mapPartitions — no Generate of the binary payload, and
    * payload bytes never survive past decode.
    */
  def qMediaPipeline(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = graft.sources.Ingest.table(s, dir, "documents")
      .select(
        col("doc_id"),
        col("text").cast("binary").as("media"),
        when(col("doc_id") % 3 === 0, "image/png")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("media_type"))
      .as[MediaRow]
    val decoded = resize(decode(media), maxW = 512, maxH = 512)
    val img = frameSample(decoded.filter(col("media_type") === "image/png").as[Decoded], 1)
    val vid = frameSample(decoded.filter(col("media_type") === "video/mp4").as[Decoded], 8)
    val aud = frameSample(decoded.filter(col("media_type") === "audio/wav").as[Decoded], 8000)
    img.unionAll(vid).unionAll(aud)
      .groupBy(col("media_type"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_frames_sampled"),
        max(col("frame_idx")).as("max_frame_idx"),
        min(size(col("feature"))).as("feature_dim"))
  }

  /** Oracle for [[qMediaPipeline]] — fully hash-checked. The rollup's
    * columns depend ONLY on each doc's media_type and n_frames (resize
    * touches dims the rollup never reads; features only contribute
    * their fixed length 8), and n_frames comes from [[StubCodec]]'s
    * 48-bit rolling hash `acc = (acc·1000003 + byte) mod 2^48` over
    * the UTF-8 payload — exact in HUGEINT (acc < 2^48, ×1000003 <
    * 2^68 ≪ 2^127). Byte values are `unicode()` code points under the
    * corpus's all-ASCII contract (the [[OracleEmul.wordHashes]]
    * device). frameSample's 1→N explode reduces to closed forms:
    * count = ⌈n/stride⌉, max idx = ⌊(n−1)/stride⌋·stride.
    */
  val qMediaPipelineSql: String = {
    val mask = 281474976710656L // 2^48
    s"""WITH codes AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0 THEN 'image/png'
       |         WHEN doc_id % 3 = 1 THEN 'audio/wav'
       |         ELSE 'video/mp4' END AS media_type,
       |    list_reduce(list_prepend(17::HUGEINT,
       |      list_transform(list_filter(string_split_regex(text, ''), c1 -> c1 <> ''),
       |        c2 -> unicode(c2)::HUGEINT)),
       |      (acc, b) -> (acc * 1000003 + b) % $mask::HUGEINT) AS base
       |  FROM documents),
       |d AS (
       |  SELECT doc_id, media_type,
       |    CASE WHEN media_type = 'image/png' THEN 1::HUGEINT
       |         WHEN media_type = 'audio/wav' THEN 8000 + base % 80000
       |         ELSE 24 + base % 240 END AS n_frames,
       |    CASE WHEN media_type = 'image/png' THEN 1
       |         WHEN media_type = 'video/mp4' THEN 8
       |         ELSE 8000 END AS stride
       |  FROM codes)
       |SELECT media_type,
       |  COUNT(DISTINCT doc_id) AS n_docs,
       |  CAST(SUM((n_frames + stride - 1) // stride) AS BIGINT) AS n_frames_sampled,
       |  CAST(MAX(((n_frames - 1) // stride) * stride) AS INTEGER) AS max_frame_idx,
       |  CAST(MIN(8) AS INTEGER) AS feature_dim
       |FROM d GROUP BY media_type
       |ORDER BY media_type""".stripMargin
  }

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] = Map(
    "q_media_pipeline" -> qMediaPipeline _)

  val oracle: Map[String, String] = Map(
    "q_media_pipeline" -> qMediaPipelineSql)
}
