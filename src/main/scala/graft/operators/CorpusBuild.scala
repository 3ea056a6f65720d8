package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.Materialize._
import graft.sources.Ingest

/** SURVEY §2 — the end-to-end corpus-build composition (VERDICT r13
  * #8): ingest → normalize → lang-ID → quality → repetition → exact
  * dedup → near dedup → pack → shard → dataset card, registered as ONE
  * program whose output is the per-stage census (docs in, tokens in,
  * stage-specific units) — the funnel table a training-data build run
  * publishes next to its artifacts.
  *
  * Every stage verdict comes from the ALREADY-VERIFIED standalone
  * operator (qLangId / qQualityScore / qRepetition / qDedupExact /
  * qDedupMinhash / qNormalizeText), composed doc-keyed; this row
  * proves they compose without semantic drift. It is registered
  * rows-only (the documented exception class: its own oracle would
  * restate six hash-checked programs, proving nothing) —
  * InvariantSpec independently recomputes every stage drop from the
  * standalone outputs and reconciles survivor counts and token
  * masses.
  *
  * Stage rules (the order real builds apply):
  *   - normalize drops nothing; its `n_units` counts docs whose
  *     normalized text actually changed (the canonicalization reach).
  *   - lang-ID keeps predicted-English docs (`q_lang_id`'s argmax).
  *   - exact dedup uses the GLOBAL `q_dedup_exact` min-id
  *     survivorship: hash-twins share identical text, hence identical
  *     lang/quality/repetition fates, so global survivorship equals
  *     stage-local survivorship exactly — the reconciliation
  *     InvariantSpec pins.
  *   - near dedup drops the larger id of each verified
  *     `q_dedup_minhash` pair (J ≥ 0.6) whose smaller id is still
  *     alive — the keep-first rule production pipelines apply.
  *   - pack/shard replay `q_pack_sequences` / `q_shard_plan` over the
  *     survivors with the SAME constants (shared private[graft] vals,
  *     so the composition cannot drift from the standalone rows).
  *
  * Shape at scale: the verdict joins are doc-keyed equi-joins of
  * map-only projections (the dedup branches carry their own verified
  * shuffle shapes); the census is ONE aggregate over the materialized
  * verdict table; pack rides the (lang, lane)-partitioned running-sum
  * window and shard the `q_shard_plan` ranked layout. Nothing here
  * adds a shuffle the standalone operators don't already pay.
  */
object CorpusBuild {

  def qCorpusBuild(s: SparkSession, dir: String): DataFrame = {
    val toks = expr("CAST(size(filter(split(text, ' '), w -> length(w) > 0)) AS BIGINT)")
    val base = Ingest.table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"), toks.as("toks"),
        md5(col("text").cast("binary")).as("raw_md5"))
    val lang = TextOps.qLangId(s, dir).select(col("doc_id"), col("lang_pred"))
    val qual = TextOps.qQualityScore(s, dir).select(col("doc_id"), col("is_keep"))
    val rep  = TextOps.qRepetition(s, dir).select(col("doc_id"), col("is_repetitive"))
    val dup  = Dedup.qDedupExact(s, dir).select(col("doc_id"), col("is_dup"))
    val norm = TextOps.qNormalizeText(s, dir).select(col("doc_id"), col("norm_md5"))
    val v0 = base.join(lang, "doc_id").join(qual, "doc_id").join(rep, "doc_id")
      .join(dup, "doc_id").join(norm, "doc_id")
      .withColumn("alive_lang", col("lang_pred") === "en")
      .withColumn("alive_quality", col("alive_lang") && col("is_keep"))
      .withColumn("alive_rep", col("alive_quality") && !col("is_repetitive"))
      .withColumn("alive_exact", col("alive_rep") && !col("is_dup"))
      .materialized
    val nearDrops = Dedup.qDedupMinhash(s, dir)
      .join(v0.filter(col("alive_exact")).select(col("doc_id").as("id_a")), "id_a")
      .select(col("id_b").as("doc_id")).distinct()
      .withColumn("near_drop", lit(true))
    val v = v0.join(nearDrops, Seq("doc_id"), "left")
      .withColumn("alive_near",
        col("alive_exact") && !coalesce(col("near_drop"), lit(false)))
      .materialized

    val census = v.agg(
      count(lit(1)).as("d0"), sum(col("toks")).as("t0"),
      sum(when(col("norm_md5") =!= col("raw_md5"), 1L).otherwise(0L)).as("n_changed"),
      sum(when(col("alive_lang"), 1L).otherwise(0L)).as("d1"),
      sum(when(col("alive_lang"), col("toks")).otherwise(0L)).as("t1"),
      sum(when(col("alive_quality"), 1L).otherwise(0L)).as("d2"),
      sum(when(col("alive_quality"), col("toks")).otherwise(0L)).as("t2"),
      sum(when(col("alive_rep"), 1L).otherwise(0L)).as("d3"),
      sum(when(col("alive_rep"), col("toks")).otherwise(0L)).as("t3"),
      sum(when(col("alive_exact"), 1L).otherwise(0L)).as("d4"),
      sum(when(col("alive_exact"), col("toks")).otherwise(0L)).as("t4"),
      sum(when(col("alive_near"), 1L).otherwise(0L)).as("d5"),
      sum(when(col("alive_near"), col("toks")).otherwise(0L)).as("t5"),
      countDistinct(when(col("alive_near"), col("source"))).as("n_sources"))

    val lane = Window.partitionBy(col("lang"), col("lane")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packs = v.filter(col("alive_near"))
      .select(col("doc_id"), col("lang"),
        (col("doc_id") % TextOps.packLanes).as("lane"), col("toks"))
      .withColumn("cum", sum(col("toks")).over(lane))
      .withColumn("pack_id", expr(s"(cum - toks) DIV ${TextOps.packBudget}"))
      .groupBy(col("lang"), col("lane"), col("pack_id"))
      .agg(sum(col("toks")).as("n_tokens"))
      .agg(coalesce(count(lit(1)), lit(0L)).as("n_packs"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("pack_tokens"))

    val shards = graft.plans.Surrogate.rankedId(
        v.filter(col("alive_near"))
          .select(col("doc_id"), col("toks"), (-col("toks")).as("wneg")),
        Seq("wneg", "doc_id"), "rk")
      .select(expr(s"(rk - 1) % ${TextOps.nShards}").as("shard"))
      .agg(coalesce(countDistinct(col("shard")), lit(0L)).as("n_shards"))

    census.crossJoin(broadcast(packs)).crossJoin(broadcast(shards))
      .select(explode(expr(
        """array(
          |  struct(CAST(1 AS BIGINT) AS stage_id, 'ingest' AS stage,
          |         d0 AS n_docs, t0 AS n_tokens, d0 AS n_units),
          |  struct(CAST(2 AS BIGINT) AS stage_id, 'normalize' AS stage,
          |         d0 AS n_docs, t0 AS n_tokens, n_changed AS n_units),
          |  struct(CAST(3 AS BIGINT) AS stage_id, 'lang_id' AS stage,
          |         d1 AS n_docs, t1 AS n_tokens, d0 - d1 AS n_units),
          |  struct(CAST(4 AS BIGINT) AS stage_id, 'quality' AS stage,
          |         d2 AS n_docs, t2 AS n_tokens, d1 - d2 AS n_units),
          |  struct(CAST(5 AS BIGINT) AS stage_id, 'repetition' AS stage,
          |         d3 AS n_docs, t3 AS n_tokens, d2 - d3 AS n_units),
          |  struct(CAST(6 AS BIGINT) AS stage_id, 'dedup_exact' AS stage,
          |         d4 AS n_docs, t4 AS n_tokens, d3 - d4 AS n_units),
          |  struct(CAST(7 AS BIGINT) AS stage_id, 'dedup_near' AS stage,
          |         d5 AS n_docs, t5 AS n_tokens, d4 - d5 AS n_units),
          |  struct(CAST(8 AS BIGINT) AS stage_id, 'pack' AS stage,
          |         d5 AS n_docs, pack_tokens AS n_tokens, n_packs AS n_units),
          |  struct(CAST(9 AS BIGINT) AS stage_id, 'shard' AS stage,
          |         d5 AS n_docs, t5 AS n_tokens, n_shards AS n_units),
          |  struct(CAST(10 AS BIGINT) AS stage_id, 'dataset_card' AS stage,
          |         d5 AS n_docs, t5 AS n_tokens, CAST(n_sources AS BIGINT) AS n_units))""".stripMargin))
        .as("r"))
      .select(col("r.stage_id").as("stage_id"), col("r.stage").as("stage"),
        col("r.n_docs").as("n_docs"), col("r.n_tokens").as("n_tokens"),
        col("r.n_units").as("n_units"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_corpus_build" -> qCorpusBuild _)

  /** Rows-only by design — see the object note. */
  val oracle: Map[String, String] = Map.empty
}
