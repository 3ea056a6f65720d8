package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Ingest

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (SURVEY.md §2 rows 24-25).
  *
  * Scale design: the query set is small relative to the corpus, so
  *   - brute force = broadcast(queries) × corpus — a map-only scan of
  *     the corpus (the shuffle-free baseline, O(N·Q) compute);
  *   - LSH = corpus bucketed by sign-random-projection, queries
  *     multi-probe their bucket's 1-bit neighborhood, candidates come
  *     from an equi-join on bucket id — at 100 TB the corpus scan
  *     drops to the probed buckets only (O(N·Q / 2^bits · probes)).
  * Top-k per query is a window over the query partition (k rows kept
  * per partition; Spark pushes the rank filter into the sort).
  */
object Ann {

  private val K = 5

  /** Query subset: every 50th vector (10 queries at sf0.01). */
  private def split(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val base = Ingest.table(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), Dedup.norm("embedding").as("nrm"))
    val queries = base.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    (base, queries)
  }

  private def topK(scored: DataFrame): DataFrame =
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rnk") <= K)
      .select("query_id", "neighbor_id", "rnk", "cosine")

  // ------------------------------------------------------------------
  // Row 24: brute-force cosine top-k — the exact baseline.
  // ------------------------------------------------------------------
  def qAnnBruteforce(s: SparkSession, dir: String): DataFrame = {
    val (corpus, queries) = split(s, dir)
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        (Dedup.dotExpr("embedding", "q_emb") / (col("nrm") * col("q_nrm"))).as("cosine"))
    topK(scored)
  }

  // ------------------------------------------------------------------
  // Row 25: LSH-bucketed ANN — L independent sign-random-projection
  // tables with multi-probe (the query probes its own bucket plus every
  // bucket within `probeBits` bit flips). Multi-table union + probe
  // depth are the recall levers; the cost lever is candidates/query,
  // which stays a bucketed equi-join, never a scan. All table buckets
  // for a vector come from ONE native codegen pass
  // ([[graft.functions.SignBuckets]]) — the interpreted per-plane
  // lambda dots were the r3 hot-path finding (VERDICT #3).
  // ------------------------------------------------------------------

  private[operators] val LshBits = 8
  private[operators] val LshTables = 4
  private[operators] val LshProbeBits = 1
  private[operators] val LshSeed = 0x5EEDA117L

  /** XOR masks of the probe neighborhood: hamming-ball of radius
    * `probeBits` around the query's own bucket (mask 0).
    */
  private[operators] def probeMasks(nBits: Int, probeBits: Int): Seq[Int] = {
    val single = (0 until nBits).map(1 << _)
    val double = for (i <- 0 until nBits; j <- i + 1 until nBits) yield (1 << i) | (1 << j)
    Seq(0) ++ (if (probeBits >= 1) single else Nil) ++ (if (probeBits >= 2) double else Nil)
  }

  /** Candidate (query, neighbor, cosine) rows for a given LSH config —
    * the tunable core of [[qAnnLsh]], exposed so the spec can measure
    * the recall/candidate-fraction trade explicitly.
    */
  private[operators] def lshScored(
      s: SparkSession, dir: String,
      nTables: Int, nBits: Int, probeBits: Int): DataFrame = {
    val (corpus, queries) = split(s, dir)
    def buckets(emb: String) = graft.functions.VectorFunctions
      .signBuckets(col(emb), LshSeed, nTables, nBits, dim = 64)
    val masks = probeMasks(nBits, probeBits)

    val bucketed = corpus
      .select(col("vec_id"), col("embedding"), col("nrm"),
        posexplode(buckets("embedding")).as(Seq("tbl", "bucket")))
    val probed = queries
      .select(col("query_id"), col("q_emb"), col("q_nrm"),
        posexplode(buckets("q_emb")).as(Seq("tbl", "q_bucket")))
      // XOR against distinct masks is bijective → probe buckets are
      // already distinct, no array_union dedup pass needed.
      .select(col("query_id"), col("q_emb"), col("q_nrm"), col("tbl"),
        explode(expr(
          s"transform(array(${masks.mkString(",")}), m -> CAST(q_bucket ^ m AS INT))"))
          .as("bucket"))
    bucketed.join(broadcast(probed), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        (Dedup.dotExpr("embedding", "q_emb") / (col("nrm") * col("q_nrm"))).as("cosine"))
      .distinct() // a pair may collide in several tables/probes
  }

  def qAnnLsh(s: SparkSession, dir: String): DataFrame =
    topK(lshScored(s, dir, LshTables, LshBits, LshProbeBits))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_bruteforce" -> qAnnBruteforce _,
    "q_ann_lsh"        -> qAnnLsh _
  )

  /** Cosine arithmetic is float-sourced and xxhash-free, but the
    * row_number tie-handling over double cosines is not reproducible
    * bit-for-bit in DuckDB SQL without replicating the exact double
    * accumulation order — rows-only.
    */
  val oracle: Map[String, String] = Map.empty
}
