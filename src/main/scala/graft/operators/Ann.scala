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
  // tables, each with 1-bit multi-probe (query probes its bucket plus
  // each single-bit flip: 9 buckets/table for 8 planes). Multi-table
  // union is the standard recall lever: one 8-bit table recalls ~0.15
  // on unclustered vectors, four tables ~0.5, while candidates stay a
  // small fraction of the corpus (bucketed equi-join, never a scan).
  // ------------------------------------------------------------------
  def qAnnLsh(s: SparkSession, dir: String): DataFrame = {
    val nBits = 8
    val nTables = 4
    val tables = (0 until nTables)
      .map(t => Dedup.hyperplanes(seed = 0x5EEDA117L + t, n = nBits, dim = 64))
    val (corpus, queries) = split(s, dir)

    def tableBuckets(emb: String): org.apache.spark.sql.Column =
      array(tables.map(p => Dedup.lshBucket(emb, p)): _*)

    val bucketed = corpus
      .select(col("vec_id"), col("embedding"), col("nrm"),
        posexplode(tableBuckets("embedding")).as(Seq("tbl", "bucket")))
    val probed = queries
      .select(col("query_id"), col("q_emb"), col("q_nrm"),
        posexplode(tableBuckets("q_emb")).as(Seq("tbl", "q_bucket")))
      .select(col("query_id"), col("q_emb"), col("q_nrm"), col("tbl"),
        explode(expr(
          s"array_union(array(q_bucket), transform(sequence(0, ${nBits - 1}), j -> CAST(q_bucket ^ shiftleft(1, j) AS INT)))"))
          .as("bucket"))
    val scored = bucketed.join(broadcast(probed), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        (Dedup.dotExpr("embedding", "q_emb") / (col("nrm") * col("q_nrm"))).as("cosine"))
      .distinct() // a pair may collide in several tables/probes
    topK(scored)
  }

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
