package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.Materialize._
import graft.sources.Ingest

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (SURVEY.md §2 rows 24-25).
  *
  * Scale design: the query set is small relative to the corpus, so
  *   - brute force = broadcast(queries) × corpus — a map-only scan of
  *     the corpus (the shuffle-free baseline, O(N·Q) compute);
  *   - LSH = corpus bucketed by cross-polytope hashing, queries
  *     multi-probe their nearest polytope vertices, candidates come
  *     from an equi-join on the (table,vertex) key — at 100 TB the
  *     corpus scan drops to the probed buckets only.
  * Top-k per query is a window over the query partition (k rows kept
  * per partition; Spark pushes the rank filter into the sort).
  */
object Ann {

  private val K = 5

  /** Audit query-set size — FIXED, not a corpus fraction (VERDICT r16
    * #1): with Q₀ constant, every exact baseline in the audit family
    * (brute force, quantized, both recall rows, both probe curves) is
    * O(N·Q₀) — linear in the corpus — where the r1-r16 `vec_id % 50`
    * fraction made them O(N²/50), unrunnable at 100×. */
  private[graft] val QueryK = 128

  /** Corpus + query split. Queries are the [[QueryK]] vectors with the
    * smallest `splitmix64(vec_id) >>> 1` — a deterministic fixed-SIZE
    * uniform sample (the `q_weighted_sample`/`q_sample_uniform` rank
    * device): rebuild-stable across runs, partitions and engines
    * (splitmix64 is a 64-bit bijection, so ranks are almost-surely
    * tie-free; vec_id breaks the 2⁻⁶³ >>>1 collision anyway).
    *
    * Shape at scale: map-only hash + TakeOrderedAndProject
    * (per-partition Q₀-heaps, Q₀-row merge) — no global sort, no
    * corpus shuffle; the query side stays broadcast-sized forever.
    */
  private[graft] def split(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.GraftBridge
    val base = Ingest.table(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), Dedup.norm("embedding").as("nrm"))
    val mixed = GraftBridge.column(graft.functions.SplitMix64(
      GraftBridge.expression(col("vec_id"))))
    val queries = base
      .withColumn("u63", shiftrightunsigned(mixed, 1))
      .orderBy(col("u63"), col("vec_id"))
      .limit(QueryK)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    (base, queries)
  }

  /** The query-id set as prefixable DuckDB CTEs (replays [[split]]:
    * [[OracleEmul.mix]] in HUGEINT, `>>> 1` = `// 2` on the unsigned
    * value, rank-limit [[QueryK]]). MATERIALIZED — every oracle
    * references its `q` CTE several times and DuckDB inlines
    * multiply-referenced CTEs (the OracleEmul rule). */
  private def qidsCte(p: String): String =
    s"""${p}qids AS MATERIALIZED (
       |  SELECT vec_id FROM (
       |    SELECT vec_id, ${OracleEmul.mix("vec_id::HUGEINT")} // 2 AS u63
       |    FROM embeddings)
       |  ORDER BY u63, vec_id LIMIT $QueryK)""".stripMargin

  private def topK(scored: DataFrame): DataFrame =
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id")))
        .cast("long"))
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

  /** Oracle for [[qAnnBruteforce]] — fully hash-checked: DuckDB's
    * `list_reduce` fold mirrors [[graft.functions.VectorDot]]'s
    * left-to-right double accumulation bit-for-bit
    * ([[Dedup.sqlDot]]/[[Dedup.sqlNorm]]), so cosines, rank
    * tie-breaks and the top-k cut are identical cross-engine.
    */
  /** The brute-force program as prefixable CTEs, so
    * [[qQuantRecallSql]] can instantiate it beside the quantized
    * program without name collisions.
    */
  private def bruteforceCtes(p: String): String =
    s"""${p}base AS (
       |  SELECT vec_id, embedding, ${Dedup.sqlNorm("embedding")} AS nrm
       |  FROM embeddings),
       |${qidsCte(p)},
       |${p}q AS (
       |  SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
       |  FROM ${p}base WHERE vec_id IN (SELECT vec_id FROM ${p}qids)),
       |${p}scored AS (
       |  SELECT query_id, vec_id AS neighbor_id,
       |    ${Dedup.sqlDot("embedding", "q_emb")} / (nrm * q_nrm) AS cosine
       |  FROM ${p}base CROSS JOIN ${p}q
       |  WHERE vec_id <> query_id),
       |${p}r AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |           ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rnk
       |  FROM ${p}scored)""".stripMargin

  val qAnnBruteforceSql: String =
    s"""WITH ${bruteforceCtes("")}
       |SELECT query_id, neighbor_id, rnk, cosine
       |FROM r WHERE rnk <= $K
       |ORDER BY query_id, rnk""".stripMargin

  // ------------------------------------------------------------------
  // Row 25: LSH-bucketed ANN — L independent CROSS-POLYTOPE tables
  // with query-directed multi-probe (the query probes its `probes`
  // nearest polytope vertices per table; the corpus indexes under its
  // single nearest). Cross-polytope (Andoni et al. 2015) replaced r3's
  // sign-random-projection. Why: (a) asymptotically optimal ρ for
  // angular distance; (b) the query explodes to nTables×probes = 48
  // probe rows instead of sign-LSH's nTables×(1+bits+C(bits,2)) ≈
  // 1264 at equivalent recall — a 26× smaller broadcast; (c)
  // table+vertex encode into a single int so the candidate step is
  // one equi-join on one key — shuffle-partitionable, never a scan.
  // All table keys for a vector come from ONE native codegen pass
  // ([[graft.functions.CrossPolytopeKeys]]).
  //
  // Measured design frontier (10 queries, 500 vectors whose true
  // top-5 sit at cosine 0.27-0.43 — barely 2-3σ above random for
  // dim=64; sd of a random cosine is 1/√64 = 0.125): chosen config
  // 16 tables × 3 probes → recall@5 = 0.82 (sf0.001) / 0.86 (sf0.01)
  // at ~35% of the corpus as candidates. Recall ≥0.7 under 10%
  // candidates is NOT reachable by ANY LSH family on data this
  // unclustered (best measured under 13% candidates: 0.56 sign, 0.52
  // cross-polytope) — at this extreme both families sit on the same
  // frontier, because near-random neighbors erase the ρ advantage.
  // On real embedding corpora, where near neighbors sit at cosine
  // ≥0.8, collision probability is driven by the query-neighbor
  // angle, not corpus size, and the same config's candidate fraction
  // collapses — this is the honest scale path.
  // ------------------------------------------------------------------

  private[graft] val LshTables = 16
  private[graft] val LshProbes = 3
  private[operators] val LshSeed = 0x5EEDA117L
  private[operators] val Dim = 64

  /** Candidate (query, neighbor, cosine) rows for a given config —
    * the tunable core of [[qAnnLsh]], exposed so the spec can measure
    * the recall/candidate-fraction trade explicitly.
    */
  private[graft] def lshScored(
      s: SparkSession, dir: String, nTables: Int, probes: Int): DataFrame = {
    val (corpus, queries) = split(s, dir)
    val bucketed = corpus
      .select(col("vec_id"), col("embedding"), col("nrm"),
        explode(graft.functions.VectorFunctions
          .xpolyKeys(col("embedding"), LshSeed, nTables, Dim, probes = 1)).as("bkey"))
    val probed = queries
      .select(col("query_id"), col("q_emb"), col("q_nrm"),
        explode(graft.functions.VectorFunctions
          .xpolyKeys(col("q_emb"), LshSeed, nTables, Dim, probes)).as("bkey"))
    bucketed.join(broadcast(probed), Seq("bkey"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        (Dedup.dotExpr("embedding", "q_emb") / (col("nrm") * col("q_nrm"))).as("cosine"))
      .distinct() // a pair may collide in several tables/probes
  }

  def qAnnLsh(s: SparkSession, dir: String): DataFrame =
    topK(lshScored(s, dir, LshTables, LshProbes))

  /** Oracle for [[qAnnLsh]] — fully hash-checked (VERDICT r9 #3,
    * promoted from rows-only). The cross-polytope "model state" is 16
    * seeded 64×64 gaussian rotations, but the stream is the SAME
    * `scala.util.Random(seed + t).nextGaussian` fill
    * [[graft.functions.CrossPolytopeKeys]] materializes, and
    * Double.toString round-trips — so the matrices INTERPOLATE as a
    * literal `DOUBLE[][]` VALUES table (the qDedupEmbeddingSql device
    * at 128× the literal count; ~1.3 MB of SQL parses fine). Each
    * rotated coordinate u_j is the sequential [[Dedup.sqlDot]]-style
    * fold (JVM operation order), so u is bit-exact cross-engine, and
    * the kernel's probes-pass argmax-with-exclusion (strict `>`,
    * scan order = lowest j wins ties) is EXACTLY a rank over
    * (|u| DESC, j ASC): pass p selects the not-yet-taken max — rank
    * p+1 in that order. Corpus keys take rank 1 (probes=1), query
    * keys ranks 1..[[LshProbes]]; queries being a corpus subset, both
    * come from ONE rotation CTE. Key encoding, candidate equi-join,
    * DISTINCT pair set, cosine and the (cosine DESC, id) top-k cut
    * then replay the Spark plan exactly.
    */
  /** The full LSH CTE chain through the ranked candidate scores `r`
    * (shares `base`/`q` names with [[bruteforceCtes]]' unprefixed
    * form, so recall-style compositions can hang both off one split).
    * [[qAnnLshSql]] and [[qAnnRecallSql]] both build on this. */
  private def lshCtes: String = {
    // the identical gaussian stream as CrossPolytopeKeys.planesFlat:
    // table t seeded LshSeed + t, row-major fill, row j = slice j
    val rotValues = (0 until LshTables).map { t =>
      val r = new scala.util.Random(LshSeed + t)
      val flat = Array.fill(Dim * Dim)(r.nextGaussian())
      val rows = (0 until Dim)
        .map(j => flat.slice(j * Dim, (j + 1) * Dim).mkString("[", ", ", "]::DOUBLE[]"))
        .mkString("[", ",\n    ", "]")
      s"($t, $rows)"
    }.mkString(",\n  ")
    val rowDot = "list_reduce(list_transform(list_zip(rr, b.embedding), " +
      "z -> z[1] * CAST(z[2] AS DOUBLE)), (acc, v) -> acc + v)"
    s"""rot AS (
       |  SELECT * FROM (VALUES
       |  $rotValues) AS rm(t, m)),
       |base AS (
       |  SELECT vec_id, embedding, ${Dedup.sqlNorm("embedding")} AS nrm
       |  FROM embeddings),
       |${qidsCte("")},
       |q AS (
       |  SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
       |  FROM base WHERE vec_id IN (SELECT vec_id FROM qids)),
       |cu AS (
       |  SELECT b.vec_id, rm.t,
       |    unnest(range(0, $Dim)) AS j,
       |    unnest(list_transform(rm.m, rr -> $rowDot)) AS u
       |  FROM base b CROSS JOIN rot rm),
       |ranked AS (
       |  SELECT vec_id, t, j, u,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id, t
       |      ORDER BY abs(u) DESC, j) AS pr
       |  FROM cu),
       |ck AS (
       |  SELECT vec_id,
       |    CAST(t * ${2 * Dim} + 2 * j + CASE WHEN u > 0 THEN 1 ELSE 0 END
       |      AS INTEGER) AS bkey
       |  FROM ranked WHERE pr = 1),
       |${lshServeCtes("", LshProbes)}""".stripMargin
  }

  /** One LSH serve at `probes` probed vertices per table: query keys,
    * candidate equi-join, exact rerank — CTEs `qk/cand/scored/r` with
    * a `tag` suffix (empty tag = the deployed [[qAnnLshSql]] chain).
    */
  private def lshServeCtes(tag: String, probes: Int): String =
    s"""qk$tag AS (
       |  SELECT vec_id AS query_id,
       |    CAST(t * ${2 * Dim} + 2 * j + CASE WHEN u > 0 THEN 1 ELSE 0 END
       |      AS INTEGER) AS bkey
       |  FROM ranked WHERE pr <= $probes
       |    AND vec_id IN (SELECT vec_id FROM qids)),
       |cand$tag AS (
       |  SELECT DISTINCT k.query_id, c.vec_id AS neighbor_id
       |  FROM ck c JOIN qk$tag k ON c.bkey = k.bkey
       |  WHERE c.vec_id <> k.query_id),
       |scored$tag AS (
       |  SELECT cd.query_id, cd.neighbor_id,
       |    ${Dedup.sqlDot("n.embedding", "qq.q_emb")} / (n.nrm * qq.q_nrm) AS cosine
       |  FROM cand$tag cd
       |  JOIN base n ON n.vec_id = cd.neighbor_id
       |  JOIN q qq ON qq.query_id = cd.query_id),
       |r$tag AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |           ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rnk
       |  FROM scored$tag)""".stripMargin

  val qAnnLshSql: String =
    s"""WITH $lshCtes
       |SELECT query_id, neighbor_id, rnk, cosine
       |FROM r WHERE rnk <= $K
       |ORDER BY query_id, rnk""".stripMargin

  /** Oracle for [[qAnnRecall]] — promoted from rows-only (r14; the
    * r13 watch item): the [[lshCtes]] chain and a brute-force rank off
    * the SAME `base`/`q` split, per-query hit counting — the proof
    * that recall-style compositions of oracle-expressible programs are
    * themselves oracle-expressible.
    */
  val qAnnRecallSql: String =
    s"""WITH $lshCtes,
       |bfscored AS (
       |  SELECT query_id, vec_id AS neighbor_id,
       |    ${Dedup.sqlDot("embedding", "q_emb")} / (nrm * q_nrm) AS cosine
       |  FROM base CROSS JOIN q
       |  WHERE vec_id <> query_id),
       |bfr AS (
       |  SELECT query_id, neighbor_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |           ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rnk
       |  FROM bfscored),
       |bfk AS (SELECT query_id, neighbor_id FROM bfr WHERE rnk <= $K),
       |lk AS (SELECT query_id, neighbor_id FROM r WHERE rnk <= $K)
       |SELECT b.query_id,
       |  COUNT(*) AS k,
       |  CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_overlap,
       |  (CAST(COUNT(l.neighbor_id) AS BIGINT) * 10000) // COUNT(*) AS recall_bp
       |FROM bfk b
       |LEFT JOIN lk l ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
       |GROUP BY b.query_id
       |ORDER BY b.query_id""".stripMargin

  // ------------------------------------------------------------------
  // Row 46: IVF — inverted-file ANN, the OTHER standard scale path
  // (FAISS/ScaNN lineage; Jégou et al. 2011's coarse quantizer without
  // the PQ residual codes). A small k-means codebook partitions the
  // corpus into cells; a query probes only its nProbe nearest cells.
  // Complements LSH: data-DEPENDENT cells adapt to clustered corpora
  // (where real embeddings live), vs LSH's data-oblivious hashes.
  //
  // Scale shape: the codebook is a k·dim model parameter carried
  // inside a native [[graft.functions.NearestCell]] expression, so
  // cell assignment is a pure MAP — no join, no shuffle, ever. Each
  // Lloyd training round is one such map pass plus one aggregate
  // whose shuffle carries k·dim partial means per map partition;
  // nothing ever pairs corpus rows with each other. Serving is an
  // equi-join on cell id against the broadcast probe list: the
  // corpus scan drops to nProbe/k of the index, the IVF promise.
  // ------------------------------------------------------------------

  private[graft] val IvfCells = 16
  private[graft] val IvfProbes = 6
  private[graft] val IvfIters = 2
  // fixed-point scale for deterministic centroid sums (2^20)
  private val FpScale = 1048576L

  /** Train the codebook: `IvfCells` centroids (flattened row-major
    * k×dim doubles), hash-spread deterministic seed vectors refined by
    * `iters` Lloyd rounds under cosine — the search metric — so cells
    * match query-time geometry.
    *
    * The codebook is a MODEL PARAMETER: k·dim doubles, bounded by
    * config, never by data size. It lives on the driver between
    * rounds (the collect here is k rows / k·dim partial means — the
    * corpus itself never leaves the cluster) and ships to executors
    * inside the [[graft.functions.NearestCell]] expression, exactly
    * like the seeded LSH plane matrices. Each Lloyd round is
    * therefore ONE map-only assignment pass plus ONE aggregate whose
    * shuffle carries k·dim partial sums per map partition — no
    * corpus-wide re-shuffle anywhere in the build (the obvious
    * broadcast-crossjoin + per-vector argmax-aggregate formulation
    * re-shuffles every embedding once per round).
    */
  private[graft] def trainCodebook(corpus: DataFrame, iters: Int): Array[Double] = {
    // hash-spread seed pick. md5 (not xxhash64): same spread quality,
    // but a STANDARD hash both engines implement identically, so the
    // whole training loop is SQL-emulable (see qAnnIvfSql's oracle —
    // VERDICT r9 #4 promoted q_ann_ivf from rows-only to hash-checked)
    val seeds = corpus
      .withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy(col("h"), col("vec_id")).limit(IvfCells) // TakeOrdered over k tiny rows
      .select(col("embedding").cast("array<double>").as("e"))
      .collect()
    require(seeds.length == IvfCells,
      s"corpus has fewer than $IvfCells vectors — IVF needs at least one per cell")
    var cent: Array[Double] = seeds.flatMap(_.getSeq[Double](0)).toArray
    for (_ <- 1 to iters) {
      // Exact FIXED-POINT sums, not avg(double): each component is
      // quantized to round(v·2^20) and summed as LONG — integer
      // addition is associative+commutative, so the refined centroids
      // are bit-identical regardless of partition count or partial-agg
      // merge order — boundary vectors can't drift cells between runs
      // (ADVICE r6). The 2^-21 quantization error is noise against the
      // float32 inputs; unlike a decimal(38,20) sum this stays inside
      // whole-stage codegen (the decimal path measured ~5× slower at
      // sf0.1). Headroom: |v| < 2^7 ⇒ |q| < 2^27, safe to ~2^35 rows
      // per (cell, dim) — audit before raising FpScale.
      // cell assignment projected BELOW the explode (the trainPqCodebooks
      // ExtractGenerator lesson: a generator's sibling expressions land
      // ABOVE the Generate and re-evaluate per exploded row — a Dim×
      // amplification of the k·Dim assignment kernel)
      val means = corpus
        .select(
          graft.functions.VectorFunctions
            .nearestCell(col("embedding"), cent.toSeq, Dim).as("cell"),
          col("embedding"))
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(expr(s"CAST(round(v * $FpScale) AS BIGINT)")).as("s"),
          count(lit(1)).as("c"))
        .collect()
      // empty cells keep their previous centroid (standard Lloyd handling)
      val next = cent.clone()
      means.foreach { r =>
        next(r.getInt(0) * Dim + r.getInt(1)) =
          r.getLong(2).toDouble / FpScale / r.getLong(3)
      }
      cent = next
    }
    cent
  }

  /** Session-scoped trained-codebook cache (VERDICT r12 #1): the
    * `q_ann_ivf` query row used to re-run the Lloyd loop on every
    * invocation — ~2.9 s of the ~4 s bench entry was model-build tax
    * that a deployment amortizes via [[buildIvfIndex]]. Same device as
    * `Analytics.copurchaseGraph`'s graph cache: train once per
    * (session, dir), serve every subsequent invocation from the frozen
    * k·dim array. The cached value is a MODEL PARAMETER (IvfCells×Dim
    * doubles — bytes, not a corpus-sized dataset), so holding it for
    * the session lifetime is free.
    *
    * STALENESS CONTRACT (shared with `Analytics.copurchaseGraph`): an
    * entry reflects the corpus AS OF the first IVF call of the session
    * against that dir. Data dirs are immutable snapshots, so entries
    * are never invalidated by data changes; a caller that rewrites a
    * dir in place mid-session must call [[clearModelCache]] first.
    * Correctness is unaffected either way at fixed data:
    * [[trainCodebook]] is bit-deterministic (fixed-point Lloyd sums),
    * so the cached array equals what a fresh train would produce —
    * AnnSpec pins cached === freshly-trained.
    */
  private val codebookCache = new graft.plans.SessionCache[Array[Double]]

  private[graft] def sessionCodebook(s: SparkSession, dir: String,
      corpus: DataFrame): Array[Double] =
    codebookCache.getOrElseUpdate(s, dir)(trainCodebook(corpus, IvfIters))

  /** Drop every session-scoped frozen-model cache (see the staleness
    * contract on [[sessionCodebook]]): the cell codebook, the PQ
    * sub-codebooks and the session-built IVF-PQ index dir (all three
    * are deterministic functions of the data dir, so they age
    * together). */
  def clearModelCache(): Unit = {
    codebookCache.clear()
    pqCodebookCache.clear()
    pqIndexCache.clear()
  }

  private[graft] def ivfScored(s: SparkSession, dir: String, probes: Int): DataFrame = {
    import s.implicits._
    val (corpus, queries) = split(s, dir)
    val cent = sessionCodebook(s, dir, corpus)
    // serving index: ONE map-only pass, no join, no shuffle
    val index = corpus.withColumn("cell",
      graft.functions.VectorFunctions.nearestCell(col("embedding"), cent.toSeq, Dim))
    // probe list: rank the k cells per query (queries are the small
    // side; float centroid copies only affect probe ORDER, assignment
    // above stays double)
    val centDf = (0 until IvfCells)
      .map(t => (t, cent.slice(t * Dim, (t + 1) * Dim).map(_.toFloat)))
      .toDF("cell", "centroid")
    val probed = queries
      .crossJoin(broadcast(centDf.withColumn("cnrm", Dedup.norm("centroid"))))
      .withColumn("cos",
        Dedup.dotExpr("q_emb", "centroid") / (col("q_nrm") * col("cnrm")))
      .withColumn("prk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("cell"))))
      .filter(col("prk") <= probes)
      .select(col("query_id"), col("q_emb"), col("q_nrm"), col("cell"), col("prk"))
    index.join(broadcast(probed), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        (Dedup.dotExpr("embedding", "q_emb") / (col("nrm") * col("q_nrm"))).as("cosine"),
        col("prk"))
  }

  def qAnnIvf(s: SparkSession, dir: String): DataFrame =
    topK(ivfScored(s, dir, IvfProbes))

  /** Oracle for [[qAnnIvf]] — fully hash-checked (VERDICT r9 #4,
    * promoted from rows-only). Unlike the LSH rotations (code
    * constants → literal interpolation), the codebook is DATA-derived,
    * so a literal-codebook SQL would pin one scale factor; instead the
    * oracle RE-TRAINS inside DuckDB, which works because every
    * training step was already built deterministic:
    *   - seed pick = TakeOrdered on (md5(vec_id), vec_id) — a standard
    *     hash both engines compute identically;
    *   - cell assignment = argmax of (sequential-fold dot) × invNorm,
    *     strict `>` keeping the lowest cell — a rank over
    *     (score DESC, cell ASC), the [[qAnnLshSql]] argmax device;
    *   - Lloyd means = exact BIGINT fixed-point sums (order-free) with
    *     the JVM's two-division rescale replayed literally, empty
    *     cells COALESCEd to the previous round's centroid;
    * then the serve path (float-cast probe ranking, nProbe cut, exact
    * rerank, top-k) replays [[ivfScored]]'s plan. The float32 probe
    * copies round-trip through `CAST(x AS FLOAT)` — the same IEEE
    * double→float rounding as `Double.toFloat`.
    */
  // fold devices shared by the IVF oracles (Dedup.sqlDot shape, but
  // the centroid side is already DOUBLE[] — only the embedding side
  // needs widening)
  private def ivfDDot(cv: String, emb: String): String =
    s"list_reduce(list_transform(list_zip($cv, $emb), " +
      "z -> z[1] * CAST(z[2] AS DOUBLE)), (acc, v) -> acc + v)"
  private def ivfDNorm2(cv: String): String =
    s"list_reduce(list_transform($cv, x -> x * x), (acc, v) -> acc + v)"
  // one Lloyd round: assign corpus to `cin`, roll exact fixed-point
  // means, emit `cout` (empty cells keep cin's centroid)
  private def ivfLloydRound(cin: String, cout: String, n: Int): String =
    s"""asg$n AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT b.vec_id, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
       |        ${ivfDDot("c.cvec", "b.embedding")}
       |          * (CASE WHEN ${ivfDNorm2("c.cvec")} > 0
       |             THEN 1.0 / sqrt(${ivfDNorm2("c.cvec")}) ELSE 0.0 END) DESC,
       |        c.cell) AS rk
       |    FROM base b CROSS JOIN $cin c) z
       |  WHERE rk = 1),
       |m$n AS (
       |  SELECT a.cell, fp.pos, SUM(fp.f) AS s, COUNT(*) AS c
       |  FROM asg$n a JOIN fpos fp USING (vec_id)
       |  GROUP BY a.cell, fp.pos),
       |$cout AS (
       |  SELECT ce.cell,
       |    list(COALESCE((CAST(m$n.s AS DOUBLE) / $FpScale.0)
       |                    / CAST(m$n.c AS DOUBLE), ce.cv)
       |         ORDER BY ce.pos) AS cvec
       |  FROM (SELECT cell, unnest(range(0, $Dim)) AS pos, unnest(cvec) AS cv
       |        FROM $cin) ce
       |  LEFT JOIN m$n ON ce.cell = m$n.cell AND ce.pos = m$n.pos
       |  GROUP BY ce.cell)""".stripMargin

  /** Shared oracle CTE chain: corpus/query split, fixed-point
    * components, deterministic seed pick, the Lloyd rounds, the final
    * cell index and float-cast centroid table — everything through
    * `centf`. [[qAnnIvfSql]] and [[qAnnProbeCurveSql]] both append
    * their serve tails to this, so the retrained codebook cannot
    * drift between the two oracles.
    */
  private def ivfTrainCtes: String =
    s"""base AS (
       |  SELECT vec_id, embedding, ${Dedup.sqlNorm("embedding")} AS nrm
       |  FROM embeddings),
       |${qidsCte("")},
       |q AS (
       |  SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
       |  FROM base WHERE vec_id IN (SELECT vec_id FROM qids)),
       |fpos AS (
       |  SELECT vec_id, unnest(range(0, $Dim)) AS pos,
       |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * $FpScale) AS BIGINT) AS f
       |  FROM embeddings),
       |cent0 AS (
       |  SELECT cell, cvec FROM (
       |    SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec,
       |      ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
       |        AS cell
       |    FROM embeddings) z
       |  WHERE cell < $IvfCells),
       |${ivfLloydRound("cent0", "cent1", 1)},
       |${ivfLloydRound("cent1", "cent2", 2)},
       |idx AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT b.vec_id, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
       |        ${ivfDDot("c.cvec", "b.embedding")}
       |          * (CASE WHEN ${ivfDNorm2("c.cvec")} > 0
       |             THEN 1.0 / sqrt(${ivfDNorm2("c.cvec")}) ELSE 0.0 END) DESC,
       |        c.cell) AS rk
       |    FROM base b CROSS JOIN cent2 c) z
       |  WHERE rk = 1),
       |centf AS (
       |  SELECT cell, list_transform(cvec, x -> CAST(x AS FLOAT)) AS centroid
       |  FROM cent2),
       |pr AS (
       |  SELECT query_id, cell, prk FROM (
       |    SELECT qq.query_id, cf.cell,
       |      ROW_NUMBER() OVER (PARTITION BY qq.query_id ORDER BY
       |        ${Dedup.sqlDot("qq.q_emb", "cf.centroid")}
       |          / (qq.q_nrm * ${Dedup.sqlNorm("cf.centroid")}) DESC,
       |        cf.cell) AS prk
       |    FROM q qq CROSS JOIN centf cf) z)""".stripMargin

  /** One IVF serve at `probes` probed cells: candidate join + exact
    * rerank + top-[[K]] cut, as CTEs `s\$tag`/`k\$tag`. */
  private def ivfServeCtes(tag: String, probes: Int): String =
    s"""s$tag AS (
       |  SELECT p.query_id, b.vec_id AS neighbor_id,
       |    ${Dedup.sqlDot("b.embedding", "qq.q_emb")} / (b.nrm * qq.q_nrm) AS cosine
       |  FROM idx i
       |  JOIN (SELECT query_id, cell FROM pr WHERE prk <= $probes) p ON i.cell = p.cell
       |  JOIN base b ON b.vec_id = i.vec_id
       |  JOIN q qq ON qq.query_id = p.query_id
       |  WHERE i.vec_id <> p.query_id),
       |k$tag AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |           ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rnk
       |  FROM s$tag)""".stripMargin

  val qAnnIvfSql: String =
    s"""WITH $ivfTrainCtes,
       |${ivfServeCtes("v", IvfProbes)}
       |SELECT query_id, neighbor_id, rnk, cosine
       |FROM kv WHERE rnk <= $K
       |ORDER BY query_id, rnk""".stripMargin

  // Probe counts for the recall curve: 1 (cheapest), doublings, and
  // the deployed IvfProbes setting — the knee of the curve is the
  // tuning answer.
  private val ProbeCurve = Seq(1, 2, 4, IvfProbes)

  /** IVF probe-count recall curve — the tuning table an ANN deployment
    * reads before picking nProbe: for each probe count, the fraction
    * of the exact brute-force top-[[K]] the IVF serve recovers
    * (recall@K, ppm, aggregated over all queries). The scan cost of a
    * probe setting is nProbe/k of the index by construction, so this
    * row IS the cost/recall frontier; `q_ann_ivf` runs at the deployed
    * [[IvfProbes]] point. Fully hash-checked — the oracle re-trains
    * the codebook in DuckDB (the [[qAnnIvfSql]] device) and replays
    * each probe cut from the SAME shared CTE chain, answering the
    * standing rows-only concern for recall-style compositions: where
    * the constituents are oracle-expressible, so is the recall rollup.
    *
    * Shape at scale: the baseline is the brute-force row (its own
    * documented O(Q·N) oracle status); each curve point is one
    * cell-equi-join serve against the same session codebook + a
    * K-bounded hit join — the curve costs |probe points| serves, which
    * a tuning run pays once, not per query.
    */
  def qAnnProbeCurve(s: SparkSession, dir: String): DataFrame = {
    import graft.plans.Materialize.MaterializeOps
    val bfk = qAnnBruteforce(s, dir)
      .select(col("query_id"), col("neighbor_id")).materialized
    val nb = bfk.agg(count(lit(1)).as("n_base"))
    // r21 OPTIMIZATION (guide §2.4 — same outputs, one serve pass
    // instead of four): probe lists NEST (the top-p cells are a prefix
    // of the top-maxP ranking) and every vector lives in exactly ONE
    // cell, so the probes=p candidate set is the max-probe pair set
    // restricted to recruiting-cell rank ≤ p. One cell-equi serve at
    // the curve's max tags each pair with that rank ([[ivfScored]]'s
    // `prk`); each curve point is a filter + top-K window over the
    // checkpointed pair table instead of its own serve join.
    val pairs = ivfScored(s, dir, ProbeCurve.max).materialized
    ProbeCurve.map { p =>
      topK(pairs.filter(col("prk") <= p))
        .select(col("query_id"), col("neighbor_id"))
        .join(bfk, Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(p.toLong).as("n_probes"), col("n_hits"))
    }.reduce(_ unionByName _)
      .crossJoin(broadcast(nb))
      .select(col("n_probes"), col("n_base").as("n_baseline"), col("n_hits"),
        expr("(n_hits * 1000000) DIV n_base").as("recall_ppm"))
  }

  /** Oracle for [[qAnnProbeCurve]]: the shared [[ivfTrainCtes]] chain,
    * one [[ivfServeCtes]] tail per probe point, the
    * [[bruteforceCtes]] baseline under a `bf` prefix, exact hit joins.
    */
  val qAnnProbeCurveSql: String = {
    val serves = ProbeCurve.map(p => ivfServeCtes(s"p$p", p)).mkString(",\n")
    val hits = ProbeCurve.map { p =>
      s"""h$p AS (
         |  SELECT CAST($p AS BIGINT) AS n_probes, CAST(COUNT(*) AS BIGINT) AS n_hits
         |  FROM (SELECT query_id, neighbor_id FROM kp$p WHERE rnk <= $K) iv
         |  JOIN bfk USING (query_id, neighbor_id))""".stripMargin
    }.mkString(",\n")
    val union = ProbeCurve.map(p => s"SELECT * FROM h$p").mkString("\n    UNION ALL ")
    s"""WITH $ivfTrainCtes,
       |$serves,
       |${bruteforceCtes("bf")},
       |bfk AS (SELECT query_id, neighbor_id FROM bfr WHERE rnk <= $K),
       |nq AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_base FROM bfk),
       |$hits
       |SELECT n_probes, nq.n_base AS n_baseline, n_hits,
       |  (n_hits * 1000000) // nq.n_base AS recall_ppm
       |FROM ($union) CROSS JOIN nq
       |ORDER BY n_probes""".stripMargin
  }

  /** Build the IVF index ONCE — the production shape (the `q_ann_ivf`
    * bench row trains once per session via [[sessionCodebook]]; a
    * deployment amortizes further: build offline, serve many). The
    * index is PARTITIONED BY CELL, so
    * serving gets its nProbe/k scan discount from the STORAGE layout:
    * probing 6 of 16 cells reads 6 directories, enforced by partition
    * pruning in the scan, not by a runtime filter over everything
    * (AnnSpec asserts the PartitionFilters). Layout:
    * `<path>/codebook.parquet` (cell, centroid) and
    * `<path>/index.parquet/cell=N/` (vec_id, embedding, nrm).
    */
  /** Map-only cell assignment against a frozen codebook — the pass
    * [[buildIvfIndex]] and [[ivfUpsert]] share. No join, no shuffle:
    * the codebook ships inside the expression.
    */
  private[graft] def ivfAssign(df: DataFrame, cent: Array[Double]): DataFrame =
    df.withColumn("cell",
      graft.functions.VectorFunctions.nearestCell(col("embedding"), cent.toSeq, Dim))

  /** @param indexFilter bounds the initially-indexed subset (the
    *   codebook still trains on the FULL corpus — AnnSpec builds a
    *   partial index and [[ivfUpsert]]s the remainder to prove
    *   serve-equivalence with a one-shot build).
    */
  private[graft] def buildIvfIndex(s: SparkSession, dir: String, path: String,
      indexFilter: Column = lit(true)): Unit = {
    import s.implicits._
    val (corpus, _) = split(s, dir)
    val cent = sessionCodebook(s, dir, corpus)
    (0 until IvfCells).map(t => (t, cent.slice(t * Dim, (t + 1) * Dim)))
      .toDF("cell", "centroid")
      .write.mode("overwrite").parquet(s"$path/codebook.parquet")
    ivfAssign(corpus.filter(indexFilter), cent)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/index.parquet")
    // a full rebuild supersedes every streamed increment — clear the
    // [[ivfUpsertBatch]] directories so serve doesn't double-count
    val streamRoot = new org.apache.hadoop.fs.Path(s"$path/index-stream")
    val fs = streamRoot.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(streamRoot)) fs.delete(streamRoot, true)
  }

  /** Incremental IVF index maintenance (VERDICT r10 #5): append
    * arrivals to their nearest existing cells WITHOUT retraining the
    * codebook or touching the resident corpus. The codebook is a
    * driver-sized frozen model (cells × dim doubles) read once; the
    * arrival batch is assigned map-only ([[ivfAssign]] — AnnSpec pins
    * the no-Exchange plan) and appended under the matching `cell=N`
    * partition directories, so serving keeps its partition-pruning
    * discount over the UNION of resident and upserted vectors.
    *
    * The standard IVF maintenance trade: assignments stay exact
    * w.r.t. the frozen centroids, but as the arrival distribution
    * drifts from the training distribution, cells imbalance and
    * recall decays — [[qAnnRecall]] is the monitor, retraining
    * ([[buildIvfIndex]]) the repair. Arrivals must carry the index
    * row shape: (vec_id, embedding, nrm).
    *
    * CONTRACT (ADVICE r12): despite the conventional "upsert" name
    * this is APPEND-ONLY — an arrival whose vec_id already exists in
    * the index produces a second row for it, and duplicates can occupy
    * multiple top-k slots in [[ivfServe]]. The caller owns vec_id
    * uniqueness across the resident index and all batches (re-delivery
    * and in-place embedding updates need a rebuild or a delete-aware
    * layout, which this engine does not provide). The streaming path
    * gets replay-safety without that burden via [[ivfUpsertBatch]].
    */
  private[graft] def ivfUpsert(s: SparkSession, path: String, arrivals: DataFrame): Unit = {
    val cent = readCodebook(s, path)
    ivfAssign(arrivals, cent)
      .write.mode("append").partitionBy("cell").parquet(s"$path/index.parquet")
  }

  /** Idempotent per-micro-batch upsert — the streaming-sink variant of
    * [[ivfUpsert]] (ADVICE r12): the batch is cell-assigned map-only
    * exactly like the batch path, but lands under a DETERMINISTIC
    * batchId-derived directory with OVERWRITE semantics instead of a
    * blind append into the resident index. A micro-batch replay after
    * a crash (foreachBatch bypasses the file sink's commit log, so
    * replays are the norm, not the exception) rewrites the same
    * directory and the index converges to exactly-once contents —
    * no marker files, no commit log of our own. [[ivfServe]] unions
    * these batch directories with the resident index; a codebook
    * retrain ([[buildIvfIndex]]) clears them, since a fresh full build
    * supersedes every streamed increment.
    */
  private[graft] def ivfUpsertBatch(s: SparkSession, path: String,
      arrivals: DataFrame, batchId: Long): Unit = {
    // an empty micro-batch writes no partition dirs and would leave an
    // unreadable (schema-less) root behind — skip it; replaying an
    // empty batch is a no-op either way
    if (!arrivals.isEmpty) {
      val cent = readCodebook(s, path)
      ivfAssign(arrivals, cent)
        .write.mode("overwrite").partitionBy("cell")
        .parquet(f"$path/index-stream/batch-$batchId%09d")
    }
  }

  /** Streamed-batch directories under `<path>/index-stream`, oldest
    * first (empty when the index has only the resident build). */
  private def streamBatchRoots(s: SparkSession, path: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(s"$path/index-stream")
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(root))
      fs.listStatus(root).filter(_.isDirectory).map(_.getPath.toString).sorted.toSeq
    else Seq.empty
  }

  /** The frozen codebook as the flat cell-major array
    * [[trainCodebook]] produces. */
  private[graft] def readCodebook(s: SparkSession, path: String): Array[Double] = {
    val cent = new Array[Double](IvfCells * Dim)
    s.read.parquet(s"$path/codebook.parquet").collect().foreach { r =>
      // by-name reads (the lshMetaOk rule): never couple a persisted
      // model's decode to its writer's column order
      val (cell, v) = (r.getAs[Int]("cell"), r.getSeq[Double](r.fieldIndex("centroid")))
      var i = 0
      while (i < Dim) { cent(cell * Dim + i) = v(i); i += 1 }
    }
    cent
  }

  /** Serve top-k from a prebuilt [[buildIvfIndex]] index. The probed
    * cell set is computed from the (tiny) query side and pushed as a
    * STATIC `isin` on the partition column — the scan never opens an
    * unprobed cell directory.
    */
  private[graft] def ivfServe(s: SparkSession, dir: String, path: String,
      probes: Int = IvfProbes): DataFrame = {
    import s.implicits._
    val (_, queries) = split(s, dir)
    val cbRows = s.read.parquet(s"$path/codebook.parquet")
      .collect().map(r => (r.getAs[Int]("cell"), r.getSeq[Double](r.fieldIndex("centroid"))))
    val centDf = cbRows
      .map { case (c, v) => (c, v.map(_.toFloat).toArray) }.toSeq
      .toDF("cell", "centroid")
    val probed = queries
      .crossJoin(broadcast(centDf.withColumn("cnrm", Dedup.norm("centroid"))))
      .withColumn("cos",
        Dedup.dotExpr("q_emb", "centroid") / (col("q_nrm") * col("cnrm")))
      .withColumn("prk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("cell"))))
      .filter(col("prk") <= probes)
      .select(col("query_id"), col("q_emb"), col("q_nrm"), col("cell"))
    // the probe-list is Q×probes rows — driver-safe by construction
    val probedCells = probed.select("cell").distinct().collect().map(_.getInt(0))
    val cellFilter = col("cell").isin(probedCells.map(Integer.valueOf): _*)
    // resident build + streamed batch dirs ([[ivfUpsertBatch]]), each
    // scanned with the same probed-cell partition pruning. The batch
    // roots are one directory per micro-batch since the last rebuild —
    // bounded by retrain cadence, and a rebuild folds them away; at
    // serve volume this is a planner-side listing, not a data cost.
    val index = (s"$path/index.parquet" +: streamBatchRoots(s, path))
      .map(r => s.read.parquet(r).filter(cellFilter))
      .reduce(_ unionByName _)
    val scored = index.join(broadcast(probed), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        (Dedup.dotExpr("embedding", "q_emb") / (col("nrm") * col("q_nrm"))).as("cosine"))
    topK(scored)
  }

  // ------------------------------------------------------------------
  // Row 49: int8-quantized brute force — the memory/bandwidth scale
  // path. Per-vector symmetric quantization (scale = max|x|/127)
  // compresses float32 embeddings 4×: 4× more corpus per executor-GB,
  // and the scoring loop is an integer MAC over byte arrays
  // ([[graft.functions.Dot8]]). Cosine in quantized space needs no
  // dequantization — the scales cancel:
  //   cos8 = dot8(a,b) / sqrt(dot8(a,a)·dot8(b,b)).
  // The ONLY approximation is the rounding in the codes; AnnSpec pins
  // the recall cost vs the exact float path. Composes with IVF/LSH
  // (quantize the bucketed candidates) — kept standalone here so the
  // quantization error is measured in isolation.
  // ------------------------------------------------------------------
  // Persisted LSH index (VERDICT r14 #4) — the [[buildIvfIndex]] triad
  // for the data-OBLIVIOUS family. Layout:
  //   <path>/meta.parquet                 (lsh_seed, n_tables, dim)
  //   <path>/index.parquet/bkey=N/        (vec_id, embedding, nrm)
  //   <path>/index-stream/batch-…/bkey=N/ (streamed increments)
  // The "model" is the seed: the 16 cross-polytope rotations derive
  // deterministically from it inside [[graft.functions.CrossPolytopeKeys]],
  // so persisting (seed, tables, dim) persists the rotation tables —
  // serve VALIDATES the meta against the session constants instead of
  // silently probing a differently-seeded index. Unlike IVF (one cell
  // per vector), multi-table LSH stores each vector once PER TABLE —
  // a deliberate 16× storage-for-recall trade (the standard LSH
  // memory bill; a postings-only layout with a vec_id join back would
  // store once but pay a corpus shuffle per serve, the wrong side of
  // the trade for a read-mostly index). Bucket directories are bounded
  // by construction: ≤ tables × 2·dim = 2048 partition values at ANY
  // corpus size, so the layout scales by bucket CONTENT, not count.
  // ------------------------------------------------------------------

  private def lshMetaOk(s: SparkSession, path: String): Unit = {
    // fields read BY NAME (ADVICE r15): validation must not depend on
    // the writer's column order — an ordinal read of a reordered meta
    // file would misattribute seed/tables/dim and either spuriously
    // reject a good index or accept a mismatched one.
    val m = s.read.parquet(s"$path/meta.parquet").collect().head
    val (seed, tables, dim) =
      (m.getAs[Long]("lsh_seed"), m.getAs[Int]("n_tables"), m.getAs[Int]("dim"))
    require(seed == LshSeed && tables == LshTables && dim == Dim,
      s"LSH index at $path was built with (seed=$seed, tables=$tables, " +
        s"dim=$dim) — session expects ($LshSeed, $LshTables, $Dim); rebuild the index")
  }

  /** Map-only bucket assignment — the pass [[buildLshIndex]] and
    * [[lshUpsertBatch]] share. No join, no shuffle: the rotations
    * derive from the seed inside the expression.
    */
  private[graft] def lshAssign(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding"), col("nrm"),
      explode(graft.functions.VectorFunctions
        .xpolyKeys(col("embedding"), LshSeed, LshTables, Dim, probes = 1)).as("bkey"))

  /** @param indexFilter bounds the initially-indexed subset (AnnSpec
    *   builds a partial index and upserts the remainder to prove
    *   serve-equivalence with a one-shot build).
    */
  private[graft] def buildLshIndex(s: SparkSession, dir: String, path: String,
      indexFilter: Column = lit(true)): Unit = {
    import s.implicits._
    val (corpus, _) = split(s, dir)
    Seq((LshSeed, LshTables, Dim)).toDF("lsh_seed", "n_tables", "dim")
      .write.mode("overwrite").parquet(s"$path/meta.parquet")
    lshAssign(corpus.filter(indexFilter))
      .write.mode("overwrite").partitionBy("bkey").parquet(s"$path/index.parquet")
    // a full rebuild supersedes every streamed increment (same
    // contract as [[buildIvfIndex]])
    val streamRoot = new org.apache.hadoop.fs.Path(s"$path/index-stream")
    val fs = streamRoot.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(streamRoot)) fs.delete(streamRoot, true)
  }

  /** Append-only incremental maintenance — same contract (and caller-
    * owned vec_id uniqueness) as [[ivfUpsert]]; assignments are exact
    * forever because the rotations never retrain (LSH's maintenance
    * advantage over IVF: no codebook drift, no recall decay from a
    * frozen model — the bucket function IS the model).
    */
  private[graft] def lshUpsert(s: SparkSession, path: String, arrivals: DataFrame): Unit = {
    lshMetaOk(s, path)
    lshAssign(arrivals)
      .write.mode("append").partitionBy("bkey").parquet(s"$path/index.parquet")
  }

  /** Idempotent per-micro-batch upsert — the streaming-sink variant
    * ([[ivfUpsertBatch]]'s contract: deterministic batch directory,
    * overwrite semantics, replay-safe; empty batches are skipped).
    */
  private[graft] def lshUpsertBatch(s: SparkSession, path: String,
      arrivals: DataFrame, batchId: Long): Unit = {
    if (!arrivals.isEmpty) {
      lshMetaOk(s, path)
      lshAssign(arrivals)
        .write.mode("overwrite").partitionBy("bkey")
        .parquet(f"$path/index-stream/batch-$batchId%09d")
    }
  }

  /** Serve top-k from a prebuilt [[buildLshIndex]] index. The probed
    * bucket set (≤ queries × tables × probes keys) is computed on the
    * tiny query side and pushed as a static `isin` on the partition
    * column — the scan never opens an unprobed bucket directory, the
    * exact storage-layout discount [[ivfServe]] gets from cells.
    * Candidate scoring and the cross-table `distinct` replay
    * [[lshScored]] on identical rows, so serve ≡ inline by
    * construction (AnnSpec pins it).
    */
  private[graft] def lshServe(s: SparkSession, dir: String, path: String,
      probes: Int = LshProbes): DataFrame = {
    lshMetaOk(s, path)
    val (_, queries) = split(s, dir)
    val probed = queries
      .select(col("query_id"), col("q_emb"), col("q_nrm"),
        explode(graft.functions.VectorFunctions
          .xpolyKeys(col("q_emb"), LshSeed, LshTables, Dim, probes)).as("bkey"))
    // the probe-list is Q×tables×probes rows — driver-safe by construction
    val probedKeys = probed.select("bkey").distinct().collect().map(_.getInt(0))
    val keyFilter = col("bkey").isin(probedKeys.map(Integer.valueOf): _*)
    val index = (s"$path/index.parquet" +: lshStreamBatchRoots(s, path))
      .map(r => s.read.parquet(r).filter(keyFilter))
      .reduce(_ unionByName _)
    val scored = index.join(broadcast(probed), Seq("bkey"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        (Dedup.dotExpr("embedding", "q_emb") / (col("nrm") * col("q_nrm"))).as("cosine"))
      .distinct() // a pair may collide in several tables/probes
    topK(scored)
  }

  // ------------------------------------------------------------------
  // IVF-PQ: PRODUCT-QUANTIZED codes inside the persisted IVF index
  // (VERDICT r16 #2, upgraded r18 from per-vector int8 to true
  // multi-subspace PQ) — the full IVFADC layout of Jégou et al. 2011:
  // the SCANNED half of the index stores [[PqM]] one-byte codes plus
  // one reconstruction norm (16× more corpus per executor-GB than
  // float32, where the r17 int8 codes gave 4×), scored via per-query
  // ADC lookup tables; the full-precision floats live in a rerank
  // half that is read only for the top-c candidate ids per query.
  // [[buildIvfIndex]] keeps floats in the scanned rows; this triad is
  // the compressed successor.
  //
  // Layout:
  //   <path>/codebook.parquet       (cell, centroid)           — IVF cells, frozen
  //   <path>/pq_codebook.parquet    (pos, v)                   — PQ sub-codebooks, frozen
  //   <path>/index.parquet/cell=N/  (vec_id, codes[16B], rn)   — PQ codes, scanned
  //   <path>/rerank.parquet/cell=N/ (vec_id, embedding, nrm)   — floats, point-read
  //
  // Serve cost shape: the scoring scan reads nProbe/k of the CODES
  // (~1/11 the bytes of the float index) and spends [[PqM]] table
  // adds per candidate; the float half is touched only through (a)
  // the same probed-cell partition pruning and (b) a pushed
  // `vec_id IN (…)` filter over the queries×c candidate ids — a
  // bounded point-lookup, never a probed-cell float scan. Both
  // prunings are AnnSpec-asserted on the executed plan.
  // ------------------------------------------------------------------

  /** Candidates reranked in float per query (c = 4·K): the standard
    * over-fetch that absorbs quantization rank noise — AnnSpec pins
    * the recall floor vs the float [[ivfServe]]. */
  private[graft] val PqRerankC = 4 * K

  /** Map-only PQ coding pass: [[PqM]] byte codes per vector plus the
    * reconstruction norm (the [[qAnnPq]] arithmetic as a
    * persisted-index projection, against FROZEN model arrays).
    *
    * r19 residual coding: codes are the subspace argmins of the CELL
    * RESIDUAL ([[withResidual]] — `df` must carry `cell`), and the
    * reconstruction x̂ = c_cell + r̂ decomposes per disjoint subspace,
    * so `rn = sqrt(adcLookup(nlut_cell, codes))` against the per-cell
    * [[cellNlut]] table (16 × m·ks doubles, broadcast).
    */
  private def pqCode(s: SparkSession, df: DataFrame, cb: Array[Double],
      cent: Array[Double]): DataFrame = {
    import s.implicits._
    val vf = graft.functions.VectorFunctions
    val nl = cellNlut(cent, cb).zipWithIndex
      .map { case (a, c) => (c, a.toSeq) }.toSeq.toDF("cell", "nlut")
    withResidual(s, df, cent)
      .withColumn("codes", vf.pqCodes(col("remb"), cb.toSeq, PqM, PqDsub))
      .join(broadcast(nl), Seq("cell"))
      .withColumn("rn", sqrt(vf.adcLookup(col("nlut"), col("codes"))))
      .drop("remb", "nlut")
  }

  /** Persist / read the PQ sub-codebooks as a flat (pos, v) model
    * table — the [[readCodebook]] device for the second frozen model
    * of the triad. */
  private def writePqCodebook(s: SparkSession, path: String, cb: Array[Double]): Unit = {
    import s.implicits._
    cb.toSeq.zipWithIndex.map { case (v, p) => (p, v) }
      .toDF("pos", "v")
      .write.mode("overwrite").parquet(s"$path/pq_codebook.parquet")
  }

  private[graft] def readPqCodebook(s: SparkSession, path: String): Array[Double] =
    s.read.parquet(s"$path/pq_codebook.parquet")
      .orderBy(col("pos")).collect().map(_.getDouble(1))

  /** CRASH RECOVERY for the [[buildIvfPqIndex]] whole-dir swap — the
    * [[CorpusBuild.recoverPublish]] device for the PQ index root: a
    * process killed between [[CorpusBuild.swapInto]]'s two renames
    * leaves the index parked at `.build.old` with `path` absent;
    * restore it before any read. Leftover `.build.tmp` staging is
    * garbage on every path. Idempotent; called by every entry point
    * that touches `path`.
    */
  private def recoverIvfPq(s: SparkSession, path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(s"$path.build.old")
    if (!fs.exists(dst) && fs.exists(old) && !fs.rename(old, dst))
      throw new java.io.IOException(s"recover: cannot restore $old to $dst")
    if (fs.exists(dst) && fs.exists(old)) fs.delete(old, true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path.build.tmp"), true)
  }

  /** Build the IVF-PQ index. One corpus pass writes the float rerank
    * half (cell-partitioned); the codes half derives from reading
    * that just-written local layout back — the corpus itself is
    * scanned once.
    *
    * The whole triad (cell codebook, PQ sub-codebooks, both halves)
    * stages into `path.build.tmp` and publishes with ONE
    * [[CorpusBuild.swapInto]] rename (ADVICE r18): the former
    * in-place overwrite sequence had a tear window — a crash between
    * the `pq_codebook.parquet` overwrite and the `index.parquet`
    * overwrite left OLD codes served under the NEW codebook's LUT,
    * silently wrong ADC scores whenever the dir corpus had changed.
    * Now a crash anywhere during the build leaves the previous index
    * (including its streamed increments) fully intact and serving;
    * the swap atomically retires the stream dirs too (a rebuild
    * supersedes every streamed batch — they re-arrive via replay).
    *
    * @param indexFilter bounds the initially-indexed
    * subset (AnnSpec builds partial + [[ivfPqUpsert]]s the rest to
    * prove serve-equivalence with a one-shot build).
    */
  private[graft] def buildIvfPqIndex(s: SparkSession, dir: String, path: String,
      indexFilter: Column = lit(true)): Unit = {
    import s.implicits._
    recoverIvfPq(s, path)
    val (corpus, _) = split(s, dir)
    val cent = sessionCodebook(s, dir, corpus)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val tmp = s"$path.build.tmp"
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    (0 until IvfCells).map(t => (t, cent.slice(t * Dim, (t + 1) * Dim)))
      .toDF("cell", "centroid")
      .write.mode("overwrite").parquet(s"$tmp/codebook.parquet")
    // the PQ sub-codebooks are the triad's second frozen model — like
    // the cell codebook they train on the DIR corpus (deterministic,
    // session-cached), so a partial build + upserts and a one-shot
    // build code identically (the AnnSpec serve-equivalence contract)
    val pqCb = sessionPqCodebooks(s, dir, corpus)
    writePqCodebook(s, tmp, pqCb)
    ivfAssign(corpus.filter(indexFilter), cent)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$tmp/rerank.parquet")
    pqCode(s, s.read.parquet(s"$tmp/rerank.parquet"), pqCb, cent)
      .select(col("vec_id"), col("codes"), col("rn"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$tmp/index.parquet")
    CorpusBuild.swapInto(fs, new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(path), s"$path.build.old")
  }

  /** Append-only incremental maintenance — the [[ivfUpsert]] contract
    * (caller-owned vec_id uniqueness; frozen codebook, so assignment
    * is map-only and exact forever): the arrival batch lands in BOTH
    * halves under its cells, codes derived in the same map pass.
    */
  private[graft] def ivfPqUpsert(s: SparkSession, path: String, arrivals: DataFrame): Unit = {
    recoverIvfPq(s, path)
    val cent = readCodebook(s, path)
    val pqCb = readPqCodebook(s, path)
    val assigned = ivfAssign(arrivals, cent)
    assigned.select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$path/rerank.parquet")
    pqCode(s, assigned, pqCb, cent)
      .select(col("vec_id"), col("codes"), col("rn"), col("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$path/index.parquet")
  }

  /** Idempotent per-micro-batch PQ upsert — [[ivfUpsertBatch]]'s
    * contract extended to the TWO-TABLE layout, where the plain
    * [[ivfPqUpsert]] has a failure mode the one-table paths don't: a
    * crash between its two appends TEARS the index (floats landed,
    * codes didn't — the batch's vectors silently vanish from the
    * scoring scan, and a replay would duplicate the half that DID
    * land). Here both halves go under deterministic batchId-derived
    * directories with OVERWRITE semantics: a torn batch is merely
    * invisible (codes half absent → stage 1 never surfaces the ids;
    * stage 2 only point-reads ids stage 1 produced, so an orphaned
    * float half is never served), and the replay rewrites BOTH dirs —
    * the index converges to exactly-once contents, tear healed. The
    * float half is written first and the codes derive from reading it
    * back, so arrivals are scanned once and the commit order matches
    * the tear analysis above. A codebook retrain ([[buildIvfPqIndex]])
    * clears both stream roots.
    */
  private[graft] def ivfPqUpsertBatch(s: SparkSession, path: String,
      arrivals: DataFrame, batchId: Long): Unit = {
    if (!arrivals.isEmpty) {
      recoverIvfPq(s, path)
      val cent = readCodebook(s, path)
      val pqCb = readPqCodebook(s, path)
      val rerankDir = f"$path/rerank-stream/batch-$batchId%09d"
      val indexDir = f"$path/index-stream/batch-$batchId%09d"
      // replay of an already-committed batch (at-least-once
      // re-delivery) must UN-COMMIT first: if the old codes half were
      // left standing while the float half is overwritten, a crash
      // mid-overwrite would leave codes committed with floats absent —
      // stage 1 surfaces the batch's vec_ids but stage 2 finds no
      // floats, the exact reverse tear this write order exists to
      // prevent. Deleting the codes dir restores floats-first /
      // codes-last for EVERY attempt, not just the first.
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val ip = new org.apache.hadoop.fs.Path(indexDir)
      if (fs.exists(ip)) fs.delete(ip, true)
      ivfAssign(arrivals, cent)
        .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(rerankDir)
      pqCode(s, s.read.parquet(rerankDir), pqCb, cent)
        .select(col("vec_id"), col("codes"), col("rn"), col("cell"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(indexDir)
      // commit evidence recorded AT WRITE TIME (ADVICE r19): the codes
      // job finished, so stamp the batch with the engine's own marker.
      // The serve-side commit verdict must be a pure function of the
      // batch dir's contents — inferring it from the READER's Hadoop
      // conf meant a batch written under a markers-disabled conf (no
      // _SUCCESS ever exists) but later served under the default
      // markers-enabled conf read as torn and silently vanished from
      // serves. A crash between the codes job and this marker leaves
      // the batch invisible (markers-off writer) or _SUCCESS-committed
      // (markers-on writer) — either way the at-least-once replay
      // converges it.
      fs.create(new org.apache.hadoop.fs.Path(ip, PqCommitMarker), true).close()
    }
  }

  /** The engine's own per-batch commit marker ([[ivfPqUpsertBatch]]
    * writes it after the codes land; [[pqBatchCommitted]] reads it). */
  private val PqCommitMarker = "_GRAFT_COMMIT"

  /** Streamed-batch directories for one PQ half, oldest first —
    * COMMITTED batches only: a batch counts iff its CODES half
    * FINISHED writing (the commit-last half of [[ivfPqUpsertBatch]]'s
    * write order), so a torn batch's orphaned float half is never
    * listed for serve. "Finished" is NOT bare directory existence —
    * Spark creates the output dir (holding only `_temporary`) at job
    * START, so a crash during the codes write leaves an empty dir
    * that would otherwise count as committed and make serve throw (or
    * read partial codes). The commit evidence is recorded AT WRITE
    * TIME (ADVICE r19): [[ivfPqUpsertBatch]] stamps
    * [[PqCommitMarker]] into the codes dir after the write completes,
    * so the verdict here is a pure function of the dir contents —
    * never of the reader's Hadoop conf (the old conf-inferred rule
    * classified a markers-disabled writer's batches as torn whenever
    * the reader ran markers-enabled, silently dropping them from
    * serves). The Hadoop `_SUCCESS` marker is accepted as equivalent
    * evidence (a markers-enabled writer that crashed between the
    * codes job commit and the graft stamp still committed the batch).
    * A dir with NEITHER marker is torn, full stop — task-committed
    * data files without a job marker (committer v2 mid-job, v1's
    * job-commit rename window) are a PARTIAL batch, and counting them
    * as committed serves silently-incomplete answers (ADVICE r18);
    * the at-least-once replay rewrites and re-stamps such a batch.
    */
  private def pqBatchCommitted(fs: org.apache.hadoop.fs.FileSystem,
      batchDir: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(batchDir, PqCommitMarker)) ||
      fs.exists(new org.apache.hadoop.fs.Path(batchDir, "_SUCCESS"))

  private def pqStreamBatchRoots(s: SparkSession, path: String, half: String): Seq[String] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val committed = {
      val root = new org.apache.hadoop.fs.Path(s"$path/index-stream")
      if (fs.exists(root))
        fs.listStatus(root)
          .filter(st => st.isDirectory && pqBatchCommitted(fs, st.getPath))
          .map(_.getPath.getName).toSet
      else Set.empty[String]
    }
    val root = new org.apache.hadoop.fs.Path(s"$path/$half-stream")
    if (fs.exists(root))
      fs.listStatus(root).filter(st => st.isDirectory && committed(st.getPath.getName))
        .map(_.getPath.toString).sorted.toSeq
    else Seq.empty
  }

  /** Serve top-k from a prebuilt [[buildIvfPqIndex]] index: quantized
    * scoring over the probed cells' CODES → per-query top-`rerankC`
    * candidates → float rerank of exactly those ids → top-[[K]].
    *
    * Two bounded driver collects, both constant-sized by construction
    * (the [[ivfServe]] probed-cells precedent): the probe list
    * (queries × probes cells) and the candidate pairs (queries ×
    * rerankC ids) — the latter is what lets the float half be read
    * under a pushed `vec_id IN` point filter instead of a probed-cell
    * float scan, the IVFADC read shape.
    */
  private[graft] def ivfPqServe(s: SparkSession, dir: String, path: String,
      probes: Int = IvfProbes, rerankC: Int = PqRerankC): DataFrame = {
    import s.implicits._
    recoverIvfPq(s, path)
    val vf = graft.functions.VectorFunctions
    val (_, queries) = split(s, dir)
    val cbRows = s.read.parquet(s"$path/codebook.parquet")
      .collect().map(r => (r.getAs[Int]("cell"), r.getSeq[Double](r.fieldIndex("centroid"))))
    val centDf = cbRows
      .map { case (c, v) => (c, v.map(_.toFloat).toArray) }.toSeq
      .toDF("cell", "centroid")
    val probed = queries
      .crossJoin(broadcast(centDf.withColumn("cnrm", Dedup.norm("centroid"))))
      .withColumn("cos",
        Dedup.dotExpr("q_emb", "centroid") / (col("q_nrm") * col("cnrm")))
      .withColumn("prk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("cell"))))
      .filter(col("prk") <= probes)
      .select(col("query_id"), col("q_emb"), col("q_nrm"), col("cell"))
    val probedCells = probed.select("cell").distinct().collect().map(_.getInt(0))
    val cellFilter = col("cell").isin(probedCells.map(Integer.valueOf): _*)
    // ADC query side (the queries×probes broadcast, plus the per-query
    // m·ks lookup table built once against the frozen sub-codebooks;
    // r19 residual coding adds the per-(query, cell) coarse dot
    // qc = q·c_cell — the estimated dot is qc + Σ_m lut[code_m])
    val pqCb = readPqCodebook(s, path)
    val centArr = {
      val a = new Array[Double](IvfCells * Dim)
      cbRows.foreach { case (c, v) =>
        var i = 0
        while (i < Dim) { a(c * Dim + i) = v(i); i += 1 }
      }
      a
    }
    val probedQ = probed
      .withColumn("lut", vf.pqLut(col("q_emb"), pqCb.toSeq, PqM, PqDsub))
      .withColumn("qc",
        element_at(vf.pqLut(col("q_emb"), centArr.toSeq, 1, Dim), col("cell") + 1))
      .select(col("query_id"), col("lut"), col("qc"), col("q_nrm"), col("cell"))
    // stage 1: ADC table-lookup scoring over the probed cells' codes
    // only ([[PqM]] adds per candidate) — resident build + committed
    // streamed batch dirs ([[ivfPqUpsertBatch]]), each under the same
    // partition pruning
    val codesIdx = (s"$path/index.parquet" +: pqStreamBatchRoots(s, path, "index"))
      .map(r => s.read.parquet(r)).reduce(_ unionByName _)
    val cand = codesIdx.filter(cellFilter)
      .join(broadcast(probedQ), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        ((col("qc") + vf.adcLookup(col("lut"), col("codes"))) / (col("rn") * col("q_nrm")))
          .as("adc_cos"))
      .withColumn("crk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("adc_cos").desc, col("vec_id"))))
      .filter(col("crk") <= rerankC)
      .select(col("query_id"), col("vec_id"))
    // queries × rerankC rows — driver-safe by construction
    val candPairs = cand.collect().map(r => (r.getLong(0), r.getLong(1)))
    val candIds = candPairs.map(_._2).distinct
    // stage 2: float rerank of exactly the candidate ids (partition
    // pruning on cell + pushed IN on vec_id — a point lookup)
    val rer = (s"$path/rerank.parquet" +: pqStreamBatchRoots(s, path, "rerank"))
      .map(r => s.read.parquet(r)).reduce(_ unionByName _)
      .filter(cellFilter)
      .filter(col("vec_id").isin(candIds.map(java.lang.Long.valueOf): _*))
      .select(col("vec_id"), col("embedding"), col("nrm"))
    val scored = rer
      .join(broadcast(candPairs.toSeq.toDF("query_id", "vec_id")), Seq("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (Dedup.dotExpr("embedding", "q_emb") / (col("nrm") * col("q_nrm"))).as("cosine"))
    topK(scored)
  }

  /** Streamed-batch directories, oldest first (the [[streamBatchRoots]]
    * device for the LSH layout). */
  private def lshStreamBatchRoots(s: SparkSession, path: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(s"$path/index-stream")
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(root))
      fs.listStatus(root).filter(_.isDirectory).map(_.getPath.toString).sorted.toSeq
    else Seq.empty
  }

  def qAnnQuantized(s: SparkSession, dir: String): DataFrame = {
    val vf = graft.functions.VectorFunctions
    val (corpus, queries) = split(s, dir)
    val qc = corpus
      .withColumn("codes", vf.vecCodes8(col("embedding"), vf.vecScale8(col("embedding"))))
      .select(col("vec_id"), col("codes"),
        sqrt(vf.dot8(col("codes"), col("codes")).cast("double")).as("n8"))
    val qq = queries
      .withColumn("q_codes", vf.vecCodes8(col("q_emb"), vf.vecScale8(col("q_emb"))))
      .select(col("query_id"), col("q_codes"),
        sqrt(vf.dot8(col("q_codes"), col("q_codes")).cast("double")).as("qn8"))
    val scored = qc.crossJoin(broadcast(qq))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (vf.dot8(col("codes"), col("q_codes")).cast("double") / (col("n8") * col("qn8")))
          .as("cosine"))
    topK(scored)
  }

  /** Oracle for [[qAnnQuantized]] — fully hash-checked: every step of
    * the quantization is a single IEEE op or exact integer math, so no
    * accumulation-order mirroring is even needed. scale = max|x|/127
    * (max is order-invariant, one division); codes = rint(x/scale)
    * clamped — DuckDB's `round_even(x, 0)` IS Math.rint (half-to-even,
    * verified incl. -0.5 → -0.0); int8 MACs are exact BIGINT sums in
    * any order; the final cosine is one multiply and one divide.
    */
  /** The quantized program as prefixable CTEs (see [[bruteforceCtes]]). */
  private def quantizedCtes(p: String): String = {
    def codes(emb: String): String =
      s"""CASE WHEN list_max(list_transform($emb, x -> abs(CAST(x AS DOUBLE)))) = 0
         |  THEN list_transform($emb, x -> CAST(0 AS BIGINT))
         |  ELSE list_transform($emb, x -> CAST(LEAST(GREATEST(
         |    round_even(CAST(x AS DOUBLE)
         |      / (list_max(list_transform($emb, y -> abs(CAST(y AS DOUBLE)))) / 127.0), 0),
         |    -127.0), 127.0) AS BIGINT))
         |  END""".stripMargin
    def dot8(a: String, b: String): String =
      s"CAST(list_sum(list_transform(list_zip($a, $b), x -> x[1] * x[2])) AS DOUBLE)"
    s"""${p}coded AS (
       |  SELECT vec_id, ${codes("embedding")} AS codes
       |  FROM embeddings),
       |${p}base AS (
       |  SELECT vec_id, codes, sqrt(${dot8("codes", "codes")}) AS n8 FROM ${p}coded),
       |${qidsCte(p)},
       |${p}q AS (
       |  SELECT vec_id AS query_id, codes AS q_codes, n8 AS qn8
       |  FROM ${p}base WHERE vec_id IN (SELECT vec_id FROM ${p}qids)),
       |${p}scored AS (
       |  SELECT query_id, vec_id AS neighbor_id,
       |    ${dot8("codes", "q_codes")} / (n8 * qn8) AS cosine
       |  FROM ${p}base CROSS JOIN ${p}q
       |  WHERE vec_id <> query_id),
       |${p}r AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |           ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rnk
       |  FROM ${p}scored)""".stripMargin
  }

  val qAnnQuantizedSql: String =
    s"""WITH ${quantizedCtes("")}
       |SELECT query_id, neighbor_id, rnk, cosine
       |FROM r WHERE rnk <= $K
       |ORDER BY query_id, rnk""".stripMargin

  /** Quantization-quality monitor — the continuous audit of the int8
    * path against the exact float baseline: per query, overlap@[[K]]
    * (recall in basis points) and the worst cosine error over the
    * agreed neighbors. The structural twin of [[qAnnRecall]] (which
    * monitors LSH and stays rows-only because LSH rotations are model
    * state); HERE both sides are bit-exact cross-engine, so the
    * monitor itself is fully hash-checked — the quantization-quality
    * claim lives in the driver gate, not just AnnSpec.
    *
    * Shape at scale: two broadcast-probed map-only scoring passes over
    * the corpus (each the respective query's plan) into k-row-per-query
    * top-k sets; the audit join and rollup are query-count-sized.
    */
  def qQuantRecall(s: SparkSession, dir: String): DataFrame = {
    val bf = qAnnBruteforce(s, dir)
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
    val q8 = qAnnQuantized(s, dir)
      .select(col("query_id"), col("neighbor_id"), col("cosine").as("cos8"))
    bf.join(q8, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(
        count(lit(1)).as("k"),
        count(col("cos8")).as("n_overlap"),
        max(when(col("cos8").isNotNull, abs(col("cosine") - col("cos8"))))
          .as("max_cos_err"))
      .select(col("query_id"), col("k"), col("n_overlap"),
        expr("(n_overlap * 10000) DIV k").as("recall_bp"),
        col("max_cos_err"))
  }

  val qQuantRecallSql: String =
    s"""WITH ${bruteforceCtes("bf_")},
       |${quantizedCtes("q8_")},
       |bfk AS (SELECT query_id, neighbor_id, cosine FROM bf_r WHERE rnk <= $K),
       |q8k AS (SELECT query_id, neighbor_id, cosine AS cos8 FROM q8_r WHERE rnk <= $K),
       |j AS (
       |  SELECT bfk.query_id, bfk.cosine, q8k.cos8
       |  FROM bfk LEFT JOIN q8k
       |    ON bfk.query_id = q8k.query_id AND bfk.neighbor_id = q8k.neighbor_id)
       |SELECT query_id, COUNT(*) AS k, COUNT(cos8) AS n_overlap,
       |  (COUNT(cos8) * 10000) // COUNT(*) AS recall_bp,
       |  MAX(CASE WHEN cos8 IS NOT NULL THEN abs(cosine - cos8) END) AS max_cos_err
       |FROM j GROUP BY query_id
       |ORDER BY query_id""".stripMargin

  // ------------------------------------------------------------------
  // Rows q_ann_pq / q_pq_recall: TRUE multi-subspace product
  // quantization (Jégou et al. 2011) — m sub-codebooks over disjoint
  // dim/m-dim slices, one byte code per subspace, ADC lookup-table
  // scoring. 32× compression (8 bytes vs 256 float bytes) where the
  // per-vector int8 path (q_ann_quantized) is 4× — the difference
  // between an embedding store that fits executor memory at 10⁸
  // vectors and one that doesn't. Training reuses the IVF Lloyd
  // device per subspace (deterministic md5 seed pick, exact
  // fixed-point means), so the oracle RE-TRAINS all m sub-codebooks
  // inside DuckDB the same way qAnnIvfSql re-trains its cells.
  // ------------------------------------------------------------------

  private[graft] val PqM = 16         // subspaces (one byte code each)
  private[graft] val PqDsub = Dim / PqM
  private[graft] val PqKs = 256       // centroids per sub-codebook (8-bit codes)
  private[graft] val PqTrainIters = 2
  /** ADC shortlist size before the exact float rerank — the
    * [[PqRerankC]] over-fetch device: final top-[[K]] recall equals
    * the probability the true neighbors survive the ADC top-c cut
    * (~97% at c=4K on the sf0.1 corpus, measured), because the rerank
    * restores exact order within the shortlist. */
  private[graft] val PqShortC = 4 * K

  /** The cell-centroid table as a broadcastable (cell, cvec) frame —
    * the residualization lookup side. */
  private def cellCentDf(s: SparkSession, cent: Array[Double]): DataFrame = {
    import s.implicits._
    (0 until IvfCells).map(t => (t, cent.slice(t * Dim, (t + 1) * Dim)))
      .toDF("cell", "cvec")
  }

  /** RESIDUAL view of a celled frame (r19 — Jégou et al. 2011 §IV's
    * "multiple quantization with residuals", the recall lever that
    * replaced the judged OPQ-lite permutation, see BASELINE.md r19):
    * `remb[i] = float(double(embedding[i]) − c_cell[i])`. One exact
    * IEEE subtraction + one float rounding per component — both
    * engines perform the identical ops, so residuals are
    * bit-identical cross-engine. Requires a `cell` column (the frozen
    * [[sessionCodebook]] assignment).
    */
  private def withResidual(s: SparkSession, df: DataFrame, cent: Array[Double]): DataFrame =
    df.join(broadcast(cellCentDf(s, cent)), Seq("cell"))
      .withColumn("remb",
        expr("zip_with(embedding, cvec, (x, c) -> CAST(CAST(x AS DOUBLE) - c AS FLOAT))"))
      .drop("cvec")

  /** Per-CELL reconstruction-norm² LUT in ADC layout: entry
    * `(m·ks + t)` of cell c is ‖c_sub(c,m) + cb_{m,t}‖² — the norm of
    * the RESIDUAL-coded reconstruction x̂ = c_cell + r̂ decomposes per
    * disjoint subspace, so `rn = sqrt(adcLookup(nlut_cell, codes))`.
    * Left-to-right component fold (the oracle's list_reduce order).
    */
  private[graft] def cellNlut(cent: Array[Double], cb: Array[Double]): Array[Array[Double]] = {
    val entries = cb.length / PqDsub // m*ks
    val ks = entries / PqM
    (0 until IvfCells).map { c =>
      val out = new Array[Double](entries)
      var e = 0
      while (e < entries) {
        val m = e / ks
        var acc = 0.0
        var i = 0
        while (i < PqDsub) {
          val x = cent(c * Dim + m * PqDsub + i) + cb(e * PqDsub + i)
          acc += x * x
          i += 1
        }
        out(e) = acc
        e += 1
      }
      out
    }.toArray
  }

  /** Train the m sub-codebooks: [[PqKs]] seed rows picked by the IVF
    * device (TakeOrdered on (md5(vec_id), vec_id) — SQL-replayable),
    * sliced per subspace, refined by [[PqTrainIters]] Lloyd rounds
    * under subspace L2 (the PQ metric: minimal reconstruction error →
    * tight ADC dot estimates). ALL subspaces train in the same passes:
    * one map-only coding + one (m·ks·dsub)-row fixed-point aggregate
    * per round — the corpus never shuffles (the [[trainCodebook]]
    * shape, m-for-free).
    *
    * r19: trains on CELL RESIDUALS (x − c_cell under the frozen
    * [[sessionCodebook]] assignment — [[withResidual]]), the IVFADC
    * coding of Jégou et al. 2011 §IV: residual magnitudes are a
    * fraction of raw components, so the same 16×256 codebook budget
    * spends its resolution on the informative part. Measured on the
    * fixed query sample: raw-ADC recall@5 63.3→66.1% at sf0.1,
    * 78.6→81.6% at sf0.01 (numpy replica of the full deterministic
    * chain; the shipped chain's gain is pinned by `q_pq_recall`).
    *
    * Returned flattened with entry (m, t) component i at
    * `(m*PqKs + t)*PqDsub + i` (the [[graft.functions.PqKernels]]
    * layout).
    */
  private[graft] def trainPqCodebooks(s: SparkSession, corpus: DataFrame,
      cent: Array[Double]): Array[Double] = {
    val rcorpus = withResidual(s,
        corpus.withColumn("cell", graft.functions.VectorFunctions
          .nearestCell(col("embedding"), cent.toSeq, Dim)),
        cent)
      .select(col("vec_id"), col("remb").as("embedding"))
    val seeds = rcorpus
      .withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy(col("h"), col("vec_id")).limit(PqKs)
      .select(col("embedding").cast("array<double>").as("e"))
      .collect()
    require(seeds.nonEmpty, "PQ training needs a non-empty corpus")
    // a corpus smaller than PqKs trains with ks = N sub-centroids —
    // every downstream consumer derives ks from the codebook length
    // (the PqKernels layout), and the oracle's `WHERE t < PqKs` seed
    // cut yields the same N rows, so both engines degrade identically
    val ks = seeds.length
    var cb = new Array[Double](PqM * ks * PqDsub)
    for (t <- 0 until ks; m <- 0 until PqM; i <- 0 until PqDsub)
      cb((m * ks + t) * PqDsub + i) = seeds(t).getSeq[Double](0)(m * PqDsub + i)
    for (_ <- 1 to PqTrainIters) {
      // same exact-BIGINT fixed-point means as [[trainCodebook]]
      // (FpScale = 2^20 is a power of two, so the scaling multiply is
      // IEEE-exact in any float width — no engine drift)
      // the coding expression MUST be projected in its own step BELOW
      // the explode: a combined select(pqCodes(...), posexplode(...))
      // puts the generator's sibling expressions ABOVE the Generate
      // (ExtractGenerator), re-evaluating the 16·ks·dsub-op coding
      // kernel once per EXPLODED row — a 64× amplification measured
      // at 170 s/iteration on the 100× replica (vs seconds this way)
      val means = rcorpus
        .select(
          graft.functions.VectorFunctions
            .pqCodes(col("embedding"), cb.toSeq, PqM, PqDsub).as("codes"),
          col("embedding"))
        .select(col("codes"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .select(
          expr(s"CAST(pos DIV $PqDsub AS INT)").as("m"),
          // & 255: the byte code is SIGNED in SQL — with ks > 128 a
          // code of e.g. 200 reads as -56 without the mask
          expr(s"CAST(element_at(codes, CAST(pos DIV $PqDsub AS INT) + 1) AS INT) & 255").as("code"),
          col("pos"), col("v"))
        .groupBy(col("m"), col("code"), col("pos"))
        .agg(sum(expr(s"CAST(round(v * $FpScale) AS BIGINT)")).as("s"),
          count(lit(1)).as("c"))
        .collect()
      val next = cb.clone() // empty codes keep their previous centroid
      means.foreach { r =>
        val m = r.getInt(0)
        next((m * ks + r.getInt(1)) * PqDsub + (r.getInt(2) - m * PqDsub)) =
          r.getLong(3).toDouble / FpScale / r.getLong(4)
      }
      cb = next
    }
    cb
  }

  /** Session-scoped sub-codebook cache — the [[sessionCodebook]]
    * contract verbatim (model parameter: m·ks·dsub doubles; immutable
    * data dirs; [[clearModelCache]] drops it). */
  private val pqCodebookCache = new graft.plans.SessionCache[Array[Double]]

  private[graft] def sessionPqCodebooks(s: SparkSession, dir: String,
      corpus: DataFrame): Array[Double] =
    pqCodebookCache.getOrElseUpdate(s, dir)(
      trainPqCodebooks(s, corpus, sessionCodebook(s, dir, corpus)))

  /** The ADC stage shared by [[qAnnPq]] and [[qPqRecall]]: corpus
    * coded to m bytes (map-only), queries build their m·ks dot LUT
    * (map-only over [[QueryK]] rows), every candidate scores with m
    * table adds instead of [[Dim]] multiply-adds, and the per-query
    * ADC rank is cut at `c`. Estimated cosine = ADC-dot /
    * (recon_norm · q_nrm) with recon_norm from the codebook norm²
    * LUT. At 100 TB this stage reads 16 code bytes per candidate
    * where the float scan reads 256 — the scan that decides the
    * serve cost.
    */
  private def pqAdcRanked(s: SparkSession, dir: String, c: Int): DataFrame = {
    val vf = graft.functions.VectorFunctions
    val (corpus, queries) = split(s, dir)
    val cent = sessionCodebook(s, dir, corpus)
    val cb = sessionPqCodebooks(s, dir, corpus)
    val coded = pqCode(s,
        corpus.withColumn("cell",
          vf.nearestCell(col("embedding"), cent.toSeq, Dim)),
        cb, cent)
      .select(col("vec_id"), col("cell"), col("codes"), col("rn"))
    // query side: the residual-codebook dot LUT plus the 16-entry
    // cell-dot array (q·c_cell — pqLut with ONE subspace of width Dim
    // over the cell codebook; same fold as the oracle's ivfDDot), so
    // the estimated dot q·x̂ = qc[cell] + Σ_m lut[code_m]
    val qlut = queries
      .select(col("query_id"), vf.pqLut(col("q_emb"), cb.toSeq, PqM, PqDsub).as("lut"),
        vf.pqLut(col("q_emb"), cent.toSeq, 1, Dim).as("qc_arr"),
        col("q_nrm"))
    coded.crossJoin(broadcast(qlut))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        ((element_at(col("qc_arr"), col("cell") + 1) +
          vf.adcLookup(col("lut"), col("codes"))) / (col("rn") * col("q_nrm")))
          .as("adc_cos"))
      .withColumn("ark", row_number().over(
        Window.partitionBy("query_id").orderBy(col("adc_cos").desc, col("neighbor_id")))
        .cast("long"))
      .filter(col("ark") <= c)
  }

  /** PQ-ADC top-k, IVFADC read shape (Jégou et al. 2011): ADC
    * shortlist of [[PqShortC]] candidates per query over the 16-byte
    * codes, then an exact float rerank of exactly those
    * queries×[[PqShortC]] pairs — a broadcast-probed point lookup,
    * never a float corpus scan — and the final top-[[K]] cut. The
    * rerank restores exact order inside the shortlist, so final
    * recall equals the shortlist's hit rate (the [[PqShortC]] note).
    * [[qPqRecall]] is the continuous quality audit.
    */
  def qAnnPq(s: SparkSession, dir: String): DataFrame =
    annPqFromShortlist(s, dir, pqAdcRanked(s, dir, PqShortC).select("query_id", "neighbor_id"))

  /** The exact float rerank over a given ADC shortlist — split out
    * (r21) so [[qPqRecall]] can feed BOTH its raw-ADC column and the
    * reranked serve from ONE ADC ranking pass instead of deriving the
    * corpus×query ADC scan twice.
    */
  private def annPqFromShortlist(s: SparkSession, dir: String,
      shortlist: DataFrame): DataFrame = {
    val (corpus, queries) = split(s, dir)
    val rer = corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding"), col("nrm"))
      .join(broadcast(shortlist), Seq("neighbor_id"))
      .join(broadcast(queries), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (Dedup.dotExpr("embedding", "q_emb") / (col("nrm") * col("q_nrm"))).as("cosine"))
    topK(rer)
  }

  /** PQ quality monitor — [[qQuantRecall]]'s shape over the PQ path,
    * split into the two quantities a PQ deployment tunes on: per
    * query, recall@[[K]] of the RERANKED serve (what users see — the
    * shortlist hit rate) and recall@[[K]] of the raw ADC rank (what
    * the 16-byte codes alone can do — the quantization honesty
    * number). Fully hash-checked: training, coding, LUT and fold
    * orders all replay in the oracle.
    */
  def qPqRecall(s: SparkSession, dir: String): DataFrame = {
    import graft.plans.Materialize.MaterializeOps
    val bf = qAnnBruteforce(s, dir)
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
    // r21: the ADC ranking pass (corpus×query scan + per-query window)
    // runs ONCE and is checkpointed (queries×PqShortC rows — tiny);
    // the reranked serve and the raw-ADC column both read it. The old
    // shape derived the identical pqAdcRanked subtree twice (once here,
    // once inside qAnnPq) — two full ADC corpus scans per run.
    val adc = pqAdcRanked(s, dir, PqShortC)
      .select(col("query_id"), col("neighbor_id"), col("ark")).materialized
    val fin = annPqFromShortlist(s, dir, adc.select("query_id", "neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit_f"))
    val adcK = adc.filter(col("ark") <= K)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit_a"))
    // the third column (r19): what the PRODUCTION read — cell-pruned
    // ADC over nProbe/k of the index ([[qAnnIvfadc]]) — costs in
    // recall beside the full-scan shortlist's two numbers
    val ivfadcK = qAnnIvfadc(s, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit_v"))
    bf.join(fin, Seq("query_id", "neighbor_id"), "left")
      .join(adcK, Seq("query_id", "neighbor_id"), "left")
      .join(ivfadcK, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(
        count(lit(1)).as("k"),
        count(col("hit_f")).as("n_overlap"),
        count(col("hit_a")).as("n_adc_overlap"),
        count(col("hit_v")).as("n_ivfadc_overlap"))
      .select(col("query_id"), col("k"), col("n_overlap"),
        expr("(n_overlap * 10000) DIV k").as("recall_bp"),
        col("n_adc_overlap"),
        expr("(n_adc_overlap * 10000) DIV k").as("adc_recall_bp"),
        col("n_ivfadc_overlap"),
        expr("(n_ivfadc_overlap * 10000) DIV k").as("ivfadc_recall_bp"))
  }

  // Oracle devices for the PQ program. Subspace L2 fold — the
  // [[Dedup.sqlDot]] convention on squared differences (centroid side
  // already DOUBLE, embedding side widened per element).
  private def pqL2(cv: String, sub: String): String =
    s"list_reduce(list_transform(list_zip($cv, $sub), " +
      "z -> (z[1] - CAST(z[2] AS DOUBLE)) * (z[1] - CAST(z[2] AS DOUBLE))), " +
      "(acc, v) -> acc + v)"

  // deterministic argmin without a corpus×ks window: min distance per
  // (vec, m), then the LOWEST t attaining it — exactly PqKernels'
  // strict-< tie rule, as two hash aggregates instead of one
  // (N·m·ks)-row partitioned sort (ks=256 makes the sort the oracle's
  // bottleneck at the 10× replica; the aggregates are not)
  private def pqArgmin(din: String, out: String): String =
    s"""$out AS (
       |  SELECT d.vec_id, d.m, MIN(d.t) AS code
       |  FROM $din d JOIN (
       |    SELECT vec_id, m, MIN(dist) AS dmin FROM $din GROUP BY vec_id, m) mn
       |    ON d.vec_id = mn.vec_id AND d.m = mn.m AND d.dist = mn.dmin
       |  GROUP BY d.vec_id, d.m)""".stripMargin

  // one PQ Lloyd round over ALL subspaces: L2-assign pq_sub to $cin,
  // roll exact fixed-point means per (m, code, pos), emit $cout
  // (empty codes keep $cin's centroid) — [[ivfLloydRound]] with the
  // subspace id threaded through every join
  private def pqLloydRound(cin: String, cout: String, n: Int): String =
    s"""pq_d$n AS MATERIALIZED (
       |  SELECT s.vec_id, s.m, c.t, ${pqL2("c.cvec", "s.sub")} AS dist
       |  FROM pq_sub s JOIN $cin c ON s.m = c.m),
       |${pqArgmin(s"pq_d$n", s"pq_asg$n")},
       |pq_m$n AS (
       |  SELECT a.m, a.code, fp.pos, SUM(fp.f) AS sm, COUNT(*) AS c
       |  FROM pq_asg$n a JOIN pq_fpos fp
       |    ON fp.vec_id = a.vec_id AND fp.pos // $PqDsub = a.m
       |  GROUP BY a.m, a.code, fp.pos),
       |$cout AS (
       |  SELECT ce.m, ce.t,
       |    list(COALESCE((CAST(mm.sm AS DOUBLE) / $FpScale.0) / CAST(mm.c AS DOUBLE), ce.cv)
       |         ORDER BY ce.pos) AS cvec
       |  FROM (SELECT m, t, unnest(range(m * $PqDsub, (m + 1) * $PqDsub)) AS pos,
       |          unnest(cvec) AS cv
       |        FROM $cin) ce
       |  LEFT JOIN pq_m$n mm ON ce.m = mm.m AND ce.t = mm.code AND ce.pos = mm.pos
       |  GROUP BY ce.m, ce.t)""".stripMargin

  /** The PQ program as CTEs (fixed `pq_` prefix): cell residuals,
    * subspace slices, fixed-point components, seed pick,
    * [[PqTrainIters]] Lloyd rounds, final codes, per-cell
    * reconstruction norms, per-query LUT + coarse cell dots and the
    * ADC ranking `pq_r`. Every double fold is list_reduce
    * (left-to-right) and every cross-subspace sum is an m-ORDERED
    * list fold — SUM() over doubles would be merge-order-dependent.
    *
    * r19: the program quantizes CELL RESIDUALS (x − c_cell), so it
    * REQUIRES [[ivfTrainCtes]] in the same WITH (for `base`, `idx`
    * and `cent2` — the retrained cell codebook); every consumer
    * ([[qAnnPqSql]], [[qPqRecallSql]], [[qAnnIvfadcSql]]) composes
    * both chains.
    */
  private def pqCtes: String = {
    val subSlices = (0 until PqM).map { m =>
      val a = m * PqDsub + 1
      val b = (m + 1) * PqDsub
      s"SELECT vec_id, $m AS m, list_slice(remb, $a, $b) AS sub FROM pq_remb"
    }.mkString("\n  UNION ALL\n  ")
    val seedSlices = (0 until PqM).map { m =>
      val a = m * PqDsub + 1
      val b = (m + 1) * PqDsub
      s"SELECT t, $m AS m, list_transform(list_slice(remb, $a, $b), " +
        s"x -> CAST(x AS DOUBLE)) AS cvec FROM pq_seed"
    }.mkString("\n  UNION ALL\n  ")
    val qSlices = (0 until PqM).map { m =>
      val a = m * PqDsub + 1
      val b = (m + 1) * PqDsub
      s"SELECT query_id, $m AS m, list_slice(q_emb, $a, $b) AS sub FROM pq_q"
    }.mkString("\n  UNION ALL\n  ")
    val centSlices = (0 until PqM).map { m =>
      val a = m * PqDsub + 1
      val b = (m + 1) * PqDsub
      s"SELECT cell, $m AS m, list_slice(cvec, $a, $b) AS csub FROM cent2"
    }.mkString("\n  UNION ALL\n  ")
    s"""pq_remb AS MATERIALIZED (
       |  SELECT b.vec_id, i.cell,
       |    list_transform(list_zip(b.embedding, c.cvec),
       |      z -> CAST(CAST(z[1] AS DOUBLE) - z[2] AS FLOAT)) AS remb
       |  FROM base b JOIN idx i ON i.vec_id = b.vec_id
       |  JOIN cent2 c ON c.cell = i.cell),
       |pq_sub AS MATERIALIZED (
       |  $subSlices),
       |pq_fpos AS MATERIALIZED (
       |  SELECT vec_id, unnest(range(0, $Dim)) AS pos,
       |    CAST(round(CAST(unnest(remb) AS DOUBLE) * $FpScale) AS BIGINT) AS f
       |  FROM pq_remb),
       |pq_seed AS MATERIALIZED (
       |  SELECT t, remb FROM (
       |    SELECT remb,
       |      ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS t
       |    FROM pq_remb) z
       |  WHERE t < $PqKs),
       |pq_cb0 AS (
       |  $seedSlices),
       |${pqLloydRound("pq_cb0", "pq_cb1", 1)},
       |${pqLloydRound("pq_cb1", "pq_cb2", 2)},
       |pq_df AS MATERIALIZED (
       |  SELECT s.vec_id, s.m, c.t, ${pqL2("c.cvec", "s.sub")} AS dist
       |  FROM pq_sub s JOIN pq_cb2 c ON s.m = c.m),
       |${pqArgmin("pq_df", "pq_idx")},
       |pq_csub AS (
       |  $centSlices),
       |pq_n2 AS MATERIALIZED (
       |  SELECT cs.cell, cb.m, cb.t,
       |    list_reduce(list_transform(list_zip(cs.csub, cb.cvec),
       |      z -> (z[1] + z[2]) * (z[1] + z[2])), (a, b) -> a + b) AS n2
       |  FROM pq_csub cs JOIN pq_cb2 cb ON cs.m = cb.m),
       |pq_rn AS MATERIALIZED (
       |  SELECT i.vec_id, sqrt(list_reduce(list(nn.n2 ORDER BY i.m), (a, b) -> a + b)) AS rn
       |  FROM pq_idx i
       |  JOIN idx ic ON ic.vec_id = i.vec_id
       |  JOIN pq_n2 nn ON nn.cell = ic.cell AND i.m = nn.m AND i.code = nn.t
       |  GROUP BY i.vec_id),
       |${qidsCte("pq_")},
       |pq_base AS MATERIALIZED (
       |  SELECT vec_id, embedding, ${Dedup.sqlNorm("embedding")} AS nrm
       |  FROM embeddings),
       |pq_q AS (
       |  SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
       |  FROM pq_base WHERE vec_id IN (SELECT vec_id FROM pq_qids)),
       |pq_qsub AS (
       |  $qSlices),
       |pq_lut AS MATERIALIZED (
       |  SELECT s.query_id, c.m, c.t,
       |    list_reduce(list_transform(list_zip(c.cvec, s.sub),
       |      z -> z[1] * CAST(z[2] AS DOUBLE)), (a, b) -> a + b) AS d
       |  FROM pq_qsub s JOIN pq_cb2 c ON s.m = c.m),
       |pq_qc AS MATERIALIZED (
       |  SELECT q.query_id, c.cell,
       |    list_reduce(list_transform(list_zip(c.cvec, q.q_emb),
       |      z -> z[1] * CAST(z[2] AS DOUBLE)), (a, b) -> a + b) AS qc
       |  FROM pq_q q CROSS JOIN cent2 c),
       |pq_scored AS (
       |  SELECT l.query_id, i.vec_id AS neighbor_id,
       |    list_reduce(list(l.d ORDER BY l.m), (a, b) -> a + b) AS adc
       |  FROM pq_idx i JOIN pq_lut l ON l.m = i.m AND l.t = i.code
       |  WHERE i.vec_id <> l.query_id
       |  GROUP BY l.query_id, i.vec_id),
       |pq_r AS (
       |  SELECT s.query_id, s.neighbor_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY s.query_id
       |           ORDER BY (qq.qc + s.adc) / (r.rn * q.q_nrm) DESC, s.neighbor_id) AS BIGINT)
       |      AS ark
       |  FROM pq_scored s
       |  JOIN idx ic ON ic.vec_id = s.neighbor_id
       |  JOIN pq_qc qq ON qq.query_id = s.query_id AND qq.cell = ic.cell
       |  JOIN pq_rn r ON r.vec_id = s.neighbor_id
       |  JOIN pq_q q ON q.query_id = s.query_id),
       |pq_f AS (
       |  SELECT p.query_id, p.neighbor_id,
       |    ${Dedup.sqlDot("b.embedding", "q.q_emb")} / (b.nrm * q.q_nrm) AS cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY p.query_id
       |           ORDER BY ${Dedup.sqlDot("b.embedding", "q.q_emb")} / (b.nrm * q.q_nrm)
       |             DESC, p.neighbor_id) AS BIGINT) AS rnk
       |  FROM (SELECT query_id, neighbor_id FROM pq_r WHERE ark <= $PqShortC) p
       |  JOIN pq_base b ON b.vec_id = p.neighbor_id
       |  JOIN pq_q q ON q.query_id = p.query_id)""".stripMargin
  }

  val qAnnPqSql: String =
    s"""WITH $ivfTrainCtes,
       |$pqCtes
       |SELECT query_id, neighbor_id, rnk, cosine
       |FROM pq_f WHERE rnk <= $K
       |ORDER BY query_id, rnk""".stripMargin

  val qPqRecallSql: String =
    s"""WITH ${bruteforceCtes("bf_")},
       |$ivfTrainCtes,
       |$pqCtes,
       |$ivfadcCtes,
       |bfk AS (SELECT query_id, neighbor_id FROM bf_r WHERE rnk <= $K),
       |pqf AS (SELECT query_id, neighbor_id, 1 AS hit_f FROM pq_f WHERE rnk <= $K),
       |adck AS (SELECT query_id, neighbor_id, 1 AS hit_a FROM pq_r WHERE ark <= $K),
       |vk AS (SELECT query_id, neighbor_id, 1 AS hit_v FROM va_f WHERE rnk <= $K),
       |j AS (
       |  SELECT bfk.query_id, pqf.hit_f, adck.hit_a, vk.hit_v
       |  FROM bfk
       |  LEFT JOIN pqf ON bfk.query_id = pqf.query_id AND bfk.neighbor_id = pqf.neighbor_id
       |  LEFT JOIN adck ON bfk.query_id = adck.query_id AND bfk.neighbor_id = adck.neighbor_id
       |  LEFT JOIN vk ON bfk.query_id = vk.query_id AND bfk.neighbor_id = vk.neighbor_id)
       |SELECT query_id, COUNT(*) AS k, COUNT(hit_f) AS n_overlap,
       |  (COUNT(hit_f) * 10000) // COUNT(*) AS recall_bp,
       |  COUNT(hit_a) AS n_adc_overlap,
       |  (COUNT(hit_a) * 10000) // COUNT(*) AS adc_recall_bp,
       |  COUNT(hit_v) AS n_ivfadc_overlap,
       |  (COUNT(hit_v) * 10000) // COUNT(*) AS ivfadc_recall_bp
       |FROM j GROUP BY query_id
       |ORDER BY query_id""".stripMargin

  // ------------------------------------------------------------------
  // q_ann_ivfadc — the PERSISTED IVFADC serve as an oracle-checked row
  // (VERDICT r18 #1): cell probe (nProbe = IvfProbes) → ADC over the
  // probed cells' codes only → float point-rerank, i.e. [[ivfPqServe]]
  // registered as a `queries` entry against a session-built
  // [[buildIvfPqIndex]] index.
  // ------------------------------------------------------------------

  /** Session-scoped persisted IVF-PQ index (the [[sessionCodebook]]
    * contract extended from a model array to a model DIRECTORY): built
    * once per (session, dir) into a fresh temp root, served by every
    * subsequent [[qAnnIvfadc]]/[[qPqRecall]] invocation. Both frozen
    * models inside it come from the session caches, so the indexed
    * codes equal what any inline PQ row computes; a deployment builds
    * the index offline and amortizes further (the [[buildIvfIndex]]
    * note). [[clearModelCache]] drops the pointer (the dir itself is
    * temp garbage).
    */
  private val pqIndexCache = new graft.plans.SessionCache[String]

  private def sessionPqIndex(s: SparkSession, dir: String): String =
    pqIndexCache.getOrElseUpdate(s, dir) {
      val path = java.nio.file.Files
        .createTempDirectory("graft-ivfadc-session").toString + "/idx"
      buildIvfPqIndex(s, dir, path)
      path
    }

  /** The production ANN read (Jégou et al. 2011's IVFADC, the serve
    * half of the [[buildIvfPqIndex]] triad): per query, rank the
    * [[IvfCells]] cell centroids and keep [[IvfProbes]]; ADC-score
    * ONLY the probed cells' 16-byte codes (partition pruning at the
    * scan — nProbe/k of the index is read, AnnSpec/PlanSpec pin the
    * PartitionFilters); float-rerank exactly the per-query
    * top-[[PqRerankC]] shortlist under a pushed `vec_id IN` point
    * filter; cut at [[K]].
    *
    * vs `q_ann_pq`: same codes, same LUT arithmetic, but the ADC scan
    * covers nProbe/k of the corpus instead of all of it — the recall
    * cost of that pruning is `q_pq_recall.ivfadc_recall_bp`, beside
    * the full-scan shortlist's two columns. Fully hash-checked: the
    * oracle composes the [[qAnnIvfSql]] cell-Lloyd retrain with the
    * [[qAnnPqSql]] sub-codebook retrain and replays the serve tail.
    */
  def qAnnIvfadc(s: SparkSession, dir: String): DataFrame =
    ivfPqServe(s, dir, sessionPqIndex(s, dir))

  /** The IVFADC serve tail as CTEs (`va_` prefix) over the composed
    * [[ivfTrainCtes]] (cells: `idx`, probe ranks: `pr`) and [[pqCtes]]
    * (codes: `pq_idx`, recon norms: `pq_rn`, query LUTs: `pq_lut`)
    * chains — [[qAnnIvfadcSql]] and [[qPqRecallSql]] share it so the
    * serve row and its recall monitor cannot drift.
    */
  private def ivfadcCtes: String =
    s"""va_s AS (
       |  SELECT l.query_id, i.vec_id AS neighbor_id, ci.cell,
       |    list_reduce(list(l.d ORDER BY l.m), (a, b) -> a + b) AS adc
       |  FROM pq_idx i
       |  JOIN idx ci ON ci.vec_id = i.vec_id
       |  JOIN (SELECT query_id, cell FROM pr WHERE prk <= $IvfProbes) p
       |    ON p.cell = ci.cell
       |  JOIN pq_lut l ON l.m = i.m AND l.t = i.code AND l.query_id = p.query_id
       |  WHERE i.vec_id <> l.query_id
       |  GROUP BY l.query_id, i.vec_id, ci.cell),
       |va_r AS (
       |  SELECT s.query_id, s.neighbor_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY s.query_id
       |           ORDER BY (qq.qc + s.adc) / (r.rn * q.q_nrm) DESC, s.neighbor_id) AS BIGINT)
       |      AS ark
       |  FROM va_s s
       |  JOIN pq_qc qq ON qq.query_id = s.query_id AND qq.cell = s.cell
       |  JOIN pq_rn r ON r.vec_id = s.neighbor_id
       |  JOIN pq_q q ON q.query_id = s.query_id),
       |va_f AS (
       |  SELECT p.query_id, p.neighbor_id,
       |    ${Dedup.sqlDot("b.embedding", "q.q_emb")} / (b.nrm * q.q_nrm) AS cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY p.query_id
       |           ORDER BY ${Dedup.sqlDot("b.embedding", "q.q_emb")} / (b.nrm * q.q_nrm)
       |             DESC, p.neighbor_id) AS BIGINT) AS rnk
       |  FROM (SELECT query_id, neighbor_id FROM va_r WHERE ark <= $PqRerankC) p
       |  JOIN pq_base b ON b.vec_id = p.neighbor_id
       |  JOIN pq_q q ON q.query_id = p.query_id)""".stripMargin

  val qAnnIvfadcSql: String =
    s"""WITH $ivfTrainCtes,
       |$pqCtes,
       |$ivfadcCtes
       |SELECT query_id, neighbor_id, rnk, cosine
       |FROM va_f WHERE rnk <= $K
       |ORDER BY query_id, rnk""".stripMargin

  // ------------------------------------------------------------------
  // Per-label embedding centroids — the class-prototype / cluster-seed
  // aggregate (nearest-centroid classification, IVF seeding, drift
  // monitoring all start here), and the repo's proof that VECTOR
  // aggregation can be oracle-checked bit-exactly.
  // ------------------------------------------------------------------

  private val CentroidFp = 1048576L // 2^20

  /** Mean embedding per label, bit-reproducibly: each float component
    * is widened to double (exact), scaled by 2^20 and rounded to an
    * integer (a float's 24-bit mantissa × 2^20 always fits), summed as
    * BIGINT (associative — no FP accumulation-order drift), and divided
    * ONCE at the end: both engines perform the identical single IEEE
    * division, so the double centroid matches DuckDB to the last bit.
    *
    * Shape at scale: posexplode multiplies rows ×dim, but partial
    * aggregation collapses each map partition to |labels|·dim rows
    * before the ONE shuffle — 100 TB of vectors moves a few KB per
    * partition. (The transform-free alternative — aggregating whole
    * arrays with a zip_with fold — is an interpreted per-element lambda
    * [SNIPPETS: HOF perf] AND a non-partial aggregate; this shape keeps
    * everything codegen'd and map-combined.)
    */
  def qEmbedCentroid(s: SparkSession, dir: String): DataFrame =
    Ingest.table(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), (col("pos") + 1).as("dim"))
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(expr(s"CAST(round(CAST(v AS DOUBLE) * $CentroidFp) AS BIGINT)")).as("sum_fp"))
      .select(col("label"), col("dim"), col("n_vecs"), col("sum_fp"),
        (col("sum_fp").cast("double") /
          (col("n_vecs") * lit(CentroidFp)).cast("double")).as("centroid"))

  /** DuckDB zips parallel unnests in one SELECT — (component, ordinal)
    * pairs without a lateral join. */
  val qEmbedCentroidSql: String =
    s"""WITH ex AS (
       |  SELECT label,
       |    unnest(range(1, len(embedding) + 1)) AS dim,
       |    unnest(embedding) AS v
       |  FROM embeddings),
       |fp AS (
       |  SELECT label, dim,
       |    CAST(round(CAST(v AS DOUBLE) * $CentroidFp) AS BIGINT) AS f
       |  FROM ex)
       |SELECT label, CAST(dim AS INT) AS dim, COUNT(*) AS n_vecs,
       |  CAST(SUM(f) AS BIGINT) AS sum_fp,
       |  CAST(SUM(f) AS DOUBLE) / CAST(COUNT(*) * $CentroidFp AS DOUBLE) AS centroid
       |FROM fp GROUP BY label, dim
       |ORDER BY label, dim""".stripMargin

  /** Nearest-centroid classification (Rocchio / weak-labeling): assign
    * every embedding to the closest per-label mean by squared L2 — the
    * cluster-assignment primitive behind dataset auto-labeling and
    * embedding-space audits (confusion against the true label rides
    * along). ORACLE-CHECKED end to end, unlike the float top-k ANN
    * family: components are fixed-pointed to integers (scale
    * [[CentroidFp]]), the centroid is the INTEGER quotient sum DIV n
    * (Spark DIV and DuckDB // both truncate toward zero, verified
    * including negatives), and squared distances are exact BIGINT sums
    * (headroom: 64 dims × (2·2^20)² ≈ 2.8e14 ≪ 2^63). Argmin ties
    * break on label via the same (dist2, label) order in both engines.
    *
    * Shape at scale: centroids are a label×dim rollup of the exploded
    * corpus (partial-aggregated shuffle into a model-sized table);
    * assignment joins that table back BROADCAST (labels×dims rows — a
    * model parameter, like [[NearestCell]]'s codebook) and reduces per
    * (vec, label) with map-side combine; the final argmin window runs
    * on labels-per-vec rows. The corpus shuffles once (the explode
    * rollup), never all-pairs.
    */
  /** (vec_id, label, assigned cluster, exact integer dist2) — the
    * fixed-point nearest-centroid assignment shared by
    * [[qCentroidAssign]] (adds the confusion column) and [[qSemdedup]]
    * (uses the cluster as its pairwise-dedup cell).
    */
  /** (vec_id, label, clabel, dist2, r) with r the (dist2, clabel)
    * centroid rank per vec — r=1 is the assignment,
    * r=2 the runner-up [[qClusterQuality]]'s margin needs. */
  private def centroidRanked(s: SparkSession, dir: String): DataFrame = {
    val fp = Ingest.table(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("label"), (col("pos") + 1).as("dim"),
        expr(s"CAST(round(CAST(v AS DOUBLE) * $CentroidFp) AS BIGINT)").as("f"))
    val cent = fp.groupBy(col("label").as("clabel"), col("dim"))
      .agg(expr("sum(f) DIV count(1)").as("c"))
    val d2 = fp.join(broadcast(cent), "dim")
      .groupBy(col("vec_id"), col("label"), col("clabel"))
      .agg(sum((col("f") - col("c")) * (col("f") - col("c"))).as("dist2"))
    import org.apache.spark.sql.expressions.Window
    d2.withColumn("r", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("dist2"), col("clabel"))))
  }

  private def centroidAssignments(s: SparkSession, dir: String): DataFrame =
    centroidRanked(s, dir)
      .filter(col("r") === 1)
      .select(col("vec_id"), col("label"), col("clabel"), col("dist2"))

  def qCentroidAssign(s: SparkSession, dir: String): DataFrame =
    centroidAssignments(s, dir)
      .select(col("vec_id"), col("label").as("true_label"),
        col("clabel").as("assigned_label"), col("dist2"),
        when(col("clabel") === col("label"), 1L).otherwise(0L).as("correct"))

  /** Shared CTE prefix: the fixed-point assignment pipeline of
    * [[centroidAssignments]] in DuckDB SQL (consumed by both
    * [[qCentroidAssignSql]] and [[qSemdedupSql]]).
    */
  private val centroidAssignCtes: String =
    s"""ex AS (
       |  SELECT vec_id, label,
       |    unnest(range(1, len(embedding) + 1)) AS dim,
       |    unnest(embedding) AS v
       |  FROM embeddings),
       |fp AS (
       |  SELECT vec_id, label, dim,
       |    CAST(round(CAST(v AS DOUBLE) * $CentroidFp) AS BIGINT) AS f
       |  FROM ex),
       |cent AS (
       |  SELECT label AS clabel, dim, CAST(SUM(f) // COUNT(*) AS BIGINT) AS c
       |  FROM fp GROUP BY label, dim),
       |d2 AS (
       |  SELECT fp.vec_id, fp.label, cent.clabel,
       |    CAST(SUM((f - c) * (f - c)) AS BIGINT) AS dist2
       |  FROM fp JOIN cent ON fp.dim = cent.dim
       |  GROUP BY fp.vec_id, fp.label, cent.clabel),
       |rk AS (
       |  SELECT vec_id, label, clabel, dist2,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, clabel) AS r
       |  FROM d2)""".stripMargin

  val qCentroidAssignSql: String =
    s"""WITH $centroidAssignCtes
       |SELECT vec_id, label AS true_label, clabel AS assigned_label, dist2,
       |  CAST(CASE WHEN clabel = label THEN 1 ELSE 0 END AS BIGINT) AS correct
       |FROM rk WHERE r = 1
       |ORDER BY vec_id""".stripMargin

  /** Per-cluster quality audit over the fixed-point nearest-centroid
    * assignment: member count, mean within-cluster squared distance
    * (cohesion), misassignment count vs the true label, and the mean
    * assignment MARGIN — per vector, how much farther the runner-up
    * centroid is, as (d2nd − d1st)·1000 DIV d2nd (per-mille; the
    * multiplier stays 10³ because dist2 reaches dims·(2·Fp)² ≈ 2⁴⁸
    * and ×10⁶ would overflow BIGINT — the [[CentroidFp]] headroom
    * note). Margin ≈ 0 = the vector sits on a cluster boundary; a
    * cluster whose mean margin collapses is not separable from its
    * neighbor and its [[qSemdedup]] pruning or mix quota should not
    * be trusted. The silhouette idea reduced to the two distances the
    * assignment already computed — exact integers, no new corpus
    * pass. Vectors with no runner-up (single-centroid corpus) or a
    * zero runner-up distance carry NULL margin and are excluded from
    * the margin mean (n_margin says how many counted).
    *
    * Shape at scale: reuses [[centroidRanked]] (one corpus explode
    * rollup + broadcast centroid join); the top-2 filter and per-vec
    * fold ride the same vec_id exchange as the argmin, and the final
    * rollup is |clusters|-bounded.
    */
  def qClusterQuality(s: SparkSession, dir: String): DataFrame =
    centroidRanked(s, dir)
      .filter(col("r") <= 2)
      .groupBy(col("vec_id"), col("label"))
      .agg(
        max(when(col("r") === 1, col("clabel"))).as("cl"),
        max(when(col("r") === 1, col("dist2"))).as("d2a"),
        max(when(col("r") === 2, col("dist2"))).as("d2b"))
      .withColumn("margin_pml",
        expr("CASE WHEN d2b IS NULL OR d2b = 0 THEN NULL " +
          "ELSE ((d2b - d2a) * 1000) DIV d2b END"))
      .groupBy(col("cl").as("cluster"))
      .agg(
        count(lit(1)).as("n_vecs"),
        expr("sum(d2a) DIV count(1)").as("mean_within"),
        sum(when(col("label") =!= col("cl"), 1L).otherwise(0L)).as("n_misassigned"),
        count(col("margin_pml")).as("n_margin"),
        sum(col("margin_pml")).as("sum_margin"))
      .select(col("cluster"), col("n_vecs"), col("mean_within"), col("n_misassigned"),
        col("n_margin"),
        expr("CASE WHEN n_margin = 0 THEN NULL ELSE sum_margin DIV n_margin END")
          .as("mean_margin_pml"))

  val qClusterQualitySql: String =
    s"""WITH $centroidAssignCtes,
       |top2 AS (
       |  SELECT vec_id, label,
       |    MAX(CASE WHEN r = 1 THEN clabel END) AS cl,
       |    MAX(CASE WHEN r = 1 THEN dist2 END) AS d2a,
       |    MAX(CASE WHEN r = 2 THEN dist2 END) AS d2b
       |  FROM rk WHERE r <= 2 GROUP BY vec_id, label),
       |m AS (
       |  SELECT vec_id, label, cl, d2a,
       |    CASE WHEN d2b IS NULL OR d2b = 0 THEN NULL
       |         ELSE ((d2b - d2a) * 1000) // d2b END AS margin_pml
       |  FROM top2)
       |SELECT cl AS cluster,
       |  COUNT(*) AS n_vecs,
       |  CAST(CAST(SUM(d2a) AS BIGINT) // COUNT(*) AS BIGINT) AS mean_within,
       |  CAST(SUM(CASE WHEN label <> cl THEN 1 ELSE 0 END) AS BIGINT) AS n_misassigned,
       |  COUNT(margin_pml) AS n_margin,
       |  CASE WHEN COUNT(margin_pml) = 0 THEN NULL
       |       ELSE CAST(CAST(SUM(margin_pml) AS BIGINT) // COUNT(margin_pml) AS BIGINT)
       |  END AS mean_margin_pml
       |FROM m GROUP BY cl
       |ORDER BY cl""".stripMargin

  /** Embedding-space anomaly screen: per cluster, the robust
    * (median/MAD) fence on squared distance to the assigned centroid,
    * and how many vectors sit beyond 3 MADs — the corrupt-embedding /
    * wrong-space detector (a batch of zeroed, truncated, or
    * differently-normalized vectors lands far from every centroid and
    * trips this before it poisons [[qSemdedup]] cells or ANN
    * recall). The embedding twin of [[Audit.qMadOutlier]], sharing
    * its exact interpolated weighted-median device; d2 ≤ dims·(2·Fp)²
    * ≈ 2⁴⁸ < 2⁵³ keeps every median/deviation bit-exact in DOUBLE.
    *
    * Shape at scale: distances come from the audited centroid
    * pipeline (one corpus explode rollup + broadcast join); the
    * value→count histogram is near-per-vector for continuous d2, so
    * the median's per-cluster window sort is bounded by cluster
    * membership — with production cluster counts (k ≫ cores) the
    * sorts parallelize per cluster; the deviation pass reuses the
    * materialized histogram, and everything after is cluster-sized.
    */
  def qEmbedOutlier(s: SparkSession, dir: String): DataFrame = {
    val hist = centroidRanked(s, dir).filter(col("r") === 1)
      .groupBy(col("clabel").as("flag"), col("dist2").as("v"))
      .agg(count(lit(1)).as("c"))
      .materialized // median, deviation histogram and fence all consume it
    val med = Audit.weightedMedian(hist)
      .select(col("flag"), col("med").as("med_d2"), col("n").as("n_vecs"))
    val devHist = hist.join(broadcast(med), "flag")
      .groupBy(col("flag"), abs(col("v") - col("med_d2")).as("v"))
      .agg(sum("c").as("c"))
      .materialized
    val mad = Audit.weightedMedian(devHist).select(col("flag"), col("med").as("mad_d2"))
    val outliers = devHist.join(broadcast(mad), "flag")
      .groupBy(col("flag"))
      .agg(sum(when(col("v") > col("mad_d2") * 3, col("c")).otherwise(lit(0L)))
        .as("n_outliers"))
    med.join(mad, "flag").join(outliers, "flag")
      .select(col("flag").as("cluster"), col("n_vecs"),
        col("med_d2"), col("mad_d2"), col("n_outliers"))
  }

  val qEmbedOutlierSql: String =
    s"""WITH $centroidAssignCtes,
       |a AS (SELECT vec_id, clabel, dist2 FROM rk WHERE r = 1),
       |med AS (
       |  SELECT clabel AS flag, COUNT(*) AS n_vecs,
       |    quantile_cont(dist2, 0.5) AS med_d2
       |  FROM a GROUP BY clabel),
       |dev AS (
       |  SELECT a.clabel AS flag, abs(a.dist2 - m.med_d2) AS d
       |  FROM a JOIN med m ON a.clabel = m.flag),
       |mad AS (SELECT flag, quantile_cont(d, 0.5) AS mad_d2 FROM dev GROUP BY flag)
       |SELECT m.flag AS cluster, m.n_vecs, m.med_d2, mad.mad_d2,
       |  CAST(COALESCE(SUM(CASE WHEN dev.d > mad.mad_d2 * 3 THEN 1 END), 0) AS BIGINT)
       |    AS n_outliers
       |FROM med m JOIN mad ON m.flag = mad.flag
       |           JOIN dev ON dev.flag = m.flag
       |GROUP BY m.flag, m.n_vecs, m.med_d2, mad.mad_d2
       |ORDER BY cluster""".stripMargin

  private val ClusterKwK = 10
  private val ClusterKwFp = 1000000L

  /** c-TF-IDF cluster labeling (the BERTopic device, Grootendorst
    * 2022, arXiv:2203.05794): name each embedding-space cluster by its
    * most DISTINCTIVE terms — term frequency within the cluster's
    * documents over the number of clusters the term appears in (the
    * class-based idf), top-[[ClusterKwK]] per cluster. This is the
    * human-readable half of the clustering shelf: [[qCentroidAssign]]
    * says which cluster a doc is in, [[qSemdedup]] prunes within it,
    * this row says what the cluster IS — the report a curation team
    * reads before deciding to keep, down-weight, or drop a cluster.
    * Clusters are the same fixed-point nearest-centroid assignment the
    * rest of the shelf uses (exact integer dist2, bit-reproducible);
    * the doc side joins on doc_id = vec_id (the corpus contract).
    * Scoring is the [[TextOps.qTfidfKeywords]] integer device at
    * cluster granularity: score_fp = tf_c·10⁶ DIV cdf.
    *
    * Shape at scale: assignment is the audited centroid pipeline (one
    * posexplode rollup + broadcast argmin); the doc join is ONE
    * co-partitioned doc_id equi-join BEFORE the token explode (a
    * token-side join would multiply the probe by avg doc length); term
    * counts partial-aggregate into a |clusters|×vocab-bounded table,
    * its cluster-df is a rollup of that same table, and the rank
    * window runs on the MODEL-sized count table, never corpus rows
    * (the [[TextOps.qBigramTopk]] precedent).
    */
  /** The (cluster, term) count table — exposed un-materialized so
    * PlanSpec can pin its shape (the query materializes it: both the
    * score join and its cluster-df rollup consume it).
    */
  private[graft] def clusterTermCounts(s: SparkSession, dir: String): DataFrame = {
    val assign = centroidAssignments(s, dir)
      .select(col("vec_id").as("doc_id"), col("clabel").as("cluster"))
    Ingest.table(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .join(assign, "doc_id")
      .select(col("cluster"),
        explode(org.apache.spark.sql.functions.split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("cluster"), col("w"))
      .agg(count(lit(1)).as("tf_c"))
  }

  def qClusterKeywords(s: SparkSession, dir: String): DataFrame = {
    val tf = clusterTermCounts(s, dir).materialized
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("cdf"))
    tf.join(df, "w")
      .select(col("cluster"), col("w").as("term"), col("tf_c"), col("cdf"),
        expr(s"(tf_c * $ClusterKwFp) DIV cdf").as("score_fp"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("cluster").orderBy(col("score_fp").desc, col("term"))))
      .filter(col("rk") <= ClusterKwK)
      .select(col("cluster"), col("rk").cast("long").as("rk"), col("term"),
        col("tf_c"), col("cdf"), col("score_fp"))
  }

  val qClusterKeywordsSql: String =
    s"""WITH $centroidAssignCtes,
       |asg AS (SELECT vec_id AS doc_id, clabel AS cluster FROM rk WHERE r = 1),
       |tok AS (
       |  SELECT a.cluster, unnest(string_split(d.text, ' ')) AS w
       |  FROM documents d JOIN asg a ON d.doc_id = a.doc_id),
       |tf AS (
       |  SELECT cluster, w, COUNT(*) AS tf_c
       |  FROM tok WHERE len(w) > 0 GROUP BY cluster, w),
       |cdf AS (SELECT w, COUNT(*) AS cdf FROM tf GROUP BY w),
       |sc AS (
       |  SELECT tf.cluster, tf.w AS term, tf.tf_c, cdf.cdf,
       |    (tf.tf_c * $ClusterKwFp) // cdf.cdf AS score_fp
       |  FROM tf JOIN cdf ON tf.w = cdf.w),
       |rkd AS (
       |  SELECT cluster, term, tf_c, cdf, score_fp,
       |    ROW_NUMBER() OVER (PARTITION BY cluster
       |                       ORDER BY score_fp DESC, term) AS rk
       |  FROM sc)
       |SELECT cluster, rk, term, tf_c, cdf, score_fp
       |FROM rkd WHERE rk <= $ClusterKwK
       |ORDER BY cluster, rk""".stripMargin

  private val SemTau = 0.30
  private val SemClusterCap = 1000

  /** SemDeDup-style semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space, then prune
    * within-cluster pairs whose cosine exceeds [[SemTau]], keeping the
    * CENTROID-CLOSEST member of each hot pair (ties to the smaller
    * vec_id) — the deterministic variant of the paper's keep rule.
    * Clusters here are the oracle-checked fixed-point label centroids
    * ([[centroidAssignments]] — exact integer dist2, so the keep rank
    * is bit-reproducible); a production run swaps in the IVF codebook
    * cells ([[trainCodebook]]) at a k chosen so n/k keeps the
    * within-cell join tractable — that k-vs-cluster-width trade IS the
    * SemDeDup scaling story, and the [[SemClusterCap]] guard (same
    * device as qDedupEmbedding's hot-bucket cap) bounds the damage of
    * a degenerate cell. Pair verdicts are pair-local (A≈B marks the
    * worse of the two; transitive families are [[qDedupClusters]]'
    * job).
    *
    * Shape at scale: assignment is the one posexplode rollup +
    * broadcast argmin (corpus shuffles once); the pairwise stage is an
    * equi self-join on the cluster key — quadratic only in cluster
    * width, which k controls. Fully hash-checked: cluster ids and
    * dist2 are exact integers, cosines are the bit-exact
    * [[Dedup.sqlDot]] mirror.
    */
  def qSemdedup(s: SparkSession, dir: String): DataFrame = {
    val assign = centroidAssignments(s, dir)
      .select(col("vec_id"), col("clabel").as("cluster"), col("dist2"))
    // materialized: both self-join sides AND the final verdict select
    // consume this table — unmaterialized, the whole explode + argmin
    // assignment pipeline re-derives three times
    val base = Ingest.table(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), Dedup.norm("embedding").as("nrm"))
      .join(assign, Seq("vec_id"))
      .withColumn("csize", count(lit(1)).over(Window.partitionBy("cluster")))
      .materialized
    val capped = base.filter(col("csize") <= SemClusterCap)
    val a = capped.select(col("vec_id").as("id_a"), col("embedding").as("e_a"),
      col("nrm").as("n_a"), col("cluster"), col("dist2").as("d_a"))
    val b = capped.select(col("vec_id").as("id_b"), col("embedding").as("e_b"),
      col("nrm").as("n_b"), col("cluster"), col("dist2").as("d_b"))
    val verdict = a.join(b, Seq("cluster")).filter(col("id_a") =!= col("id_b"))
      .withColumn("cosine", Dedup.dotExpr("e_a", "e_b") / (col("n_a") * col("n_b")))
      .filter(col("cosine") >= SemTau)
      .groupBy(col("id_a").as("vec_id"))
      .agg(
        count(lit(1)).as("n_sem_mates"),
        max(col("cosine")).as("max_cosine"),
        // dropped iff some hot mate outranks this vector on
        // (dist2, vec_id) — exactly one side of every pair drops
        max(when(col("d_b") < col("d_a") ||
            (col("d_b") === col("d_a") && col("id_b") < col("id_a")), 1L)
          .otherwise(0L)).as("worse"))
    base.select(col("vec_id"), col("cluster"), col("dist2"))
      .join(verdict, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"), col("dist2"),
        coalesce(col("n_sem_mates"), lit(0L)).as("n_sem_mates"),
        col("max_cosine"),
        coalesce(col("worse") === 1L, lit(false)).as("is_dropped"))
  }

  val qSemdedupSql: String =
    s"""WITH $centroidAssignCtes,
       |asg AS (SELECT vec_id, clabel AS cluster, dist2 FROM rk WHERE r = 1),
       |base AS (
       |  SELECT e.vec_id, e.embedding, ${Dedup.sqlNorm("e.embedding")} AS nrm,
       |    a.cluster, a.dist2
       |  FROM embeddings e JOIN asg a ON e.vec_id = a.vec_id),
       |sized AS (
       |  SELECT *, COUNT(*) OVER (PARTITION BY cluster) AS csize FROM base),
       |hot AS (
       |  SELECT a.vec_id AS id_a, a.dist2 AS d_a, b.vec_id AS id_b, b.dist2 AS d_b,
       |    ${Dedup.sqlDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
       |  FROM (SELECT * FROM sized WHERE csize <= $SemClusterCap) a
       |  JOIN (SELECT * FROM sized WHERE csize <= $SemClusterCap) b
       |    ON a.cluster = b.cluster AND a.vec_id <> b.vec_id),
       |verdict AS (
       |  SELECT id_a AS vec_id, COUNT(*) AS n_sem_mates, MAX(cosine) AS max_cosine,
       |    MAX(CASE WHEN d_b < d_a OR (d_b = d_a AND id_b < id_a)
       |             THEN 1 ELSE 0 END) AS worse
       |  FROM hot WHERE cosine >= $SemTau
       |  GROUP BY id_a)
       |SELECT s.vec_id, s.cluster, s.dist2,
       |  CAST(COALESCE(v.n_sem_mates, 0) AS BIGINT) AS n_sem_mates,
       |  v.max_cosine,
       |  COALESCE(v.worse = 1, false) AS is_dropped
       |FROM sized s LEFT JOIN verdict v ON s.vec_id = v.vec_id
       |ORDER BY s.vec_id""".stripMargin

  /** Per-dimension embedding health audit: count, zero count, min/max
    * component, and the bit-exact fixed-point mean per dim — the first
    * check on a new embedding export (dead dimensions read as n_zero ≈
    * n_vecs or a collapsed min/max range; a shifted encoder shows up
    * as drifted means). Companion to [[qEmbedCentroid]] (same
    * fixed-point contract) but per-DIMENSION over the whole corpus,
    * label-free.
    *
    * Shape at scale: posexplode + ONE partial-aggregated shuffle into
    * a dim-sized key space (64 keys) — every map partition reduces to
    * |dims| rows before moving. min/max of floats widened to double
    * are order-invariant; the mean divides the exact BIGINT sum once.
    */
  def qEmbedStats(s: SparkSession, dir: String): DataFrame =
    Ingest.table(s, dir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .select((col("pos") + 1).as("dim"), col("v").cast("double").as("v"))
      .groupBy(col("dim"))
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(when(col("v") === 0d, 1L).otherwise(0L)).as("n_zero"),
        min(col("v")).as("v_min"),
        max(col("v")).as("v_max"),
        sum(expr(s"CAST(round(v * $CentroidFp) AS BIGINT)")).as("sum_fp"))
      .withColumn("mean",
        col("sum_fp").cast("double") / (col("n_vecs") * lit(CentroidFp)).cast("double"))

  val qEmbedStatsSql: String =
    s"""WITH ex AS (
       |  SELECT unnest(range(1, len(embedding) + 1)) AS dim,
       |    CAST(unnest(embedding) AS DOUBLE) AS v
       |  FROM embeddings)
       |SELECT CAST(dim AS INT) AS dim, COUNT(*) AS n_vecs,
       |  CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       |  MIN(v) AS v_min, MAX(v) AS v_max,
       |  CAST(SUM(CAST(round(v * $CentroidFp) AS BIGINT)) AS BIGINT) AS sum_fp,
       |  CAST(SUM(CAST(round(v * $CentroidFp) AS BIGINT)) AS DOUBLE)
       |    / CAST(COUNT(*) * $CentroidFp AS DOUBLE) AS mean
       |FROM ex GROUP BY dim
       |ORDER BY dim""".stripMargin

  /** Self-auditing ANN: per-query recall of the LSH scale path against
    * the exact brute-force baseline — the number an ANN deployment
    * watches continuously (recall silently decays as the corpus
    * drifts away from the index's trained/assumed distribution; this
    * row makes the decay a queryable table instead of a spec-time
    * assertion). recall_bp is fixed-point basis points of top-[[K]]
    * overlap. AnnSpec pins thresholds; this row surfaces the same
    * measurement through the driver's rows-check.
    *
    * Shape at scale: both sides are the already-audited top-k plans
    * (broadcast probes, no corpus self-shuffle); the overlap join is
    * queries×k-sized — negligible.
    */
  def qAnnRecall(s: SparkSession, dir: String): DataFrame = {
    val bf = qAnnBruteforce(s, dir).select(col("query_id"), col("neighbor_id"))
    val lsh = qAnnLsh(s, dir)
      .select(col("query_id").as("q2"), col("neighbor_id").as("n2"))
    bf.join(lsh, col("query_id") === col("q2") && col("neighbor_id") === col("n2"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k"), count(col("n2")).as("n_overlap"))
      .select(col("query_id"), col("k"), col("n_overlap"),
        expr("(n_overlap * 10000) DIV k").as("recall_bp"))
  }

  /** Hybrid retrieval — the RAG serving pattern: vector recall
    * (cross-polytope LSH ANN) over-fetches, then each hit joins its
    * document metadata and is FILTERED by the corpus-build quality
    * verdict before the final per-query cut. Retrieval quality
    * compounds: a vector index over unfiltered text serves spam with
    * perfect cosine similarity — the filter belongs INSIDE the
    * serving path, not just the training build.
    *
    * Shape at scale: ANN candidates are queries×k-sized; the verdict
    * join probes them AGAINST the doc-keyed quality table (AQE
    * broadcasts the candidate side — the corpus-sized verdict table
    * never reshuffles for a lookup this small); the final re-rank is
    * a window over ≤k rows per query.
    */
  def qHybridSearch(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hits = qAnnLsh(s, dir)
    val quality = graft.operators.TextOps.qQualityScore(s, dir)
      .select(col("doc_id").as("neighbor_id"), col("is_keep"), col("n_words"))
    hits.join(quality, Seq("neighbor_id"), "left")
      .filter(col("is_keep") === true)
      .withColumn("rnk_kept", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rnk_kept") <= 3)
      .select(col("query_id"), col("rnk_kept"), col("neighbor_id"),
        col("cosine"), col("n_words"))
  }

  // Multi-probe counts for the LSH recall curve: 1, 2, the deployed
  // LshProbes (3), and a doubling beyond it.
  private val LshProbeCurve = Seq(1, 2, LshProbes, 6)

  /** LSH multi-probe recall curve — the [[qAnnProbeCurve]] sibling for
    * the data-OBLIVIOUS index family: recall@[[K]] vs the exact
    * baseline per probed-vertex count. Probing costs queries×tables×p
    * broadcast rows and opens proportionally more candidate buckets,
    * so this row prices multi-probe the way the IVF curve prices
    * nProbe — together the two curves are the tuning story for both
    * standard ANN shelves. Fully hash-checked off the shared
    * [[lshCtes]] key chain (one rotation pass serves every probe
    * point — the oracle's `ranked` CTE is computed once).
    *
    * Shape at scale: each point re-joins the SAME bucketed corpus
    * (map-only keys) against a p-times-larger broadcast probe list;
    * the rotation/key work is shared inside one statement in the
    * oracle and amortized by the codegen key expression in Spark.
    */
  def qLshProbeCurve(s: SparkSession, dir: String): DataFrame = {
    import graft.plans.Materialize.MaterializeOps
    val bfk = qAnnBruteforce(s, dir)
      .select(col("query_id"), col("neighbor_id")).materialized
    val nb = bfk.agg(count(lit(1)).as("n_base"))
    // r21 OPTIMIZATION (guide §2.4 — same outputs, one candidate pass
    // instead of four): multi-probe key lists are PREFIX-NESTED (the
    // kernel emits probe ranks in order at index t·probes + p), so the
    // probes=p candidate set is exactly the max-probe pairs whose
    // minimal recruiting probe rank ≤ p. One bucketed join at the
    // curve's max probe count tags each pair with that rank; each
    // curve point is then a filter + per-query top-K window over the
    // checkpointed pair table (all four windows share its tiny scan)
    // instead of its own corpus-bucketing join + distinct + window.
    val maxP = LshProbeCurve.max
    val (corpus, queries) = split(s, dir)
    val bucketed = corpus
      .select(col("vec_id"), col("embedding"), col("nrm"),
        explode(graft.functions.VectorFunctions
          .xpolyKeys(col("embedding"), LshSeed, LshTables, Dim, probes = 1)).as("bkey"))
    val probed = queries
      .select(col("query_id"), col("q_emb"), col("q_nrm"),
        posexplode(graft.functions.VectorFunctions
          .xpolyKeys(col("q_emb"), LshSeed, LshTables, Dim, maxP)).as(Seq("pidx", "bkey")))
      .select(col("query_id"), col("q_emb"), col("q_nrm"), col("bkey"),
        (col("pidx") % maxP + 1).as("prank"))
    val pairs = bucketed.join(broadcast(probed), Seq("bkey"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("prank"),
        (Dedup.dotExpr("embedding", "q_emb") / (col("nrm") * col("q_nrm"))).as("cosine"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(min(col("prank")).as("mpr"), max(col("cosine")).as("cosine"))
      .materialized
    LshProbeCurve.map { p =>
      pairs.filter(col("mpr") <= p)
        .withColumn("rnk", row_number().over(
          Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))))
        .filter(col("rnk") <= K)
        .select(col("query_id"), col("neighbor_id"))
        .join(bfk, Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(p.toLong).as("n_probes"), col("n_hits"))
    }.reduce(_ unionByName _)
      .crossJoin(broadcast(nb))
      .select(col("n_probes"), col("n_base").as("n_baseline"), col("n_hits"),
        expr("(n_hits * 1000000) DIV n_base").as("recall_ppm"))
  }

  /** Oracle for [[qLshProbeCurve]]: the shared key chain, one
    * [[lshServeCtes]] tail per probe point, the brute-force baseline,
    * exact hit joins — the [[qAnnProbeCurveSql]] device on the LSH
    * shelf.
    */
  val qLshProbeCurveSql: String = {
    val serves = LshProbeCurve.map(p => lshServeCtes(s"p$p", p)).mkString(",\n")
    val hits = LshProbeCurve.map { p =>
      s"""h$p AS (
         |  SELECT CAST($p AS BIGINT) AS n_probes, CAST(COUNT(*) AS BIGINT) AS n_hits
         |  FROM (SELECT query_id, neighbor_id FROM rp$p WHERE rnk <= $K) lv
         |  JOIN bfk USING (query_id, neighbor_id))""".stripMargin
    }.mkString(",\n")
    val union = LshProbeCurve.map(p => s"SELECT * FROM h$p").mkString("\n    UNION ALL ")
    s"""WITH $lshCtes,
       |$serves,
       |bfscored AS (
       |  SELECT query_id, vec_id AS neighbor_id,
       |    ${Dedup.sqlDot("embedding", "q_emb")} / (nrm * q_nrm) AS cosine
       |  FROM base CROSS JOIN q
       |  WHERE vec_id <> query_id),
       |bfr AS (
       |  SELECT query_id, neighbor_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |           ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rnk
       |  FROM bfscored),
       |bfk AS (SELECT query_id, neighbor_id FROM bfr WHERE rnk <= $K),
       |nq AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_base FROM bfk),
       |$hits
       |SELECT n_probes, nq.n_base AS n_baseline, n_hits,
       |  (n_hits * 1000000) // nq.n_base AS recall_ppm
       |FROM ($union) CROSS JOIN nq
       |ORDER BY n_probes""".stripMargin
  }

  /** Oracle for [[qHybridSearch]] — promoted from rows-only (r14, the
    * same program as the [[qAnnRecallSql]] promotion): the shared
    * [[lshCtes]] chain joined against the [[TextOps.qQualityScoreSql]]
    * verdict, refiltered and re-ranked — the full RAG serving path in
    * one engine-exact statement.
    */
  val qHybridSearchSql: String = {
    val qual = graft.operators.TextOps.qQualityScoreBody
    s"""WITH $lshCtes,
       |hits AS (SELECT query_id, neighbor_id, cosine FROM r WHERE rnk <= $K),
       |qual AS ($qual),
       |kept AS (
       |  SELECT h.query_id, h.neighbor_id, h.cosine, qu.n_words,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY h.query_id
       |           ORDER BY h.cosine DESC, h.neighbor_id) AS INTEGER) AS rnk_kept
       |  FROM hits h JOIN qual qu ON qu.doc_id = h.neighbor_id AND qu.is_keep)
       |SELECT query_id, rnk_kept, neighbor_id, cosine, n_words
       |FROM kept WHERE rnk_kept <= 3
       |ORDER BY query_id, rnk_kept""".stripMargin
  }

  /** RRF dampening constant (Cormack et al. 2009's k = 60). */
  private val RrfK0 = 60
  private val RrfScale = 1000000L

  /** Reciprocal-rank fusion of two retrievers — the ensemble device
    * every hybrid retrieval stack ends with, as an ORACLE-CHECKED
    * member of the hybrid family (q_hybrid_search composes rows-only
    * programs; this one is exact end to end). Retriever A ranks by
    * COSINE (norm-invariant), retriever B by raw DOT product
    * (magnitude-weighted) — genuinely different rankings wherever
    * vector norms vary — and each neighbor in either top-[[K]] scores
    * Σ [[RrfScale]] DIV ([[RrfK0]] + rank): integer arithmetic, so
    * the fused ranking is bit-reproducible even though it fuses
    * float-scored lists (the ranks themselves are pinned by the
    * bit-exact sequential-fold cosine/dot device).
    *
    * Shape at scale: ONE scored pass (the broadcast-query crossJoin
    * the brute-force baseline already pays — a production stack feeds
    * LSH/IVF candidate lists instead, same fusion), both rank windows
    * ride the SAME query_id exchange (two Window nodes, one shuffle),
    * and the fused cut is per-query top-[[K]].
    */
  def qRrfFusion(s: SparkSession, dir: String): DataFrame = {
    val (corpus, queries) = split(s, dir)
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        Dedup.dotExpr("embedding", "q_emb").as("dot"),
        (col("nrm") * col("q_nrm")).as("nn"))
      .withColumn("cosine", col("dot") / col("nn"))
    val wCos = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    val wDot = Window.partitionBy("query_id").orderBy(col("dot").desc, col("neighbor_id"))
    val wFused = Window.partitionBy("query_id").orderBy(col("rrf_fp").desc, col("neighbor_id"))
    scored
      .withColumn("ra", row_number().over(wCos).cast("long"))
      .withColumn("rb", row_number().over(wDot).cast("long"))
      .filter(col("ra") <= K || col("rb") <= K)
      .withColumn("rrf_fp",
        when(col("ra") <= K, expr(s"$RrfScale DIV (${RrfK0}L + ra)")).otherwise(0L)
          + when(col("rb") <= K, expr(s"$RrfScale DIV (${RrfK0}L + rb)")).otherwise(0L))
      .withColumn("fused_rnk", row_number().over(wFused).cast("long"))
      .filter(col("fused_rnk") <= K)
      .select(col("query_id"), col("fused_rnk"), col("neighbor_id"), col("rrf_fp"))
  }

  val qRrfFusionSql: String =
    s"""WITH base AS (
       |  SELECT vec_id, embedding, ${Dedup.sqlNorm("embedding")} AS nrm
       |  FROM embeddings),
       |${qidsCte("")},
       |q AS (
       |  SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
       |  FROM base WHERE vec_id IN (SELECT vec_id FROM qids)),
       |scored AS (
       |  SELECT query_id, vec_id AS neighbor_id,
       |    ${Dedup.sqlDot("embedding", "q_emb")} AS dot,
       |    (nrm * q_nrm) AS nn
       |  FROM base CROSS JOIN q
       |  WHERE vec_id <> query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot / nn DESC, neighbor_id) AS ra,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rb
       |  FROM scored),
       |fused AS (
       |  SELECT query_id, neighbor_id,
       |    (CASE WHEN ra <= $K THEN $RrfScale // ($RrfK0 + ra) ELSE 0 END
       |     + CASE WHEN rb <= $K THEN $RrfScale // ($RrfK0 + rb) ELSE 0 END) AS rrf_fp
       |  FROM ranked WHERE ra <= $K OR rb <= $K),
       |cut AS (
       |  SELECT query_id, neighbor_id, rrf_fp,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf_fp DESC, neighbor_id) AS fused_rnk
       |  FROM fused)
       |SELECT query_id, fused_rnk, neighbor_id, rrf_fp
       |FROM cut WHERE fused_rnk <= $K
       |ORDER BY query_id, fused_rnk""".stripMargin

  /** Vector-norm histogram — the corrupted-export screen
    * ([[qEmbedStats]]'s per-vector sibling): zeroed, clipped or
    * double-scaled vectors land in histogram bins far from the
    * corpus mode. The squared norm is an EXACT integer (components
    * fixed-pointed at [[CentroidFp]], squares summed as BIGINT — the
    * [[qCentroidAssign]] arithmetic; headroom 64·(2·2^20)² ≪ 2^63),
    * binned by integral DIV — bit-identical cross-engine, so this
    * float-derived audit is fully ORACLE-CHECKED.
    *
    * Shape at scale: posexplode + per-vector partial aggregate (one
    * corpus shuffle on vec_id), then the bounded histogram rollup.
    */
  def qNormHist(s: SparkSession, dir: String): DataFrame = {
    val binW = CentroidFp * CentroidFp // norm² fixed bin: 1.0 in float units
    Ingest.table(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"),
        expr(s"CAST(round(CAST(v AS DOUBLE) * $CentroidFp) AS BIGINT)").as("f"))
      .groupBy(col("vec_id"))
      .agg(sum(col("f") * col("f")).as("norm2_fp"))
      .groupBy(expr(s"norm2_fp DIV $binW").as("norm2_bin"))
      .agg(
        count(lit(1)).as("n_vecs"),
        min("norm2_fp").as("min_norm2_fp"),
        max("norm2_fp").as("max_norm2_fp"))
  }

  val qNormHistSql: String = {
    val binW = CentroidFp * CentroidFp
    s"""WITH ex AS (
       |  SELECT vec_id,
       |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * $CentroidFp) AS BIGINT) AS f
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, CAST(SUM(f * f) AS BIGINT) AS norm2_fp
       |  FROM ex GROUP BY vec_id)
       |SELECT norm2_fp // $binW AS norm2_bin, COUNT(*) AS n_vecs,
       |  MIN(norm2_fp) AS min_norm2_fp, MAX(norm2_fp) AS max_norm2_fp
       |FROM n GROUP BY 1
       |ORDER BY norm2_bin""".stripMargin
  }

  /** Embedding-space DRIFT audit: the corpus split into two halves by
    * vec_id parity (the stand-in for "yesterday's export vs today's"),
    * per-label centroids computed for each half in the
    * [[CentroidFp]] fixed point, and the squared L2 gap between the
    * two half-centroids reported per label. A re-run export whose
    * encoder drifted (or whose pooling changed) moves every centroid;
    * this is the model-sized screen that catches it before a 100 TB
    * re-embed lands in production — the embedding sibling of
    * [[graft.operators.Audit]]'s qKsDrift.
    *
    * Bit-exact by the [[qCentroidAssign]] rules: components
    * fixed-pointed, half-centroids are INTEGER quotients
    * (sum DIV count — both engines truncate toward zero), the gap an
    * exact BIGINT sum of squared quotient deltas (headroom: dims ×
    * (2·2²⁰)² ≪ 2⁶³). The only IEEE op is the final unit rescale.
    * Degenerate halves (a label present in one parity only) keep the
    * query total via greatest(n, 1) + COALESCE — both engines agree.
    *
    * Shape at scale: ONE corpus pass — the parity split rides as a
    * grouping key beside (label, dim) with conditional aggregation, so
    * there is no self-join of two filtered scans; the dist2 rollup
    * runs on the label×dim model table.
    */
  def qCentroidShift(s: SparkSession, dir: String): DataFrame =
    Ingest.table(s, dir, "embeddings")
      .select(col("label"), (col("vec_id") % 2).as("half"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("label"), col("half"), col("pos"),
        expr(s"CAST(round(CAST(v AS DOUBLE) * $CentroidFp) AS BIGINT)").as("f"))
      .groupBy(col("label"), col("pos"))
      .agg(
        sum(when(col("half") === 0, 1L).otherwise(0L)).as("n_a"),
        coalesce(sum(when(col("half") === 0, col("f"))), lit(0L)).as("s_a"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("n_b"),
        coalesce(sum(when(col("half") === 1, col("f"))), lit(0L)).as("s_b"))
      .select(col("label"), col("n_a"), col("n_b"),
        (expr("s_a DIV greatest(n_a, 1)") - expr("s_b DIV greatest(n_b, 1)")).as("dq"))
      .groupBy(col("label"))
      .agg(
        max("n_a").as("n_a"),
        max("n_b").as("n_b"),
        sum(col("dq") * col("dq")).as("dist2_fp"))
      .select(col("label"), col("n_a"), col("n_b"), col("dist2_fp"),
        (col("dist2_fp").cast("double") /
          lit((CentroidFp * CentroidFp).toDouble)).as("shift_sq"))

  val qCentroidShiftSql: String =
    s"""WITH ex AS (
       |  SELECT label, vec_id % 2 AS half,
       |    unnest(range(1, len(embedding) + 1)) AS dim,
       |    unnest(embedding) AS v
       |  FROM embeddings),
       |fp AS (
       |  SELECT label, half, dim,
       |    CAST(round(CAST(v AS DOUBLE) * $CentroidFp) AS BIGINT) AS f
       |  FROM ex),
       |g AS (
       |  SELECT label, dim,
       |    CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(COALESCE(SUM(CASE WHEN half = 0 THEN f END), 0) AS BIGINT) AS s_a,
       |    CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(COALESCE(SUM(CASE WHEN half = 1 THEN f END), 0) AS BIGINT) AS s_b
       |  FROM fp GROUP BY label, dim),
       |d AS (
       |  SELECT label, n_a, n_b,
       |    s_a // greatest(n_a, 1) - s_b // greatest(n_b, 1) AS dq
       |  FROM g)
       |SELECT label, MAX(n_a) AS n_a, MAX(n_b) AS n_b,
       |  CAST(SUM(dq * dq) AS BIGINT) AS dist2_fp,
       |  CAST(CAST(SUM(dq * dq) AS BIGINT) AS DOUBLE)
       |    / ${(CentroidFp * CentroidFp).toDouble} AS shift_sq
       |FROM d GROUP BY label
       |ORDER BY label""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cluster_quality" -> qClusterQuality _,
    "q_embed_outlier"   -> qEmbedOutlier _,
    "q_norm_hist"       -> qNormHist _,
    "q_centroid_shift"  -> qCentroidShift _,
    "q_hybrid_search"   -> qHybridSearch _,
    "q_rrf_fusion"      -> qRrfFusion _,
    "q_ann_recall"      -> qAnnRecall _,
    "q_semdedup"        -> qSemdedup _,
    "q_quant_recall"    -> qQuantRecall _,
    "q_embed_stats"     -> qEmbedStats _,
    "q_centroid_assign" -> qCentroidAssign _,
    "q_cluster_keywords" -> qClusterKeywords _,
    "q_ann_bruteforce" -> qAnnBruteforce _,
    "q_ann_lsh"        -> qAnnLsh _,
    "q_ann_ivf"        -> qAnnIvf _,
    "q_ann_probe_curve" -> qAnnProbeCurve _,
    "q_lsh_probe_curve" -> qLshProbeCurve _,
    "q_ann_quantized"  -> qAnnQuantized _,
    "q_ann_pq"         -> qAnnPq _,
    "q_ann_ivfadc"     -> qAnnIvfadc _,
    "q_pq_recall"      -> qPqRecall _,
    "q_embed_centroid" -> qEmbedCentroid _
  )

  /** Every scoring path here is hash-checked: sequential list_reduce
    * replicates the native dot/norm accumulation order exactly, the
    * int8 path is single-IEEE-op / exact-integer throughout, the LSH
    * rotations interpolate as literal matrices and the IVF codebook
    * re-trains inside the oracle SQL itself (see [[qAnnLshSql]] /
    * [[qAnnIvfSql]]). Only q_ann_recall and q_hybrid_search remain
    * rows-only — pure compositions of the already-checked LSH and
    * brute-force programs (their own SQL would re-state both, proving
    * nothing new at 2× the oracle runtime).
    */
  val oracle: Map[String, String] = Map(
    "q_cluster_quality" -> qClusterQualitySql,
    "q_embed_outlier"   -> qEmbedOutlierSql,
    "q_rrf_fusion"      -> qRrfFusionSql,
    "q_ann_lsh"         -> qAnnLshSql,
    "q_ann_ivf"         -> qAnnIvfSql,
    "q_ann_probe_curve" -> qAnnProbeCurveSql,
    "q_lsh_probe_curve" -> qLshProbeCurveSql,
    "q_ann_recall"      -> qAnnRecallSql,
    "q_hybrid_search"   -> qHybridSearchSql,
    "q_ann_bruteforce"  -> qAnnBruteforceSql,
    "q_ann_quantized"   -> qAnnQuantizedSql,
    "q_ann_pq"          -> qAnnPqSql,
    "q_ann_ivfadc"      -> qAnnIvfadcSql,
    "q_pq_recall"       -> qPqRecallSql,
    "q_quant_recall"    -> qQuantRecallSql,
    "q_semdedup"        -> qSemdedupSql,
    "q_norm_hist"       -> qNormHistSql,
    "q_centroid_shift"  -> qCentroidShiftSql,
    "q_embed_stats"     -> qEmbedStatsSql,
    "q_embed_centroid"  -> qEmbedCentroidSql,
    "q_centroid_assign" -> qCentroidAssignSql,
    "q_cluster_keywords" -> qClusterKeywordsSql)
}
