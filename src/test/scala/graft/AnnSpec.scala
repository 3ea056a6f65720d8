package graft

import graft.operators.Ann

/** ANN correctness: brute force is the exact baseline; the LSH variant
  * is graded on recall against it.
  */
class AnnSpec extends SparkSpec {

  private def topSets(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
    rows.groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  test("brute force returns exactly k ranked neighbors per query") {
    val rows = Ann.qAnnBruteforce(spark, sf0001).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size === Ann.QueryK,
      s"the query set is the fixed-size splitmix sample (QueryK=${Ann.QueryK})")
    byQ.foreach { case (q, rs) =>
      assert(rs.length === 5, s"query $q must have 5 neighbors")
      assert(rs.map(_.getLong(2)).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
      val cosines = rs.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b },
        "cosine must be non-increasing in rank")
      assert(cosines.forall(c => c >= -1.0001 && c <= 1.0001))
    }
  }

  /** Recall AND candidate cost, asserted together — a recall number
    * without its candidate fraction is half a measurement.
    *
    * Context for the thresholds (measured, see Ann.scala's frontier
    * note): this corpus's true top-5 neighbors sit at cosine
    * 0.27-0.43, barely above random for dim=64, which caps what ANY
    * LSH family can do — recall ≥0.7 under 10% candidates is not
    * attainable here (best measured ≤13%: ~0.5). The chosen
    * cross-polytope config buys recall 0.82 at ~35% candidates; both
    * sides of that trade are asserted so a config change can't
    * silently buy recall with a corpus scan (candFrac → 1.0 would
    * "recall" 1.0).
    */
  test("LSH ANN recall@5 ≥ 0.7 with bounded, reported candidate fraction") {
    val brute = topSets(Ann.qAnnBruteforce(spark, sf0001).collect())
    val scored = Ann.lshScored(spark, sf0001, Ann.LshTables, Ann.LshProbes).cache()
    try {
      val corpusN = graft.sources.Ingest.table(spark, sf0001, "embeddings").count()
      val candFrac = scored.count().toDouble / brute.size / corpusN
      val lsh = topSets(
        Ann.qAnnLsh(spark, sf0001).collect())
      val recalls = brute.map { case (q, bs) =>
        lsh.getOrElse(q, Set.empty).intersect(bs).size.toDouble / bs.size
      }
      val recall = recalls.sum / recalls.size
      info(f"LSH recall@5 over ${brute.size} queries: $recall%.3f, candidate fraction: $candFrac%.3f")
      assert(recall >= 0.7, f"cross-polytope 16×3-probe LSH should recall ≥ 0.7, got $recall%.3f")
      assert(candFrac < 0.5, f"candidates must stay a bounded corpus fraction, got $candFrac%.3f")
    } finally scored.unpersist()
  }

  /** IVF recall AND candidate cost, same double-sided contract as the
    * LSH test. nProbe/k = 6/16 bounds the EXPECTED candidate fraction
    * near 0.375, but cells are data-sized, so the assertion allows
    * skew headroom. The same unclustered-corpus frontier note applies
    * (true neighbors at cosine 0.27-0.43 ≈ barely above random):
    * data-dependent cells can't beat the LSH frontier here either —
    * the test pins that probing 6/16 of the codebook buys most of
    * brute force's answer set without a corpus scan.
    */
  test("IVF ANN recall@5 ≥ 0.6 with bounded, reported candidate fraction") {
    val brute = topSets(Ann.qAnnBruteforce(spark, sf0001).collect())
    val scored = Ann.ivfScored(spark, sf0001, Ann.IvfProbes).cache()
    try {
      val corpusN = graft.sources.Ingest.table(spark, sf0001, "embeddings").count()
      val candFrac = scored.count().toDouble / brute.size / corpusN
      val ivf = topSets(Ann.qAnnIvf(spark, sf0001).collect())
      val recalls = brute.map { case (q, bs) =>
        ivf.getOrElse(q, Set.empty).intersect(bs).size.toDouble / bs.size
      }
      val recall = recalls.sum / recalls.size
      info(f"IVF recall@5 over ${brute.size} queries: $recall%.3f, candidate fraction: $candFrac%.3f")
      assert(recall >= 0.6, f"IVF 16-cell 6-probe should recall ≥ 0.6, got $recall%.3f")
      assert(candFrac < 0.55, f"candidates must stay a bounded corpus fraction, got $candFrac%.3f")
    } finally scored.unpersist()
  }

  test("sessionCodebook: cached model bit-identical to a fresh train; second lookup serves cached") {
    // VERDICT r12 #1: the session cache must be a pure memoization —
    // trainCodebook is bit-deterministic (fixed-point Lloyd sums), so
    // the cached array equals a fresh train on the same immutable dir.
    val (corpus, _) = Ann.split(spark, sf0001)
    val cached = Ann.sessionCodebook(spark, sf0001, corpus)
    val fresh = Ann.trainCodebook(corpus, Ann.IvfIters)
    assert(cached.toSeq === fresh.toSeq,
      "session-cached codebook must equal a freshly trained one")
    assert(Ann.sessionCodebook(spark, sf0001, corpus) eq cached,
      "second lookup must return the cached model, not retrain")
  }

  test("persisted IVF index: serve == train-and-serve; scan prunes to the probed cells") {
    val path = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Ann.buildIvfIndex(spark, sf0001, path)
    val served = Ann.ivfServe(spark, sf0001, path)
    // same deterministic codebook (seeded Lloyd) → identical answers
    val inline = Ann.qAnnIvf(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fromIndex = served.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fromIndex === inline)
    val p = served.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("cell"),
      s"the probed-cell isin must prune index partitions at the scan:\n$p")
  }

  test("persisted LSH index: serve == inline qAnnLsh; scan prunes to the probed buckets") {
    val path = java.nio.file.Files.createTempDirectory("graft-lsh").toString
    Ann.buildLshIndex(spark, sf0001, path)
    val served = Ann.lshServe(spark, sf0001, path)
    // seed-derived rotations → identical bucket keys → identical answers
    val inline = Ann.qAnnLsh(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fromIndex = served.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fromIndex === inline)
    val p = served.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("bkey"),
      s"the probed-bucket isin must prune index partitions at the scan:\n$p")
  }

  test("lshUpsert: serve-after-upsert == one-shot build; replay idempotent; no assignment shuffle") {
    import org.apache.spark.sql.functions.col
    val full = java.nio.file.Files.createTempDirectory("graft-lsh-full").toString
    val incr = java.nio.file.Files.createTempDirectory("graft-lsh-incr").toString
    Ann.buildLshIndex(spark, sf0001, full)
    Ann.buildLshIndex(spark, sf0001, incr, col("vec_id") % 7 =!= 0)
    val (corpus, _) = Ann.split(spark, sf0001)
    val arrivals = corpus.filter(col("vec_id") % 7 === 0)
    Ann.lshUpsert(spark, incr, arrivals)
    val ref = Ann.lshServe(spark, sf0001, full).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Ann.lshServe(spark, sf0001, incr).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === ref, "upserted index must serve exactly what a rebuild serves")
    // assignment is map-only (rotations ship inside the expression)
    val plan = Ann.lshAssign(arrivals).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"upsert assignment must never reshuffle the arrivals:\n$plan")
    // streaming-sink path: deterministic batch dir, replay-safe,
    // empty batch a no-op, rebuild folds increments away
    val incr2 = java.nio.file.Files.createTempDirectory("graft-lsh-incr2").toString
    Ann.buildLshIndex(spark, sf0001, incr2, col("vec_id") % 7 =!= 0)
    Ann.lshUpsertBatch(spark, incr2, arrivals, 3L)
    Ann.lshUpsertBatch(spark, incr2, arrivals, 3L) // crash replay
    val residentN = spark.read.parquet(s"$incr2/index.parquet").count()
    val streamN = spark.read.parquet(s"$incr2/index-stream/batch-000000003").count()
    assert(residentN + streamN === corpus.count() * Ann.LshTables,
      "replayed batch must not duplicate rows (one row per vector per table)")
    val got2 = Ann.lshServe(spark, sf0001, incr2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got2 === ref, "post-replay index must serve exactly what a rebuild serves")
    Ann.lshUpsertBatch(spark, incr2, arrivals.filter(col("vec_id") < 0), 4L)
    assert(!new java.io.File(s"$incr2/index-stream/batch-000000004").exists(),
      "an empty batch must not leave an unreadable directory behind")
    Ann.buildLshIndex(spark, sf0001, incr2)
    assert(!new java.io.File(s"$incr2/index-stream").exists(),
      "a full rebuild must clear streamed batch directories")
  }

  test("ivfUpsert: serve-after-upsert == one-shot build serve; assignment plan has no shuffle") {
    import org.apache.spark.sql.functions.col
    val full = java.nio.file.Files.createTempDirectory("graft-ivf-full").toString
    val incr = java.nio.file.Files.createTempDirectory("graft-ivf-incr").toString
    // one-shot reference index over the whole corpus
    Ann.buildIvfIndex(spark, sf0001, full)
    // partial build (codebook still trains on the full corpus) + upsert
    // of the held-out arrivals — the incremental-maintenance path
    Ann.buildIvfIndex(spark, sf0001, incr, col("vec_id") % 7 =!= 0)
    val (corpus, _) = Ann.split(spark, sf0001)
    val arrivals = corpus.filter(col("vec_id") % 7 === 0)
    Ann.ivfUpsert(spark, incr, arrivals)
    // identical codebook + exact assignment → identical serving answers
    val ref = Ann.ivfServe(spark, sf0001, full).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Ann.ivfServe(spark, sf0001, incr).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === ref, "upserted index must serve exactly what a rebuild serves")
    // the maintenance pass is map-only: no Exchange anywhere in the
    // assignment plan (the codebook ships inside the expression)
    val plan = Ann.ivfAssign(arrivals, Ann.readCodebook(spark, incr))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"upsert assignment must never reshuffle the arrivals (or the corpus):\n$plan")
  }

  test("ivfUpsertBatch: micro-batch replay is idempotent; empty batch is a no-op") {
    import org.apache.spark.sql.functions.col
    val full = java.nio.file.Files.createTempDirectory("graft-ivfb-full").toString
    val incr = java.nio.file.Files.createTempDirectory("graft-ivfb-incr").toString
    Ann.buildIvfIndex(spark, sf0001, full)
    Ann.buildIvfIndex(spark, sf0001, incr, col("vec_id") % 7 =!= 0)
    val (corpus, _) = Ann.split(spark, sf0001)
    val arrivals = corpus.filter(col("vec_id") % 7 === 0)
    Ann.ivfUpsertBatch(spark, incr, arrivals, 3L)
    // crash-replay (ADVICE r12): foreachBatch re-delivers the SAME
    // batch id after a failure — the deterministic overwrite path must
    // converge to exactly-once contents, not double-append
    Ann.ivfUpsertBatch(spark, incr, arrivals, 3L)
    val residentN = spark.read.parquet(s"$incr/index.parquet").count()
    val streamN = spark.read.parquet(s"$incr/index-stream/batch-000000003").count()
    assert(residentN + streamN === corpus.count(),
      "replayed batch must not duplicate rows in the index")
    val ref = Ann.ivfServe(spark, sf0001, full).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Ann.ivfServe(spark, sf0001, incr).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === ref, "post-replay index must serve exactly what a rebuild serves")
    // empty micro-batch: no directory, no schema-less read hazard
    Ann.ivfUpsertBatch(spark, incr, arrivals.filter(col("vec_id") < 0), 4L)
    assert(!new java.io.File(s"$incr/index-stream/batch-000000004").exists(),
      "an empty batch must not leave an unreadable directory behind")
    // a rebuild folds the streamed increments away
    Ann.buildIvfIndex(spark, sf0001, incr)
    assert(!new java.io.File(s"$incr/index-stream").exists(),
      "a full rebuild must clear streamed batch directories")
  }

  test("IVF-PQ index: codes compress 2×+ on disk; recall ≥ 0.9 vs float serve; both scans prune") {
    val path = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    val fullIvf = java.nio.file.Files.createTempDirectory("graft-ivfpq-ref").toString
    Ann.buildIvfPqIndex(spark, sf0001, path)
    Ann.buildIvfIndex(spark, sf0001, fullIvf)
    // compression: the scanned half stores 1-byte codes, the float
    // half 4-byte components — the 4× storage claim must survive
    // parquet encoding with at least 2× to spare
    def bytesUnder(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
      walk(new java.io.File(p))
    }
    val codeBytes = bytesUnder(s"$path/index.parquet")
    val floatBytes = bytesUnder(s"$path/rerank.parquet")
    info(s"IVF-PQ scanned half: $codeBytes B vs float half: $floatBytes B")
    assert(codeBytes * 2 < floatBytes,
      s"int8 codes half must be at most half the float half on disk: $codeBytes vs $floatBytes")
    // recall floor vs the float serve (the q_quant_recall device): the
    // candidate cells are identical, so the only loss is a true top-K
    // neighbor falling out of the quantized top-(4K) over-fetch
    val ref = topSets(Ann.ivfServe(spark, sf0001, fullIvf).collect())
    val served = Ann.ivfPqServe(spark, sf0001, path)
    val got = topSets(served.collect())
    val recalls = ref.map { case (q, bs) =>
      got.getOrElse(q, Set.empty).intersect(bs).size.toDouble / bs.size
    }
    val recall = recalls.sum / recalls.size
    info(f"IVF-PQ recall@5 vs float IVF serve over ${ref.size} queries: $recall%.3f")
    assert(recall >= 0.9, f"float rerank of the int8 top-4K should recover ≥ 0.9, got $recall%.3f")
    // plan: the codes scan prunes to probed cells; the float scan is a
    // point lookup (probed cells AND a pushed vec_id IN filter)
    val p = served.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("cell"),
      s"the probed-cell isin must prune both halves at the scan:\n$p")
    assert(p.contains("PushedFilters: [In(vec_id"),
      s"the rerank scan must push the candidate-id IN filter into parquet:\n$p")
  }

  test("ivfPqUpsert: serve-after-upsert == one-shot build serve") {
    import org.apache.spark.sql.functions.col
    val full = java.nio.file.Files.createTempDirectory("graft-ivfpq-full").toString
    val incr = java.nio.file.Files.createTempDirectory("graft-ivfpq-incr").toString
    Ann.buildIvfPqIndex(spark, sf0001, full)
    Ann.buildIvfPqIndex(spark, sf0001, incr, col("vec_id") % 7 =!= 0)
    val (corpus, _) = Ann.split(spark, sf0001)
    Ann.ivfPqUpsert(spark, incr, corpus.filter(col("vec_id") % 7 === 0))
    val ref = Ann.ivfPqServe(spark, sf0001, full).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Ann.ivfPqServe(spark, sf0001, incr).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === ref, "upserted IVF-PQ index must serve exactly what a rebuild serves")
  }

  test("ivfPqUpsertBatch: replay converges; a torn batch is invisible and heals on replay") {
    import org.apache.spark.sql.functions.col
    val full = java.nio.file.Files.createTempDirectory("graft-ivfpqb-full").toString
    val incr = java.nio.file.Files.createTempDirectory("graft-ivfpqb-incr").toString
    Ann.buildIvfPqIndex(spark, sf0001, full)
    Ann.buildIvfPqIndex(spark, sf0001, incr, col("vec_id") % 7 =!= 0)
    val (corpus, _) = Ann.split(spark, sf0001)
    val batch = corpus.filter(col("vec_id") % 7 === 0)
    def serveSet(path: String) = Ann.ivfPqServe(spark, sf0001, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ref = serveSet(full)
    val preBatch = serveSet(incr)

    // tear injection: the batch lands, then the CODES half is deleted —
    // the on-disk state of a crash between ivfPqUpsertBatch's two
    // writes (floats committed, codes not)
    Ann.ivfPqUpsertBatch(spark, incr, batch, batchId = 3L)
    val fs = new org.apache.hadoop.fs.Path(incr)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$incr/index-stream/batch-000000003"), true))
    assert(serveSet(incr) === preBatch,
      "a torn batch (orphaned float half) must be INVISIBLE to serve, not a crash or a partial answer")

    // tear injection 2: a crash DURING the codes write — Spark creates
    // the batch dir (holding only `_temporary`) at job start, so bare
    // dir existence is NOT commit evidence. Such a dir must not count
    // as committed (it has no _SUCCESS and no data files): serve
    // neither throws nor reads partial codes.
    val crashDir = new org.apache.hadoop.fs.Path(s"$incr/index-stream/batch-000000004")
    fs.mkdirs(new org.apache.hadoop.fs.Path(crashDir, "_temporary"))
    assert(serveSet(incr) === preBatch,
      "a batch dir with only _temporary (crash mid-codes-write) must read as uncommitted")
    assert(fs.delete(crashDir, true))

    // replay with the same batchId: the stale codes half (if any) is
    // un-committed FIRST, then both halves rewritten floats-first /
    // codes-last → healed, and the index converges to exactly-once
    // contents
    Ann.ivfPqUpsertBatch(spark, incr, batch, batchId = 3L)
    Ann.ivfPqUpsertBatch(spark, incr, batch, batchId = 3L) // second replay: idempotent
    assert(serveSet(incr) === ref,
      "replayed batch upserts must serve exactly what a one-shot build serves")

    // a full rebuild atomically retires the stream roots with the old
    // dir (no old-codebook batches can survive into a new-codebook
    // serve) — post-state: roots gone, serve == build
    Ann.buildIvfPqIndex(spark, sf0001, incr)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$incr/index-stream")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$incr/rerank-stream")),
      "a rebuild must clear both stream roots")
    assert(serveSet(incr) === ref)
  }

  test("q_ann_ivfadc: the registered row == explicit build + ivfPqServe, and recall is monitored") {
    val path = java.nio.file.Files.createTempDirectory("graft-ivfadc-row").toString
    Ann.buildIvfPqIndex(spark, sf0001, path)
    val exp = Ann.ivfPqServe(spark, sf0001, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Ann.qAnnIvfadc(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === exp,
      "the session-built index must serve exactly what an explicit build serves")
    // the monitor's third column exists and sits at-or-below the
    // full-scan shortlist recall (cell pruning can only lose candidates)
    val rec = Ann.qPqRecall(spark, sf0001).collect()
    val full = rec.map(_.getAs[Long]("recall_bp")).sum
    val pruned = rec.map(_.getAs[Long]("ivfadc_recall_bp")).sum
    info(s"mean recall_bp full-scan=${full / rec.length} ivfadc=${pruned / rec.length}")
    assert(pruned <= full, "cell pruning cannot ADD recall over the full-scan shortlist")
    assert(pruned >= rec.length * 5000,
      "the production read should keep mean recall@5 above 50% on this corpus")
  }

  test("pqBatchCommitted: commit evidence is stamped at write time, independent of the reader's conf") {
    import org.apache.spark.sql.functions.col
    // ADVICE r19: the old rule consulted the READER's Hadoop conf — a
    // batch written under markers-disabled (no _SUCCESS ever exists)
    // but served under the default markers-enabled conf read as torn
    // and silently vanished from serves. The upsert now stamps its own
    // _GRAFT_COMMIT after the codes land; the verdict is a pure
    // function of the batch dir.
    val incr = java.nio.file.Files.createTempDirectory("graft-ivfpqm").toString
    Ann.buildIvfPqIndex(spark, sf0001, incr, col("vec_id") % 7 =!= 0)
    val (corpus, _) = Ann.split(spark, sf0001)
    def serveSet() = Ann.ivfPqServe(spark, sf0001, incr).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val preBatch = serveSet()
    // write the batch under a markers-DISABLED conf: no _SUCCESS lands
    val conf = spark.sparkContext.hadoopConfiguration
    conf.setBoolean("mapreduce.fileoutputcommitter.marksuccessfuljobs", false)
    try Ann.ivfPqUpsertBatch(spark, incr,
      corpus.filter(col("vec_id") % 7 === 0), batchId = 3L)
    finally conf.setBoolean("mapreduce.fileoutputcommitter.marksuccessfuljobs", true)
    val fs = new org.apache.hadoop.fs.Path(incr)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bdir = s"$incr/index-stream/batch-000000003"
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$bdir/_SUCCESS")),
      "fixture: the markers-disabled write must leave no _SUCCESS")
    val committed = serveSet() // reader runs markers-ENABLED (default)
    assert(committed !== preBatch,
      "a markers-disabled writer's batch must be visible to a markers-enabled reader")
    // torn state: strip the graft stamp too (crash after task commits,
    // before the codes job's stamp) — data files alone are PARTIAL
    // evidence (ADVICE r18) and must read as uncommitted
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$bdir/_GRAFT_COMMIT"), false))
    assert(serveSet() === preBatch,
      "a batch with neither marker must read as torn, even with data files present")
    // the at-least-once replay rewrites and re-stamps — healed
    Ann.ivfPqUpsertBatch(spark, incr,
      corpus.filter(col("vec_id") % 7 === 0), batchId = 3L)
    assert(serveSet() === committed, "the replay must re-commit the batch")
  }

  test("buildIvfPqIndex: atomic triad publish — a crashed rebuild leaves the old index serving") {
    import org.apache.spark.sql.functions.col
    val path = java.nio.file.Files.createTempDirectory("graft-ivfpqswap").toString + "/idx"
    Ann.buildIvfPqIndex(spark, sf0001, path)
    def serveSet() = Ann.ivfPqServe(spark, sf0001, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ref = serveSet()
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash DURING a rebuild's staging (ADVICE r18's tear window: new
    // pq_codebook landed, new codes not): with staging, the half-built
    // state is all under .build.tmp — the published triad is untouched
    // and KEEPS serving old-codebook codes under the old-codebook LUT
    val tmp = new org.apache.hadoop.fs.Path(s"$path.build.tmp")
    fs.mkdirs(new org.apache.hadoop.fs.Path(tmp, "pq_codebook.parquet"))
    assert(serveSet() === ref,
      "a half-staged rebuild must be invisible: the old triad serves unchanged")
    // crash BETWEEN swapInto's two renames: old index parked at
    // .build.old, path absent — the next entry point heals it
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(s"$path.build.old")))
    assert(serveSet() === ref,
      "recoverIvfPq must restore the parked index before the read")
    assert(!fs.exists(tmp), "recovery must sweep staging garbage")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path.build.old")))
  }

  /** Int8 quantization costs 4× less memory; this pins what it costs
    * in ANSWER quality. 127 levels over a 64-dim unit-ish vector
    * perturbs each cosine by ~1e-3 — far below the corpus's typical
    * neighbor gaps — so top-5 should match the float path nearly
    * everywhere, and every quantized cosine must sit near its exact
    * value.
    */
  test("quantized ANN: top-5 recall vs exact ≥ 0.9 and cosines within 0.02") {
    val brute = Ann.qAnnBruteforce(spark, sf0001).collect()
    val exactSets = topSets(brute)
    val exactCos = brute.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val qrows = Ann.qAnnQuantized(spark, sf0001).collect()
    val qSets = topSets(qrows)
    val recalls = exactSets.map { case (q, bs) =>
      qSets.getOrElse(q, Set.empty).intersect(bs).size.toDouble / bs.size
    }
    val recall = recalls.sum / recalls.size
    info(f"int8 recall@5 over ${exactSets.size} queries: $recall%.3f")
    assert(recall >= 0.9, f"int8 rounding should barely move top-5, got $recall%.3f")
    qrows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      exactCos.get(key).foreach { e =>
        assert(math.abs(r.getDouble(3) - e) <= 0.02,
          s"pair $key: quantized cosine ${r.getDouble(3)} vs exact $e")
      }
    }
  }

  /** The PQ kernels must agree with a driver-side reference: codes
    * are the per-subspace L2 argmin (lowest id on ties), the ADC
    * lookup over a query LUT reconstructs Σ_m q_m·c_{m,code_m}, and
    * the served result's recall floor holds (rerank restores exact
    * order, so final recall = shortlist hit rate).
    */
  test("PQ: codes are subspace L2 argmins; ADC lookup = reconstructed dot; reranked recall ≥ 0.9") {
    import graft.functions.VectorFunctions
    val (corpus, _) = Ann.split(spark, sf0001)
    val cb = Ann.sessionPqCodebooks(spark, sf0001, corpus)
    val m = Ann.PqM; val dsub = Ann.PqDsub
    val ks = cb.length / (m * dsub)
    // driver-side reference on a handful of vectors
    val sample = corpus.limit(16)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"),
        VectorFunctions.pqCodes(org.apache.spark.sql.functions.col("embedding"),
          cb.toSeq, m, dsub).as("codes"))
      .collect()
    sample.foreach { r =>
      val emb = r.getSeq[Float](1).toArray
      val codes = r.getSeq[Byte](2).toArray
      for (mm <- 0 until m) {
        val dists = (0 until ks).map { t =>
          var acc = 0.0
          for (i <- 0 until dsub) {
            val d = cb((mm * ks + t) * dsub + i) - emb(mm * dsub + i).toDouble
            acc += d * d
          }
          acc
        }
        val ref = dists.zipWithIndex.minBy { case (d, t) => (d, t) }._2
        assert((codes(mm) & 0xff) === ref,
          s"vec ${r.getLong(0)} subspace $mm: code ${codes(mm) & 0xff} != argmin $ref")
      }
      // ADC identity: lut lookup == Σ_m dot(q_m, c_{m, code_m}) for q = emb itself
      val lutRow = corpus.filter(org.apache.spark.sql.functions.col("vec_id") === r.getLong(0))
        .select(VectorFunctions.adcLookup(
          VectorFunctions.pqLut(org.apache.spark.sql.functions.col("embedding"), cb.toSeq, m, dsub),
          VectorFunctions.pqCodes(org.apache.spark.sql.functions.col("embedding"), cb.toSeq, m, dsub)))
        .collect()(0).getDouble(0)
      var refDot = 0.0
      for (mm <- 0 until m) {
        val t = codes(mm) & 0xff
        var acc = 0.0
        for (i <- 0 until dsub)
          acc += cb((mm * ks + t) * dsub + i) * emb(mm * dsub + i).toDouble
        refDot += acc
      }
      assert(math.abs(lutRow - refDot) < 1e-9,
        s"vec ${r.getLong(0)}: ADC lookup $lutRow != reconstructed dot $refDot")
    }
    // recall floor of the reranked serve
    val exactSets = topSets(Ann.qAnnBruteforce(spark, sf0001).collect())
    val pqSets = topSets(Ann.qAnnPq(spark, sf0001).collect())
    val recalls = exactSets.map { case (q, bs) =>
      pqSets.getOrElse(q, Set.empty).intersect(bs).size.toDouble / bs.size
    }
    val recall = recalls.sum / recalls.size
    info(f"PQ reranked recall@5 over ${exactSets.size} queries: $recall%.3f")
    assert(recall >= 0.9,
      f"ADC shortlist + exact rerank should recover ≥0.9 of exact top-5, got $recall%.3f")
    // cached codebooks are bit-deterministic (the sessionCodebook contract)
    assert(java.util.Arrays.equals(cb,
      Ann.trainPqCodebooks(spark, corpus, Ann.sessionCodebook(spark, sf0001, corpus))),
      "cached PQ codebooks must equal a fresh deterministic retrain")
  }

  test("q_embed_centroid: bit-exact against a driver-side fixed-point recompute") {
    val rows = Ann.qEmbedCentroid(spark, sf0001).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val vecs = graft.sources.Ingest.table(spark, sf0001, "embeddings")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
    assert(rows.keySet.map(_._2) === (1 to 64).toSet, "all 64 dims present")
    val byLabel = vecs.groupBy(_._1)
    byLabel.foreach { case (label, vs) =>
      // round half AWAY FROM ZERO (what Spark's round() and DuckDB's
      // round() both do) — math.round alone is floor(x+0.5), which
      // disagrees on negative halves
      val dim1 = vs.map { v =>
        val x = v._2.head.toDouble * 1048576L
        math.signum(x).toLong * math.round(math.abs(x))
      }
      val (n, sumFp, centroid) = rows((label, 1))
      assert(n === vs.length.toLong)
      assert(sumFp === dim1.sum, s"label $label dim 1: integer sum must match exactly")
      assert(centroid === sumFp.toDouble / (n * 1048576L).toDouble,
        "single-division reconstruction must be bit-identical")
    }
  }

  /** Tiny embeddings table on disk for the cluster-quality audit. */
  private def embDir(rows: Seq[(Long, Seq[Float], Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-emb").toString
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<FLOAT>) AS embedding",
        "CAST(label AS INT) AS label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q_cluster_quality: exact fixed-point recompute on a hand corpus") {
    val Fp = 1048576L
    val vecs = Seq(
      (1L, Seq(0.0f, 0.0f), 0),
      (2L, Seq(0.2f, 0.0f), 0),
      (3L, Seq(1.0f, 0.0f), 1),
      (4L, Seq(0.8f, 0.0f), 1))
    val d = embDir(vecs)
    // mirror the pipeline: f = round-half-away(v * Fp), c = sum DIV n
    def fp(x: Float): Long = {
      val s = x.toDouble * Fp
      math.signum(s).toLong * math.round(math.abs(s))
    }
    val cents = vecs.groupBy(_._3).view.mapValues { vs =>
      Seq(0, 1).map(i => vs.map(v => fp(v._2(i))).sum / vs.length)
    }.toMap
    def d2(v: Seq[Float], c: Seq[Long]): Long =
      v.zip(c).map { case (x, cc) => val dx = fp(x) - cc; dx * dx }.sum
    val got = Ann.qClusterQuality(spark, d).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(got.keySet === Set(0, 1))
    for (cl <- Seq(0, 1)) {
      val members = vecs.filter(_._3 == cl)
      val within = members.map(v => d2(v._2, cents(cl)))
      val margins = members.map { v =>
        val a = d2(v._2, cents(cl)); val b = d2(v._2, cents(1 - cl))
        ((b - a) * 1000L) / b
      }
      assert(got(cl).getLong(1) === 2L, s"cluster $cl size")
      assert(got(cl).getLong(2) === within.sum / 2L, s"cluster $cl mean_within")
      assert(got(cl).getLong(3) === 0L, s"cluster $cl misassigned")
      assert(got(cl).getLong(4) === 2L, s"cluster $cl margin count")
      assert(got(cl).getLong(5) === margins.sum / 2L, s"cluster $cl mean margin")
    }
  }

  test("q_embed_outlier: a far vector trips the 3-MAD fence; tight cluster stays clean") {
    val d = embDir(Seq(
      (1L, Seq(0.0f, 0.0f), 0),
      (2L, Seq(0.01f, 0.0f), 0),
      (3L, Seq(-0.01f, 0.0f), 0),
      (4L, Seq(0.02f, 0.0f), 0),
      (5L, Seq(0.5f, 0.0f), 0))) // corrupt: far from the tight mass
    val r = Ann.qEmbedOutlier(spark, d).collect()
    assert(r.length === 1 && r(0).getInt(0) === 0)
    assert(r(0).getLong(1) === 5L)
    assert(r(0).getLong(4) === 1L, "exactly the far vector is beyond 3 MADs")
    assert(r(0).getDouble(2) >= 0.0 && r(0).getDouble(3) >= 0.0)
  }

  test("q_cluster_quality: single-label corpus has NULL margins, not a crash") {
    val d = embDir(Seq(
      (1L, Seq(0.1f, 0.2f), 7),
      (2L, Seq(0.3f, 0.1f), 7)))
    val r = Ann.qClusterQuality(spark, d).collect()
    assert(r.length === 1 && r(0).getInt(0) === 7)
    assert(r(0).getLong(1) === 2L && r(0).getLong(4) === 0L)
    assert(r(0).isNullAt(5), "no runner-up centroid -> NULL mean margin")
  }

  test("q_ann_probe_curve: recall is monotone in probes and full-probe recall is total") {
    val rows = Ann.qAnnProbeCurve(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 4L, 6L))
    assert(rows.map(_._2).distinct.size === 1, "one shared brute-force baseline")
    // more probed cells can only add candidates: hits never decrease
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._3, s"recall must be monotone: probes ${a._1}->${b._1}")
    }
    // probing ALL 16 cells is exact by construction; the deployed
    // 6-probe point must already recover a usable majority
    assert(rows.last._4 >= 500000L,
      s"deployed probe point recovers ${rows.last._4} ppm — the curve knee moved")
    assert(rows.head._3 >= 1L, "even 1 probe finds the query's own cell neighbors")
  }

  test("q_lsh_probe_curve: multi-probe recall is monotone; the deployed point holds its floor") {
    val rows = Ann.qLshProbeCurve(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 3L, 6L))
    assert(rows.map(_._2).distinct.size === 1, "one shared brute-force baseline")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._3, s"multi-probe recall must be monotone: ${a._1}->${b._1}")
    }
    assert(rows(2)._4 >= 500000L,
      s"deployed 3-probe point recovers ${rows(2)._4} ppm — the curve knee moved")
  }
}
