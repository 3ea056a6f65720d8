package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusBuild

/** The corpus materialization ([[CorpusBuild.corpusWrite]]): manifest
  * reconciliation with the published census, independent replay of the
  * pack/shard rules over the written rows, byte-identical rebuild, and
  * the publish swap contract.
  */
class CorpusWriteSpec extends SparkSpec {

  private def build(tag: String): (String, Array[org.apache.spark.sql.Row]) = {
    val out = java.nio.file.Files.createTempDirectory(s"graft-corpus-$tag").toString + "/corpus"
    (out, CorpusBuild.corpusWrite(spark, sf0001, out).collect())
  }

  test("manifest reconciles with the q_corpus_build census; written rows replay the rules") {
    val (out, manifest) = build("recon")
    val census = CorpusBuild.qCorpusBuild(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val (d5, t5, _) = census(7L) // dedup_near: final survivors
    assert(manifest.map(_.getLong(1)).sum === d5, "manifest docs = census survivors")
    assert(manifest.map(_.getLong(2)).sum === t5, "manifest token mass = census survivor mass")
    assert(manifest.length.toLong === census(9L)._3, "manifest rows = shard-stage n_units")

    val written = spark.read.parquet(s"$out/shards.parquet")
    assert(written.count() === d5)
    assert(written.select(countDistinct(struct(col("lang"), col("lane"), col("pack_id"))))
      .head.getLong(0) === census(8L)._3, "distinct packs in the corpus = pack-stage n_units")

    // per-shard signature round-trip: recompute from the written data
    val recomputed = written.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(xxhash64(doc_id, text))").as("sig"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    manifest.foreach { r =>
      val (n, sig) = recomputed(r.getInt(0))
      assert(r.getLong(1) === n && r.getLong(5) === sig,
        s"shard ${r.getInt(0)}: manifest (docs, signature) must round-trip from the data")
    }

    // the written manifest must equal the hash-checked q_corpus_manifest
    // row for row (modulo the content signature, which only the written
    // data carries) — the published artifact IS the verified plan
    val mq = CorpusBuild.qCorpusManifest(spark, sf0001).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(manifest.length === mq.size)
    manifest.foreach { r =>
      assert(mq(r.getInt(0)) === ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))),
        s"shard ${r.getInt(0)}: written manifest must equal the manifest query")
    }

    // independent driver-side replay of the LPT shard + pack rules
    val rows = written
      .select("doc_id", "lang", "toks", "lane", "pack_id", "rk", "shard").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6)))
    val expRk = rows.sortBy(t => (-t._3, t._1)).zipWithIndex
      .map { case (t, i) => t._1 -> (i + 1L) }.toMap
    rows.foreach { case (id, _, _, _, _, rk, shard) =>
      assert(rk === expRk(id), s"doc $id rank")
      assert(shard === ((rk - 1) % 8).toInt, s"doc $id shard = (rk-1) mod nShards")
    }
    rows.groupBy(t => (t._2, t._4)).foreach { case ((_, lane), laneDocs) =>
      var cum = 0L
      laneDocs.sortBy(_._1).foreach { case (id, _, t, l, pack, _, _) =>
        assert(l === lane && pack === cum / 256L, s"doc $id pack id (greedy running sum)")
        cum += t
      }
    }
  }

  test("rebuild is byte-identical per shard; publish swap replaces fully and cleans up") {
    def shardFiles(out: String): Map[String, java.io.File] =
      new java.io.File(s"$out/shards.parquet").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("shard="))
        .map(d => d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet")))
        .map { case (n, fs) =>
          assert(fs.length === 1, s"$n must hold exactly ONE file (one task per shard)")
          n -> fs.head
        }.toMap
    def md5(f: java.io.File): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.update(java.nio.file.Files.readAllBytes(f.toPath))
      d.digest().map("%02x".format(_)).mkString
    }
    val (a, mA) = build("a")
    val (b, mB) = build("b")
    val fa = shardFiles(a); val fb = shardFiles(b)
    assert(fa.keySet === fb.keySet)
    fa.keySet.foreach { s =>
      assert(md5(fa(s)) === md5(fb(s)), s"$s: a clean rebuild must be byte-identical")
    }
    assert(mA.map(_.toSeq).sortBy(_.head.toString) === mB.map(_.toSeq).sortBy(_.head.toString),
      "rebuilt manifest must be identical")
    // publish over an existing corpus: full replacement, no tmp/old leftovers
    CorpusBuild.corpusWrite(spark, sf0001, a)
    assert(!new java.io.File(a + ".publish.tmp").exists(), "tmp staging must be swapped away")
    assert(!new java.io.File(a + ".publish.old").exists(), "the staged-aside corpus must be deleted")
    assert(spark.read.parquet(s"$a/shards.parquet").count() ===
      spark.read.parquet(s"$b/shards.parquet").count())
  }

  test("corpusUpsert: increment-sized refresh — funnel + dedup vs the published corpus, commit-last append") {
    import spark.implicits._
    val (out, _) = build("upsert")
    val shards = spark.read.parquet(s"$out/shards.parquet")
      .select("doc_id", "lang", "lane", "toks", "text").collect()
    val maxId = shards.map(_.getLong(0)).max
    val base = shards.maxBy(r => (r.getLong(3), -r.getLong(0))) // deterministic: fattest survivor
    val baseText = base.getString(4)
    val reversed = baseText.split(" ").reverse.mkString(" ")
    val nearCopy = ("zzzqx" +: baseText.split(" ").drop(1)).mkString(" ")
    val m0 = spark.read.parquet(s"$out/manifest.parquet").collect()
    val (docs0, toks0) = (m0.map(_.getLong(1)).sum, m0.map(_.getLong(2)).sum)
    val maxShard0 = m0.map(_.getInt(0)).max
    val maxRk0 = m0.map(_.getLong(4)).max

    val inc = Seq(
      (maxId + 1001L, "src_upsert", base.getString(1), reversed), // unique -> survives
      (maxId + 1002L, "src_upsert", base.getString(1), baseText), // verbatim corpus copy -> md5 probe drop
      (maxId + 1003L, "src_upsert", base.getString(1), nearCopy), // near copy -> index serve drop
      (maxId + 1004L, "src_upsert", base.getString(1), reversed)  // within-increment exact twin -> first-wins drop
    ).toDF("doc_id", "source", "lang", "text")
    val m1 = CorpusBuild.corpusUpsert(spark, out, inc).collect()

    assert(m1.length === m0.length + 1, "one survivor -> one new shard")
    val newRow = m1.filter(_.getInt(0) > maxShard0)
    assert(newRow.length === 1 && newRow(0).getInt(0) === maxShard0 + 1)
    assert(m1.map(_.getLong(1)).sum === docs0 + 1, "docs: published + the one survivor")
    val expToks = reversed.split(" ", -1).length.toLong
    assert(m1.map(_.getLong(2)).sum === toks0 + expToks)
    assert(newRow(0).getLong(3) === maxRk0 + 1, "rk continues after the published max")

    val written = spark.read.parquet(s"$out/shards.parquet")
      .filter(col("doc_id") === (maxId + 1001L)).collect()
    assert(written.length === 1, "exactly the unique doc appended")
    // pack cursor continuation: the appended doc's pack_id continues the
    // published (lang, lane) token cursor, the streaming keyed-state rule
    val w = written(0)
    val laneBase = shards.filter(r => r.getString(1) == w.getAs[String]("lang") &&
      r.getLong(2) == w.getAs[Long]("lane")).map(_.getLong(3)).sum
    assert(w.getAs[Long]("pack_id") === laneBase / graft.operators.TextOps.packBudget)

    // a later increment repeating the survivor's text dedups against the
    // APPENDED index entry: no-op, manifest unchanged
    val inc2 = Seq((maxId + 2001L, "src_upsert", base.getString(1), reversed))
      .toDF("doc_id", "source", "lang", "text")
    val m2 = CorpusBuild.corpusUpsert(spark, out, inc2).collect()
    assert(m2.length === m1.length, "repeat arrival must be dropped by the appended index")
    assert(m2.map(_.getLong(1)).sum === docs0 + 1)
  }

  test("verdict chain is built once per (session, dir) and serves every consumer") {
    CorpusBuild.clearVerdictCache()
    val v1 = CorpusBuild.survivorVerdicts(spark, sf0001)
    val v2 = CorpusBuild.survivorVerdicts(spark, sf0001)
    assert(v1 eq v2,
      "census / manifest / write must share ONE verdict materialization")
    CorpusBuild.clearVerdictCache()
    val v3 = CorpusBuild.survivorVerdicts(spark, sf0001)
    assert(!(v1 eq v3), "clearVerdictCache must drop the session entry")
    assert(v3.count() === v1.count())
  }
}
