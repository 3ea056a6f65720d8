package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared word-tokenized n-gram hashing core (static-forwarder object
  * so generated code can call it). Tokenization matches
  * `split(text, ' ')` (single-space split, empty tokens kept).
  */
object NgramHashing {

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Mixed per-word hashes of `s`. */
  def wordHashes(s: String): Array[Long] = {
    val len = s.length
    var nw = 1
    var i = 0
    while (i < len) { if (s.charAt(i) == ' ') nw += 1; i += 1 }
    val wh = new Array[Long](nw)
    var w = 0
    var h = 0L
    i = 0
    while (i < len) {
      val ch = s.charAt(i)
      if (ch == ' ') { wh(w) = mix(h); w += 1; h = 0L }
      else h = h * 31L + ch
      i += 1
    }
    wh(w) = mix(h)
    wh
  }

  /** Mixed hash of the n-gram starting at word i (shorter at the tail). */
  def featureHash(wh: Array[Long], i: Int, n: Int): Long = {
    var f = 0L
    var j = i
    val end = math.min(i + n, wh.length)
    while (j < end) { f = f * 1000003L + wh(j); j += 1 }
    mix(f)
  }

  def windows(nw: Int, n: Int): Int = math.max(nw - n + 1, 1)
}

/** One-pass k-slot MinHash signature over word n-gram shingles —
  * the word-level twin of [[CharNgramMinHash]]. Map-only: the first
  * shuffle in the dedup pipeline is the band-bucket candidate join.
  */
case class WordNgramMinHash(child: Expression, n: Int, k: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_word_minhash"

  override protected def nullSafeEval(input: Any): Any =
    WordNgramMinHash.sig(input.asInstanceOf[UTF8String].toString, n, k, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.WordNgramMinHash.sigArray($c.toString(), $n, $k, ${seed}L));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WordNgramMinHash =
    copy(child = newChild)
}

object WordNgramMinHash {
  private val P = 2147483647L

  /** Coefficients cached per (seed, k): sigArray runs once per ROW in
    * the generated code — recomputing 2k Random draws per document
    * would dominate the signature pass.
    */
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int), (Array[Long], Array[Long])]()

  def sigArray(s: String, n: Int, k: Int, seed: Long): Array[Long] = {
    val (a, b) = coeffCache.computeIfAbsent((seed, k),
      key => CharNgramMinHash.coeffs(key._1, key._2))
    val wh = NgramHashing.wordHashes(s)
    val m = NgramHashing.windows(wh.length, n)
    val out = Array.fill(k)(P)
    var i = 0
    while (i < m) {
      val h = java.lang.Math.floorMod(NgramHashing.featureHash(wh, i, n), P)
      var t = 0
      while (t < k) {
        val v = (a(t) * h + b(t)) % P
        if (v < out(t)) out(t) = v
        t += 1
      }
      i += 1
    }
    out
  }

  def sig(s: String, n: Int, k: Int, seed: Long): GenericArrayData =
    new GenericArrayData(sigArray(s, n, k, seed))

  def column(c: Column, n: Int, k: Int, seed: Long): Column =
    GraftBridge.column(WordNgramMinHash(GraftBridge.expression(c), n, k, seed))
}

/** Distinct word-n-gram feature-hash set (for exact-Jaccard verify). */
case class WordNgramHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_word_ngram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    WordNgramHashes.hashes(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNgramHashes.hashes($c.toString(), $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgramHashes =
    copy(child = newChild)
}

object WordNgramHashes {
  def hashes(s: String, n: Int): GenericArrayData = {
    val wh = NgramHashing.wordHashes(s)
    val m = NgramHashing.windows(wh.length, n)
    val set = new LongInsertionSet(m)
    var i = 0
    // floorMod keeps the set domain non-negative (LongInsertionSet
    // uses -1 as its empty sentinel)
    while (i < m) {
      set.add(java.lang.Math.floorMod(NgramHashing.featureHash(wh, i, n), Long.MaxValue))
      i += 1
    }
    val arr = set.toArray
    java.util.Arrays.sort(arr) // sorted contract → merge-count Jaccard
    new GenericArrayData(arr)
  }

  def column(c: Column, n: Int): Column =
    GraftBridge.column(WordNgramHashes(GraftBridge.expression(c), n))
}
