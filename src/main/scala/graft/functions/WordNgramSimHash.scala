package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash-64 over word n-gram features (with multiplicity) as a
  * native Catalyst expression: one generated-Java pass per document —
  * word hashes, n-gram feature mixing, 64 ±1 bit sums, sign packing.
  *
  * Replaces the explode + 64-`sum` aggregate formulation: the
  * signature stage becomes map-only (no shuffle at all before the
  * band-bucket candidate join), and the ~70 ops/feature run in a JIT'd
  * loop instead of 64 aggregate buffers per row.
  *
  * Feature hashing is internal to the operator (rows-only query), so
  * it uses a splitmix64-style finalizer for uniform bit distribution —
  * the property the ±1 sums depend on.
  */
case class WordNgramSimHash(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_word_simhash"

  override protected def nullSafeEval(input: Any): Any =
    WordNgramSimHash.simhash(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNgramSimHash.simhash($c.toString(), $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgramSimHash =
    copy(child = newChild)
}

object WordNgramSimHash {

  /** splitmix64 finalizer — uniform bits from a polynomial prefix. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Callable from generated code (static forwarder on the object). */
  def simhash(s: String, n: Int): Long = {
    // one pass: polynomial word hashes (split on single spaces, empty
    // words included — same tokenization as split(text, ' '))
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

    val m = math.max(nw - n + 1, 1)
    val sums = new Array[Int](64)
    i = 0
    while (i < m) {
      var f = 0L
      var j = i
      val end = math.min(i + n, nw)
      while (j < end) { f = f * 1000003L + wh(j); j += 1 }
      f = mix(f)
      var k = 0
      while (k < 64) {
        if (((f >>> k) & 1L) == 1L) sums(k) += 1 else sums(k) -= 1
        k += 1
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) { if (sums(k) > 0) sig |= (1L << k); k += 1 }
    sig
  }

  def column(c: Column, n: Int): Column =
    GraftBridge.column(WordNgramSimHash(GraftBridge.expression(c), n))
}
