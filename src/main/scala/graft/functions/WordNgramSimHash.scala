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

  /** Callable from generated code (static forwarder on the object). */
  def simhash(s: String, n: Int): Long = {
    val wh = NgramHashing.wordHashes(s)
    val m = NgramHashing.windows(wh.length, n)
    val sums = new Array[Int](64)
    var i = 0
    while (i < m) {
      val f = NgramHashing.featureHash(wh, i, n)
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
