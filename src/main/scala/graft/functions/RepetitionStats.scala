package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document repetition counters (the Gopher/MassiveText
  * repetition-filter inputs) as a native Catalyst expression: word
  * counts, duplicate-word mass, and top word/bigram frequencies from
  * a single tokenization, returned as a struct.
  *
  * This is what makes `q_repetition` MAP-ONLY: the signals are pure
  * per-row functions, so exploding the corpus into words and bigrams
  * and shuffling it through two wordcount aggregates (the relational
  * formulation — 10-100× row inflation through two exchanges, plus a
  * join) buys nothing at 100 TB. Here the whole operator is one
  * projection over the scan.
  *
  * Tokenization contract (must mirror the DuckDB oracle exactly):
  * split on single spaces KEEPING empty tokens (Spark `split(text,
  * ' ')` / DuckDB `string_split` semantics); bigram identity is the
  * two tokens joined by one space, with multiplicity.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStats.schema
  override def prettyName: String = "graft_repetition_stats"

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.stats(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepetitionStats.stats($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {

  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("top_word_n", LongType, nullable = false),
    StructField("dup_word_n", LongType, nullable = false),
    StructField("top_bigram_n", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false)))

  /** Callable from generated code (static forwarder on the object). */
  def stats(s: String): InternalRow = {
    val ws = s.split(" ", -1) // -1: keep trailing empties, like SQL split
    val wc = new java.util.HashMap[String, Integer](ws.length * 2)
    var i = 0
    while (i < ws.length) {
      val c = wc.get(ws(i))
      wc.put(ws(i), if (c == null) 1 else c + 1)
      i += 1
    }
    var topWord = 0L
    var dupWord = 0L
    val it = wc.values().iterator()
    while (it.hasNext) {
      val c = it.next().intValue()
      if (c > topWord) topWord = c
      if (c > 1) dupWord += c
    }
    var topBigram = 0L
    val nBigrams = math.max(ws.length - 1, 0)
    if (nBigrams > 0) {
      val bc = new java.util.HashMap[String, Integer](nBigrams * 2)
      i = 0
      while (i < ws.length - 1) {
        val b = ws(i) + " " + ws(i + 1)
        val c = bc.get(b)
        val n = if (c == null) 1 else c + 1
        bc.put(b, n)
        if (n > topBigram) topBigram = n
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](
      ws.length.toLong, topWord, dupWord, topBigram, nBigrams.toLong))
  }

  def column(c: Column): Column =
    GraftBridge.column(RepetitionStats(GraftBridge.expression(c)))
}
