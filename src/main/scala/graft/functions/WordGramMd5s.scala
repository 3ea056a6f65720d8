package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All word n-gram md5 hex digests of a document, one generated-Java
  * pass: tokenize once, slide an n-word window, digest each window.
  *
  * Replaces the `transform(ws, (w, i) -> md5(concat_ws(' ',
  * slice(ws, i+1, n))))` SQL-lambda formulation in the contamination
  * screen: lambda HOFs evaluate interpreted per element, and each
  * element re-slices the words array; here the window string is built
  * into one reused StringBuilder and hashed with a thread-cached
  * MessageDigest.
  *
  * md5 — not a faster 64-bit mix — is deliberate: the digest is the
  * join key the DuckDB oracle must reproduce (`md5()` is identical in
  * both engines). A production run free of the oracle could swap in
  * the 64-bit word-gram hashing of [[WordNgramMinHash]]'s machinery
  * for 4× narrower keys; the operator shape wouldn't change.
  *
  * Tokenization contract matches `split(text, ' ')` / DuckDB
  * `string_split`: single-space delimiter, empty tokens kept.
  */
case class WordGramMd5s(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"gram width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_gram_md5s"

  override protected def nullSafeEval(input: Any): Any =
    WordGramMd5s.grams(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordGramMd5s.grams($c.toString(), $n);")

  override protected def withNewChildInternal(newChild: Expression): WordGramMd5s =
    copy(child = newChild)
}

object WordGramMd5s {

  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Callable from generated code (static forwarder on the object). */
  def grams(s: String, n: Int): ArrayData = {
    val ws = s.split(" ", -1)
    val m = ws.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    val sb = new java.lang.StringBuilder
    val digest = md.get()
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(ws(i + j))
        j += 1
      }
      digest.reset()
      val d = digest.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var k = 0
      while (k < 16) {
        hex(k * 2) = hexDigits((d(k) >> 4) & 0xf)
        hex(k * 2 + 1) = hexDigits(d(k) & 0xf)
        k += 1
      }
      out(i) = UTF8String.fromString(new String(hex))
      i += 1
    }
    new GenericArrayData(out)
  }

  def column(c: Column, n: Int): Column =
    GraftBridge.column(WordGramMd5s(GraftBridge.expression(c), n))
}
