package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization as a native Catalyst expression — the
  * cleanup pass that precedes tokenization/dedup in a training-data
  * pipeline, where byte-level differences ("Café" vs "Café" vs
  * "cafe") would defeat exact and near dedup alike.
  *
  * Semantics (in order):
  *   1. NFD-decompose, drop combining marks, NFC-recompose
  *      (= accent stripping; matches DuckDB/utf8proc `strip_accents`)
  *   2. Unicode lowercase
  *   3. collapse ASCII whitespace runs to one space, trim ends
  *
  * Spark has no builtin for steps 1-2's Unicode machinery; a UDF would
  * leave codegen and pay serialization per row. This expression stays
  * inside whole-stage codegen (one static call per row on the
  * already-materialized UTF8String). Map-only at any scale.
  *
  * Oracle parity: DuckDB `trim(regexp_replace(lower(strip_accents(x)),
  * '\s+', ' ', 'g'))` — identical on this corpus (ASCII + CJK; both
  * engines' `\s` is the ASCII whitespace class, and utf8proc's
  * strip_accents is the same decompose/drop-marks/recompose pipeline).
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize_text"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      NormalizeText.normalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.NormalizeText.normalize($c.toString()));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {

  def normalize(s: String): String = {
    // Fast path: ASCII, already lowercase, no whitespace anomalies —
    // the overwhelmingly common case in a cleaned corpus; skip the
    // Normalizer allocation entirely.
    if (isCleanAscii(s)) return s
    val decomposed = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var i = 0
    while (i < decomposed.length) {
      val cp = decomposed.codePointAt(i)
      i += Character.charCount(cp)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(Character.toLowerCase(cp))
    }
    val recomposed = java.text.Normalizer.normalize(sb.toString,
      java.text.Normalizer.Form.NFC)
    collapseWs(recomposed)
  }

  /** true iff every char is printable ASCII or single interior spaces —
    * i.e. normalize(s) == s without doing any work.
    */
  private def isCleanAscii(s: String): Boolean = {
    if (s.isEmpty) return true
    if (s.charAt(0) == ' ' || s.charAt(s.length - 1) == ' ') return false
    var i = 0
    var prevSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= 128 || Character.isUpperCase(c)) return false
      if (c < ' ') return false // control chars incl. \t \n \r
      if (c == ' ') { if (prevSpace) return false; prevSpace = true }
      else prevSpace = false
      i += 1
    }
    true
  }

  private def collapseWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r') {
        if (sb.length > 0) pendingSpace = true // drop leading ws
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString // trailing pendingSpace never flushed = trim right
  }

  def column(c: Column): Column =
    GraftBridge.column(NormalizeText(GraftBridge.expression(c)))
}
