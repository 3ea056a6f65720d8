package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial document fingerprint as a native Catalyst
  * expression: acc = (acc * P + codepoint) mod 2^40 over the string's
  * Unicode code points.
  *
  * Semantics are identical to the SQL-lambda formulation
  * `aggregate(split(text, ''), 0L, (acc, ch) -> (acc*P + ascii(ch)) % M)`
  * (split('') yields one code point per element, ascii() its value) and
  * to the DuckDB oracle — but the lambda fold is interpreted per
  * element (~7 s for 5000 sf0.1 docs); this expression generates a
  * tight Java loop inside whole-stage codegen.
  *
  * Extension mechanism showcase: registered as SQL function
  * `graft_fingerprint` via [[GraftExtensions]] (SparkSessionExtensions)
  * and exposed as a [[Column]] through [[GraftFunctions.fingerprint]].
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    RollingFingerprint.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $c.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $i += java.lang.Character.charCount($cp);
         |  $acc = ($acc * ${RollingFingerprint.P}L + (long) $cp) % ${RollingFingerprint.M}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object RollingFingerprint {
  /** Must match TextOps' oracle: P=1000003, M=2^40 (every intermediate
    * < 2^60, exact in any 64-bit engine).
    */
  val P = 1000003L
  val M = 1099511627776L

  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      acc = (acc * P + cp) % M
    }
    acc
  }
}

/** Column-level API for graft's native expressions. */
object GraftFunctions {
  def fingerprint(c: Column): Column =
    GraftBridge.column(RollingFingerprint(GraftBridge.expression(c)))
}

/** SparkSessionExtensions entry point: registers graft's native SQL
  * functions. Enabled by [[graft.GraftSession]] (builder.withExtensions)
  * or via `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {

  /** A literal / foldable int argument (e.g. graft_topk's k). */
  private def foldableInt(e: Expression, fn: String, arg: String): Int = {
    if (!e.foldable)
      throw new IllegalArgumentException(s"$fn: $arg must be a literal integer")
    e.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a literal integer, got $other")
    }
  }

  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[RollingFingerprint].getName, "graft_fingerprint"),
      (children: Seq[Expression]) => RollingFingerprint(Cast(children.head, StringType))))
    ext.injectFunction((
      new FunctionIdentifier("graft_normalize_text"),
      new ExpressionInfo(classOf[NormalizeText].getName, "graft_normalize_text"),
      (children: Seq[Expression]) => NormalizeText(Cast(children.head, StringType))))
    ext.injectFunction((
      new FunctionIdentifier("graft_vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "graft_vector_dot"),
      (children: Seq[Expression]) => VectorDot(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_vector_norm"),
      new ExpressionInfo(classOf[VectorNorm].getName, "graft_vector_norm"),
      (children: Seq[Expression]) => VectorNorm(children.head)))
    // aggregate: the analyzer wraps a bare AggregateFunction builder
    // result in its AggregateExpression (same contract as built-ins)
    ext.injectFunction((
      new FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKPairs].getName, "graft_topk"),
      (children: Seq[Expression]) =>
        TopKPairs(children(0), foldableInt(children(1), "graft_topk", "k"))))
  }
}
