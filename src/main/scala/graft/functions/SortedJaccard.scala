package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exact Jaccard similarity of two SORTED distinct long arrays via a
  * single merge pass — no per-row hash set (what `array_intersect` +
  * `array_union` build) and no intermediate arrays. The inputs are the
  * sorted hash sets emitted by [[CharNgramHashes]]/[[WordNgramHashes]];
  * with ~1.4k-element sets over tens of thousands of candidate pairs
  * the allocation-free merge is the difference between the verify join
  * being free and being the pipeline's hotspot.
  */
case class SortedJaccard(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sorted_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedJaccard.jaccard(
      a.asInstanceOf[ArrayData].toLongArray(),
      b.asInstanceOf[ArrayData].toLongArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedJaccard.jaccard($a.toLongArray(), $b.toLongArray());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedJaccard =
    copy(left = newLeft, right = newRight)
}

object SortedJaccard {
  /** Merge-count over sorted distinct arrays. */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    var i = 0
    var j = 0
    var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  def column(a: Column, b: Column): Column =
    GraftBridge.column(SortedJaccard(GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** Intersection SIZE of two sorted distinct long arrays — same
  * allocation-free merge as [[SortedJaccard]], returning the raw count
  * so callers can derive DIRECTIONAL similarities (containment
  * |A∩B|/|A|), which symmetric Jaccard destroys.
  */
case class SortedOverlap(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_sorted_overlap"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedOverlap.overlap(
      a.asInstanceOf[ArrayData].toLongArray(),
      b.asInstanceOf[ArrayData].toLongArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedOverlap.overlap($a.toLongArray(), $b.toLongArray());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedOverlap =
    copy(left = newLeft, right = newRight)
}

object SortedOverlap {
  def overlap(a: Array[Long], b: Array[Long]): Long = {
    var i = 0
    var j = 0
    var inter = 0L
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    inter
  }

  def column(a: Column, b: Column): Column =
    GraftBridge.column(SortedOverlap(GraftBridge.expression(a), GraftBridge.expression(b)))
}
