package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaccard similarity of two SORTED, DISTINCT string arrays via a single
  * merge walk — no intersection/union arrays are materialized. This is the
  * hot inner operation of LSH near-dup verification (millions of candidate
  * pairs on a dense corpus), where `array_intersect`+`array_union` allocate
  * two hash sets and two result arrays per pair.
  *
  * Precondition: both inputs sorted ascending with distinct elements
  * (produce them with `array_sort(array_distinct(...))` once per row).
  */
object JaccardKernel {
  def sortedJaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getUTF8String(i); val y = b.getUTF8String(j)
      val c = x.compareTo(y)
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Same merge walk over sorted distinct array<long> (64-bit token
    * hashes): primitive compares instead of UTF8String byte compares —
    * ~3-4× faster on the millions-of-pairs verify stream. Exact up to
    * 64-bit hash collisions between distinct tokens within one pair
    * (probability ~|toks|²/2⁶⁵ — negligible at any realistic vocabulary).
    */
  def sortedJaccardLong(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}

case class SortedJaccard(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_jaccard"
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires two array<string> args")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardKernel.sortedJaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaccardKernel.sortedJaccard($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

case class SortedJaccardLong(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_jaccard_long"
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires two array<bigint> args")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardKernel.sortedJaccardLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaccardKernel.sortedJaccardLong($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

object JaccardFunctions {
  def sortedJaccard(a: Column, b: Column): Column =
    ColumnBridge.column(SortedJaccard(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def sortedJaccardLong(a: Column, b: Column): Column =
    ColumnBridge.column(SortedJaccardLong(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
