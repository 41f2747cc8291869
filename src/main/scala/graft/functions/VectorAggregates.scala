package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise vector aggregates — the `pgml.sum/max/min/max_abs/min_abs`
  * aggregate surface (reference: pgml-extension/src/vectors.rs:320-900, which
  * declares Postgres aggregates with state/combine/finalize).
  *
  * Spark shape: a `TypedImperativeAggregate` over a primitive `Array[Double]`
  * buffer — partial aggregation (map-side combine) comes for free from
  * Spark's aggregate physical operators, and `merge` is the `combinefunc`
  * equivalent, so the shuffle carries one vector per (group × partition)
  * rather than one per row. That is the property that matters at 100 TB:
  * aggregating N 1024-d vectors shuffles `parts × 8 KB`, not `N × 8 KB`.
  *
  * `op` ∈ sum | min | max | minAbs | maxAbs. Result is `array<double>`.
  */
case class VectorAggregate(
    child: Expression,
    op: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  private lazy val floatElems = VectorTypeUtils.elemIsFloat(child.dataType)

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = s"vec_$op"

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorTypeUtils.isVectorType(child.dataType) &&
        Set("sum", "min", "max", "minAbs", "maxAbs").contains(op))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> input, got ${child.dataType.simpleString}")

  // Empty buffer sentinel: length-0 array until the first input row arrives
  // (vector width is learned from the data, as in vectors.rs state functions).
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def combine(acc: Double, x: Double): Double = op match {
    case "sum"    => acc + x
    case "min"    => math.min(acc, x)
    case "max"    => math.max(acc, x)
    case "minAbs" => math.min(acc, math.abs(x))
    case "maxAbs" => math.max(acc, math.abs(x))
  }
  private def seed(x: Double): Double = op match {
    case "sum" => x
    case "min" | "max" => x
    case "minAbs" | "maxAbs" => math.abs(x)
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (buf.length == 0) {
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        out(i) = seed(if (floatElems) arr.getFloat(i).toDouble else arr.getDouble(i)); i += 1
      }
      out
    } else {
      require(buf.length == n, s"vector length mismatch in $prettyName: ${buf.length} vs $n")
      var i = 0
      while (i < n) {
        buf(i) = combine(buf(i), if (floatElems) arr.getFloat(i).toDouble else arr.getDouble(i))
        i += 1
      }
      buf
    }
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (a.length == 0) return b
    if (b.length == 0) return a
    require(a.length == b.length, s"vector length mismatch in $prettyName merge")
    var i = 0
    // note: for minAbs/maxAbs both sides already hold absolute values, so the
    // plain min/max combine is correct here.
    while (i < a.length) {
      a(i) = op match {
        case "sum" => a(i) + b(i)
        case "min" | "minAbs" => math.min(a(i), b(i))
        case "max" | "maxAbs" => math.max(a(i), b(i))
      }
      i += 1
    }
    a
  }

  override def eval(buf: Array[Double]): Any =
    if (buf.length == 0) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}
