package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column-level API for the vector-math surface (`pgml.*` vector functions,
  * reference pgml-extension/src/vectors.rs) plus SQL registration so every
  * function is callable from `spark.sql` too.
  *
  * Elementwise arithmetic maps to Spark's codegen'd higher-order functions
  * (`transform` / `zip_with`) — no custom expression needed; the scalar
  * reductions (dot/cosine/norm/distance) are custom codegen expressions in
  * [[VectorExpressions]]; the aggregates are [[VectorAggregate]].
  */
object VecFunctions {

  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ColumnBridge.column(e)
  private def e(col: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    ColumnBridge.expression(col)
  private def agg(a: AggregateFunction): Column = c(a.toAggregateExpression())

  // ---- elementwise: vector ∘ scalar (vectors.rs:4-42) ----
  def vecAddScalar(v: Column, s: Column): Column = transform(v, x => x + s)
  def vecSubScalar(v: Column, s: Column): Column = transform(v, x => x - s)
  def vecMulScalar(v: Column, s: Column): Column = transform(v, x => x * s)
  def vecDivScalar(v: Column, s: Column): Column = transform(v, x => x / s)

  // ---- elementwise: vector ∘ vector (vectors.rs:44-114) ----
  def vecAdd(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x + y)
  def vecSub(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x - y)
  def vecMul(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x * y)
  def vecDiv(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x / y)

  // ---- scalar reductions ----
  def vecDot(a: Column, b: Column): Column = c(DotProduct(e(a), e(b)))
  def cosineSimilarity(a: Column, b: Column): Column = c(CosineSimilarity(e(a), e(b)))
  /** pgvector `<=>` operator: cosine *distance* = 1 − similarity
    * (score formula at pgml-sdks/pgml/src/search_query_builder.rs:149-151). */
  def cosineDistance(a: Column, b: Column): Column = lit(1.0) - cosineSimilarity(a, b)
  def vecDistanceL1(a: Column, b: Column): Column = c(DistanceL1(e(a), e(b)))
  def vecDistanceL2(a: Column, b: Column): Column = c(DistanceL2(e(a), e(b)))
  def vecNormL0(a: Column): Column = c(NormL0(e(a)))
  def vecNormL1(a: Column): Column = c(NormL1(e(a)))
  def vecNormL2(a: Column): Column = c(NormL2(e(a)))
  def vecNormMax(a: Column): Column = c(NormMax(e(a)))
  def vecNormalizeL1(a: Column): Column = c(NormalizeVector(e(a), "l1"))
  def vecNormalizeL2(a: Column): Column = c(NormalizeVector(e(a), "l2"))
  def vecNormalizeMax(a: Column): Column = c(NormalizeVector(e(a), "max"))

  // ---- aggregates (vectors.rs:320-900) ----
  def vecSumAgg(v: Column): Column = agg(VectorAggregate(e(v), "sum"))
  def vecMinAgg(v: Column): Column = agg(VectorAggregate(e(v), "min"))
  def vecMaxAgg(v: Column): Column = agg(VectorAggregate(e(v), "max"))
  def vecMinAbsAgg(v: Column): Column = agg(VectorAggregate(e(v), "minAbs"))
  def vecMaxAbsAgg(v: Column): Column = agg(VectorAggregate(e(v), "maxAbs"))
  /** Mean vector — the documented idiom `pgml.divide(pgml.sum(v), count(v))`
    * (pgml-extension/examples/vectors.sql:37-50). */
  def vecAvgAgg(v: Column): Column = {
    val s = vecSumAgg(v); val n = count(v)
    transform(s, x => x / n)
  }

  /** Make a float32 vector literal (e.g. a query embedding) matching the
    * element type of stored `array<float>` embedding columns. */
  def floatVec(values: Seq[Float]): Column = typedLit(values.toArray)

  // ---- quantized scan surface (operators/Quantized.scala) ----
  def vecSignPack(v: Column): Column = c(SignPack(e(v)))
  def vecHamming(a: Column, b: Column): Column = c(HammingWords(e(a), e(b)))
  def sq8Encode(v: Column, mins: Column, scales: Column): Column =
    c(Sq8Encode(e(v), e(mins), e(scales)))
  def sq8AdcDot(codes: Column, weights: Column, base: Column): Column =
    c(Sq8AdcDot(e(codes), e(weights), e(base)))
  def sq8AdcPoly(codes: Column, wts: Column, base: Column): Column =
    c(Sq8AdcPoly(e(codes), e(wts), e(base)))

  /** Register the full graft SQL function surface on a live session (same
    * registration table as [[graft.GraftExtensions]]). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    graft.SqlRegistrations.all.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
