package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util.{Identifiable, MLReadable, MLReader, MLWritable, MLWriter}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

/** Full-batch (sub)gradient descent for the robust linear-regression
  * algorithms of the reference's enum (orm/algorithm.rs:27-28 —
  * sklearn's HuberRegressor / QuantileRegressor): MLlib has neither
  * loss, so the WarmStart treeAggregate machinery generalizes to them —
  * per epoch the d+1 parameters broadcast, executors fold per-partition
  * (sub)gradient partials, treeAggregate merges, the driver steps. Same
  * scale contract as [[WarmStart.continueLogisticBinary]]: one
  * distributed pass per epoch, O(d) driver state, no data collect.
  *
  * Losses (r = prediction − y):
  *  - huber(δ):    ∂/∂pred = r for |r| ≤ δ, else δ·sign(r)
  *  - quantile(τ): pinball subgradient — (1 − τ) for r > 0, else −τ
  */
object GdRegression {

  def fit(
      data: DataFrame, featuresCol: String, labelCol: String,
      loss: String, lossParam: Double,
      epochs: Int = 300, learningRate: Double = 0.1): (Array[Double], Double) = {
    require(loss == "huber" || loss == "quantile", s"unknown GD loss $loss")
    val d = data.select(col(featuresCol)).first().getAs[Vector](0).size
    val isHuber = loss == "huber"
    val (w, b) = WarmStart.gdEpochs(new Array[Double](d), 0.0, data, featuresCol, labelCol,
      epochs, learningRate, 0.0, s"$loss regression") { (m, y) =>
      val r = m - y
      if (isHuber) { if (math.abs(r) <= lossParam) r else lossParam * math.signum(r) }
      else { if (r > 0) 1.0 - lossParam else -lossParam }
    }
    // fixed-rate full-batch GD can diverge on unscaled large-magnitude
    // features; NaN/Inf here would serialize as unquoted json tokens in
    // gd_linear.json and unparseable oracle literals — fail loudly instead
    // (the warm-start path guards its SEED the same way)
    require(w.forall(java.lang.Double.isFinite) && java.lang.Double.isFinite(b),
      s"$loss regression diverged to non-finite parameters — " +
        "standard-scale the features (preprocess scale=standard) or lower the learning rate")
    (w, b)
  }
}

/** Linear serving head with explicit parameters — what a huber/quantile
  * GD fit registers. Output contract matches MLlib's
  * LinearRegressionModel (`prediction` = b + ⟨w, v⟩); the dot product
  * folds left-associatively in index order, so the served prediction
  * replays in SQL with the parameters as literals (the m14/m15 oracles'
  * contract — the x8/GdLogisticModel float discipline). */
class GdLinearModel(
    override val uid: String,
    val coefficients: Array[Double],
    val intercept: Double) extends Transformer with MLWritable {

  def this(coefficients: Array[Double], intercept: Double) =
    this(Identifiable.randomUID("gdLinear"), coefficients, intercept)

  private def predictOne(v: Vector): Double = {
    var dot = 0.0
    var i = 0
    while (i < coefficients.length) { dot += coefficients(i) * v(i); i += 1 }
    intercept + dot
  }

  override def transform(df: Dataset[_]): DataFrame = {
    val predUdf = udf { (v: Vector) => predictOne(v) }
    df.withColumn("prediction", predUdf(col("features")))
  }

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+ StructField("prediction", DoubleType, nullable = false))

  override def copy(extra: ParamMap): GdLinearModel =
    new GdLinearModel(uid, coefficients.clone(), intercept)

  override def write: MLWriter = new MLWriter {
    override protected def saveImpl(path: String): Unit = {
      implicit val fmts: Formats = DefaultFormats
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$path/gd_linear.json"),
        Serialization.write(Map(
          "uid" -> uid,
          "coefficients" -> coefficients.toSeq,
          "intercept" -> intercept)))
    }
  }
}

object GdLinearModel extends MLReadable[GdLinearModel] {
  override def read: MLReader[GdLinearModel] = new MLReader[GdLinearModel] {
    override def load(path: String): GdLinearModel = {
      implicit val fmts: Formats = DefaultFormats
      val j = JsonMethods.parse(java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$path/gd_linear.json")))
      new GdLinearModel(
        (j \ "uid").extract[String],
        (j \ "coefficients").extract[Seq[Double]].toArray,
        (j \ "intercept").extract[Double])
    }
  }
}
