package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util.{Identifiable, MLReadable, MLReader, MLWritable, MLWriter}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}
import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

/** Continued (warm-start) training for `pgml.tune` — the reference's tune
  * does real gradient updates on the deployed checkpoint
  * (pgml-extension/src/api.rs:846-995, orm/model.rs:161-330); this is the
  * same lifecycle over the MLlib-family text head: seed from the DEPLOYED
  * model's coefficients, run full-batch gradient descent on the tune
  * relation, register the updated model, auto-deploy on metric
  * improvement.
  *
  * Scale shape: each epoch is ONE distributed pass — the coefficient
  * vector broadcasts (64 doubles here; a real text head is still KBs),
  * executors fold per-partition gradient partials, and treeAggregate
  * merges them back (MLlib's own optimizer loop shape, map-side combine
  * by construction). No per-row driver work, no collect of the data.
  * Epoch cost is O(rows/partitions) per executor regardless of corpus
  * size; the driver holds only the d+1 parameters.
  */
object WarmStart {

  /** Full-batch binary-logistic gradient descent from an initial
    * (coefficients, intercept). `data` must carry `featuresCol: Vector`
    * and a 0/1 `labelCol`. Deterministic given the data (the final
    * parameters are what the serving oracle inlines as literals; the
    * treeAggregate partial-sum order does not need cross-engine replay).
    */
  def continueLogisticBinary(
      init: Array[Double], initIntercept: Double,
      data: DataFrame, featuresCol: String, labelCol: String,
      epochs: Int = 60, learningRate: Double = 2.0, l2: Double = 0.0): (Array[Double], Double) =
    gdEpochs(init, initIntercept, data, featuresCol, labelCol,
      epochs, learningRate, l2, "warm-start tune") { (m, y) =>
      1.0 / (1.0 + math.exp(-m)) - y
    }

  /** The shared full-batch GD epoch loop both the logistic warm start and
    * the huber/quantile regression fits instantiate: per epoch the d+1
    * parameters broadcast, executors fold per-partition partials of
    * (g·x, Σg) where `g = pointGrad(margin, y)` and
    * `margin = b + ⟨w, x⟩` (left-assoc, intercept-seeded), treeAggregate
    * merges, the driver steps by `lr·(g/n + l2·w)` and destroys the
    * broadcast. One distributed pass per epoch, O(d) driver state, no
    * data collect. Deterministic given data + init.
    */
  private[ml] def gdEpochs(
      init: Array[Double], initIntercept: Double,
      data: DataFrame, featuresCol: String, labelCol: String,
      epochs: Int, learningRate: Double, l2: Double, what: String)(
      pointGrad: (Double, Double) => Double): (Array[Double], Double) = {
    val d = init.length
    val sc = data.sparkSession.sparkContext
    val rows = data.select(col(featuresCol), col(labelCol).cast("double"))
      .rdd.map(r => (r.getAs[Vector](0), r.getDouble(1)))
      .cache() // epochs passes over the same frame
    val n = rows.count().toDouble
    require(n > 0, s"$what needs at least one training row")
    var w = init.clone()
    // A warm-start seed fitted on one-class data carries MLlib's
    // infinite-intercept limit (constant-label logistic short-circuits to
    // zero coefficients and ±∞ log-odds), and ∞ survives every finite
    // gradient step — the tuned head would serialize as an unparseable
    // oracle literal. Clamp to the house one-class MLE convention
    // (QualityClassifier.OneClassIntercept: sigmoid(±10) ≈ 1∓4.5e-5,
    // decisive at any oracle rounding) so continued training resumes from
    // a finite, replayable point. NaN seeds never reach here — the tune
    // dispatch cold-fits instead of warm-starting from garbage.
    var b = if (initIntercept.isInfinite)
      math.signum(initIntercept) * graft.operators.QualityClassifier.OneClassIntercept
      else initIntercept
    for (_ <- 0 until epochs) {
      val wB = sc.broadcast(w)
      val bNow = b
      val (gw, gb) = rows.treeAggregate((new Array[Double](d), 0.0))(
        seqOp = { case ((gwAcc, gbAcc), (x, y)) =>
          val ww = wB.value
          var m = bNow
          var i = 0
          while (i < d) { m += ww(i) * x(i); i += 1 }
          val g = pointGrad(m, y)
          i = 0
          while (i < d) { gwAcc(i) += g * x(i); i += 1 }
          (gwAcc, gbAcc + g)
        },
        combOp = { case ((g1, b1), (g2, b2)) =>
          var i = 0
          while (i < d) { g1(i) += g2(i); i += 1 }
          (g1, b1 + b2)
        })
      var i = 0
      while (i < d) { w(i) -= learningRate * (gw(i) / n + l2 * w(i)); i += 1 }
      b -= learningRate * gb / n
      wB.destroy()
    }
    rows.unpersist()
    (w, b)
  }

  /** Continued Lloyd iterations from an initial set of centroids — the
    * conversation-tune warm start (the deployed retrieval-generator's
    * centers keep moving on the new tune relation instead of being refit
    * from a random seed). Same scale shape as the logistic loop: per
    * epoch the centers broadcast, executors fold per-partition
    * (sum, count) partials per cluster with an index-tie-broken argmin
    * assignment, treeAggregate merges. A cluster that captures no rows
    * keeps its previous center (the standard empty-cluster rule).
    * Deterministic given data + init.
    */
  def continueKMeans(
      initCenters: Array[Array[Double]], data: DataFrame,
      featuresCol: String, epochs: Int = 10): Array[Array[Double]] = {
    val k = initCenters.length
    require(k > 0, "warm-start kmeans needs at least one initial center")
    val d = initCenters.head.length
    val sc = data.sparkSession.sparkContext
    val rows = data.select(col(featuresCol))
      .rdd.map(_.getAs[Vector](0)).cache()
    require(rows.count() > 0, "warm-start kmeans needs at least one training row")
    var centers = initCenters.map(_.clone())
    for (_ <- 0 until epochs) {
      val cB = sc.broadcast(centers)
      val (sums, counts) = rows.treeAggregate(
        (Array.fill(k)(new Array[Double](d)), new Array[Long](k)))(
        seqOp = { case ((sAcc, nAcc), x) =>
          val cs = cB.value
          var best = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            var dist = 0.0
            var i = 0
            while (i < d) { val df = x(i) - cs(c)(i); dist += df * df; i += 1 }
            if (dist < bestD) { bestD = dist; best = c } // strict <: index tie-break
            c += 1
          }
          var i = 0
          while (i < d) { sAcc(best)(i) += x(i); i += 1 }
          nAcc(best) += 1
          (sAcc, nAcc)
        },
        combOp = { case ((s1, n1), (s2, n2)) =>
          var c = 0
          while (c < k) {
            var i = 0
            while (i < d) { s1(c)(i) += s2(c)(i); i += 1 }
            n1(c) += n2(c)
            c += 1
          }
          (s1, n1)
        })
      centers = Array.tabulate(k) { c =>
        if (counts(c) == 0) centers(c)
        else Array.tabulate(d)(i => sums(c)(i) / counts(c))
      }
      cB.destroy()
    }
    rows.unpersist()
    centers
  }
}

/** Centroid retrieval head with explicit centers — what a warm-started
  * conversation tune registers (the KMeansModel's serving contract,
  * `prediction` = index of the nearest center, without MLlib's
  * no-warm-start fit). Distances fold left-associatively in index order
  * and ties break on the LOWER index, so the assignment — and therefore
  * the generated reply — replays exactly in SQL with the centers as
  * literals (the x12 oracle's contract). */
class CentroidModel(
    override val uid: String,
    val centers: Array[Array[Double]]) extends Transformer with MLWritable {

  def this(centers: Array[Array[Double]]) =
    this(Identifiable.randomUID("centroids"), centers)

  /** Nearest-center index: left-assoc squared distance, strict-< argmin
    * (first minimum wins). Shared by transform and the driver-side
    * generate path so the two serving shapes cannot diverge. */
  def assign(v: IndexedSeq[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centers.length) {
      var dist = 0.0
      var i = 0
      while (i < centers(c).length) {
        val df = v(i) - centers(c)(i); dist += df * df; i += 1
      }
      if (dist < bestD) { bestD = dist; best = c }
      c += 1
    }
    best
  }

  /** Plan-pure assignment: the SAME left-associative squared distance in
    * index order and strict-< first-minimum as [[assign]], expressed as
    * codegen'd column arithmetic with the centers as literals (the m3
    * oracle's projection shape — no per-row UDF). Per-center distances
    * materialize as temp columns first so the argmin when-chain folds
    * over cheap column refs, not re-inlined 64-term sums. Emits
    * `prediction` as INT, matching KMeansModel's serving contract. */
  override def transform(df: Dataset[_]): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    val arr = vector_to_array(col("features"), dtype = "float64")
    val dCol = (c: Int) => s"__graft_cdist_$c"
    val withD = centers.zipWithIndex.foldLeft(df.toDF()) { case (acc, (ctr, c)) =>
      acc.withColumn(dCol(c), ctr.indices.map { i =>
        val d = element_at(arr, i + 1) - lit(ctr(i))
        d * d
      }.reduceLeft(_ + _))
    }
    val idx = (1 until centers.length).foldLeft((lit(0), col(dCol(0)))) {
      case ((bi, bd), c) =>
        (when(col(dCol(c)) < bd, lit(c)).otherwise(bi),
          when(col(dCol(c)) < bd, col(dCol(c))).otherwise(bd))
    }._1
    withD.withColumn("prediction", idx.cast("int"))
      .drop(centers.indices.map(dCol): _*)
  }

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+ StructField("prediction", IntegerType, nullable = false))

  override def copy(extra: ParamMap): CentroidModel =
    new CentroidModel(uid, centers.map(_.clone()))

  override def write: MLWriter = new MLWriter {
    override protected def saveImpl(path: String): Unit = {
      implicit val fmts: Formats = DefaultFormats
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$path/centroids.json"),
        Serialization.write(Map(
          "uid" -> uid,
          "centers" -> centers.map(_.toSeq).toSeq)))
    }
  }
}

object CentroidModel extends MLReadable[CentroidModel] {
  override def read: MLReader[CentroidModel] = new MLReader[CentroidModel] {
    override def load(path: String): CentroidModel = {
      implicit val fmts: Formats = DefaultFormats
      val j = JsonMethods.parse(java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$path/centroids.json")))
      new CentroidModel(
        (j \ "uid").extract[String],
        (j \ "centers").extract[Seq[Seq[Double]]].map(_.toArray).toArray)
    }
  }
}

/** Binary logistic serving head with explicit parameters — what a
  * warm-start tune registers. Output contract matches MLlib's binary
  * LogisticRegressionModel (`probability` = [1−p, p], `prediction` = 1
  * iff p > 0.5), so every registry surface (predict / predict_proba /
  * predict_row / metrics) serves it unchanged. The margin is computed
  * b + (left-associative Σ wᵢ·vᵢ in index order) so the served
  * probability replays IEEE-identically in SQL with the parameters as
  * literals (the x8 oracle's contract; same float discipline as c7).
  */
class GdLogisticModel(
    override val uid: String,
    val coefficients: Array[Double],
    val intercept: Double) extends Transformer with MLWritable {

  def this(coefficients: Array[Double], intercept: Double) =
    this(Identifiable.randomUID("gdLogistic"), coefficients, intercept)

  private def prob(v: Vector): Double = {
    var dot = 0.0
    var i = 0
    while (i < coefficients.length) { dot += coefficients(i) * v(i); i += 1 }
    1.0 / (1.0 + math.exp(-(intercept + dot)))
  }

  override def transform(df: Dataset[_]): DataFrame = {
    // ONE dot product per row: probability computed once, prediction
    // derived from it (p > 0.5 ⇔ margin > 0, MLlib's binary threshold)
    val probUdf = udf { (v: Vector) =>
      val p = prob(v)
      Vectors.dense(1.0 - p, p)
    }
    df.withColumn("probability", probUdf(col("features")))
      .withColumn("prediction",
        when(VectorOps.element(col("probability"), 1) > 0.5, 1.0).otherwise(0.0))
  }

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields ++ Seq(
      StructField("probability",
        org.apache.spark.ml.linalg.SQLDataTypes.VectorType, nullable = false),
      StructField("prediction", DoubleType, nullable = false)))

  override def copy(extra: ParamMap): GdLogisticModel =
    new GdLogisticModel(uid, coefficients.clone(), intercept)

  override def write: MLWriter = new MLWriter {
    override protected def saveImpl(path: String): Unit = {
      implicit val fmts: Formats = DefaultFormats
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$path/gd_logistic.json"),
        Serialization.write(Map(
          "uid" -> uid,
          "coefficients" -> coefficients.toSeq,
          "intercept" -> intercept)))
    }
  }
}

object GdLogisticModel extends MLReadable[GdLogisticModel] {
  override def read: MLReader[GdLogisticModel] = new MLReader[GdLogisticModel] {
    override def load(path: String): GdLogisticModel = {
      implicit val fmts: Formats = DefaultFormats
      val j = JsonMethods.parse(java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$path/gd_logistic.json")))
      new GdLogisticModel(
        (j \ "uid").extract[String],
        (j \ "coefficients").extract[Seq[Double]].toArray,
        (j \ "intercept").extract[Double])
    }
  }
}
