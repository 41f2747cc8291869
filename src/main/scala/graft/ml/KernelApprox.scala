package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.linalg.{SQLDataTypes, Vector, Vectors}
import org.apache.spark.ml.param.{DoubleArrayParam, IntParam, Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, udf}
import org.apache.spark.sql.types.{StructField, StructType}

/** Random Fourier feature map (Rahimi & Rahimi-Recht, "Random Features for
  * Large-Scale Kernel Machines", NIPS 2007): z(x) = √(2/D) ·
  * [cos(w₁ᵀx + b₁), …, cos(w_Dᵀx + b_D)] with w ~ N(0, 2γ·I) and
  * b ~ U(0, 2π), so z(x)ᵀz(y) →_D exp(−γ‖x−y‖²) — the RBF kernel.
  *
  * This is how the reference's `svm` / `nu_svm` algorithms (sklearn SVC /
  * NuSVC, RBF kernel by default — pgml-extension/src/orm/algorithm.rs:6-52)
  * are served at Spark scale: sklearn's own documented large-corpus path is
  * exactly this approximation (`sklearn.kernel_approximation.RBFSampler` +
  * a linear model) because exact kernel SVMs are O(n²) in support-vector
  * count; a linear SVC over the randomized feature map trains distributed
  * and predicts in O(D·d) per row. The drawn frequencies ride the
  * transformer's Params (plain JSON metadata), so the fitted pipeline
  * persists and reloads through MLlib's own writers — no custom storage.
  *
  * Determinism: frequencies come from a seeded SplittableRandom keyed by
  * (seed, component, dim) — identical data + seed ⇒ identical model.
  */
final class RffTransformer(override val uid: String)
    extends Transformer with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("rff"))

  final val inputCol: Param[String] =
    new Param[String](this, "inputCol", "input features column")
  final val outputCol: Param[String] =
    new Param[String](this, "outputCol", "output features column")
  /** Row-major D×d frequency matrix. */
  final val weights: DoubleArrayParam =
    new DoubleArrayParam(this, "weights", "row-major D x d frequency matrix")
  final val offsets: DoubleArrayParam =
    new DoubleArrayParam(this, "offsets", "phase offsets, length D")
  final val inDim: IntParam = new IntParam(this, "inDim", "input dimension d")

  setDefault(inputCol -> "features", outputCol -> "rff_features")

  def setInputCol(v: String): this.type = set(inputCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def setWeights(v: Array[Double]): this.type = set(weights, v)
  def setOffsets(v: Array[Double]): this.type = set(offsets, v)
  def setInDim(v: Int): this.type = set(inDim, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val w = $(weights); val b = $(offsets); val d = $(inDim)
    val nc = b.length
    require(w.length == nc * d, s"weights ${w.length} != $nc x $d")
    val scale = math.sqrt(2.0 / nc)
    val mapF = udf { (v: Vector) =>
      val x = v.toArray
      require(x.length == d, s"feature dim ${x.length} != fitted dim $d")
      val out = new Array[Double](nc)
      var i = 0
      while (i < nc) {
        var s = b(i)
        var j = 0
        while (j < d) { s += w(i * d + j) * x(j); j += 1 }
        out(i) = scale * math.cos(s)
        i += 1
      }
      Vectors.dense(out)
    }
    ds.withColumn($(outputCol), mapF(col($(inputCol))))
  }

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+
      StructField($(outputCol), SQLDataTypes.VectorType, nullable = false))

  override def copy(extra: ParamMap): RffTransformer = defaultCopy(extra)
}

object RffTransformer extends DefaultParamsReadable[RffTransformer] {

  /** Draw the RBF feature map: `nComponents` frequencies over `inDim` dims
    * at bandwidth `gamma` (w ~ N(0, 2γ) per coordinate), seeded. */
  def draw(inDim: Int, nComponents: Int, gamma: Double, seed: Long): RffTransformer = {
    require(inDim > 0 && nComponents > 0 && gamma > 0,
      s"invalid RFF shape: d=$inDim D=$nComponents gamma=$gamma")
    val sd = math.sqrt(2.0 * gamma)
    val w = new Array[Double](nComponents * inDim)
    val b = new Array[Double](nComponents)
    var i = 0
    while (i < nComponents) {
      val r = new java.util.SplittableRandom(seed ^ (i.toLong * 0x9E3779B97F4A7C15L))
      b(i) = r.nextDouble() * 2.0 * math.Pi
      var j = 0
      while (j < inDim) { w(i * inDim + j) = r.nextGaussian() * sd; j += 1 }
      i += 1
    }
    new RffTransformer()
      .setInDim(inDim).setWeights(w).setOffsets(b)
  }
}
