package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{RffTransformer, Trainer}

/** Kernel-SVM via random Fourier features (ml/KernelApprox.scala): the
  * map approximates the RBF kernel, the trained pipeline separates data a
  * linear SVM provably cannot, and the fitted model round-trips through
  * the registry's MLlib persistence (custom stage included). */
class KernelApproxSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def newTrainer() =
    new Trainer(spark, Files.createTempDirectory("graft_reg_").toString)

  // deterministic XOR-ish clouds: label = 1 iff x·y > 0 — not linearly
  // separable by construction
  private def xorDf(n: Int) = (1 to n).map { i =>
    val r = new java.util.SplittableRandom(i.toLong * 7919L)
    val x = r.nextDouble() * 2 - 1
    val y = r.nextDouble() * 2 - 1
    (x, y, if (x * y > 0) 1.0 else 0.0)
  }.toDF("x", "y", "label")

  test("RFF inner products approximate the RBF kernel") {
    val gamma = 0.7
    val rff = RffTransformer.draw(3, 4096, gamma, seed = 42L)
    val pts = Seq(
      Array(0.0, 0.0, 0.0), Array(1.0, -0.5, 0.25), Array(-2.0, 1.0, 0.5))
    val df = pts.zipWithIndex
      .map { case (p, i) => (i, org.apache.spark.ml.linalg.Vectors.dense(p)) }
      .toDF("id", "features")
    val z = rff.transform(df).orderBy("id")
      .select("rff_features").collect()
      .map(_.getAs[org.apache.spark.ml.linalg.Vector](0).toArray)
    for (a <- pts.indices; b <- pts.indices if a < b) {
      val dot = z(a).zip(z(b)).map { case (u, v) => u * v }.sum
      val d2 = pts(a).zip(pts(b)).map { case (u, v) => (u - v) * (u - v) }.sum
      val want = math.exp(-gamma * d2)
      assert(math.abs(dot - want) < 0.05, s"pair ($a,$b): $dot vs $want")
    }
  }

  test("svm (RBF) separates XOR where linear_svm cannot; registry round-trip") {
    val df = xorDf(400)
    val t = newTrainer()
    val lin = t.train("xor_lin", "classification", df, Some("label"), "linear_svm",
      hyperparams = Map.empty, testSampling = "last")
    val rbf = t.train("xor_rbf", "classification", df, Some("label"), "svm",
      hyperparams = Map("n_components" -> 200, "gamma" -> 2.0),
      testSampling = "last")
    assert(lin.metrics("f1") < 0.75, s"linear unexpectedly fits XOR: ${lin.metrics}")
    assert(rbf.metrics("f1") > 0.9, s"RBF SVM failed on XOR: ${rbf.metrics}")

    // persistence: drop the serving cache and predict through the reloaded
    // PipelineModel (custom RFF stage reloads via its companion reader)
    val cached = t.registry.predict("xor_rbf", df.limit(50))
      .select("prediction").as[Double].collect().toSeq
    t.registry.clearServingCaches()
    val reloaded = t.registry.predict("xor_rbf", df.limit(50))
      .select("prediction").as[Double].collect().toSeq
    assert(cached == reloaded)
  }

  test("svm regression (RFF + ridge) fits a nonlinear surface better than linear") {
    val df = (1 to 300).map { i =>
      val r = new java.util.SplittableRandom(i.toLong * 104729L)
      val x = r.nextDouble() * 4 - 2
      (x, math.sin(2.0 * x))
    }.toDF("x", "y")
    val t = newTrainer()
    val lin = t.train("sin_lin", "regression", df, Some("y"), "linear",
      testSampling = "last")
    val svr = t.train("sin_svr", "regression", df, Some("y"), "svm",
      hyperparams = Map("n_components" -> 200, "gamma" -> 1.0, "alpha" -> 0.01),
      testSampling = "last")
    assert(svr.metrics("r2") > 0.9, s"SVR failed: ${svr.metrics}")
    assert(svr.metrics("r2") > lin.metrics("r2") + 0.2)
  }

  test("kernel='linear' hyperparam stands the feature map down") {
    val df = xorDf(120)
    val t = newTrainer()
    val r = t.train("xor_lin_kernel", "classification", df, Some("label"), "svm",
      hyperparams = Map("kernel" -> "linear"), testSampling = "last")
    // plain LinearSVC: persists as LinearSVCModel, not a pipeline
    assert(r.metrics("f1") <= 0.8)
  }
}
