package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml._

/** Train-lifecycle tests mirroring the reference's per-runtime train tests
  * (api.rs:1581-1739) plus exact-semantics preprocessing/metrics checks.
  */
class MlSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def newTrainer() =
    new Trainer(spark, Files.createTempDirectory("graft_reg_").toString)

  test("linear regression recovers a known linear function; predict via registry") {
    // y = 3x + 2 exactly → OLS must recover it
    val df = (1 to 100).map(i => (i.toDouble, 3.0 * i + 2.0)).toDF("x", "y")
    val t = newTrainer()
    val res = t.train("proj_lin", "regression", df, Some("y"), "linear",
      testSampling = "last")
    assert(res.deployed)
    assert(res.metrics("r2") > 0.99999)
    assert(res.metrics("mse") < 1e-6)
    val pred = t.registry.predict("proj_lin", Seq((200.0, 0.0)).toDF("x", "y"))
    val p = pred.select("prediction").as[Double].head()
    assert(math.abs(p - 602.0) < 1e-3)
  }

  test("classification: logistic + random_forest, metrics and auto-deploy compare") {
    val df = (1 to 200).map { i =>
      val x1 = (i % 40).toDouble
      (x1, (i % 3).toDouble, if (x1 >= 20) 1.0 else 0.0)
    }.toDF("x1", "x2", "label")
    val t = newTrainer()
    val r1 = t.train("proj_clf", "classification", df, Some("label"), "linear",
      testSampling = "stratified")
    assert(r1.deployed)
    assert(r1.metrics("f1") > 0.9)
    assert(r1.metrics.contains("roc_auc") && r1.metrics("roc_auc") > 0.9)
    assert(r1.metrics.contains("log_loss"))
    val r2 = t.train("proj_clf", "classification", df, Some("label"), "random_forest")
    // reference tie semantics (api.rs): the second model deploys UNLESS the
    // deployed one is strictly better — a tie deploys the new model
    val dep = t.registry.currentDeployment("proj_clf").get
    if (r2.metrics("f1") >= r1.metrics("f1")) assert(dep.model_id == r2.modelId)
    else assert(dep.model_id == r1.modelId && !r2.deployed)
  }

  test("knn: classification vote + regression mean match the stored-set contract; round-trips") {
    // 2D points in two tight clusters; labels by cluster — knn must be
    // perfect on the training region
    val df = (0 until 60).map { i =>
      val c = i % 2
      (c * 10.0 + (i % 5) * 0.1, c * -8.0 + (i % 3) * 0.1, c.toDouble)
    }.toDF("a", "b", "label")
    val t = newTrainer()
    val res = t.train("proj_knn", "classification", df, Some("label"), "knn",
      hyperparams = Map("n_neighbors" -> 3), testSampling = "stratified")
    assert(res.metrics("f1") == 1.0, s"knn f1: ${res.metrics}")
    // algorithm recorded as requested, not as a substitute
    assert(t.registry.models.where(col("model_id") === res.modelId)
      .select("algorithm").as[String].head() == "knn")
    // serving survives a cache clear (MLReadable round-trip)
    val probe = Seq((10.2, -7.9, 0.0), (0.1, 0.2, 0.0)).toDF("a", "b", "label")
    val before = t.registry.predict("proj_knn", probe)
      .select("prediction").as[Double].collect().toSeq
    assert(before == Seq(1.0, 0.0))
    t.registry.clearServingCaches()
    val after = t.registry.predict("proj_knn", probe)
      .select("prediction").as[Double].collect().toSeq
    assert(before == after)
    // regression mode: prediction = mean of the k neighbour labels
    val rdf = (0 until 30).map(i => (i.toDouble, i.toDouble * 2)).toDF("x", "y")
    val rr = t.train("proj_knn_r", "regression", rdf, Some("y"), "knn",
      hyperparams = Map("n_neighbors" -> 3), testSampling = "last")
    val p = t.registry.predict("proj_knn_r", Seq((10.0, 0.0)).toDF("x", "y"))
      .select("prediction").as[Double].head()
    // neighbours of x=10 are {9, 10, 11} → mean(18, 20, 22) = 20
    assert(math.abs(p - 20.0) < 1e-9, s"knn regression: $p")
  }

  test("huber is robust to outliers where OLS is not; quantile τ shifts the fit") {
    // y = 2x with 10% gross positive outliers: OLS chases them, huber
    // shouldn't
    val df = (1 to 200).map { i =>
      val x = (i % 20).toDouble / 20.0
      val y = 2.0 * x + (if (i % 10 == 0) 50.0 else 0.0)
      (x, y)
    }.toDF("x", "y")
    val t = newTrainer()
    def fitB(algo: String, hp: Map[String, Any]): Double = {
      val res = t.train(s"proj_$algo", "regression", df, Some("y"), algo,
        hyperparams = hp,
        preprocess = Map("x" -> ColumnPlan("x", scale = "standard")),
        testSize = 0.0)
      val (_, b) = t.registry.linearParams(res.modelId)
      b // with standardized x, the intercept is the fit's centre estimate
    }
    val bHuber = fitB("huber", Map("epsilon" -> 0.5, "epochs" -> 400))
    val bOls = {
      val res = t.train("proj_ols_cmp", "regression", df, Some("y"), "linear",
        preprocess = Map("x" -> ColumnPlan("x", scale = "standard")), testSize = 0.0)
      t.registry.linearParams(res.modelId)._2
    }
    // OLS centre ≈ mean(y) ≈ 2x̄ + 5; huber centre stays near the inlier line
    assert(bHuber < bOls - 2.0,
      s"huber not robust: huber b=$bHuber vs ols b=$bOls")
    // quantile: higher τ ⇒ higher fitted level on asymmetric data
    val b30 = fitB("quantile", Map("quantile" -> 0.3, "epochs" -> 400))
    val b80 = fitB("quantile", Map("quantile" -> 0.8, "epochs" -> 400))
    assert(b80 > b30, s"quantile τ ordering violated: τ=0.8 b=$b80 vs τ=0.3 b=$b30")
  }

  test("ada_boost and bagging map to the boosting/bagging tree families and fit") {
    val df = (1 to 150).map { i =>
      val x1 = (i % 30).toDouble
      (x1, (i % 7).toDouble, x1 * 2 + (i % 7))
    }.toDF("x1", "x2", "y")
    val t = newTrainer()
    for (algo <- Seq("ada_boost", "bagging")) {
      val res = t.train(s"proj_$algo", "regression", df, Some("y"), algo,
        hyperparams = Map("n_estimators" -> 5), testSampling = "last")
      assert(res.metrics("r2") > 0.9, s"$algo r2: ${res.metrics}")
      assert(t.registry.models.where(col("model_id") === res.modelId)
        .select("algorithm").as[String].head() == algo)
      // the ensemble introspection surface resolves (the m16/m17 oracle seam)
      val (roots, weights, divisor) = t.registry.treeEnsemble(res.modelId)
      assert(roots.length == 5 && weights.length == 5)
      assert(if (algo == "bagging") divisor == 5.0 else divisor == 1.0)
    }
    // classification side dispatches too
    val cdf = (1 to 100).map { i =>
      val x = (i % 20).toDouble
      (x, if (x >= 10) 1.0 else 0.0)
    }.toDF("x", "label")
    for (algo <- Seq("ada_boost", "bagging")) {
      val res = t.train(s"projc_$algo", "classification", cdf, Some("label"), algo,
        testSampling = "stratified")
      assert(res.metrics("f1") > 0.9, s"$algo classification f1: ${res.metrics}")
    }
  }

  test("kmeans clustering and pca decomposition produce metrics") {
    val df = (1 to 90).map { i =>
      val c = i % 3
      (c * 10.0 + (i % 5) * 0.1, c * -5.0 + (i % 7) * 0.1)
    }.toDF("a", "b")
    val t = newTrainer()
    val km = t.train("proj_km", "clustering", df, None, "kmeans",
      hyperparams = Map("n_clusters" -> 3))
    assert(km.metrics("silhouette") > 0.8) // well-separated synthetic clusters
    val pca = t.train("proj_pca", "decomposition", df, None, "pca",
      hyperparams = Map("n_components" -> 1))
    assert(pca.metrics("cumulative_explained_variance") > 0.9)
  }

  test("preprocessing: NULL category 0, unseen NaN -> impute, one-hot k-1, scaling") {
    val train = Seq(
      (Some("red"), Some(10.0)), (Some("blue"), Some(20.0)),
      (None, Some(30.0)), (Some("red"), None)
    ).toDF("color", "v")
    // native encode: NULL -> 0; categories sorted get 1..k
    val fitted = Preprocessor.fit(train,
      Seq(ColumnPlan("color", encode = "native", impute = "zero"),
        ColumnPlan("v", impute = "mean", scale = "standard")), "v")
    val out = Preprocessor.transform(train, fitted)
      .select(col("color__f"), col("v__f")).collect()
    val colorVals = out.map(_.getDouble(0))
    assert(colorVals.toSet == Set(0.0, 1.0, 2.0)) // __NULL__=0, blue=1, red=2
    // unseen category at serve time -> NaN -> imputed to 0
    val serve = Seq((Some("green"), Some(10.0))).toDF("color", "v")
    val sv = Preprocessor.transform(serve, fitted).select("color__f").as[Double].head()
    assert(sv == 0.0)
    // v: mean imputation of the missing value; standard scaling uses
    // train stats of non-null values (mean 20, std_pop ~8.165)
    val vVals = Preprocessor.transform(train, fitted).select("v__f").as[Double].collect()
    assert(math.abs(vVals.map(x => x).sum) < 1e-9) // imputed-with-mean → scaled mean 0

    // one-hot drops last category
    val oh = Preprocessor.fit(train, Seq(ColumnPlan("color", encode = "one_hot")), "v")
    val ohNames = Preprocessor.featureNames(oh)
    assert(ohNames.size == 2) // 3 categories -> 2 columns
    // ordinal encoding with explicit order
    val ord = Preprocessor.fit(train,
      Seq(ColumnPlan("color", encode = "ordinal", ordinalValues = Seq("blue", "red"))), "v")
    val ordVals = Preprocessor.transform(train, ord).select("color__f").as[Double].collect()
    assert(ordVals.toSet == Set(0.0, 1.0, 2.0))
  }

  test("preprocessing fails loudly when a needed stat is NULL (all-null column)") {
    // regression: impute=mean on an all-null column silently imputed 0.0
    val train = Seq((Option.empty[Double], 1.0), (None, 2.0)).toDF("v", "y")
    val ex = intercept[IllegalArgumentException] {
      Preprocessor.fit(train, Seq(ColumnPlan("v", impute = "mean")), "y")
    }
    assert(ex.getMessage.contains("mean") && ex.getMessage.contains("'v'"))
    val ex2 = intercept[IllegalArgumentException] {
      Preprocessor.fit(train, Seq(ColumnPlan("v", impute = "mode")), "y")
    }
    assert(ex2.getMessage.contains("mode"))
    // impute=zero needs no stats and still works on an all-null column
    val ok = Preprocessor.fit(train, Seq(ColumnPlan("v", impute = "zero")), "y")
    val vals = Preprocessor.transform(train, ok).select("v__f").as[Double].collect()
    assert(vals.toSeq == Seq(0.0, 0.0))
  }

  test("classification metrics match hand-computed confusion matrix") {
    // y:    a a a b b c
    // pred: a a b b b a
    val pred = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"), ("c", "a"))
      .toDF("y", "p")
    val m = Metrics.classification(pred, "y", "p")
    assert(math.abs(m("accuracy") - 4.0 / 6) < 1e-12)
    // per-class: a: p=2/3 r=2/3 f1=2/3 ; b: p=2/3 r=1 f1=0.8 ; c: p=0 r=0 f1=0
    assert(math.abs(m("f1") - (2.0 / 3 + 0.8 + 0.0) / 3) < 1e-12)
    assert(math.abs(m("precision") - (2.0 / 3 + 2.0 / 3 + 0) / 3) < 1e-12)
    assert(math.abs(m("recall") - (2.0 / 3 + 1.0 + 0) / 3) < 1e-12)
  }

  test("roc_auc matches the closed-form on a small example") {
    // scores: pos {0.9, 0.8, 0.3}, neg {0.7, 0.2, 0.1} → 8 of 9 pos>neg pairs
    val df = Seq((1, 0.9), (1, 0.8), (0, 0.7), (1, 0.3), (0, 0.2), (0, 0.1)).toDF("y", "s")
    assert(math.abs(Metrics.rocAuc(df, "y", "s") - 8.0 / 9.0) < 1e-12)
    // tie handling: all scores equal → AUC 0.5
    val ties = Seq((1, 0.5), (0, 0.5), (1, 0.5), (0, 0.5)).toDF("y", "s")
    assert(math.abs(Metrics.rocAuc(ties, "y", "s") - 0.5) < 1e-12)
  }

  test("deploy strategies: best_score, most_recent, rollback") {
    val df = (1 to 60).map(i => (i.toDouble, 2.0 * i + (i % 7))).toDF("x", "y")
    val t = newTrainer()
    val a = t.train("p", "regression", df, Some("y"), "linear")
    val b = t.train("p", "regression", df, Some("y"), "ridge",
      hyperparams = Map("alpha" -> 100.0)) // worse
    assert(t.registry.resolveStrategy("p", "best_score").contains(a.modelId))
    assert(t.registry.resolveStrategy("p", "most_recent").contains(b.modelId))
    t.registry.deploy("p", b.modelId, "specific")
    assert(t.registry.resolveStrategy("p", "rollback").contains(a.modelId))
  }

  test("every algorithm.rs enum name trains, serves, and records its executing family") {
    // the full pgml.algorithm enum (orm/algorithm.rs:6-52) minus the three
    // that never reach the train dispatch: dbscan/optics (label the fitted
    // set, no predict() — asserted below) and transformers (the tune path)
    val reg = (alg: String) => alg -> "regression"
    val clf = (alg: String) => alg -> "classification"
    val clu = (alg: String) => alg -> "clustering"
    val expected = Map[String, String](
      // linear family — exact fits, no substitution
      "linear" -> "LinearRegression", "ridge" -> "LinearRegression",
      "lasso" -> "LinearRegression", "elastic_net" -> "LinearRegression",
      "stochastic_gradient_descent" -> "LinearRegression",
      // sparse/Bayesian linear tail → L1/L2 nearest family
      "least_angle" -> "LinearRegression",
      "lasso_least_angle" -> "LinearRegression",
      "orthogonal_matching_pursuit" -> "LinearRegression",
      "bayesian_ridge" -> "LinearRegression",
      "automatic_relevance_determination" -> "LinearRegression",
      // robust tail → the huber GD head
      "huber" -> "GdLinear", "quantile" -> "GdLinear",
      "ransac" -> "GdLinear", "theil_sen" -> "GdLinear",
      // kernel tail → RFF pipeline under the sklearn default kernels
      // (SVR/GPR default rbf; KernelRidge defaults kernel='linear')
      "svm" -> "RffTransformer+LinearRegression",
      "nu_svm" -> "RffTransformer+LinearRegression",
      "kernel_ridge" -> "LinearRegression",
      "gaussian_process" -> "RffTransformer+LinearRegression",
      // trees
      "random_forest" -> "RandomForestRegression",
      "extra_trees" -> "RandomForestRegression",
      "bagging" -> "RandomForestRegression",
      "xgboost_random_forest" -> "RandomForestRegression",
      "gradient_boosting_trees" -> "GBTRegression",
      "hist_gradient_boosting" -> "GBTRegression",
      "xgboost" -> "GBTRegression", "lightgbm" -> "GBTRegression",
      "ada_boost" -> "GBTRegression", "catboost" -> "GBTRegression",
      "knn" -> "Knn",
      // classification-only names → hinge separator
      "perceptron" -> "LinearSVC", "passive_aggressive" -> "LinearSVC",
      "linear_svm" -> "LinearSVC",
      // clustering
      "kmeans" -> "KMeans", "mini_batch_kmeans" -> "KMeans",
      "birch" -> "BisectingKMeans", "feature_agglomeration" -> "BisectingKMeans",
      "affinity_propagation" -> "GaussianMixture",
      "mean_shift" -> "GaussianMixture", "spectral" -> "GaussianMixture",
      "spectral_bi" -> "GaussianMixture", "spectral_co" -> "GaussianMixture",
      "pca" -> "PCA")
    val tasks: Seq[(String, String)] =
      Seq("linear", "ridge", "lasso", "elastic_net", "least_angle",
        "lasso_least_angle", "orthogonal_matching_pursuit", "bayesian_ridge",
        "automatic_relevance_determination", "stochastic_gradient_descent",
        "huber", "quantile", "ransac", "theil_sen", "svm", "nu_svm",
        "kernel_ridge", "gaussian_process", "random_forest", "extra_trees",
        "bagging", "xgboost_random_forest", "gradient_boosting_trees",
        "hist_gradient_boosting", "xgboost", "lightgbm", "ada_boost",
        "catboost", "knn").map(reg) ++
      Seq("perceptron", "passive_aggressive", "linear_svm").map(clf) ++
      Seq("kmeans", "mini_batch_kmeans", "birch", "feature_agglomeration",
        "affinity_propagation", "mean_shift", "spectral", "spectral_bi",
        "spectral_co").map(clu) :+ ("pca" -> "decomposition")
    val rdf = (1 to 60).map(i =>
      ((i % 13).toDouble, (i % 7).toDouble, 2.0 * (i % 13) + (i % 7)))
      .toDF("x1", "x2", "y")
    val cdf = (1 to 60).map(i =>
      ((i % 13).toDouble, (i % 7).toDouble, if (i % 13 >= 6) 1.0 else 0.0))
      .toDF("x1", "x2", "y")
    val t = newTrainer()
    for ((alg, task) <- tasks) {
      val (rel, y) = task match {
        case "regression" => (rdf, Some("y"))
        case "classification" => (cdf, Some("y"))
        case _ => (rdf.select("x1", "x2"), None)
      }
      val res = t.train(s"sweep_$alg", task, rel, y, alg, testSize = 0.0,
        hyperparams = Map("n_clusters" -> 3))
      val row = t.registry.models.where(col("model_id") === res.modelId)
        .select("algorithm", "runtime").head()
      assert(row.getString(0) == alg)
      assert(row.getString(1) == expected(alg),
        s"$alg: runtime ${row.getString(1)}, want ${expected(alg)}")
      val servedCol = if (task == "decomposition") "pca" else "prediction"
      val served = t.registry.predictWithModel(res.modelId,
        rel.limit(3)).select(servedCol)
      assert(served.na.drop().count() == 3, s"$alg served nulls")
    }
    // the two density clusterers never serve predict() — loud contract
    val err = intercept[IllegalArgumentException] {
      t.train("sweep_dbscan", "clustering", rdf.select("x1", "x2"), None, "dbscan")
    }
    assert(err.getMessage.contains("Dbscan"))
  }

  test("splitters registry: get-or-create dedups; rows dump and reload") {
    val t = newTrainer()
    val a = t.registry.getOrCreateSplitter("recursive_character",
      """{"chunk_size": 1500, "chunk_overlap": 40}""", 1L)
    val b = t.registry.getOrCreateSplitter("recursive_character",
      """{"chunk_size": 1500, "chunk_overlap": 40}""", 1L)
    assert(a == b, "same (name, parameters, project) must reuse its row")
    val c = t.registry.getOrCreateSplitter("recursive_character",
      """{"chunk_size": 1500, "chunk_overlap": 40}""", 2L) // other project
    val d = t.registry.getOrCreateSplitter("markdown", """{}""", 1L)
    assert(Set(a, c, d).size == 3)
    assert(t.registry.splitters.count() == 3)
    val dump = Files.createTempDirectory("graft_split_dump_").toString
    t.registry.dumpAll(dump)
    val re = newTrainer().registry.loadSplitters(dump)
    assert(re.count() == 3)
    assert(re.where(col("name") === "recursive_character")
      .select("parameters").as[String].collect()
      .forall(_ == """{"chunk_size": 1500, "chunk_overlap": 40}"""))
  }

  test("splitter ids: concurrent registrations yield exactly one id per config") {
    val t = newTrainer()
    val configs = Seq(
      ("recursive_character", """{"chunk_size": 256}""", 1L),
      ("recursive_character", """{"chunk_size": 512}""", 1L),
      ("character", """{"chunk_size": 256}""", 1L),
      ("markdown", """{}""", 2L))
    // 4 configs × 4 racers each, all released through one barrier so the
    // max(id)+1 window is actually contended — the pre-fix allocator mints
    // the SAME id for DIFFERENT configs under exactly this schedule
    val barrier = new java.util.concurrent.CyclicBarrier(configs.size * 4)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(configs.size * 4)
    try {
      val futures = (0 until 4).flatMap { _ =>
        configs.map { case (n, p, pid) =>
          pool.submit(new java.util.concurrent.Callable[((String, String, Long), Long)] {
            def call() = {
              barrier.await()
              ((n, p, pid), t.registry.getOrCreateSplitter(n, p, pid))
            }
          })
        }
      }
      val got = futures.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
      val byConfig = got.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      byConfig.foreach { case (cfg, ids) =>
        assert(ids.size == 1, s"config $cfg resolved to multiple ids: $ids")
      }
      val perConfig = byConfig.values.map(_.head).toSeq
      assert(perConfig.distinct.size == configs.size,
        s"distinct configs shared an id: $byConfig")
      // later readers converge on the same ids (min-per-config), and a
      // fresh Registry over the same dir agrees
      configs.foreach { case (n, p, pid) =>
        assert(t.registry.getOrCreateSplitter(n, p, pid) == byConfig((n, p, pid)).head)
      }
    } finally pool.shutdownNow()
  }

  test("migrate() upgrades a pre-runtime-column registry layout in place") {
    val regDir = Files.createTempDirectory("graft_reg_old_").toString
    // an r13-layout models table: rows WITHOUT the runtime column
    graft.store.DeltaTable.appendLogFilesLocal(s"$regDir/models",
      Seq("model_id" -> "long", "project" -> "string", "task" -> "string",
        "algorithm" -> "string", "hyperparams" -> "string",
        "metrics" -> "string", "created_at" -> "string"),
      Seq(Seq(1L, "old_p", "regression", "linear", "{}", """{"r2": 0.5}""",
        "2026-01-01T00:00:00Z")))
    graft.store.DeltaTable.appendLogFilesLocal(s"$regDir/deployments",
      Seq("project" -> "string", "model_id" -> "long", "strategy" -> "string",
        "created_at" -> "string", "seq" -> "long"),
      Seq(Seq("old_p", 1L, "new_score", "2026-01-01T00:00:00Z", 1L)))
    val reg = new Registry(spark, regDir)
    reg.migrate()
    // every file now carries the FULL current schema — a single-file
    // (non-mergeSchema) reader sees the runtime column, null for old rows
    val files = new java.io.File(s"$regDir/models").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val sch = spark.read.parquet(f.getPath).schema.fieldNames.toSet
      assert(sch == Set("model_id", "project", "task", "algorithm", "runtime",
        "hyperparams", "metrics", "created_at"), s"${f.getName}: $sch")
    }
    val row = reg.models.where(col("model_id") === 1L)
      .select("algorithm", "runtime").head()
    assert(row.getString(0) == "linear" && row.isNullAt(1))
    // deployments were already current: migrate() must not have rewritten
    // them (idempotence on the current layout), and the pointer still works
    assert(reg.currentDeployment("old_p").exists(_.model_id == 1L))
    val before = new java.io.File(s"$regDir/models").listFiles()
      .map(_.getName).toSet
    reg.migrate() // second run: no-op
    assert(new java.io.File(s"$regDir/models").listFiles()
      .map(_.getName).toSet == before)
  }
}
