package graft.ml

import org.apache.spark.ml.{PredictionModel, Predictor}
import org.apache.spark.ml.classification.{GBTClassifier, LinearSVC, LogisticRegression, RandomForestClassifier}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{PCA, VectorAssembler}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.regression.{GBTRegressor, LinearRegression, RandomForestRegressor}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

/** `pgml.train` orchestration (pgml-extension/src/api.rs:92-330 lifecycle,
  * §3.1): project resolution → snapshot (schema reflect + stats) → split
  * sampling → per-column preprocessing → estimator fit (MLlib) → test
  * metrics → registry persist → deploy decision (better-metric wins, like
  * `value_is_better`, task.rs:83-89).
  *
  * Algorithm → MLlib mapping per SURVEY.md §2.12; unsupported reference
  * algorithms degrade to the nearest MLlib family and the substitution is
  * recorded in the model row (`runtime` field).
  */
final case class TrainResult(
    projectName: String, task: String, algorithm: String, modelId: Long,
    deployed: Boolean, metrics: Map[String, Double])

object Sampling {
  /** random | last | stratified (src/orm/sampling.rs:48-68).
    *
    * With `keyCol` (a stable row identity), the seeded shuffle order is
    * the house splitmix64 avalanche of the key instead of `rand(seed)`:
    * rand's per-partition stream changes under any repartition, so the
    * same seed gives a DIFFERENT split on a different cluster layout —
    * a keyed draw makes a 100 TB training split reproducible at any
    * scale, and SQL-replayable (SplitmixSql), so split membership itself
    * is oracle-gated (m20). Without a key the rand(seed) order remains
    * (arbitrary relations have no stable identity to hash). */
  def split(df: DataFrame, testSize: Double, sampling: String, labelCol: String,
      seed: Long = 42L, keyCol: Option[String] = None): (DataFrame, DataFrame) = {
    val n = df.count()
    val nTest = if (testSize > 1) testSize.toLong else math.round(n * testSize)
    def shuffleCols: Seq[org.apache.spark.sql.Column] = keyCol match {
      case Some(k) =>
        val kh =
          if (df.schema(k).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
            col(k).cast("long")
          else xxhash64(col(k))
        // key as tie-break: mix64 collisions cannot make the order
        // partition-dependent
        Seq(graft.functions.TextFunctions.mix64(kh, seed), col(k))
      case None => Seq(rand(seed))
    }
    val ordered = sampling match {
      case "random" => df.orderBy(shuffleCols: _*)
      case "last" => df
      case "stratified" =>
        // round-robin by label via row_number-per-label (sampling.rs:55-68)
        df.withColumn("__rn", row_number().over(
          Window.partitionBy(col(labelCol)).orderBy(shuffleCols: _*)))
          .orderBy(col("__rn"), col(labelCol)).drop("__rn")
      case other => throw new IllegalArgumentException(s"unknown sampling $other")
    }
    // contiguous [0, n) index via zipWithIndex (monotonically_increasing_id
    // jumps by 2^33 per partition, so a numeric cut over it selects garbage
    // under any multi-partition plan). The split is then a FILTER on the
    // index: no GlobalLimit funnels the train relation through a single
    // partition, and the Long cut never overflows an Int.
    val spark = df.sparkSession
    val schema = ordered.schema
      .add("__idx", org.apache.spark.sql.types.LongType, nullable = false)
    val indexed = spark.createDataFrame(
      ordered.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) },
      schema).cache() // materialize so the split is deterministic
    val cut = n - nTest
    (indexed.where(col("__idx") < cut).drop("__idx"),
      indexed.where(col("__idx") >= cut).drop("__idx"))
  }
}

class Trainer(spark: SparkSession, registryDir: String) {

  val registry = new Registry(spark, registryDir)
  private implicit val fmts: Formats = DefaultFormats

  /** The `pgml.train(...)` entry. `relation` is the snapshot frame. */
  def train(
      projectName: String,
      task: String, // regression | classification | clustering | decomposition
      relation: DataFrame,
      yCol: Option[String],
      algorithm: String = "linear",
      hyperparams: Map[String, Any] = Map.empty,
      preprocess: Map[String, ColumnPlan] = Map.empty,
      testSize: Double = 0.25,
      testSampling: String = "random",
      automaticDeploy: Boolean = true,
      // tune() records its text task in the registry while training under
      // the classification lifecycle (the reference's model row keeps the
      // tune task, api.rs:846-995); deploy metrics coincide (both f1)
      recordTaskAs: Option[String] = None): TrainResult = {

    val featureCols = relation.columns.filterNot(yCol.contains(_)).toSeq
    val plans = featureCols.map(c =>
      preprocess.getOrElse(c, ColumnPlan(c,
        impute = if (preprocess.contains(c)) "error" else "zero")))

    val (trainDf, testDf) = task match {
      case "clustering" | "decomposition" => (relation, relation)
      case _ if testSize <= 0.0 => (relation, relation) // fit on everything
      case _ => Sampling.split(relation, testSize,
        if (task == "classification" && testSampling == "stratified") "stratified" else testSampling,
        yCol.getOrElse(featureCols.head))
    }

    val fitted = Preprocessor.fit(trainDf, plans, yCol.getOrElse(featureCols.head))
    val featNames = Preprocessor.featureNames(fitted)
    val assembler = new VectorAssembler()
      .setInputCols(featNames.toArray).setOutputCol("features")
    def prep(df: DataFrame): DataFrame = assembler.transform(Preprocessor.transform(df, fitted))

    // Cache pays only for multi-pass estimators (iterative solvers, trees);
    // the normal-equations linear path reads the data exactly once for fit
    // and once for metrics — materializing a cache costs more than the two
    // streaming reads of a cheap projection.
    val singlePass = task == "regression" && algorithm == "linear"
    val trainPrep = if (singlePass) prep(trainDf) else prep(trainDf).cache()
    val testPrep = prep(testDf)

    val (model, metrics) = fitAndEvaluate(task, algorithm, hyperparams,
      trainPrep, testPrep, yCol)

    val recordedTask = recordTaskAs.getOrElse(task)
    val modelId = registry.saveModel(projectName, recordedTask, algorithm,
      hyperparams, metrics, model, fitted, featNames)

    val deployed = if (automaticDeploy)
      registry.maybeDeploy(projectName, recordedTask, modelId, metrics)
      else false
    if (!singlePass) trainPrep.unpersist()
    TrainResult(projectName, recordedTask, algorithm, modelId, deployed, metrics)
  }

  /** Hyperparameter search — grid = full cartesian product of
    * `searchParams` (× fixed hyperparams), random = n_iter-sized
    * deterministic subsample (model.rs:560-610, 794-940; defaults n_iter=10,
    * cv=5). Per combo: mean test metric over `cv` contiguous folds
    * (dataset.rs:32-68 fold slicing); best combo refits on the full train
    * split and is recorded with its search_results.
    */
  def trainWithSearch(
      projectName: String, task: String, relation: DataFrame, yCol: Option[String],
      algorithm: String,
      searchParams: Map[String, Seq[Any]],
      search: String = "grid",
      nIter: Int = 10,
      cv: Int = 5,
      hyperparams: Map[String, Any] = Map.empty,
      testSize: Double = 0.25,
      testSampling: String = "random"): TrainResult = {

    val keys = searchParams.keys.toSeq.sorted
    val grid: Seq[Map[String, Any]] = keys.foldLeft(Seq(Map.empty[String, Any])) {
      (acc, k) => acc.flatMap(m => searchParams(k).map(v => m + (k -> v)))
    }
    val combos = search match {
      case "grid" => grid
      case "random" =>
        val rnd = new scala.util.Random(42)
        rnd.shuffle(grid).take(math.min(nIter, grid.size))
      case other => throw new IllegalArgumentException(s"unknown search $other")
    }

    val (trainDf, testDf) = Sampling.split(relation, testSize, testSampling,
      yCol.getOrElse(relation.columns.head))
    val metricName = registry.defaultMetric(task)

    val featureCols = relation.columns.filterNot(yCol.contains(_)).toSeq
    val plans = featureCols.map(c => ColumnPlan(c, impute = "zero"))
    val fitted = Preprocessor.fit(trainDf, plans, yCol.getOrElse(featureCols.head))
    val assembler = new VectorAssembler()
      .setInputCols(Preprocessor.featureNames(fitted).toArray).setOutputCol("features")
    val prepped = assembler.transform(Preprocessor.transform(trainDf, fitted))
    // contiguous [0, nRows) fold index via zipWithIndex: monotonically_
    // increasing_id jumps by 2^33 per partition, so under any
    // multi-partition plan the [lo, hi) fold bounds would select nothing
    // from partitions 1+ (empty folds → rows never held out)
    val foldSchema = prepped.schema.add("__fold", org.apache.spark.sql.types.LongType, nullable = false)
    val trainPrep = spark.createDataFrame(
      prepped.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) },
      foldSchema).cache()
    val nRows = trainPrep.count()

    val searchResults = combos.map { combo =>
      val hp = hyperparams ++ combo
      val foldScores = (0 until cv).map { f =>
        val lo = f * nRows / cv; val hi = (f + 1) * nRows / cv
        val inFold = col("__fold") >= lo && col("__fold") < hi
        val (_, m) = fitAndEvaluate(task, algorithm, hp,
          trainPrep.where(!inFold), trainPrep.where(inFold), yCol)
        m.getOrElse(metricName, Double.NaN)
      }
      val mean = foldScores.sum / cv
      val std = math.sqrt(foldScores.map(s => (s - mean) * (s - mean)).sum / cv)
      (combo, mean, std, foldScores)
    }
    val best = searchResults.maxBy(_._2)._1

    // refit best combo through the standard lifecycle (records + deploys)
    val result = train(projectName, task, relation, yCol, algorithm,
      hyperparams ++ best, Map.empty, testSize, testSampling)
    registry.attachSearchResults(result.modelId, searchResults.map { case (c, m, s, fs) =>
      (c.map { case (k, v) => k -> v.toString }, m, s, fs)
    })
    trainPrep.unpersist()
    result
  }

  /** `pgml.train_joint`: multi-target training — one model per y column,
    * registered as `<project>:<y>` sub-projects (api.rs:136-162 capability).
    */
  def trainJoint(
      projectName: String, task: String, relation: DataFrame, yCols: Seq[String],
      algorithm: String = "linear", hyperparams: Map[String, Any] = Map.empty,
      testSize: Double = 0.25, testSampling: String = "random"): Seq[TrainResult] =
    yCols.map { y =>
      val rel = relation.drop(yCols.filterNot(_ == y): _*)
      train(s"$projectName:$y", task, rel, Some(y), algorithm, hyperparams,
        Map.empty, testSize, testSampling)
    }

  /** `pgml.tune` — LLM fine-tuning (api.rs:846-995). True transformer
    * fine-tuning is out of Spark scope (documented gap); the capability is
    * preserved per task over the deterministic text embedder's features,
    * registered with the base model name so the registry/deploy/generate
    * surfaces resolve identically. Dataset column contracts follow
    * orm/dataset.rs:88-157:
    *
    *  - text_classification:       (textCol, yCol)
    *  - text_pair_classification:  (text1, text2, yCol)   — dataset.rs:111
    *  - conversation:              (system, user, assistant) — dataset.rs:137
    */
  def tune(
      projectName: String, task: String, relation: DataFrame,
      textCol: String, yCol: String, modelName: String,
      testSize: Double = 0.25, testSampling: String = "random"): TrainResult = {
    val dim = 64
    val embedder = graft.functions.HashEmbedder(dim)
    val tuneHp = Map("model_name" -> modelName, "project_name" -> projectName,
      "tuned" -> "true")
    task match {
      case "text_classification" =>
        val emb = embedder.embedCol(col(textCol))
        val feat = relation.select(
          (0 until dim).map(i => element_at(emb, i + 1).cast("double").as(s"e$i")) :+
            col(yCol): _*)
        // CONTINUED training when the project already has a deployed
        // binary-logistic head (api.rs:846-995 tunes the deployed
        // checkpoint): seed from its coefficients, gradient-descend on
        // the tune relation, register + auto-deploy on improvement.
        // First tune of a project (or a non-logistic deployment) cold-fits
        // through the standard lifecycle as before.
        registry.deployedLogisticParams(projectName) match {
          // ±Inf intercept = the one-class MLE, warm-started from its
          // clamp (gdEpochs); NaN anywhere → cold fit, the seed is garbage
          case Some((seedId, w0, b0)) if w0.length == dim &&
              w0.forall(java.lang.Double.isFinite) && !b0.isNaN =>
            tuneWarmStart(projectName, task, feat, yCol, seedId, w0, b0,
              tuneHp, testSize, testSampling)
          case _ =>
            train(projectName, "classification", feat, Some(yCol), "linear",
              hyperparams = tuneHp, testSize = testSize, testSampling = testSampling,
              recordTaskAs = Some(task))
        }

      case "text_pair_classification" =>
        // pair features: per-dim |u−v| and u⊙v of the two text embeddings —
        // the standard symmetric pair representation, so the linear head can
        // express both similarity and per-dim interaction (the cross-encoder
        // capability tune() fine-tunes in the reference, api.rs:846-995)
        require(relation.columns.contains("text1") && relation.columns.contains("text2"),
          "text_pair_classification tuning expects columns text1, text2 (orm/dataset.rs:111-124)")
        // the pair dataset fixes its text columns; a caller passing some
        // other textCol would silently get text1/text2 — fail loudly instead
        require(textCol == "text1",
          s"text_pair_classification reads fixed columns text1/text2 (orm/dataset.rs:111); pass textCol=text1, got '$textCol'")
        val e1 = embedder.embedCol(col("text1"))
        val e2 = embedder.embedCol(col("text2"))
        val feat = relation.select(
          (0 until dim).flatMap { i =>
            val a = element_at(e1, i + 1).cast("double")
            val b = element_at(e2, i + 1).cast("double")
            Seq(abs(a - b).as(s"d$i"), (a * b).as(s"p$i"))
          } :+ col(yCol): _*)
        // CONTINUED training, exactly the text_classification lifecycle:
        // a deployed binary-logistic pair head (2·dim interaction
        // features) seeds full-batch GD on the new tune relation.
        registry.deployedLogisticParams(projectName) match {
          // a ±Inf intercept is the one-class MLE and warm-starts from its
          // clamp (gdEpochs); NaN anywhere means the deployed head is
          // garbage — cold-fit rather than continue from it
          case Some((seedId, w0, b0)) if w0.length == 2 * dim &&
              w0.forall(java.lang.Double.isFinite) && !b0.isNaN =>
            tuneWarmStart(projectName, task, feat, yCol, seedId, w0, b0,
              tuneHp, testSize, testSampling)
          case _ =>
            train(projectName, "classification", feat, Some(yCol), "linear",
              hyperparams = tuneHp, testSize = testSize, testSampling = testSampling,
              recordTaskAs = Some(task))
        }

      case "conversation" =>
        // conversation datasets fix their columns (system/user/assistant);
        // reject mismatched textCol/yCol rather than silently ignoring them
        require(textCol == "user" && yCol == "assistant",
          s"conversation tuning reads fixed columns system/user/assistant (orm/dataset.rs:137); pass textCol=user, yCol=assistant, got ('$textCol', '$yCol')")
        tuneConversation(projectName, relation, modelName, testSize, testSampling)

      case other => throw new IllegalArgumentException(
        s"tune supports text_classification | text_pair_classification | conversation; got $other")
    }
  }

  /** Warm-start continuation for text_classification tuning: REAL
    * gradient updates from the deployed model's coefficients
    * ([[WarmStart.continueLogisticBinary]] — full-batch distributed GD,
    * the model.rs:161-330 continued-training lifecycle over the MLlib
    * family). The tune relation passes through the SEED model's stored
    * preprocessing so the parameter space aligns; the updated head
    * registers through the standard lifecycle and deploys only on metric
    * improvement. */
  private def tuneWarmStart(
      projectName: String, task: String, feat: DataFrame, yCol: String,
      seedId: Long, w0: Array[Double], b0: Double, tuneHp: Map[String, Any],
      testSize: Double, testSampling: String): TrainResult = {
    val (trainDf, testDf) =
      if (testSize <= 0.0) (feat, feat)
      else Sampling.split(feat, testSize, testSampling, yCol)
    val trainPrep = registry.prepFeatures(seedId, trainDf).cache()
    val (w, b) = WarmStart.continueLogisticBinary(w0, b0, trainPrep, "features", yCol)
    val model = new GdLogisticModel(w, b)
    val pred = model.transform(registry.prepFeatures(seedId, testDf))
    val base = Metrics.classification(pred, yCol, "prediction")
    val extra = if (pred.select(col(yCol)).distinct().count() == 2) {
      val withP1 = pred.withColumn("p1", VectorOps.element(col("probability"), 1))
      Map("roc_auc" -> Metrics.rocAuc(withP1, yCol, "p1"),
        "log_loss" -> Metrics.logLoss(withP1, yCol, "p1"))
    } else Map.empty[String, Double]
    val metrics = base ++ extra
    val (fitted, featNames) = registry.fittedOf(seedId)
    val modelId = registry.saveModel(projectName, task, "linear",
      tuneHp + ("warm_start_from" -> seedId.toString), metrics, model, fitted, featNames)
    val deployed = registry.maybeDeploy(projectName, task, modelId, metrics)
    trainPrep.unpersist()
    TrainResult(projectName, task, "linear", modelId, deployed, metrics)
  }

  /** Conversation tuning (api.rs:846-995 with ConversationDataset,
    * dataset.rs:137-148): a deterministic retrieval-generator stands in for
    * causal-LM fine-tuning. KMeans clusters the embedded (system, user)
    * contexts; each cluster stores its most-central training reply as the
    * generation table (a model-dir sidecar, like search_results.json).
    * `generate()` embeds the input, assigns the nearest centroid driver-side
    * (no Spark job per call), and returns the stored reply. Metric is BLEU-1
    * of retrieved-vs-true replies on the held-out split — the task's default
    * target metric (task.rs:60), higher-better, so maybeDeploy composes.
    */
  private def tuneConversation(
      projectName: String, relation: DataFrame, modelName: String,
      testSize: Double, testSampling: String): TrainResult = {
    import org.apache.spark.ml.linalg.Vectors
    val dim = 64
    val embedder = graft.functions.HashEmbedder(dim)
    for (c <- Seq("system", "user", "assistant"))
      require(relation.columns.contains(c),
        s"conversation tuning expects columns system, user, assistant (orm/dataset.rs:137-148); missing $c")
    // Cluster on the USER turn alone: generate(project, input) embeds the
    // raw input at serve time, so the retrieval key must be the same
    // feature space — folding the (usually constant) system prompt into the
    // training vectors would skew every centroid relative to serving.
    val ctx = embedder.embedCol(col("user"))
    val feat = relation.select(
      (0 until dim).map(i => element_at(ctx, i + 1).cast("double").as(s"e$i")) :+
        col("assistant"): _*)
    // no class label to stratify on — fall back to random for that mode
    val sampling = if (testSampling == "stratified") "random" else testSampling
    val (trainDf, testDf) =
      if (testSize <= 0.0) (feat, feat)
      else Sampling.split(feat, testSize, sampling, "assistant")

    // CONTINUED training when the project already has a deployed centroid
    // head of the same width (api.rs:846-995 tunes the deployed
    // checkpoint): the deployed centers keep moving on the NEW tune
    // relation via distributed Lloyd iterations (WarmStart.continueKMeans)
    // instead of a from-scratch random-seed refit; the tune relation
    // passes through the SEED model's stored preprocessing so the feature
    // space aligns. First tune of a project cold-fits MLlib KMeans.
    val warmSeed = registry.deployedCentroids(projectName)
      .filter { case (_, c0) => c0.nonEmpty && c0.head.length == dim }
    val (fitted, featNames, prep) = warmSeed match {
      case Some((seedId, _)) =>
        val (f, names) = registry.fittedOf(seedId)
        (f, names, (df: DataFrame) => registry.prepFeatures(seedId, df))
      case None =>
        val featureCols = (0 until dim).map(i => s"e$i")
        val plans = featureCols.map(c => ColumnPlan(c, impute = "zero"))
        val f = Preprocessor.fit(trainDf, plans, "assistant")
        val names = Preprocessor.featureNames(f)
        val assembler = new VectorAssembler()
          .setInputCols(names.toArray).setOutputCol("features")
        (f, names,
          (df: DataFrame) => assembler.transform(Preprocessor.transform(df, f)))
    }
    val trainPrep = prep(trainDf).cache()
    val nTrain = trainPrep.count()
    require(nTrain > 0, "conversation tuning needs at least one training row")
    // (estimator to register, its converged centers, assignment transform)
    val fitRes: (Any, Array[Array[Double]], DataFrame => DataFrame) =
      warmSeed match {
        case Some((seedId, c0)) =>
          val moved = WarmStart.continueKMeans(c0, trainPrep, "features")
          // Final-assignment capture audit: a seed center that captures NO
          // rows of the new tune relation would keep a stale position AND
          // get no generation-table entry, so serve-time inputs nearest to
          // it would generate "". Drop uncaptured centers (dense reindex) —
          // this also covers nTrain < k, where at most nTrain centers can
          // capture. Each training row's nearest center is captured by
          // definition, so its assignment survives the drop (modulo index).
          val captured = new CentroidModel(moved).transform(trainPrep)
            .groupBy(col("prediction")).count()
            .select("prediction").collect().map(_.getInt(0)).toSet
          val kept = moved.zipWithIndex.collect {
            case (ctr, i) if captured(i) => ctr
          }
          val cm = new CentroidModel(kept)
          (cm, kept, (df: DataFrame) => cm.transform(df))
        case None =>
          val k = math.max(1, math.min(8, nTrain.toInt))
          val km = new KMeans().setK(k).setSeed(42).setFeaturesCol("features")
            .fit(trainPrep)
          (km, km.clusterCenters.map(_.toArray),
            (df: DataFrame) => km.transform(df))
      }
    val (model, centers, assign) = fitRes

    // generation table: per cluster, the reply of the most-central training
    // context (ties broken on the reply string — deterministic)
    val centerVecs = centers.map(Vectors.dense)
    val distToCenter = udf((v: Vector, c: Int) => Vectors.sqdist(v, centerVecs(c)))
    val w = Window.partitionBy(col("prediction"))
      .orderBy(col("_dist"), col("assistant"))
    val reps = assign(trainPrep)
      .withColumn("_dist", distToCenter(col("features"), col("prediction")))
      .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
      .select(col("prediction").cast("int").as("c"), col("assistant"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap

    // BLEU-1 on the held-out split, distributed (UDF over (candidate, ref));
    // an empty held-out split falls back to the CACHED train frame rather
    // than re-deriving the embedding lineage
    val evalPrep = if (testDf.isEmpty) trainPrep else prep(testDf)
    val repExpr = reps.foldLeft(lit("")) { case (acc, (c, r)) =>
      when(col("prediction") === c, lit(r)).otherwise(acc)
    }
    val bleuOf = udf((cand: String, ref: String) => Metrics.bleu1(cand, ref))
    val bleu = assign(evalPrep)
      .withColumn("_cand", repExpr)
      .agg(avg(bleuOf(col("_cand"), col("assistant")))).head().getDouble(0)
    val metrics = Map("bleu" -> bleu)

    val hp = Map("model_name" -> modelName, "project_name" -> projectName,
      "tuned" -> "true") ++
      warmSeed.map { case (seedId, _) => "warm_start_from" -> seedId.toString }
    val modelId = registry.saveModel(projectName, "conversation", "transformers",
      hp, metrics, model, fitted, featNames)
    registry.attachResponses(modelId, reps)
    val deployed = registry.maybeDeploy(projectName, "conversation", modelId, metrics)
    trainPrep.unpersist()
    TrainResult(projectName, "conversation", "transformers", modelId, deployed, metrics)
  }

  private def fitAndEvaluate(
      task: String, algorithm: String, hp: Map[String, Any],
      train: DataFrame, test: DataFrame, yCol: Option[String]): (Any, Map[String, Double]) = {

    def d(k: String, dft: Double) = hp.get(k).map(_.toString.toDouble).getOrElse(dft)
    def i(k: String, dft: Int) = hp.get(k).map(_.toString.toDouble.toInt).getOrElse(dft)

    // Kernel-SVM family (sklearn SVC/NuSVC/SVR, RBF kernel by default —
    // reference algorithm enum algorithm.rs:6-52): served via the random
    // Fourier feature approximation + a linear estimator (sklearn's own
    // documented large-scale path, RBFSampler) — see [[RffTransformer]].
    // kernel='linear' stands the map down to the plain linear estimator.
    // the passed estimator must already read features from "rff_features"
    def kernelPipeline(linear: org.apache.spark.ml.PipelineStage)
        : org.apache.spark.ml.Estimator[_] = {
      val dim = train.select("features").head().getAs[Vector](0).size
      // sklearn gamma semantics: 'scale' (the SVC default) = 1/(d·Var(X))
      // with Var over the FLATTENED feature matrix; 'auto' = 1/d. The
      // flattened variance folds out of the per-dim Summarizer moments:
      // E[x²] = avg_j(var_j + mean_j²), E[x] = avg_j mean_j. Recomputed
      // per fit BY DESIGN: sklearn evaluates X.var() on each fit's own
      // training slice too, so CV folds legitimately get per-fold gammas.
      val gamma = hp.get("gamma").map(_.toString) match {
        case Some("auto") => 1.0 / dim
        case None | Some("scale") =>
          import org.apache.spark.ml.stat.Summarizer
          val row = train.select(Summarizer
            .metrics("mean", "variance", "count")
            .summary(col("features")).as("s")).select("s.*").head()
          val m = row.getAs[Vector](0).toArray
          val v = row.getAs[Vector](1).toArray
          val cnt = row.getLong(2).toDouble
          // Summarizer variance is the n−1 sample form; sklearn's X.var()
          // divides by n — rescale so the default-config model matches
          val pop = if (cnt > 1) (cnt - 1) / cnt else 1.0
          val ex = m.sum / dim
          val ex2 = m.indices.map(j => v(j) * pop + m(j) * m(j)).sum / dim
          val flatVar = ex2 - ex * ex
          if (flatVar > 0) 1.0 / (dim * flatVar) else 1.0 / dim
        case Some(g) => g.toDouble
      }
      val rff = RffTransformer
        .draw(dim, i("n_components", 100), gamma, 42L)
        .setInputCol("features").setOutputCol("rff_features")
      new org.apache.spark.ml.Pipeline().setStages(Array(rff, linear))
    }
    // sklearn default kernels: KernelRidge(kernel='linear'); SVR/SVC and
    // the GP models default to RBF
    def isRbf: Boolean =
      hp.get("kernel").map(_.toString)
        .getOrElse(if (algorithm == "kernel_ridge") "linear" else "rbf") != "linear"

    task match {
      case "regression" if Set("huber", "quantile", "ransac", "theil_sen")(algorithm) =>
        // robust losses (algorithm.rs:27-28) — MLlib has neither, so the
        // WarmStart treeAggregate GD machinery fits them (GdRegression);
        // the registered GdLinearModel serves like any linear head and
        // its parameters replay as the m14/m15/m18 oracle literals.
        // ransac/theil_sen (algorithm.rs:25-26) are the other two
        // outlier-robust regressors in the enum: neither consensus
        // sampling nor median-of-slopes distributes cleanly, and the
        // huber loss is the standard smooth robust surrogate for both —
        // recorded substitution (the model row's runtime says GdLinear).
        // sklearn defaults: HuberRegressor epsilon=1.35, QuantileRegressor
        // quantile=0.5
        val y = yCol.get
        val lossParam =
          if (algorithm == "quantile") d("quantile", 0.5) else d("epsilon", 1.35)
        val gdLoss = if (algorithm == "quantile") "quantile" else "huber"
        val (w, b) = GdRegression.fit(train, "features", y, gdLoss, lossParam,
          epochs = i("epochs", 300), learningRate = d("learning_rate", 0.1))
        val m = new GdLinearModel(w, b)
        (m, Metrics.regression(m.transform(test), y, "prediction"))

      case "regression" if algorithm == "knn" =>
        // sklearn KNeighborsRegressor (algorithm.rs:16): the training set
        // IS the model; the stored-order tie contract makes serving
        // SQL-replayable (m13)
        val y = yCol.get
        val m = KnnModel.fit(train, "features", y,
          k = i("n_neighbors", 5), classification = false)
        (m, Metrics.regression(m.transform(test), y, "prediction"))

      case "regression" =>
        val y = yCol.get
        val est: org.apache.spark.ml.Estimator[_] = algorithm match {
          case "linear" => new LinearRegression().setSolver("normal").setRegParam(0.0)
            .setLabelCol(y).setFeaturesCol("features")
          // bayesian_ridge/ARD (algorithm.rs:21-22) estimate the ridge
          // penalty from the data; the point estimate is a ridge fit —
          // nearest family, recorded substitution
          case "ridge" | "bayesian_ridge" | "automatic_relevance_determination" =>
            new LinearRegression().setRegParam(d("alpha", 1.0))
              .setElasticNetParam(0.0).setLabelCol(y).setFeaturesCol("features")
          // least_angle computes the lasso path, omp the greedy L0
          // approximation of it (algorithm.rs:18-20) — the L1 fit is the
          // nearest sparse-linear family for all three
          case "lasso" | "least_angle" | "lasso_least_angle" | "orthogonal_matching_pursuit" =>
            new LinearRegression().setRegParam(d("alpha", 1.0))
            .setElasticNetParam(1.0).setLabelCol(y).setFeaturesCol("features")
          case "elastic_net" => new LinearRegression()
            .setRegParam(d("alpha", 1.0)).setElasticNetParam(d("l1_ratio", 0.5))
            .setLabelCol(y).setFeaturesCol("features")
          // bagging → forest of trees (sklearn BaggingRegressor's default
          // base estimator is a decision tree — a random forest IS bagged
          // trees + feature subsampling; recorded substitution like
          // extra_trees)
          // xgboost_random_forest (algorithm.rs:9) IS a random forest fit
          // through the xgboost runtime — the forest family, not boosting
          case "random_forest" | "extra_trees" | "bagging" | "xgboost_random_forest" =>
            new RandomForestRegressor()
            .setNumTrees(i("n_estimators", 20)).setSeed(42)
            .setMaxDepth(i("max_depth", 5))
            .setLabelCol(y).setFeaturesCol("features")
          // ada_boost/catboost → the MLlib boosting family (sequential
          // additive trees; recorded substitution like xgboost)
          case "gradient_boosting_trees" | "xgboost" | "lightgbm" | "hist_gradient_boosting" | "ada_boost" | "catboost" =>
            new GBTRegressor().setMaxIter(i("n_estimators", 20)).setSeed(42)
              .setMaxDepth(i("max_depth", 5))
              .setLabelCol(y).setFeaturesCol("features")
          // SVR: RBF feature map + ridge (MLlib has no epsilon-insensitive
          // loss — squared loss over the same kernel map, recorded
          // fallback). kernel_ridge IS exactly this shape (ridge over the
          // kernel map), and a GP posterior mean is kernel ridge with the
          // noise term as the penalty (algorithm.rs:29-30) — same mapping;
          // isRbf carries each algorithm's sklearn default kernel.
          case "svm" | "nu_svm" | "kernel_ridge" | "gaussian_process" if isRbf =>
            kernelPipeline(
            new LinearRegression().setRegParam(d("alpha", 1.0))
              .setElasticNetParam(0.0)
              .setLabelCol(y).setFeaturesCol("rff_features"))
          case "kernel_ridge" | "gaussian_process" => // linear kernel
            new LinearRegression().setRegParam(d("alpha", 1.0))
              .setElasticNetParam(0.0).setLabelCol(y).setFeaturesCol("features")
          // sklearn SGDRegressor's default loss is plain squared error —
          // the OLS fit is the exact limit point, not a substitution
          case _ => new LinearRegression().setSolver("normal") // incl. stochastic_gradient_descent
            .setLabelCol(y).setFeaturesCol("features")
        }
        val m = est.fit(train).asInstanceOf[org.apache.spark.ml.Transformer]
        val pred = m.transform(test)
        (m, Metrics.regression(pred, y, "prediction"))

      case "classification" if algorithm == "knn" =>
        // sklearn KNeighborsClassifier: majority vote, tied counts take
        // the smallest label (mode semantics); no probability output, so
        // the binary extras are skipped exactly like LinearSVC
        val y = yCol.get
        val m = KnnModel.fit(train, "features", y,
          k = i("n_neighbors", 5), classification = true)
        (m, Metrics.classification(m.transform(test), y, "prediction"))

      case "classification" =>
        val y = yCol.get
        val est: org.apache.spark.ml.Estimator[_] = algorithm match {
          case "linear" | "ridge" => new LogisticRegression().setMaxIter(100)
            .setLabelCol(y).setFeaturesCol("features")
          // perceptron, passive_aggressive, and SGDClassifier's default
          // all train a linear separator on hinge-family losses
          // (algorithm.rs:23-26) — LinearSVC is the hinge fit
          case "linear_svm" | "perceptron" | "passive_aggressive" | "stochastic_gradient_descent" =>
            new LinearSVC()
            .setLabelCol(y).setFeaturesCol("features")
          case "svm" | "nu_svm" | "gaussian_process" if !isRbf => new LinearSVC()
            .setLabelCol(y).setFeaturesCol("features")
          // a GP classifier's RBF-kernel decision surface (GPC's sklearn
          // default) → the same random-Fourier map the SVC substitution uses
          case "svm" | "nu_svm" | "gaussian_process" => kernelPipeline(
            new LinearSVC().setLabelCol(y).setFeaturesCol("rff_features"))
          case "random_forest" | "extra_trees" | "bagging" | "xgboost_random_forest" =>
            new RandomForestClassifier()
            .setNumTrees(i("n_estimators", 20)).setSeed(42)
            .setMaxDepth(i("max_depth", 5))
            .setLabelCol(y).setFeaturesCol("features")
          case "gradient_boosting_trees" | "xgboost" | "lightgbm" | "hist_gradient_boosting" | "ada_boost" | "catboost" =>
            new GBTClassifier().setMaxIter(i("n_estimators", 20)).setSeed(42)
              .setMaxDepth(i("max_depth", 5))
              .setLabelCol(y).setFeaturesCol("features")
          case _ => new LogisticRegression().setMaxIter(100)
            .setLabelCol(y).setFeaturesCol("features")
        }
        val m = est.fit(train).asInstanceOf[org.apache.spark.ml.Transformer]
        val pred = m.transform(test)
        val base = Metrics.classification(pred, y, "prediction")
        val extra = if (pred.columns.contains("probability") &&
            pred.select(col(y)).distinct().count() == 2) {
          val withP1 = pred.withColumn("p1", VectorOps.element(col("probability"), 1))
          Map("roc_auc" -> Metrics.rocAuc(withP1, y, "p1"),
            "log_loss" -> Metrics.logLoss(withP1, y, "p1"))
        } else Map.empty[String, Double]
        (m, base ++ extra)

      case "clustering" =>
        val k = i("n_clusters", 8)
        // sklearn family → MLlib mapping (substitutions recorded in the
        // model's runtime field by the registry). dbscan/optics have no
        // predict() even in the reference's sklearn backend — they live as
        // the graft.operators.Dbscan labeling operator instead.
        val est: org.apache.spark.ml.Estimator[_] = algorithm match {
          case "kmeans" | "mini_batch_kmeans" =>
            new KMeans().setK(k).setSeed(42).setFeaturesCol("features")
          case "agglomerative" | "birch" | "ward" | "feature_agglomeration" =>
            new org.apache.spark.ml.clustering.BisectingKMeans()
              .setK(k).setSeed(42).setFeaturesCol("features")
          case "gaussian_mixture" | "spectral" | "spectral_bi" | "spectral_co" | "affinity_propagation" | "mean_shift" =>
            new org.apache.spark.ml.clustering.GaussianMixture()
              .setK(k).setSeed(42).setFeaturesCol("features")
          case "dbscan" | "optics" => throw new IllegalArgumentException(
            s"$algorithm labels the fitted set and cannot serve predict() — " +
              "use graft.operators.Dbscan.run(df, id, features, eps, minPts)")
          case _ => new KMeans().setK(k).setSeed(42).setFeaturesCol("features")
        }
        val m = est.fit(train).asInstanceOf[org.apache.spark.ml.Transformer]
        val pred = m.transform(test)
        val silhouette = new org.apache.spark.ml.evaluation.ClusteringEvaluator()
          .setFeaturesCol("features").evaluate(pred)
        (m, Map("silhouette" -> silhouette))

      case "decomposition" =>
        val dim = train.select("features").head().getAs[Vector](0).size
        val k = math.min(i("n_components", 2), dim)
        val m = new PCA().setK(k).setInputCol("features").setOutputCol("pca")
          .fit(train)
        (m, Map("cumulative_explained_variance" -> m.explainedVariance.toArray.sum))

      case other => throw new IllegalArgumentException(s"unknown task $other")
    }
  }
}

object VectorOps {
  private val getElem = udf((v: Vector, i: Int) => v(i))
  def element(v: org.apache.spark.sql.Column, i: Int): org.apache.spark.sql.Column =
    getElem(v, lit(i))
  private val toArr = udf((v: Vector) => v.toArray)
  def toArray(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = toArr(v)
}
