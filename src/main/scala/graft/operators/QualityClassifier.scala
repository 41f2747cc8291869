package graft.operators

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Trained model-based quality filtering — the classifier stage of a
  * pretraining curation pipeline (GPT-3 / The Pile train a logistic
  * classifier over hashed features against a trusted corpus; DCLM and
  * fastText's supervised mode are the same shape: a LINEAR model over
  * hashed bag-of-words, chosen precisely because it scores at corpus
  * scale for ~zero cost per document). Unlike the heuristic gates
  * ([[graft.functions.TextFunctions.qualityScore]]) this model is FIT to
  * data — a real MLlib `LogisticRegression` trained in-pipeline, its
  * coefficients then served as a broadcastable weight frame.
  *
  * Spark-first scale shape, mirroring the CCNet perplexity gate
  * ([[Corpus.perplexityStats]]):
  *
  *  - featurization is a codegen kernel (`token_fnv_buckets`: per-token
  *    FNV-1a-64 folded to a power-of-two `dim`) running inside the scan;
  *  - the model lives as a dim-sized (bucket, weight) FRAME the scoring
  *    join broadcasts — scoring a 100 TB corpus shuffles nothing, the
  *    only wide op is the per-document aggregation of fixed-width rows;
  *  - the per-document dot product folds LEFT-ASSOCIATIVELY over
  *    position-sorted contributions (`sort_array` + `aggregate`), so
  *    score values are run-stable and replay IEEE-identically in SQL —
  *    the c7 oracle gates the probabilities themselves, not just counts.
  *
  * Features are term frequencies (bucket count / doc token count), so a
  * document's score is length-invariant; the per-occurrence contribution
  * `w[bucket]/N` summed over occurrences equals the tf dot product
  * exactly, which is what lets the fold run at occurrence granularity
  * without materializing per-doc vectors.
  */
object QualityClassifier {

  /** Clamp for the one-class MLE's infinite-intercept limit:
    * sigmoid(±10) ≈ 1∓4.54e-5, decisive at any rounded precision the
    * oracles use while staying an exact short decimal literal.
    */
  val OneClassIntercept = 10.0

  /** A fitted classifier: `score(doc) = sigmoid(intercept + tf · weights)`.
    * `weights` is dense over the `dim` hash buckets.
    */
  final case class Model(dim: Int, intercept: Double, weights: Array[Double]) {
    require(weights.length == dim, s"weights length ${weights.length} != dim $dim")

    /** Driver/executor-local single-text score — the same math as the
      * distributed [[QualityClassifier.scores]] in the same order (token
      * -order left-associative sum), so the two paths agree bitwise. */
    def scoreOne(text: String): Double = {
      val toks = graft.functions.TextKernels.tokens(text)
      val n = toks.length.toDouble
      var s = 0.0
      var i = 0
      while (i < toks.length) {
        s += weights((graft.functions.TextKernels.fnv1a64(toks(i)) & (dim - 1)).toInt) / n
        i += 1
      }
      1.0 / (1.0 + math.exp(-(intercept + s)))
    }

    def weightsFrame(spark: SparkSession): DataFrame = {
      import spark.implicits._
      weights.toIndexedSeq.zipWithIndex.map { case (w, b) => (b, w) }
        .toDF("bucket", "w")
    }

    /** Persist as a JSON sidecar (exact `Double.toString` round-trip). */
    def save(spark: SparkSession, path: String): Unit = {
      val fs = IndexStore.fsFor(spark, path)
      val json =
        s"""{"dim":$dim,"intercept":$intercept,""" +
          s""""weights":[${weights.mkString(",")}]}"""
      IndexStore.writeString(fs, new org.apache.hadoop.fs.Path(path, "quality_classifier.json"), json)
    }
  }

  def load(spark: SparkSession, path: String): Model = {
    val fs = IndexStore.fsFor(spark, path)
    val json = IndexStore.readString(
      fs, new org.apache.hadoop.fs.Path(path, "quality_classifier.json"))
    def scalarField(name: String): String = {
      val key = "\"" + name + "\":"
      val i = json.indexOf(key)
      require(i >= 0, s"quality_classifier.json missing field $name")
      val from = i + key.length
      val until = json.indexWhere(ch => ch == ',' || ch == '}', from)
      json.substring(from, until)
    }
    val dim = scalarField("dim").toInt
    val intercept = scalarField("intercept").toDouble
    val ws = json.substring(json.indexOf('[') + 1, json.lastIndexOf(']'))
      .split(',').map(_.toDouble)
    Model(dim, intercept, ws)
  }

  /** Fit a logistic quality classifier: `pos` = trusted/kept documents,
    * `neg` = rejected/untrusted documents. Featurization at fit time goes
    * through the SAME `token_fnv_buckets` kernel serving uses; the
    * per-document tf vector assembly is a fit-time-only UDF (the serving
    * path never builds vectors — it streams occurrences).
    */
  def fit(
      pos: DataFrame,
      neg: DataFrame,
      textCol: String,
      dim: Int = 1024,
      maxIter: Int = 100,
      regParam: Double = 1e-4): Model = {
    require(dim > 0 && (dim & (dim - 1)) == 0, s"dim must be a power of two, got $dim")
    // One-class training data makes LogisticRegression return an infinite
    // intercept — invalid JSON and an unparseable literal in generated
    // oracles. The true one-class MLE is the intercept limit ±∞ with zero
    // weights; return that limit clamped to a finite canonical value so a
    // distillation labeling that happens to be unanimous on some corpus
    // (every document passes curate, every document reads positive) still
    // yields a deterministic, servable, replayable model. Only a fully
    // empty corpus fails loudly.
    val posEmpty = pos.isEmpty
    val negEmpty = neg.isEmpty
    require(!(posEmpty && negEmpty), "quality classifier fit: both classes are empty")
    if (posEmpty || negEmpty) {
      val intercept = if (negEmpty) OneClassIntercept else -OneClassIntercept
      return Model(dim, intercept, new Array[Double](dim))
    }
    val labeled = pos.select(col(textCol).as("__text"), lit(1.0).as("label"))
      .unionByName(neg.select(col(textCol).as("__text"), lit(0.0).as("label")))
    val toTf = udf { bks: scala.collection.Seq[Int] =>
      if (bks == null || bks.isEmpty)
        Vectors.sparse(dim, Array.empty[Int], Array.empty[Double])
      else {
        val counts = scala.collection.mutable.TreeMap.empty[Int, Int]
        bks.foreach(b => counts.update(b, counts.getOrElse(b, 0) + 1))
        val n = bks.length.toDouble
        val idx = new Array[Int](counts.size); val v = new Array[Double](counts.size)
        var i = 0
        counts.foreach { case (b, c) => idx(i) = b; v(i) = c / n; i += 1 }
        Vectors.sparse(dim, idx, v)
      }
    }
    val feats = labeled.select(col("label"),
      toTf(TextFunctions.tokenFnvBuckets(col("__text"), dim)).as("features"))
    val m = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam).setFamily("binomial")
      .fit(feats)
    require(java.lang.Double.isFinite(m.intercept),
      s"quality classifier fit diverged: intercept ${m.intercept}")
    Model(dim, m.intercept, m.coefficients.toArray)
  }

  /** Weight counts at or under this ride the scoring plan as an ARRAY
    * LITERAL (pure scan-stage fold — no explode, no join, no aggregation
    * buffer); larger models broadcast as a (bucket, weight) frame instead
    * (a 2²⁰-bucket model would bloat every plan by 8 MB of literals).
    * Volatile so tests can pin a regime. */
  @volatile var literalMaxDim: Int = 8192

  /** Score every document: (idCol, n_toks, score) with
    * score = sigmoid(intercept + Σ_occurrences w[bucket]/n_toks), the fold
    * running left-associatively in TOKEN ORDER. A document with no tokens
    * scores sigmoid(intercept) — the model's prior, exactly what an
    * all-zero tf vector predicts.
    *
    * Default (dim ≤ [[literalMaxDim]]) is fully map-side: the weights are
    * a plan literal and the per-doc sum is `aggregate` over the bucket
    * array — one scan, zero shuffle, constant memory per row regardless
    * of document length. Above the gate the weights broadcast as a frame
    * and the fold runs over position-sorted collected contributions
    * (same order, same IEEE result — the oracle replays both
    * identically).
    */
  def scores(docs: DataFrame, idCol: String, textCol: String, model: Model): DataFrame = {
    val toked = docs.select(col(idCol),
      TextFunctions.tokenFnvBuckets(col(textCol), model.dim).as("__bks"))
    if (model.dim <= literalMaxDim) {
      val wLit = typedLit(model.weights.toIndexedSeq)
      toked.select(col(idCol),
        size(col("__bks")).cast("long").as("n_toks"),
        sigmoid(lit(model.intercept) +
          aggregate(col("__bks"), lit(0.0),
            (acc, b) => acc + element_at(wLit, b + 1) / size(col("__bks"))))
          .as("score"))
    } else {
      val w = model.weightsFrame(docs.sparkSession)
      val base = toked.select(col(idCol), size(col("__bks")).as("n_toks"))
      val occ = toked.select(col(idCol), size(col("__bks")).as("__n"),
        posexplode(col("__bks")).as(Seq("pos", "bucket")))
      val scored = occ.join(broadcast(w), Seq("bucket"), "left")
        .groupBy(col(idCol))
        .agg(aggregate(
          sort_array(collect_list(struct(col("pos"),
            (coalesce(col("w"), lit(0.0)) / col("__n")).as("c")))),
          lit(0.0),
          (acc, x) => acc + x.getField("c")).as("__s"))
      base.join(scored, Seq(idCol), "left")
        .select(col(idCol), col("n_toks").cast("long").as("n_toks"),
          sigmoid(lit(model.intercept) + coalesce(col("__s"), lit(0.0))).as("score"))
    }
  }

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** [[scores]] as a gate: keep documents scoring at or above `minScore`. */
  def filterByScore(
      docs: DataFrame, idCol: String, textCol: String,
      model: Model, minScore: Double): DataFrame =
    docs.join(
      scores(docs, idCol, textCol, model)
        .where(col("score") >= minScore).select(col(idCol)),
      Seq(idCol), "left_semi")
}
