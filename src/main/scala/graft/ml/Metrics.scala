package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Task metrics — exact-semantics re-implementation of the reference's
  * ConfusionMatrix (pgml-extension/src/metrics.rs:37-165) and regression
  * metrics (src/orm/model.rs:623-697), rather than trusting MLlib defaults
  * (SURVEY.md §7.3: f1 micro/macro edge cases differ).
  *
  * All computed as DataFrame aggregations — distributed, no collect of
  * predictions.
  */
object Metrics {

  /** Regression: r2, MAE, MSE, RMSE. */
  def regression(pred: DataFrame, yCol: String, predCol: String): Map[String, Double] = {
    // single pass: ssTot/n = var_pop(y) (Welford-merged, numerically stable)
    // and ssRes/n = mse, so r2 = 1 - mse/var_pop — no second job for ymean
    val agg = pred.agg(
      var_pop(col(yCol)).as("varY"),
      avg(abs(col(yCol) - col(predCol))).as("mae"),
      avg(pow(col(yCol) - col(predCol), 2)).as("mse")).head()
    val varY = agg.getDouble(0); val mse = agg.getDouble(2)
    val r2 = if (varY == 0.0) Double.NaN else 1.0 - mse / varY
    Map("r2" -> r2, "mae" -> agg.getDouble(1), "mse" -> mse,
      "rmse" -> math.sqrt(mse))
  }

  /** Classification: accuracy, f1 (macro over classes, the reference's
    * default `f1`), precision/recall (macro), f1_micro.
    *
    * metrics.rs semantics: per-class f1 = 2·p·r/(p+r) with 0 when p+r = 0;
    * macro = unweighted mean over *observed* classes; micro = global
    * TP/(TP+FP) which equals accuracy in single-label classification.
    */
  def classification(pred: DataFrame, yCol: String, predCol: String): Map[String, Double] = {
    val counts = pred.groupBy(col(yCol).as("y"), col(predCol).as("p"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getAs[Any]("y"), r.getAs[Any]("p"), r.getLong(2)))
    val classes = (counts.map(_._1) ++ counts.map(_._2)).distinct
    val total = counts.map(_._3).sum.toDouble
    val correct = counts.filter(c => c._1 == c._2).map(_._3).sum.toDouble

    val perClass = classes.map { c =>
      val tp = counts.filter(x => x._1 == c && x._2 == c).map(_._3).sum.toDouble
      val fp = counts.filter(x => x._1 != c && x._2 == c).map(_._3).sum.toDouble
      val fn = counts.filter(x => x._1 == c && x._2 != c).map(_._3).sum.toDouble
      val p = if (tp + fp == 0) 0.0 else tp / (tp + fp)
      val r = if (tp + fn == 0) 0.0 else tp / (tp + fn)
      val f1 = if (p + r == 0) 0.0 else 2 * p * r / (p + r)
      (p, r, f1)
    }
    Map(
      "accuracy" -> correct / total,
      "precision" -> perClass.map(_._1).sum / perClass.size,
      "recall" -> perClass.map(_._2).sum / perClass.size,
      "f1" -> perClass.map(_._3).sum / perClass.size,
      "f1_micro" -> correct / total)
  }

  /** Binary ROC AUC via the rank formula (equivalent to the reference's
    * roc_auc_score over score pairs) — one sort, no threshold sweep.
    */
  def rocAuc(pred: DataFrame, yCol: String, scoreCol: String): Double = {
    import org.apache.spark.sql.expressions.Window
    val ranked = pred.select(col(yCol).cast("double").as("y"), col(scoreCol).as("s"))
      .withColumn("r", rank().over(Window.orderBy(col("s"))))
      // average rank for ties: mean of rank within equal scores
      .groupBy("s").agg(avg(col("r")).as("ar"), sum(col("y")).as("pos"), count(lit(1)).as("cnt"))
    val row = ranked.agg(
      sum(col("ar") * col("pos") + (col("cnt") - lit(1)) * col("pos") / lit(2.0)).as("sumRankPos"),
      sum(col("pos")).as("nPos"), sum(col("cnt")).as("n")).head()
    val sumRankPos = row.getDouble(0); val nPos = row.getDouble(1); val n = row.getLong(2).toDouble
    val nNeg = n - nPos
    if (nPos == 0 || nNeg == 0) Double.NaN
    else (sumRankPos - nPos * (nPos + 1) / 2.0) / (nPos * nNeg)
  }

  /** Binary log loss with probability clipping (reference clips to
    * [eps, 1-eps], model.rs:668-680). */
  def logLoss(pred: DataFrame, yCol: String, probCol: String, eps: Double = 1e-15): Double =
    pred.select(col(yCol).cast("double").as("y"),
        least(greatest(col(probCol), lit(eps)), lit(1 - eps)).as("p"))
      .agg(avg(-(col("y") * log(col("p")) + (lit(1) - col("y")) * log(lit(1) - col("p")))))
      .head().getDouble(0)

  /** BLEU-1 (clipped unigram precision × brevity penalty) for a single
    * candidate/reference pair — conversation tuning's default target metric
    * (orm/task.rs:60 maps `conversation` to bleu, higher is better). Pure
    * scalar function so it can run inside a UDF over the test split.
    */
  def bleu1(candidate: String, reference: String): Double = {
    val cand = graft.functions.TextKernels.tokens(candidate)
    val ref = graft.functions.TextKernels.tokens(reference)
    if (cand.isEmpty || ref.isEmpty) return 0.0
    val refCounts = ref.groupBy(identity).map { case (t, xs) => t -> xs.length }
    val clipped = cand.groupBy(identity).map { case (t, xs) =>
      math.min(xs.length, refCounts.getOrElse(t, 0))
    }.sum
    val precision = clipped.toDouble / cand.length
    val bp = if (cand.length >= ref.length) 1.0
      else math.exp(1.0 - ref.length.toDouble / cand.length)
    precision * bp
  }
}
