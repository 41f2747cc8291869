package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{QualityClassifier, TaskModels, TrainedSentimentModel, Transform}

/** x5_transform_trained: a TRAINED sentiment model (MLlib logistic
  * regression over hashed tf, weak labels distilled from the
  * text-classification lexicon) served through the transform dispatch's
  * model registry. The oracle replays the fitted model's probability
  * IEEE-identically (C7OracleSql's scoring CTEs) plus the HF envelope's
  * winning-class semantics (label, score = p or 1−p) behind round(4).
  */
object X5OracleSql {

  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, QualityClassifier.Model]

  def modelName(dir: String): String = s"trained-sentiment:$dir"

  /** Fit (memoized per sf-dir) and register under [[modelName]]. Weak
    * labels = the lexicon stand-in's own verdict (pos-count >= neg-count),
    * so the trained model learns to reproduce the deterministic labeling —
    * the DCLM-style distillation move, and exactly what makes the x5
    * labels a meaningful (mostly-agreeing) comparison. */
  def fittedAndRegistered(spark: SparkSession, dir: String): QualityClassifier.Model = {
    val m = cache.getOrElseUpdate(dir, {
      val docs = graft.Tables.load(spark, dir, "documents")
      val toks = split(trim(lower(col("text"))), "\\s+")
      val posArr = typedLit(TaskModels.positive.toSeq.sorted)
      val negArr = typedLit(TaskModels.negative.toSeq.sorted)
      val labeled = docs.withColumn("__lbl",
        size(filter(toks, t => array_contains(posArr, t))) >=
          size(filter(toks, t => array_contains(negArr, t))))
      QualityClassifier.fit(
        labeled.where(col("__lbl")), labeled.where(!col("__lbl")), "text")
    })
    Transform.registerModel(modelName(dir), TrainedSentimentModel(m))
    m
  }

  def sql(spark: SparkSession, dir: String): String = {
    val m = fittedAndRegistered(spark, dir)
    s"""${C7OracleSql.scoringCtes(m)},
       |p AS (SELECT tk.doc_id,
       |    1.0 / (1.0 + exp(-(${m.intercept.toString} + coalesce(agg.s, 0.0)))) AS p
       |  FROM tk LEFT JOIN agg ON tk.doc_id = agg.doc_id)
       |SELECT doc_id,
       |  CASE WHEN p >= 0.5 THEN 'POSITIVE' ELSE 'NEGATIVE' END AS label,
       |  round(CASE WHEN p >= 0.5 THEN p ELSE 1.0 - p END, 4) AS score
       |FROM p ORDER BY doc_id""".stripMargin
  }
}
