package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained token-classification (NER) for the transform dispatch — the
  * last transform task family that had no trained model behind it
  * (pgml-extension/src/api.rs:670-751 token-classification; the
  * capitalization regex in [[TaskModels.run]] is the untrained stand-in).
  * A per-token MLlib logistic over WINDOW FEATURES (the classical
  * feature-based NER shape — Ratinov & Roth, CoNLL 2009 — with the
  * transformer architecture out of sandbox scope, SURVEY §7.0): each
  * token scores independently from its own surface form plus its left
  * neighbor, so serving is embarrassingly parallel and the decision
  * function is SQL-replayable (the x9 oracle's contract).
  *
  * Scale shape: fit explodes (text, entity-indices) rows into per-token
  * feature rows map-side (no shuffle beyond MLlib's own aggregation);
  * serving rides the transform dispatch's batched mapPartitions with the
  * 7-double parameter vector in the task-model closure — constant
  * per-token work, the corpus streams once.
  */
object NerClassifier {

  /** Left-context trigger lexicon (feature f2). Part of the model's
    * feature definition — the oracle inlines the same list. */
  val Triggers: Seq[String] = Seq("mr", "mrs", "dr", "visited", "in", "from")
  private val triggerSet = Triggers.toSet

  final case class Model(weights: Array[Double], intercept: Double)
      extends Serializable {
    /** p(entity) for token `i` (0-based) — margin folds b + (left-assoc
      * Σ wⱼfⱼ in feature order) so SQL replays it IEEE-identically. */
    def scoreToken(tokens: Array[String], i: Int): Double = {
      val f = features(tokens, i)
      var dot = 0.0
      var j = 0
      while (j < weights.length) { dot += weights(j) * f(j); j += 1 }
      1.0 / (1.0 + math.exp(-(intercept + dot)))
    }
  }

  private def cap(s: String): Boolean =
    s.nonEmpty && s.charAt(0) >= 'A' && s.charAt(0) <= 'Z'

  /** Per-token window features, every term SQL-expressible:
    * [cap(w), is-first, trigger(prev), cap(prev), min(len,12)/12,
    * has-digit]. ASCII-case semantics on both engines (corpus contract). */
  def features(tokens: Array[String], i: Int): Array[Double] = {
    val w = tokens(i)
    val prev = if (i > 0) tokens(i - 1) else ""
    Array(
      if (cap(w)) 1.0 else 0.0,
      if (i == 0) 1.0 else 0.0,
      if (i > 0 && triggerSet.contains(prev.toLowerCase)) 1.0 else 0.0,
      if (i > 0 && cap(prev)) 1.0 else 0.0,
      math.min(w.length, 12) / 12.0,
      if (w.exists(c => c >= '0' && c <= '9')) 1.0 else 0.0)
  }

  private[operators] def tokenize(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)

  /** Fit the per-token logistic: `docs(textCol, labelIdxCol)` where
    * `labelIdxCol` holds the 1-BASED indices of the entity tokens. */
  def fit(docs: DataFrame, textCol: String, labelIdxCol: String): Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = docs.select(col(textCol), col(labelIdxCol))
      .as[(String, Seq[Int])]
      .flatMap { case (text, ents) =>
        val toks = tokenize(text)
        val es = ents.toSet
        toks.indices.map { i =>
          val f = features(toks, i)
          (f(0), f(1), f(2), f(3), f(4), f(5),
            if (es.contains(i + 1)) 1.0 else 0.0)
        }
      }.toDF("f0", "f1", "f2", "f3", "f4", "f5", "label")
    val vec = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("f0", "f1", "f2", "f3", "f4", "f5"))
      .setOutputCol("features")
      .transform(rows)
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(100).setLabelCol("label").setFeaturesCol("features")
      .fit(vec)
    Model(lr.coefficients.toArray, lr.intercept)
  }
}

/** NER served from a trained [[NerClassifier.Model]] through the transform
  * dispatch (`pgml.transform('token-classification', model := ...)`): the
  * HF token-classification envelope, one object per predicted entity with
  * the raw probability (`Double.toString` round-trips — the x9 oracle
  * replays the score behind round(4)). `index` is 1-based. */
final case class TrainedNerModel(model: NerClassifier.Model) extends TaskModel {
  override def task: String = "token-classification"

  // full JSON string escaping — every control char below 0x20 must be
  // escaped or the envelope is invalid JSON and from_json nulls the
  // whole entity array for the document
  private def esc(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '"' => "\\\""
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  override def runBatch(texts: Seq[String], args: Map[String, String]): Seq[String] =
    texts.map { t =>
      val toks = NerClassifier.tokenize(t)
      val ents = toks.indices.flatMap { i =>
        val p = model.scoreToken(toks, i)
        if (p >= 0.5)
          Some(s"""{"word": "${esc(toks(i))}", "entity": "ENT", "score": $p, "index": ${i + 1}}""")
        else None
      }
      s"[${ents.mkString(", ")}]"
    }
}
