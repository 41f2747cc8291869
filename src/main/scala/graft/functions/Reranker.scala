package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.VecFunctions._

/** Cross-scorer seam for `pgml.rank` (reference:
  * pgml-extension/src/api.rs:612-625 — a cross-encoder scores
  * (query, document) pairs and the SDK re-orders a shortlist by that
  * score). The seam is column-level so rerank scoring runs distributed
  * inside the shortlist's plan — never a driver loop over candidates.
  *
  * Implementations:
  *  - [[TokenOverlapReranker]] — the deterministic offline stand-in
  *    (SURVEY §7.0: model-free but order-realistic, the default);
  *  - [[BiEncoderReranker]] — scores with a real [[Embedder]]
  *    (cosine of query/chunk embeddings). With [[Word2VecEmbedder]] this
  *    serves a genuinely TRAINED model through the rank seam — the
  *    sentence-transformers bi-encoder serving shape; a production
  *    cross-encoder drops in behind the same (query, chunk) → score
  *    contract.
  */
trait Reranker extends Serializable {
  def name: String
  /** Relevance of `chunk` to the (driver-known) query — higher is better. */
  def scoreCol(query: String, chunk: Column): Column
}

/** Deterministic token-overlap cross-scorer (Jaccard of query/chunk token
  * sets) — same alignment contract as the reference's cross-encoder
  * ((rank).corpus_id join), no model required. */
case object TokenOverlapReranker extends Reranker {
  override def name: String = "token-overlap"
  override def scoreCol(query: String, chunk: Column): Column =
    graft.operators.Dedup.tokenJaccard(lit(query), chunk)
}

/** Bi-encoder rerank over any [[Embedder]]: score = cosine(embed(query),
  * embed(chunk)). The query embeds once driver-side (a literal in the
  * plan); chunks embed in the codegen column path. */
final case class BiEncoderReranker(embedder: Embedder) extends Reranker {
  override def name: String = s"bi-encoder-${embedder.dim}"
  override def scoreCol(query: String, chunk: Column): Column =
    cosineSimilarity(
      embedder.embedCol(chunk),
      floatVec(embedder.embedOne(query).toIndexedSeq))
}

/** Cross-encoder-SHAPED reranker: a trained linear model over
  * (query, document) INTERACTION features rather than two independent
  * encodings — what architecturally separates a cross-encoder from a
  * bi-encoder (the pair is scored jointly; pgml's rank task serves
  * cross-encoder models the same way, api.rs:612-625). A transformer
  * cross-attention stack is out of sandbox scope; the interaction
  * features here (overlap, coverage, tf product, bigram overlap, length
  * ratio, plus the bi-encoder cosine as one input among equals) are the
  * classic learning-to-rank matching features (RankNet/LambdaMART
  * lineage), and the weights are a genuinely FIT MLlib
  * LogisticRegression.
  *
  * All features are pure Column expressions over the pair, so rerank
  * scoring runs inside the shortlist's plan — map-side, no driver loop,
  * no join (the query side folds to literals at serve time).
  */
final case class CrossEncoderReranker(model: CrossEncoderReranker.Model)
    extends Reranker {
  override def name: String = "cross-encoder-interaction"
  override def scoreCol(query: String, chunk: Column): Column =
    // the query embeds ONCE driver-side and rides as a literal (the
    // BiEncoderReranker move) — a UDF-backed embedder would otherwise
    // re-embed (or re-call its remote endpoint) per scored row
    model.score(lit(query), chunk,
      Some(floatVec(model.embedder.embedOne(query).toIndexedSeq)))
}

object CrossEncoderReranker {

  /** Tokenized views shared by fit and serve. */
  private def toks(c: Column): Column =
    filter(split(trim(lower(c)), "\\s+"), t => t =!= "")
  private def bigrams(t: Column): Column =
    when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1), i =>
        concat_ws(" ", element_at(t, i), element_at(t, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** The interaction features of one (query, chunk) pair, in fixed order.
    * Both sides are Columns so the same expressions serve fit (per-row
    * queries) and serving (a literal query). `queryVec` overrides the
    * query-side embedding with a prebuilt (literal) vector: a UDF-backed
    * embedder (Word2Vec, the remote batch client) is never
    * constant-folded, so without it a literal query would re-embed — or
    * re-call the remote endpoint — once per scored row. */
  def features(query: Column, chunk: Column, embedder: Embedder,
      queryVec: Option[Column] = None): Seq[Column] = {
    val q = toks(query); val c = toks(chunk)
    val qd = array_distinct(q); val cd = array_distinct(c)
    val inter = size(array_intersect(cd, qd)).cast("double")
    val nq = greatest(size(qd), lit(1)).cast("double")
    val nc = greatest(size(cd), lit(1)).cast("double")
    // union-size guard: both sides empty → 0/0 would be NaN, and NaN
    // sorts ABOVE every real score in a descending rerank
    val jaccard = inter / greatest(size(array_union(cd, qd)), lit(1)).cast("double")
    val coverage = inter / nq
    // Σ_w tf_q(w)·tf_c(w): per chunk token, its count in the query —
    // normalized by both lengths
    val tfprod = aggregate(c, lit(0.0),
      (acc, w) => acc + size(filter(q, t => t === w)).cast("double")) /
      (greatest(size(q), lit(1)) * greatest(size(c), lit(1))).cast("double")
    val bq = array_distinct(bigrams(q)); val bc = array_distinct(bigrams(c))
    val bigramCov = size(array_intersect(bc, bq)).cast("double") /
      greatest(size(bq), lit(1)).cast("double")
    val lenRatio = least(nq / nc, nc / nq)
    val biCos = cosineSimilarity(embedder.embedCol(chunk),
      queryVec.getOrElse(embedder.embedCol(query))).cast("double")
    Seq(jaccard, coverage, tfprod, bigramCov, lenRatio, biCos)
  }

  val FeatureNames: Seq[String] =
    Seq("jaccard", "coverage", "tf_product", "bigram_coverage", "len_ratio", "bi_cosine")

  /** A fitted pair scorer: sigmoid(intercept + w·features). */
  final case class Model(
      weights: Array[Double], intercept: Double, embedder: Embedder) {
    require(weights.length == FeatureNames.length,
      s"expected ${FeatureNames.length} weights, got ${weights.length}")
    def score(query: Column, chunk: Column,
        queryVec: Option[Column] = None): Column = {
      val dot = features(query, chunk, embedder, queryVec)
        .zip(weights.toIndexedSeq)
        .map { case (f, w) => f * lit(w) }.reduceLeft(_ + _)
      lit(1.0) / (lit(1.0) + exp(-(lit(intercept) + dot)))
    }
  }

  /** Fit on labeled pairs (queryCol, chunkCol, label ∈ {0,1}) — the
    * cross-encoder training contract (relevant/irrelevant pairs). */
  def fit(
      pairs: org.apache.spark.sql.DataFrame,
      queryCol: String, chunkCol: String, labelCol: String,
      embedder: Embedder,
      maxIter: Int = 100, regParam: Double = 1e-4): Model = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.linalg.Vectors
    val featCols = features(col(queryCol), col(chunkCol), embedder)
    val toVec = org.apache.spark.sql.functions.udf(
      (xs: scala.collection.Seq[Double]) => Vectors.dense(xs.toArray))
    val ds = pairs.select(col(labelCol).cast("double").as("label"),
      toVec(array(featCols: _*)).as("features"))
    val m = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam).setFamily("binomial").fit(ds)
    require(java.lang.Double.isFinite(m.intercept),
      s"cross-encoder fit diverged: intercept ${m.intercept}")
    Model(m.coefficients.toArray, m.intercept, embedder)
  }
}
