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
