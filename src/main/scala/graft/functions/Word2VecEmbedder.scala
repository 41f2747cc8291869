package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A GENUINELY TRAINED model behind the [[Embedder]] seam — the proof that
  * the seam carries more than the deterministic hash stand-in. MLlib
  * Word2Vec (skip-gram) is fit on a corpus column, persisted with MLlib's
  * own writer (so a serving session can load it with no retrain and no
  * network), and served as mean-pooled word vectors L2-normalized to the
  * fixed-dim contract — the same mean-pool + normalize output shape the
  * reference's sentence-transformer embedders produce
  * (pgml-extension/src/bindings/transformers/transformers.py; contract at
  * src/api.rs:589-610).
  *
  * Serving carries the vocabulary as a plain broadcast-friendly map: an
  * executor embeds a chunk with zero driver round-trips, and [[embedOne]]
  * answers query-vector requests in-process — the index/search machinery
  * cannot tell this model from the hash projection, which is exactly what
  * the seam promises.
  */
final case class Word2VecEmbedder(
    vectors: Map[String, Array[Float]],
    override val dim: Int) extends Embedder {

  private def tokens(text: String): Array[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty)

  private def meanPool(toks: Array[String]): Array[Float] = {
    val acc = new Array[Double](dim)
    var n = 0
    toks.foreach { t =>
      vectors.get(t).foreach { v =>
        var i = 0
        while (i < dim) { acc(i) += v(i); i += 1 }
        n += 1
      }
    }
    if (n > 0) { var i = 0; while (i < dim) { acc(i) /= n; i += 1 } }
    var norm = 0.0
    acc.foreach(x => norm += x * x)
    norm = math.sqrt(norm)
    val out = new Array[Float](dim)
    var i = 0
    // all-OOV text embeds to the zero vector (cosine 0 against everything)
    // rather than NaN — the hash embedder's empty-input contract
    while (i < dim) { out(i) = (if (norm == 0.0) 0.0 else acc(i) / norm).toFloat; i += 1 }
    out
  }

  override def embedOne(text: String): Array[Float] = meanPool(tokens(text))

  override def embedCol(text: Column): Column = {
    val self = this
    udf((t: String) => if (t == null) null else self.meanPool(self.tokens(t)))
      .apply(text)
  }
}

object Word2VecEmbedder {

  /** The ONE fit path (train and serve tokenize identically; fit and
    * fitAndSave must never drift): whitespace-lowercase tokens, fixed
    * seed, single gradient partition for reproducibility. */
  private def fitModel(corpus: DataFrame, textCol: String, dim: Int,
      minCount: Int, seed: Long): org.apache.spark.ml.feature.Word2VecModel = {
    val toks = corpus
      .select(split(lower(col(textCol)), "\\s+").as("toks"))
      .where(size(col("toks")) > 0)
      .coalesce(1) // single gradient partition → reproducible fits
    new org.apache.spark.ml.feature.Word2Vec()
      .setInputCol("toks").setOutputCol("vec")
      .setVectorSize(dim).setMinCount(minCount).setSeed(seed)
      .setMaxIter(1)
      .fit(toks)
  }

  /** Fit on `corpus(textCol)` (whitespace-lowercase tokens — the same
    * tokenization serving uses, so train and serve agree). Deterministic:
    * fixed seed, one partition for the gradient pass. */
  def fit(corpus: DataFrame, textCol: String, dim: Int = 32,
      minCount: Int = 1, seed: Long = 42L): Word2VecEmbedder =
    fromModel(fitModel(corpus, textCol, dim, minCount, seed))

  /** Wrap an already-fit (or loaded) MLlib model. */
  def fromModel(model: org.apache.spark.ml.feature.Word2VecModel): Word2VecEmbedder = {
    val dim = model.getVectorSize
    val vecs = model.getVectors.collect()
      .map(r => r.getString(0) ->
        r.getAs[org.apache.spark.ml.linalg.Vector](1).toArray.map(_.toFloat))
      .toMap
    Word2VecEmbedder(vecs, dim)
  }

  /** Persist with MLlib's writer — a later session serves via [[load]]
    * with no retrain (the registry dump/load shape, orm/model.rs). */
  def save(model: org.apache.spark.ml.feature.Word2VecModel, path: String): Unit =
    model.write.overwrite().save(path)

  def fitAndSave(corpus: DataFrame, textCol: String, path: String,
      dim: Int = 32, minCount: Int = 1, seed: Long = 42L): Word2VecEmbedder = {
    val model = fitModel(corpus, textCol, dim, minCount, seed)
    save(model, path)
    fromModel(model)
  }

  def load(spark: SparkSession, path: String): Word2VecEmbedder =
    fromModel(org.apache.spark.ml.feature.Word2VecModel.load(path))
}

/** The trained model behind the REMOTE batch protocol
  * (remote_embeddings.rs:1-197): what a self-hosted embedding endpoint
  * would serve. [[RemoteEmbedder]] over this client batches exactly like
  * it batches over a network client — the second end-to-end implementation
  * of the seam, with real learned vectors instead of the hash kernel. */
final case class Word2VecBackedClient(embedder: Word2VecEmbedder)
    extends RemoteEmbeddingsClient {
  override def model: String = s"word2vec-${embedder.dim}"
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    texts.map(embedder.embedOne)
}
