package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic, offline-friendly text embedder implementing the
  * `pgml.embed` contract (fixed dimension, L2-normalized output —
  * reference: pgml-extension/src/api.rs:589-610). SURVEY.md §7.0 calls for
  * a hash-based random-projection stand-in so search semantics are testable
  * without model downloads, mirroring how the reference's tests skip
  * model-dependent cases (api.rs:1087 `#[ignore]`).
  *
  * Model: bag-of-words random projection. Each token hashes to a
  * deterministic pseudo-random ±1 pattern over the `dim` output slots
  * (splitmix64 per (tokenHash, slot)); token vectors are summed and the
  * result L2-normalized. Cosine similarity of two embeddings then
  * approximates token-multiset overlap — monotone with Jaccard — so KNN /
  * hybrid-search semantics behave like a real sentence embedder's.
  *
  * A production deployment swaps this `Embedder` for an ONNX/JNI model
  * behind the same (text → fixed-dim normalized float vector) contract.
  */
object HashEmbedKernel {
  def embed(text: UTF8String, dim: Int): ArrayData = {
    val toks = TextKernels.tokens(text.toString)
    val acc = new Array[Double](dim)
    var t = 0
    while (t < toks.length) {
      val h = TextKernels.fnv1a64(toks(t))
      var d = 0
      while (d < dim) {
        // one pseudo-random sign per (token, slot)
        val r = TextKernels.mix(h, d.toLong)
        acc(d) += (if ((r & 1L) == 0L) 1.0 else -1.0)
        d += 1
      }
      t += 1
    }
    var norm = 0.0
    var d = 0
    while (d < dim) { norm += acc(d) * acc(d); d += 1 }
    val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
    val out = new Array[Float](dim)
    d = 0
    while (d < dim) { out(d) = (acc(d) * inv).toFloat; d += 1 }
    new GenericArrayData(out)
  }
}

/** `embed_text(text)` → array<float> of fixed `dim`, L2-normalized. */
case class EmbedText(child: Expression, dim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "embed_text"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && dim > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string input and dim>0")
  override def nullSafeEval(v: Any): Any =
    HashEmbedKernel.embed(v.asInstanceOf[UTF8String], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.HashEmbedKernel.embed($a, $dim)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Pluggable embedder boundary (local hash model vs remote endpoint —
  * remote_embeddings.rs:1-197 equivalent). */
trait Embedder extends Serializable {
  def dim: Int
  /** Column-level embedding for distributed use. */
  def embedCol(text: Column): Column
  /** Driver-side single-string embedding (query vectors). */
  def embedOne(text: String): Array[Float]
  /** Frame-level embedding: append `outName` (array<float> of `dim`) derived
    * from `inCol`. Default is the column path (codegen, per-row); embedders
    * whose backend wants batches (a remote endpoint, an on-device model)
    * override this with a `mapPartitions` batcher — sync paths call this, so
    * the batch shape reaches ingest without changing the column contract. */
  def embedFrame(df: org.apache.spark.sql.DataFrame, inCol: Column,
      outName: String): org.apache.spark.sql.DataFrame =
    df.withColumn(outName, embedCol(inCol))

  /** Driver-side batch embedding — what an event-sized sync batch calls
    * so a handful of chunks never pays a Spark job. Default maps
    * [[embedOne]]; batching backends override with ONE protocol call per
    * slice (the remote_embeddings.rs:70-118 shape, like [[embedFrame]]). */
  def embedMany(texts: Seq[String]): Seq[Array[Float]] = texts.map(embedOne)
}

final case class HashEmbedder(dim: Int = 64) extends Embedder {
  override def embedCol(text: Column): Column =
    ColumnBridge.column(EmbedText(ColumnBridge.expression(text), dim))
  override def embedOne(text: String): Array[Float] =
    HashEmbedKernel.embed(UTF8String.fromString(text), dim).toFloatArray()
}

/** The reference's remote-embeddings batch contract
  * (pgml-sdks/pgml/src/remote_embeddings.rs:1-197): texts are chunked into
  * fixed-size batches (`chunks(self.batch_size)`) and each batch is ONE
  * request returning one embedding per input, in order. Implementations are
  * per-executor clients (an HTTP endpoint in production); the deterministic
  * [[HashBackedClient]] serves the same protocol from the local hash kernel
  * so the plumbing is testable offline.
  */
trait RemoteEmbeddingsClient extends Serializable {
  def model: String
  /** One request: an embedding per input text, same order. */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]
}

/** Offline stand-in "endpoint": the hash kernel behind the remote protocol
  * shape, so RemoteEmbedder and HashEmbedder agree vector-for-vector. */
final case class HashBackedClient(dim: Int = 64) extends RemoteEmbeddingsClient {
  override def model: String = s"hash-projection-$dim"
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    texts.map(t => HashEmbedKernel.embed(UTF8String.fromString(t), dim).toFloatArray())
}

/** Embedder over a [[RemoteEmbeddingsClient]]. The frame path is the real
  * contract: `mapPartitions` groups rows into `batchSize` slices and makes
  * one client call per slice (remote_embeddings.rs:70-118's
  * generate_embeddings loop) — never a call per row. NULL texts yield NULL
  * embeddings without reaching the client, matching the null-intolerant
  * column kernel.
  */
final case class RemoteEmbedder(
    client: RemoteEmbeddingsClient,
    dim: Int = 64,
    batchSize: Int = 32) extends Embedder {

  override def embedOne(text: String): Array[Float] = {
    val e = client.embedBatch(Seq(text)).head
    require(e.length == dim,
      s"client ${client.model} returned dim ${e.length}, embedder declares $dim")
    e
  }

  /** Driver-side batches go through the SAME sliced protocol as
    * [[embedFrame]] — one client request per `batchSize` slice, never a
    * request per text. */
  override def embedMany(texts: Seq[String]): Seq[Array[Float]] =
    texts.grouped(batchSize).flatMap { slice =>
      val embs = client.embedBatch(slice)
      embs.foreach(e => require(e.length == dim,
        s"client ${client.model} returned dim ${e.length}, embedder declares $dim"))
      embs
    }.toSeq

  /** Column fallback (single-text batches). Prefer [[embedFrame]] — this
    * exists so driver-side query embedding and ad-hoc column use work. */
  override def embedCol(text: Column): Column = {
    val c = client
    val f = org.apache.spark.sql.functions.udf(
      (t: String) => if (t == null) null else c.embedBatch(Seq(t)).head)
    f(text)
  }

  override def embedFrame(df: org.apache.spark.sql.DataFrame, inCol: Column,
      outName: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    require(!df.columns.contains(outName),
      s"embedFrame output column '$outName' already exists in the input frame")
    // derive a temp name absent from the frame so an existing __embed_in
    // column is never clobbered
    val tmpName = Iterator.from(0).map(i => s"__embed_in_$i")
      .find(n => !df.columns.contains(n)).get
    val tmp = df.withColumn(tmpName, inCol)
    val inIdx = tmp.schema.fieldIndex(tmpName)
    val outSchema = tmp.schema.add(outName, ArrayType(FloatType, containsNull = false))
    val c = client
    val bs = batchSize
    val d = dim
    val out = tmp.mapPartitions { it =>
      it.grouped(bs).flatMap { batch =>
        val texts = batch.collect { case r if !r.isNullAt(inIdx) => r.getString(inIdx) }
        // an all-NULL slice must not generate client traffic (a real
        // endpoint rejects an empty-input request)
        val embs = (if (texts.isEmpty) Nil else c.embedBatch(texts)).iterator
        batch.map { r =>
          val e = if (r.isNullAt(inIdx)) null else embs.next()
          if (e != null) require(e.length == d,
            s"client ${c.model} returned dim ${e.length}, embedder declares $d")
          Row.fromSeq(r.toSeq :+ e)
        }
      }
    }(Encoders.row(outSchema))
    out.drop(tmpName)
  }
}
