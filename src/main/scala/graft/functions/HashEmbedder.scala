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
}

final case class HashEmbedder(dim: Int = 64) extends Embedder {
  override def embedCol(text: Column): Column =
    ColumnBridge.column(EmbedText(ColumnBridge.expression(text), dim))
  override def embedOne(text: String): Array[Float] =
    HashEmbedKernel.embed(UTF8String.fromString(text), dim).toFloatArray()
}
