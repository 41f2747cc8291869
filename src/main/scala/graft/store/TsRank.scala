package graft.store

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextKernels

/** Full-text scoring — the engine's counterpart of Postgres
  * `to_tsvector('english', ...)` + `ts_rank(ts, plainto_tsquery(q), 32)`
  * (used at search_query_builder.rs:328-344).
  *
  * Divergence note (documented, deterministic): instead of Snowball
  * stemming + stopword dictionaries, tokens are lowercased and run through
  * a small English suffix stripper. The *scoring shape* matches: per-term
  * frequency weighting and the `32` normalization `rank/(rank+1)`.
  */
object TsRank {

  /** Suffix-stripping stemmer (applied identically to documents and
    * queries, so matching is self-consistent). */
  def stem(tok: String): String = {
    var t = tok
    if (t.endsWith("ies") && t.length > 4) t = t.dropRight(3) + "y"
    else if (t.endsWith("sses")) t = t.dropRight(2)
    else if (t.endsWith("es") && t.length > 3) t = t.dropRight(2)
    else if (t.endsWith("s") && !t.endsWith("ss") && t.length > 3) t = t.dropRight(1)
    if (t.endsWith("ing") && t.length > 5) t = t.dropRight(3)
    else if (t.endsWith("ed") && t.length > 4) t = t.dropRight(2)
    t
  }

  def stemTokens(text: UTF8String): Array[UTF8String] =
    TextKernels.tokens(text.toString).map(t => UTF8String.fromString(stem(t)))

  /** tsvector surrogate: array of stemmed tokens (duplicates kept — they
    * carry the term frequencies). */
  def tsVector(text: Column): Column =
    ColumnBridge.column(TsVectorExpr(ColumnBridge.expression(text)))

  /** ts_rank with normalization 32 under `plainto_tsquery` AND semantics
    * (search_query_builder.rs:328-344): plainto_tsquery joins all query
    * terms with `&`, and the reference gates on `tsvector @@ query` before
    * ranking — a document missing ANY stemmed query term scores 0. For
    * matching documents: rank = Σ_t tf(t)/len, then rank/(rank+1).
    */
  def rank(termsCol: Column, query: String): Column = {
    val qTerms = TextKernels.tokens(query).map(stem).distinct
    if (qTerms.isEmpty) lit(0.0)
    else {
      val len = greatest(size(termsCol).cast("double"), lit(1.0))
      val tfs = qTerms.map(t => size(filter(termsCol, x => x === lit(t))).cast("double"))
      val allPresent = tfs.map(_ > lit(0.0)).reduce(_ && _)
      val raw = tfs.map(_ / len).reduce(_ + _)
      when(allPresent, raw / (raw + lit(1.0))).otherwise(lit(0.0))
    }
  }
}

case class TsVectorExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ts_vector"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string input")
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(TsRank.stemTokens(v.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.store.TsRank.stemTokens($a))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
