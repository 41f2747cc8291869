package graft

import org.apache.spark.sql.catalyst.expressions.Expression

import graft.functions._

/** The single source of truth for the engine's SQL function surface —
  * consumed by [[GraftExtensions]] (session-build injection via
  * `spark.sql.extensions`, a static conf) and by
  * `VecFunctions.registerAll` (runtime registration on a live session).
  */
object SqlRegistrations {

  private def intArg(es: Seq[Expression], i: Int, dflt: Int): Int =
    if (es.length > i) es(i).eval(null).toString.toInt else dflt

  /** Config arguments must be foldable non-NULL literals: a non-foldable
    * expression would silently evaluate against a null row, and a NULL
    * literal would NPE with an opaque message — both are caller errors
    * worth naming. */
  private def literalArg(es: Seq[Expression], i: Int, fn: String): String = {
    val e = es(i)
    require(e.foldable, s"$fn argument ${i + 1} must be a literal, got: ${e.sql}")
    val v = e.eval(null)
    require(v != null, s"$fn argument ${i + 1} must not be NULL")
    v.toString
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (es => DotProduct(es(0), es(1))),
    "cosine_similarity" -> (es => CosineSimilarity(es(0), es(1))),
    "vec_distance_l1" -> (es => DistanceL1(es(0), es(1))),
    "vec_distance_l2" -> (es => DistanceL2(es(0), es(1))),
    "vec_norm_l0" -> (es => NormL0(es.head)),
    "vec_norm_l1" -> (es => NormL1(es.head)),
    "vec_norm_l2" -> (es => NormL2(es.head)),
    "vec_norm_max" -> (es => NormMax(es.head)),
    "vec_normalize_l1" -> (es => NormalizeVector(es.head, "l1")),
    "vec_normalize_l2" -> (es => NormalizeVector(es.head, "l2")),
    "vec_normalize_max" -> (es => NormalizeVector(es.head, "max")),
    "vec_sum" -> (es => VectorAggregate(es.head, "sum").toAggregateExpression()),
    "vec_min" -> (es => VectorAggregate(es.head, "min").toAggregateExpression()),
    "vec_max" -> (es => VectorAggregate(es.head, "max").toAggregateExpression()),
    "vec_min_abs" -> (es => VectorAggregate(es.head, "minAbs").toAggregateExpression()),
    "vec_max_abs" -> (es => VectorAggregate(es.head, "maxAbs").toAggregateExpression()),
    "simhash64" -> (es => SimHash64(es.head)),
    "lang_id" -> (es => LangId(es.head)),
    "token_count" -> (es => TokenCount(es.head)),
    "embed_text" -> (es => EmbedText(es.head, intArg(es, 1, 64))),
    "minhash_signature" -> (es =>
      MinHashSignature(es.head, intArg(es, 1, 128), intArg(es, 2, 1))),
    "winnow_fingerprint" -> (es =>
      WinnowFingerprint(es.head, intArg(es, 1, 8), intArg(es, 2, 4))),
    "char_ngram_fnv_buckets" -> (es =>
      CharNgramFnvBuckets(es.head, intArg(es, 1, 2), intArg(es, 2, 1024))),
    "chunk_text" -> (es => ChunkText(es.head, intArg(es, 1, 1500), intArg(es, 2, 40),
      if (es.length > 3) ChunkKernel.setIdFor(literalArg(es, 3, "chunk_text"))
      else 0)),
    "ts_vector" -> (es => graft.store.TsVectorExpr(es.head)),
    "vec_sign_pack" -> (es => SignPack(es.head)),
    "vec_hamming" -> (es => HammingWords(es(0), es(1))),
    "sq8_encode" -> (es => Sq8Encode(es(0), es(1), es(2))),
    "sq8_adc_dot" -> (es => Sq8AdcDot(es(0), es(1), es(2))),
    "sq8_adc_poly" -> (es => Sq8AdcPoly(es(0), es(1), es(2))),
    "pq_encode" -> (es => PqEncode(es(0), es(1), intArg(es, 2, 8), intArg(es, 3, 256))),
    "pq_adc_dot" -> (es => PqAdcDot(es(0), es(1))))
}
