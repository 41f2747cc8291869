package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Corpus, QualityClassifier}

/** DuckDB oracle for c7_quality_classifier: replays the trained logistic
  * quality model's SERVING math end to end — per-token FNV-1a-64 over
  * UTF-8 bytes folded to the power-of-two bucket count, the tf-weighted
  * dot product folded left-associatively in token order, and the
  * sigmoid — against the fitted coefficients inlined as exact
  * `Double.toString` literals (the v16/m3 generated-oracle pattern: the
  * MODEL is data the oracle receives; the SCORING PIPELINE is what it
  * verifies).
  *
  * The fit is memoized per sf-dir so the Spark query and the generated
  * oracle replay the SAME fitted model within a Verify run.
  */
object C7OracleSql {

  val Dim = 1024

  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, QualityClassifier.Model]

  /** Labels distilled from the heuristic curation gates (the DCLM shape:
    * a cheap classifier fit to reproduce an expensive pipeline's keep
    * decision): positives = `Corpus.curate` survivors, negatives = its
    * rejects.
    */
  def fitted(spark: SparkSession, dir: String): QualityClassifier.Model =
    cache.getOrElseUpdate(dir, {
      val docs = graft.Tables.load(spark, dir, "documents")
      val keptIds = Corpus.curate(docs, "doc_id", "text").select("doc_id")
      val pos = docs.join(keptIds, Seq("doc_id"), "left_semi")
      val neg = docs.join(keptIds, Seq("doc_id"), "left_anti")
      QualityClassifier.fit(pos, neg, "text", dim = Dim)
    })

  private val fnvInit = "14695981039346656037::HUGEINT"
  private val fnvPrime = "1099511628211::HUGEINT"
  private val m64 = "18446744073709551616::HUGEINT"

  private def fnv(list: String): String =
    s"list_reduce(list_concat([$fnvInit], list_transform($list, b -> b::HUGEINT)), " +
      s"(h, b) -> (xor(h, b) * $fnvPrime) % $m64)"

  // UTF-8 byte expansion of a string (same helper shape as T6OracleSql)
  private def utf8Bytes(s: String): String =
    s"flatten(list_transform(string_split($s, ''), ch -> " +
      "CASE WHEN unicode(ch) < 128 THEN [unicode(ch)] " +
      "WHEN unicode(ch) < 2048 THEN [192 + unicode(ch) // 64, 128 + unicode(ch) % 64] " +
      "WHEN unicode(ch) < 65536 THEN [224 + unicode(ch) // 4096, 128 + (unicode(ch) // 64) % 64, 128 + unicode(ch) % 64] " +
      "ELSE [240 + unicode(ch) // 262144, 128 + (unicode(ch) // 4096) % 64, 128 + (unicode(ch) // 64) % 64, 128 + unicode(ch) % 64] END))"

  /** Shared WITH-clause body replaying a fitted model's serving math over
    * `documents`: hashed bucketing, per-occurrence tf contributions, and
    * the j-ordered left-assoc fold. Exposes CTEs `tk(doc_id, t)` and
    * `agg(doc_id, s)`; the caller's SELECT applies
    * `1/(1+exp(-(intercept + coalesce(s, 0))))`. Reused by the x5
    * trained-sentiment oracle. */
  def scoringCtes(m: QualityClassifier.Model): String = {
    val values = m.weights.zipWithIndex
      .map { case (w, b) => s"($b, ${w.toString})" }.mkString(", ")
    s"""WITH w(bucket, wt) AS (VALUES $values),
       |tk AS (SELECT doc_id, list_filter(
       |    string_split_regex(lower(text), '\\s+'), t -> t <> '') AS t
       |  FROM documents),
       |tok AS (SELECT doc_id, len(t) AS n, unnest(t) AS tokw,
       |    unnest(range(1, len(t) + 1)) AS j FROM tk),
       |bk AS (SELECT doc_id, n, j,
       |    (${fnv(utf8Bytes("tokw"))} % ${m.dim}::HUGEINT)::INT AS bucket
       |  FROM tok),
       |sc AS (SELECT bk.doc_id, bk.j, coalesce(w.wt, 0.0) / bk.n AS c
       |  FROM bk LEFT JOIN w USING (bucket)),
       |agg AS (SELECT doc_id,
       |    list_reduce(list(c ORDER BY j), (x, y) -> x + y) AS s
       |  FROM sc GROUP BY doc_id)""".stripMargin
  }

  def sql(spark: SparkSession, dir: String): String = {
    val m = fitted(spark, dir)
    s"""${scoringCtes(m)}
       |SELECT tk.doc_id, CAST(len(tk.t) AS BIGINT) AS n_toks,
       |  round(1.0 / (1.0 + exp(-(${m.intercept.toString} + coalesce(agg.s, 0.0)))), 4) + 0.0 AS score
       |FROM tk LEFT JOIN agg ON tk.doc_id = agg.doc_id
       |ORDER BY tk.doc_id""".stripMargin
  }
}
