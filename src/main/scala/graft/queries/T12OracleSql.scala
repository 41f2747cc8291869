package graft.queries

import org.apache.spark.sql.SparkSession

import graft.operators.{LangIdClassifier, LangIdFixtures}

/** DuckDB oracle for t12_lang_id_trained: replays the trained multinomial
  * langid model's SERVING math end to end — per-window char-bigram
  * FNV-1a-64 bucketing over the lowercased text, per-class tf dot
  * products folded left-associatively in window order, the deterministic
  * (−logit, label) struct-sort argmax, and the stable softmax folded in
  * label order — against the fitted coefficients inlined as exact
  * `Double.toString` literals (the c7/x5 generated-oracle pattern: the
  * MODEL is data the oracle receives; the SCORING PIPELINE is what it
  * verifies).
  *
  * The model is fit ONCE per JVM on the deterministic
  * [[LangIdFixtures]] corpus (which does not depend on the sf dir), so
  * the Spark query and the generated oracle replay the same model.
  */
object T12OracleSql {

  val N: Int = LangIdClassifier.DefaultN
  val Dim: Int = LangIdClassifier.DefaultDim
  val TrainPerLang = 200
  val TrainSeed = 0x7a5a5a5aL

  @volatile private var cached: Option[LangIdClassifier.Model] = None

  def fitted(spark: SparkSession): LangIdClassifier.Model = synchronized {
    cached.getOrElse {
      val m = LangIdClassifier.fit(
        LangIdFixtures.corpus(spark, TrainPerLang, TrainSeed), "text", "lang",
        n = N, dim = Dim)
      cached = Some(m)
      m
    }
  }

  private val fnvInit = "14695981039346656037::HUGEINT"
  private val fnvPrime = "1099511628211::HUGEINT"
  private val m64 = "18446744073709551616::HUGEINT"

  private def fnv(list: String): String =
    s"list_reduce(list_concat([$fnvInit], list_transform($list, b -> b::HUGEINT)), " +
      s"(h, b) -> (xor(h, b) * $fnvPrime) % $m64)"

  // UTF-8 byte expansion of a string (same helper as C7OracleSql; the
  // fixture vocabularies reach the 2- and 3-byte branches — ü/é/ñ and CJK)
  private def utf8Bytes(s: String): String =
    s"flatten(list_transform(string_split($s, ''), ch -> " +
      "CASE WHEN unicode(ch) < 128 THEN [unicode(ch)] " +
      "WHEN unicode(ch) < 2048 THEN [192 + unicode(ch) // 64, 128 + unicode(ch) % 64] " +
      "WHEN unicode(ch) < 65536 THEN [224 + unicode(ch) // 4096, 128 + (unicode(ch) // 64) % 64, 128 + unicode(ch) % 64] " +
      "ELSE [240 + unicode(ch) // 262144, 128 + (unicode(ch) // 4096) % 64, 128 + (unicode(ch) // 64) % 64, 128 + unicode(ch) % 64] END))"

  def sql(spark: SparkSession, dir: String): String = {
    val m = fitted(spark)
    val ls = m.labels
    val wCols = ls.map(l => s"w_$l").mkString(", ")
    val values = (0 until m.dim).map { b =>
      s"($b, ${ls.indices.map(c => m.weights(c)(b).toString).mkString(", ")})"
    }.mkString(", ")
    val contribs = ls.map(l => s"coalesce(w.w_$l, 0.0) / bk.nw AS c_$l").mkString(", ")
    val folds = ls.map(l =>
      s"list_reduce(list(c_$l ORDER BY j), (x, y) -> x + y) AS s_$l").mkString(", ")
    val logits = ls.indices.map { c =>
      s"(${m.intercepts(c).toString} + coalesce(agg.s_${ls(c)}, 0.0)) AS l_${ls(c)}"
    }.mkString(", ")
    val structs = ls.map(l => s"{'nl': -l_$l, 'lang': '$l'}").mkString(", ")
    val lCols = ls.map(l => s"l_$l").mkString(", ")
    val denom = ls.map(l => s"exp(l_$l + p.nl)").mkString(" + ")
    s"""WITH w(bucket, $wCols) AS (VALUES $values),
       |ch AS (SELECT doc_id, string_split(lower(text), '') AS cs FROM documents),
       |ng AS (SELECT doc_id, len(cs) + ${1 - N} AS nw,
       |    unnest(range(1, len(cs) + ${2 - N})) AS j, cs
       |  FROM ch WHERE len(cs) >= $N),
       |gram AS (SELECT doc_id, nw, CAST(j AS INT) AS j,
       |    array_to_string(cs[CAST(j AS INT):CAST(j AS INT) + ${N - 1}], '') AS g
       |  FROM ng),
       |bk AS (SELECT doc_id, nw, j,
       |    (${fnv(utf8Bytes("g"))} % ${m.dim}::HUGEINT)::INT AS bucket
       |  FROM gram),
       |sc AS (SELECT bk.doc_id, bk.j, $contribs
       |  FROM bk LEFT JOIN w USING (bucket)),
       |agg AS (SELECT doc_id, $folds FROM sc GROUP BY doc_id),
       |lg AS (SELECT ch.doc_id, $logits
       |  FROM ch LEFT JOIN agg ON ch.doc_id = agg.doc_id),
       |pk AS (SELECT doc_id, list_sort([$structs])[1] AS p, $lCols FROM lg)
       |SELECT doc_id, p.lang AS lang,
       |  round(1.0 / ($denom), 4) AS confidence
       |FROM pk ORDER BY doc_id""".stripMargin
  }
}
