package graft.queries

import org.apache.spark.sql.SparkSession

import graft.operators.Bpe

/** DuckDB oracle for t13_bpe_tokens: replays the fitted BPE tokenizer's
  * SERVING loop end to end — per distinct pre-token, a recursive CTE
  * applies one merge per iteration (lowest-rank adjacent pair present in
  * the merge table, every occurrence merged left-to-right via the same
  * string-accumulator fold the Spark step uses), then per-document token
  * counts aggregate back over the occurrences. The merge table is the
  * only data the oracle receives (inlined from the fitted model, the
  * m3/c7 generated-oracle pattern); the ENCODER is what it verifies.
  */
object T13OracleSql {

  val NumMerges = 40

  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, Bpe.Model]

  def fitted(spark: SparkSession, dir: String): Bpe.Model =
    cache.getOrElseUpdate(dir, {
      val docs = graft.Tables.load(spark, dir, "documents")
      Bpe.fit(docs, "doc_id", "text", numMerges = NumMerges)
    })

  private def esc(s: String): String = s.replace("'", "''")

  def sql(spark: SparkSession, dir: String): String = {
    val m = fitted(spark, dir)
    // rank-ordered merge keys as a chr(31)-joined literal list — tokens
    // can be any punctuation mark, so the key separator must be the same
    // unit separator the token strings use
    val mk = m.merges
      .map { case (a, b) => s"'${esc(a)}' || chr(31) || '${esc(b)}'" }
      .mkString("[", ", ", "]")
    // RE2's \\s excludes the vertical tab Java's includes — spell the
    // whitespace class out so both engines pre-tokenize identically; and
    // drop the reserved U+001F pre-token exactly like the Spark path
    val pattern = """[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\v\f\r]"""
    s"""WITH RECURSIVE
        d0 AS (SELECT doc_id, list_filter(
            regexp_extract_all(text, '$pattern'), x -> x <> chr(31)) AS pt
          FROM documents),
        wds AS (SELECT DISTINCT unnest(pt) AS w FROM d0),
        st(w, s, i) AS (
          SELECT w, array_to_string(string_split(w, ''), chr(31)), 0 FROM wds
          UNION ALL
          SELECT w,
            list_reduce(list_concat([''],
              string_split(s, chr(31))), (acc, t) -> CASE
                WHEN acc = '' THEN t
                WHEN (acc = string_split(($mk)[best], chr(31))[1]
                      OR ends_with(acc,
                        chr(31) || string_split(($mk)[best], chr(31))[1]))
                     AND t = string_split(($mk)[best], chr(31))[2]
                  THEN acc || t
                ELSE acc || chr(31) || t END),
            i + 1
          FROM (
            SELECT w, s, i,
              list_min(list_filter(list_transform(
                list_transform(range(1, len(tk)),
                  j -> tk[CAST(j AS INT)] || chr(31) || tk[CAST(j AS INT) + 1]),
                p -> list_position($mk, p)), x -> x IS NOT NULL AND x > 0))
                AS best
            FROM (SELECT w, s, i, string_split(s, chr(31)) AS tk FROM st
              WHERE i < ${Bpe.DefaultMaxSteps}) t0
          ) t1
          WHERE best IS NOT NULL),
        fin AS (SELECT w, arg_max(s, i) AS s FROM st GROUP BY w),
        cnt AS (SELECT w, len(string_split(s, chr(31))) AS c FROM fin),
        occ AS (SELECT doc_id, unnest(pt) AS w FROM d0),
        agg AS (SELECT occ.doc_id, count(*) AS npt, sum(cnt.c) AS nb
          FROM occ JOIN cnt USING (w) GROUP BY occ.doc_id)
        SELECT d0.doc_id,
          CAST(coalesce(agg.npt, 0) AS INT) AS n_pretokens,
          CAST(coalesce(agg.nb, 0) AS BIGINT) AS n_bpe_tokens
        FROM d0 LEFT JOIN agg ON d0.doc_id = agg.doc_id
        ORDER BY d0.doc_id"""
  }
}
