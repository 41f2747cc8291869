package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** DuckDB replay of the PQ serving path (v16): encode → ADC shortlist →
  * exact cosine re-rank — the v12 SQ8 pattern extended to a FITTED model.
  *
  * The codebook comes out of a deterministic seeded Lloyd over a bounded
  * sample (Pq.fit), so the oracle can't be a static SQL string: it is
  * GENERATED per scale factor at Verify-dump time by refitting the same
  * model (identical data + seed ⇒ identical codebook) and inlining the
  * codebook and the query's ADC lookup table as SQL literals. Floats are
  * printed through Double.toString (shortest round-trip), so DuckDB parses
  * back the exact doubles the JVM kernels widen to — the replay is
  * float-for-float:
  *
  *   - encode: per (vector, subspace) argmin over centroids of the squared
  *     L2 distance, ties to the lowest centroid index
  *     (QuantExpressions.pqEncodeF);
  *   - ADC: qscore = Σ_g lut[g·k + code_g] (pqAdcDot), LUT inlined from
  *     PqModel.lut;
  *   - shortlist (qscore desc, vec_id) top-R, then exact cosine top-k —
  *     Pq.knnIndexed's In(id…)-pushdown re-rank.
  */
object V16OracleSql {

  def sql(spark: SparkSession, dir: String, queryId: Long = 7, k: Int = 10,
      m: Int = 8, kCent: Int = 32, rerank: Int = 200): String = {
    import spark.implicits._
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val q = emb.where(col("vec_id") === queryId)
      .select("embedding").as[Array[Float]].head()
    val model = graft.operators.Pq.fit(emb, "vec_id", "embedding", m, kCent)
    val cb = model.codebook.map(_.toDouble.toString).mkString("[", ",", "]")
    val lut = model.lut(q).map(_.toString).mkString("[", ",", "]")
    val sub = model.subDim
    val kc = model.k
    s"""WITH x AS (SELECT vec_id, CAST(i AS INT) AS d,
            CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM embeddings, range(1, ${model.dim + 1}) t(i)),
        cb AS (SELECT CAST(i AS INT) AS ci, l[CAST(i AS INT)] AS w
          FROM (SELECT $cb AS l), range(1, ${model.codebook.length + 1}) t(i)),
        dist AS (SELECT x.vec_id, (x.d - 1) // $sub AS g, cc.c AS c,
            sum((x.v - cb.w) * (x.v - cb.w)) AS dsq
          FROM x, range(0, $kc) cc(c)
          JOIN cb ON cb.ci = (((x.d - 1) // $sub) * $kc + cc.c) * $sub
                             + ((x.d - 1) % $sub) + 1
          GROUP BY x.vec_id, (x.d - 1) // $sub, cc.c),
        sel AS (SELECT vec_id, g, c,
            row_number() OVER (PARTITION BY vec_id, g ORDER BY dsq, c) AS rn
          FROM dist),
        lut AS (SELECT CAST(i AS INT) AS li, l[CAST(i AS INT)] AS w
          FROM (SELECT $lut AS l), range(1, ${m * kc + 1}) t(i)),
        sco AS (SELECT sel.vec_id, sum(lut.w) AS qscore
          FROM sel JOIN lut ON lut.li = sel.g * $kc + sel.c + 1
          WHERE sel.rn = 1
          GROUP BY sel.vec_id),
        shortlist AS (SELECT vec_id FROM sco
          ORDER BY qscore DESC, vec_id LIMIT $rerank)
        SELECT e.vec_id,
          round(CAST(list_cosine_similarity(e.embedding,
            (SELECT embedding FROM embeddings WHERE vec_id = $queryId)) AS DOUBLE), 5) AS score
        FROM embeddings e JOIN shortlist s ON e.vec_id = s.vec_id
        ORDER BY list_cosine_similarity(e.embedding,
          (SELECT embedding FROM embeddings WHERE vec_id = $queryId)) DESC, e.vec_id
        LIMIT $k"""
  }
}
