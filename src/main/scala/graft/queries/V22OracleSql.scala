package graft.queries

import org.apache.spark.sql.SparkSession

/** DuckDB replay of the PQ serving path under METRIC l2 (v22): encode →
  * l2-ADC shortlist → exact L2 re-rank, over DE-NORMALIZED vectors (each
  * scaled by `vec_id % 7 + 1` in float32 — see the v17–v20 twin rationale
  * in QueryCatalog).
  *
  * Same generated-oracle scheme as [[V16OracleSql]]: the codebook comes
  * out of a deterministic seeded Lloyd (identical data + seed ⇒ identical
  * codebook), so the oracle is generated per scale factor at Verify-dump
  * time with the refit codebook and the query's l2 ADC lookup table
  * (−‖q_g − centroid‖², summing to −‖q − v̂‖² because the subspaces
  * partition the dims) inlined as exact double literals.
  */
object V22OracleSql {

  def sql(spark: SparkSession, dir: String, queryId: Long = 7, k: Int = 10,
      m: Int = 8, kCent: Int = 32, rerank: Int = 200): String = {
    val emb = QueryCatalog.scaledEmb(spark, dir)
    val q = QueryCatalog.scaledQuery(spark, dir, queryId.toInt)
    val model = graft.operators.Pq.fit(emb, "vec_id", "embedding", m, kCent)
    val cb = model.codebook.map(_.toDouble.toString).mkString("[", ",", "]")
    val lut = model.lutFor(q, graft.operators.HnswIndex.MetricL2)
      .map(_.toString).mkString("[", ",", "]")
    val sub = model.subDim
    val kc = model.k
    s"""WITH ${QueryCatalog.scaledSql(queryId.toInt)},
        x AS (SELECT vec_id, CAST(i AS INT) AS d,
            CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM se, range(1, ${model.dim + 1}) t(i)),
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
          ORDER BY qscore DESC, vec_id LIMIT $rerank),
        rr AS (SELECT e.vec_id,
            sqrt(sum(pow(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)
                         - CAST(q.qe[CAST(i AS INT)] AS DOUBLE), 2))) AS dist
          FROM se e JOIN shortlist USING (vec_id), q,
               range(1, ${model.dim + 1}) t(i)
          GROUP BY e.vec_id)
        SELECT vec_id, round(dist, 4) AS dist FROM rr
        ORDER BY dist, vec_id LIMIT $k"""
  }
}
