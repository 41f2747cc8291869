package graft.queries

import org.apache.spark.sql.SparkSession

/** DuckDB replay of the IVF-PQ serving path (v24) — the v5 and v16
  * generated oracles COMPOSED, because the operator composes the same two
  * mechanisms: coarse probe selection + spill membership (v5's CTEs, same
  * tie rules) restrict the candidate set, then PQ encode → ADC shortlist
  * → exact re-rank (v16's CTEs) run over only those candidates. The
  * coarse centroids, PQ codebook, and query LUT are read from the SERVED
  * home (same session cache the query hits) and inlined as exact double
  * literals.
  */
object V24OracleSql {

  val Nlist = 16
  val Nprobe = 4
  val Nassign = 3
  val M = 8
  val KCent = 32
  val Rerank = 200

  def home(spark: SparkSession, dir: String): graft.operators.IvfPq.Home =
    graft.operators.IvfPq.serveOrBuild(
      spark, s"$dir/embeddings.parquet",
      graft.Tables.load(spark, dir, "embeddings"), "vec_id", "embedding",
      nlist = Nlist, m = M, kCent = KCent, nassign = Nassign)

  def sql(spark: SparkSession, dir: String, queryId: Long = 7, k: Int = 10): String = {
    import spark.implicits._
    val h = home(spark, dir)
    // the replay SQL is cosine-only (assignment, probe selection, final
    // scoring); a non-cosine home must extend the SQL, not silently mix
    require(h.metric == graft.operators.IvfIndex.MetricCosine,
      s"replay is cosine-only, home is built with metric '${h.metric}'")
    val q = graft.Tables.load(spark, dir, "embeddings")
      .where(org.apache.spark.sql.functions.col("vec_id") === queryId)
      .select("embedding").as[Array[Float]].head()
    val centerRows = h.centroids.zipWithIndex.map { case (c, i) =>
      s"($i, [${c.map(_.toDouble.toString).mkString(",")}])"
    }.mkString(", ")
    val cb = h.model.codebook.map(_.toDouble.toString).mkString("[", ",", "]")
    val lut = h.model.lutFor(q, h.metric).map(_.toString).mkString("[", ",", "]")
    val sub = h.model.subDim
    val kc = h.model.k
    s"""WITH cent(ci, v) AS (VALUES $centerRows),
        q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = $queryId),
        vc AS (SELECT e.vec_id, cent.ci,
            list_cosine_similarity(e.embedding, cent.v) AS s
          FROM embeddings e, cent),
        asg AS (SELECT vec_id, ci,
            row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, ci DESC) AS rn
          FROM vc),
        qc AS (SELECT cent.ci, list_cosine_similarity(q.qe, cent.v) AS s
          FROM cent, q),
        probed AS (SELECT ci FROM (
            SELECT ci, row_number() OVER (ORDER BY s DESC, ci) AS rn FROM qc)
          WHERE rn <= $Nprobe),
        cand AS (SELECT DISTINCT a.vec_id
          FROM asg a JOIN probed USING (ci) WHERE a.rn <= $Nassign),
        x AS (SELECT e.vec_id, CAST(i AS INT) AS d,
            CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS v
          FROM embeddings e JOIN cand USING (vec_id),
               range(1, ${h.model.dim + 1}) t(i)),
        cb AS (SELECT CAST(i AS INT) AS cbi, l[CAST(i AS INT)] AS w
          FROM (SELECT $cb AS l), range(1, ${h.model.codebook.length + 1}) t(i)),
        dist AS (SELECT x.vec_id, (x.d - 1) // $sub AS g, cc.c AS c,
            sum((x.v - cb.w) * (x.v - cb.w)) AS dsq
          FROM x, range(0, $kc) cc(c)
          JOIN cb ON cb.cbi = (((x.d - 1) // $sub) * $kc + cc.c) * $sub
                             + ((x.d - 1) % $sub) + 1
          GROUP BY x.vec_id, (x.d - 1) // $sub, cc.c),
        sel AS (SELECT vec_id, g, c,
            row_number() OVER (PARTITION BY vec_id, g ORDER BY dsq, c) AS rn
          FROM dist),
        lut AS (SELECT CAST(i AS INT) AS li, l[CAST(i AS INT)] AS w
          FROM (SELECT $lut AS l), range(1, ${M * kc + 1}) t(i)),
        sco AS (SELECT sel.vec_id, sum(lut.w) AS qscore
          FROM sel JOIN lut ON lut.li = sel.g * $kc + sel.c + 1
          WHERE sel.rn = 1
          GROUP BY sel.vec_id),
        shortlist AS (SELECT vec_id FROM sco
          ORDER BY qscore DESC, vec_id LIMIT $Rerank)
        SELECT e.vec_id,
          round(CAST(list_cosine_similarity(e.embedding,
            (SELECT qe FROM q)) AS DOUBLE), 5) AS score
        FROM embeddings e JOIN shortlist s ON e.vec_id = s.vec_id
        ORDER BY list_cosine_similarity(e.embedding, (SELECT qe FROM q)) DESC, e.vec_id
        LIMIT $k"""
  }
}
