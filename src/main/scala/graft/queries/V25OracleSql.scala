package graft.queries

import org.apache.spark.sql.SparkSession

/** DuckDB replay of the RESIDUAL IVF-PQ path (v25) — v24's composition
  * plus FAISS's by_residual=true refinement: every spill copy encodes
  * v − c(copy) in float32 (FLOAT arithmetic on both engines — single
  * rounding), the per-copy ADC score is the per-cluster constant ⟨q,c⟩
  * plus the shared residual LUT sum, and the best copy wins (MAX). The
  * served home's centroids, residual codebook, LUT, and ⟨q,c⟩ constants
  * are inlined as exact literals.
  */
object V25OracleSql {

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
      nlist = Nlist, m = M, kCent = KCent, nassign = Nassign,
      byResidual = true)

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
    val probed = graft.operators.IvfIndex
      .rankCentroids(h.centroids, q, h.metric, Nprobe)
    val centerRows = h.centroids.zipWithIndex.map { case (c, i) =>
      s"($i, [${c.map(_.toDouble.toString).mkString(",")}])"
    }.mkString(", ")
    val cb = h.model.codebook.map(_.toDouble.toString).mkString("[", ",", "]")
    val lut = h.model.lut(q).map(_.toString).mkString("[", ",", "]")
    val qcRows = probed.map { ci =>
      var s = 0.0
      var d = 0
      while (d < q.length) { s += q(d).toDouble * h.centroids(ci)(d); d += 1 }
      s"($ci, ${s.toString})"
    }.mkString(", ")
    val sub = h.model.subDim
    val kc = h.model.k
    s"""WITH cent(ci, v) AS (VALUES $centerRows),
        qcs(ci, qc) AS (VALUES $qcRows),
        q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = $queryId),
        vc AS (SELECT e.vec_id, cent.ci,
            list_cosine_similarity(e.embedding, cent.v) AS s
          FROM embeddings e, cent),
        asg AS (SELECT vec_id, ci,
            row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, ci DESC) AS rn
          FROM vc),
        copies AS (SELECT a.vec_id, a.ci FROM asg a
          JOIN qcs ON a.ci = qcs.ci WHERE a.rn <= $Nassign),
        xr AS (SELECT e.vec_id, c.ci, CAST(i AS INT) AS d,
            CAST(CAST(e.embedding[CAST(i AS INT)] AS FLOAT)
                 - CAST(cent.v[CAST(i AS INT)] AS FLOAT) AS DOUBLE) AS v
          FROM embeddings e JOIN copies c USING (vec_id)
               JOIN cent ON cent.ci = c.ci,
               range(1, ${h.model.dim + 1}) t(i)),
        cb AS (SELECT CAST(i AS INT) AS cbi, l[CAST(i AS INT)] AS w
          FROM (SELECT $cb AS l), range(1, ${h.model.codebook.length + 1}) t(i)),
        dist AS (SELECT xr.vec_id, xr.ci, (xr.d - 1) // $sub AS g, cc.c AS c,
            sum((xr.v - cb.w) * (xr.v - cb.w)) AS dsq
          FROM xr, range(0, $kc) cc(c)
          JOIN cb ON cb.cbi = (((xr.d - 1) // $sub) * $kc + cc.c) * $sub
                             + ((xr.d - 1) % $sub) + 1
          GROUP BY xr.vec_id, xr.ci, (xr.d - 1) // $sub, cc.c),
        sel AS (SELECT vec_id, ci, g, c,
            row_number() OVER (PARTITION BY vec_id, ci, g ORDER BY dsq, c) AS rn
          FROM dist),
        lut AS (SELECT CAST(i AS INT) AS li, l[CAST(i AS INT)] AS w
          FROM (SELECT $lut AS l), range(1, ${M * kc + 1}) t(i)),
        csc AS (SELECT sel.vec_id, sel.ci, sum(lut.w) AS rsum
          FROM sel JOIN lut ON lut.li = sel.g * $kc + sel.c + 1
          WHERE sel.rn = 1
          GROUP BY sel.vec_id, sel.ci),
        sco AS (SELECT csc.vec_id, max(qcs.qc + csc.rsum) AS qscore
          FROM csc JOIN qcs ON csc.ci = qcs.ci
          GROUP BY csc.vec_id),
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
