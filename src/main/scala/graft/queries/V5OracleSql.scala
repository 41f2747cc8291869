package graft.queries

import org.apache.spark.sql.SparkSession

/** DuckDB replay of the PRUNED IVF probe (v5) — the last ANN serving path
  * without its own oracle. Given the index, the search is deterministic:
  *
  *   - probe selection: the `nprobe` centroids closest to the query by
  *     cosine, ties keeping the lower index (IvfIndex.search ranks with a
  *     stable sort);
  *   - membership: each vector is stored under its `nassign` best
  *     centroids by (cosine desc, centroid index DESC) — the
  *     sort_array(desc) tie order of the spill-assignment expression;
  *   - result: exact cosine top-k among vectors assigned to ≥1 probed
  *     cluster, ties by id.
  *
  * The centroids come from a seeded KMeans over a seeded sample, and the
  * v5 query serves the PERSISTED index — so the generator reads the very
  * same centroids out of the served index and inlines them (exact double
  * literals) per scale factor, like v16/m3.
  */
object V5OracleSql {

  def sql(spark: SparkSession, dir: String, queryId: Long = 0, k: Int = 10,
      nlist: Int = 16, nprobe: Int = 4, nassign: Int = 3): String = {
    import spark.implicits._
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val idx = graft.operators.IvfIndex.serveOrBuild(
      spark, s"$dir/embeddings.parquet", emb, "embedding", nlist = nlist)
    val centerRows = idx.centroids.zipWithIndex.map { case (c, i) =>
      s"($i, [${c.map(_.toDouble.toString).mkString(",")}])"
    }.mkString(", ")
    val dim = idx.centroids.head.length
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
          WHERE rn <= $nprobe),
        cand AS (SELECT DISTINCT a.vec_id
          FROM asg a JOIN probed USING (ci) WHERE a.rn <= $nassign)
        SELECT e.vec_id,
          round(CAST(list_cosine_similarity(e.embedding,
            (SELECT qe FROM q)) AS DOUBLE), 5) AS score
        FROM embeddings e JOIN cand USING (vec_id)
        ORDER BY list_cosine_similarity(e.embedding, (SELECT qe FROM q)) DESC, e.vec_id
        LIMIT $k"""
  }
}
