package graft.queries

import org.apache.spark.sql.SparkSession

/** e2_semdedup: SemDeDup's cluster-scoped semantic pruning, replayed in
  * DuckDB with the fitted centroids inlined (the v5/m3 generated-oracle
  * pattern). Assignment = argmax cosine with ties to the lower centroid
  * index (row_number over (s DESC, ci)); drop rule = EXISTS a smaller-id
  * same-cluster vector at >= threshold cosine.
  */
object E2OracleSql {

  val K = 8
  val Threshold = 0.45 // the e1-proven regime on this corpus

  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, Array[Array[Float]]]

  def fittedCenters(spark: SparkSession, dir: String): Array[Array[Float]] =
    cache.getOrElseUpdate(dir, graft.operators.Dedup.semDedupCentroids(
      graft.Tables.load(spark, dir, "embeddings"), "embedding", K))

  def sql(spark: SparkSession, dir: String): String = {
    val centerRows = fittedCenters(spark, dir).zipWithIndex.map { case (c, i) =>
      s"($i, [${c.map(_.toDouble.toString).mkString(",")}])"
    }.mkString(", ")
    s"""WITH cent(ci, v) AS (VALUES $centerRows),
        vc AS (SELECT e.vec_id, cent.ci,
            list_cosine_similarity(e.embedding, cent.v) AS s
          FROM embeddings e, cent),
        asg AS (SELECT vec_id, ci AS cluster FROM (
            SELECT vec_id, ci,
              row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, ci) AS rn
            FROM vc) WHERE rn = 1),
        dropped AS (SELECT DISTINCT b.vec_id
          FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
          JOIN embeddings ea ON ea.vec_id = a.vec_id
          JOIN embeddings eb ON eb.vec_id = b.vec_id
          WHERE list_cosine_similarity(ea.embedding, eb.embedding) >= $Threshold)
        SELECT asg.vec_id, asg.cluster,
          (dropped.vec_id IS NULL) AS is_kept
        FROM asg LEFT JOIN dropped ON asg.vec_id = dropped.vec_id
        ORDER BY asg.vec_id"""
  }
}
