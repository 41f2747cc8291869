package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VecFunctions._

/** IVF (inverted-file) approximate nearest neighbour index — the engine's
  * counterpart of the reference's HNSW index (pgvector, pipeline.rs:526-543)
  * re-thought for a distributed column store (SURVEY.md §4.2: HNSW's
  * pointer-chasing graph doesn't fit executors; IVF partition pruning
  * does).
  *
  * Build: KMeans over a driver-side sample → `nlist` centroids; every
  * vector is assigned to its nearest centroid and the table is written
  * repartitioned by `cluster_id` (at cluster scale: partitioned parquet →
  * partition pruning serves queries).
  *
  * Query: rank centroids against the query vector on the driver (nlist is
  * small), scan only the `nprobe` closest clusters — a `cluster_id IN (…)`
  * predicate that prunes partitions — then exact cosine top-k inside them.
  * Recall follows the IVF literature: nprobe/nlist trades recall for a
  * ~nlist/nprobe scan reduction.
  */
class IvfIndex private (
    val data: DataFrame, // (…idCols, vecCol, cluster_id) partitioned by cluster_id
    val centroids: Array[Array[Float]],
    vecCol: String) extends Serializable {

  /** Exact top-k within the nprobe nearest clusters. */
  def search(query: Array[Float], k: Int, nprobe: Int, idCols: Seq[String]): DataFrame = {
    val ranked = centroids.zipWithIndex.map { case (c, i) =>
      var dot = 0.0; var nq = 0.0; var nc = 0.0
      var d = 0
      while (d < c.length) {
        dot += query(d).toDouble * c(d); nq += query(d).toDouble * query(d); nc += c(d).toDouble * c(d)
        d += 1
      }
      (i, if (nq == 0 || nc == 0) 0.0 else dot / math.sqrt(nq * nc))
    }.sortBy(-_._2).take(nprobe).map(_._1)

    data
      .where(col("cluster_id").isin(ranked.toIndexedSeq: _*))
      .select(idCols.map(col) :+
        (cosineSimilarity(col(vecCol), floatVec(query.toIndexedSeq)) as "score"): _*)
      .orderBy(col("score").desc, col(idCols.head))
      .limit(k)
  }
}

object IvfIndex {

  private val cache = scala.collection.concurrent.TrieMap.empty[String, IvfIndex]

  /** Build-once-per-session cache — an index is built at ingest time and
    * served for many queries (exactly like the reference's HNSW index,
    * built at pipeline.rs:526-543 and reused per search). `key` should
    * identify the underlying table (e.g. its path).
    */
  def buildOrGet(
      key: String,
      spark: SparkSession,
      df: => DataFrame,
      vecCol: String,
      nlist: Int = 0): IvfIndex =
    cache.getOrElseUpdate(key, build(spark, df, vecCol, nlist))

  /** Drop a cached index after its underlying table is rewritten —
    * writers (Collection.writeSnapshot) call this so queries never serve a
    * stale index or recompute evicted blocks against swapped parquet. */
  def invalidate(key: String): Unit =
    cache.remove(key).foreach(_.data.unpersist())

  def invalidateAll(): Unit = { cache.keys.foreach(invalidate); () }

  /** Build over `df(vecCol)`. `nlist` defaults to ~√N (the IVF rule of
    * thumb); KMeans fits on a bounded sample so build cost is independent
    * of table size.
    */
  def build(
      spark: SparkSession,
      df: DataFrame,
      vecCol: String,
      nlist: Int = 0,
      sampleSize: Int = 20000,
      seed: Long = 42L): IvfIndex = {
    import spark.implicits._
    val n = df.count()
    val k = if (nlist > 0) nlist else math.max(2, math.sqrt(n.toDouble).toInt)

    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    // Random sample, not limit(): limit() takes the first partitions, which
    // on sorted/clustered tables biases every centroid toward the head of
    // the table and degrades recall everywhere else.
    val fraction = if (n <= sampleSize) 1.0 else math.min(1.0, sampleSize * 1.2 / n)
    val sample = df.sample(withReplacement = false, fraction, seed)
      .limit(sampleSize).select(toVec(col(vecCol)).as("features"))
    val km = new KMeans().setK(k).setSeed(seed).setFeaturesCol("features").fit(sample)
    val centroids = km.clusterCenters.map(_.toArray.map(_.toFloat))

    // nearest-centroid assignment as a single codegen'd expression: argmax
    // over per-centroid cosine (centroid list is a broadcast-sized literal)
    val centroidCols = centroids.zipWithIndex.map { case (c, i) =>
      struct(cosineSimilarity(col(vecCol), floatVec(c.toIndexedSeq)).as("s"), lit(i).as("i"))
    }
    val assigned = df.withColumn("cluster_id",
      greatest(centroidCols.toIndexedSeq: _*).getField("i"))
      // co-locate clusters: at scale this is a partitioned write; locally a
      // repartition so each probe scan touches few partitions
      .repartition(math.min(k, 64), col("cluster_id"))
      .cache()
    assigned.count() // materialize
    new IvfIndex(assigned, centroids, vecCol)
  }
}
