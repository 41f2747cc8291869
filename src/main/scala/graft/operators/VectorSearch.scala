package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VecFunctions._

/** Vector-search operators — the Spark-native counterpart of the reference's
  * KNN path (`ORDER BY embedding <=> $q LIMIT k`, HNSW-accelerated;
  * pgml-sdks/pgml/src/vector_search_query_builder.rs:163-233).
  *
  * Spark has no native ANN index; the strategies offered here are:
  *  - [[topK]]: exact brute force. A single codegen'd scan → cosine →
  *    `TakeOrderedAndProject` — embarrassingly parallel, zero shuffle
  *    (each partition keeps a k-heap; driver merges p×k rows). This
  *    scales linearly with vector count and is the right default to ~10⁸
  *    vectors on a cluster.
  *  - [[IvfIndex]]: IVF-style centroid partitioning for the 100-TB path —
  *    probe only the `nprobe` closest centroid partitions (see IvfIndex.scala).
  */
object VectorSearch {

  /** Exact higher-is-closer score column for a metric ∈ {cosine, l2, ip}
    * (pgvector's three ops classes): cosine similarity, NEGATED L2
    * distance, raw inner product. The shared re-rank scorer of every
    * quantized/ANN serving path — negating L2 keeps fusion and top-k
    * metric-agnostic (`orderBy(score desc)` everywhere). */
  /** Bounded top-k selection over (id, score) hits — rank order
    * (score desc, id asc) under the total double order, returned
    * best-first: the O(n log k) serving twin of
    * `.sortBy { case (id, s) => (-s, id) }.take(k)`. At production probe
    * widths the candidate set is hundreds of thousands of rows per probe
    * (sf100: IVF ~650k postings at nprobe=32/nlist=2236), and the full
    * boxed TimSort was the dominant per-probe cost (~0.5 s) — a size-k
    * heap does one primitive compare per candidate instead. */
  private[graft] def topHits(
      it: Iterator[(Long, Double)], k: Int): Array[(Long, Double)] = {
    if (k <= 0) return Array.empty
    // heap head = the WORST kept hit: score asc, ties by id desc
    val worstFirst = new java.util.Comparator[(Long, Double)] {
      def compare(a: (Long, Double), b: (Long, Double)): Int = {
        val c = java.lang.Double.compare(a._2, b._2)
        if (c != 0) c else java.lang.Long.compare(b._1, a._1)
      }
    }
    val pq = new java.util.PriorityQueue[(Long, Double)](k, worstFirst)
    while (it.hasNext) {
      val e = it.next()
      if (pq.size < k) pq.add(e)
      else {
        val h = pq.peek()
        val c = java.lang.Double.compare(e._2, h._2)
        if (c > 0 || (c == 0 && e._1 < h._1)) { pq.poll(); pq.add(e) }
      }
    }
    val out = new Array[(Long, Double)](pq.size)
    var i = out.length - 1
    while (i >= 0) { out(i) = pq.poll(); i -= 1 }
    out
  }

  def exactScoreCol(metric: String, vec: Column, query: Array[Float]): Column = {
    val q = floatVec(query.toIndexedSeq)
    metric match {
      case HnswIndex.MetricCosine => cosineSimilarity(vec, q)
      case HnswIndex.MetricL2 => -vecDistanceL2(vec, q)
      case HnswIndex.MetricIp => vecDot(vec, q)
      case other => throw new IllegalArgumentException(
        s"unknown metric '$other' (expected cosine | l2 | ip)")
    }
  }

  /** Exact brute-force top-k by cosine similarity against a single query
    * vector. Returns `idCols :+ score`, ordered by score desc (ties broken
    * by the first id column for determinism).
    */
  def topK(
      emb: DataFrame,
      vecCol: String,
      query: Array[Float],
      k: Int,
      idCols: Seq[String]): DataFrame = {
    val score = cosineSimilarity(col(vecCol), floatVec(query.toIndexedSeq)).as("score")
    emb.select(idCols.map(col) :+ (score: Column): _*)
      .orderBy(col("score").desc, col(idCols.head).asc)
      .limit(k)
  }

  /** Fetch the full-precision rows of an ANN shortlist from `df` — the ONE
    * re-rank fetch shared by the quantized serving paths (binary, PQ) and
    * the Collection's signature search. Two regimes behind one seam:
    *
    *  - narrow shortlists (single key, `width <= inPushdownMax`) COLLECT
    *    the candidate ids to the driver and push an `In(id…)` literal into
    *    the parquet scan — row-group pruning on id stats (indexed homes
    *    are written id-sorted for exactly this), at the cost of one driver
    *    round-trip per query and a width-sized literal the planner folds.
    *    The fetch is EAGER: the candidate set freezes at call time, so the
    *    returned frame reflects the shortlist as of now, not re-execution
    *    time.
    *  - wide shortlists or composite keys broadcast-hash-join the
    *    shortlist instead: no driver round-trip, no giant literal; the
    *    scan prunes nothing but streams once, map-side.
    *
    * ExplainCheck pins the In-pushdown regime on v11/v16;
    * QuantizedSpec pins the broadcast regime and cross-regime equality.
    */
  def fetchShortlist(
      df: DataFrame,
      keyCols: Seq[String],
      shortlist: DataFrame,
      width: Int,
      inPushdownMax: Int = 8192): DataFrame =
    if (keyCols.length == 1 && width <= inPushdownMax) {
      val ids = shortlist.select(keyCols.head).collect().map(_.get(0))
      df.where(col(keyCols.head).isin(ids.toIndexedSeq: _*))
    } else
      df.join(broadcast(shortlist.select(keyCols.map(col): _*).distinct()), keyCols)

  /** Top-k per query for a *set* of query vectors (batch KNN): broadcast the
    * queries, score the cross product partition-locally, keep k per query via
    * window — one shuffle on query_id only (k rows per query per partition
    * after the partial top-k).
    */
  def topKBatch(
      emb: DataFrame,
      vecCol: String,
      queries: DataFrame, // (query_id, query_vec)
      k: Int,
      idCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = emb.crossJoin(broadcast(queries))
      .withColumn("score", cosineSimilarity(col(vecCol), col("query_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCols.head).asc)
    joined.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select((col("query_id") +: idCols.map(col)) :+ col("score") :+ col("rn"): _*)
  }
}
