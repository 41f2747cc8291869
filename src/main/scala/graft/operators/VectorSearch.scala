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
    val h = new TopHitsHeap(k)
    while (it.hasNext) { val e = it.next(); h.offer(e._1, e._2) }
    h.result()
  }

  /** Int-safe size of an `nRows × d` flat float snapshot: the product is
    * checked in Long so a 5M-row × 768-dim tier REFUSES loudly instead of
    * wrapping negative (NegativeArraySizeException) or — worse — wrapping
    * to a small positive length and corrupting the copy loop. */
  private[graft] def flatFloats(nRows: Int, d: Int, what: String): Int = {
    val n = nRows.toLong * d
    require(n <= Int.MaxValue - 8L,
      s"$what needs a $n-float flat snapshot, past the JVM array ceiling — " +
        "shard the tier (more clusters / more partitions) or serve distributed")
    n.toInt
  }

  /** Size-k heap over primitive (id, score) arrays, head = the WORST kept
    * hit under (score asc, id desc) — so [[topHits]]'s rank order falls
    * out of extract-all. Single-use: [[result]] drains the heap. */
  private[graft] final class TopHitsHeap(k: Int) {
    private val cap = math.max(0, k)
    private val hid = new Array[Long](cap)
    private val hs = new Array[Double](cap)
    private var n = 0
    // (s1,id1) ranks WORSE than (s2,id2): total double order asc, id desc
    @inline private def worse(s1: Double, id1: Long, s2: Double, id2: Long): Boolean = {
      val c = java.lang.Double.compare(s1, s2)
      c < 0 || (c == 0 && id1 > id2)
    }
    @inline private def swap(i: Int, j: Int): Unit = {
      val ti = hid(i); hid(i) = hid(j); hid(j) = ti
      val ts = hs(i); hs(i) = hs(j); hs(j) = ts
    }
    def offer(id: Long, s: Double): Unit = {
      if (cap == 0) return
      if (n < cap) {
        hid(n) = id; hs(n) = s; n += 1
        var i = n - 1
        while (i > 0) {
          val p = (i - 1) >> 1
          if (worse(hs(i), hid(i), hs(p), hid(p))) { swap(i, p); i = p }
          else i = 0
        }
      } else if (worse(hs(0), hid(0), s, id)) {
        hs(0) = s; hid(0) = id
        siftDown()
      }
    }
    private def siftDown(): Unit = {
      var i = 0
      var continue = true
      while (continue) {
        val l = 2 * i + 1; val r = l + 1
        var w = i
        if (l < n && worse(hs(l), hid(l), hs(w), hid(w))) w = l
        if (r < n && worse(hs(r), hid(r), hs(w), hid(w))) w = r
        if (w == i) continue = false
        else { swap(i, w); i = w }
      }
    }
    /** Kept hits best-first (score desc, id asc); drains the heap. */
    def result(): Array[(Long, Double)] = {
      val out = new Array[(Long, Double)](n)
      while (n > 0) {
        out(n - 1) = (hid(0), hs(0))
        n -= 1
        if (n > 0) { hid(0) = hid(n); hs(0) = hs(n); siftDown() }
      }
      out
    }
  }

  /** Open-addressed primitive long→double accumulator for the driver-local
    * probe paths: `java.util.HashMap[Long, Double]` boxes every candidate
    * id and score — at production probe widths (~650k candidates/probe at
    * 5M vectors) the boxing and GC churn WERE the probe (~250 ms measured
    * at sf100). Linear probing, power-of-2 capacity sized to the caller's
    * candidate-count hint (no mid-probe rehash on the expected path). */
  private[graft] final class LongDoubleAcc(expected: Int) {
    private var cap = {
      var c = 16
      val want = math.max(16, expected) * 2L
      while (c < want && c < (1 << 30)) c <<= 1
      c
    }
    private var keys = new Array[Long](cap)
    private var has = new Array[Boolean](cap)
    private var vals = new Array[Double](cap)
    private var n = 0
    @inline private def slot(id: Long, c: Int): Int = {
      var h = id * -0x61c8864680b583ebL // golden-ratio mix, then fold high bits
      h ^= (h >>> 32)
      (h & (c - 1)).toInt
    }
    private def grow(): Unit = {
      val oc = cap; val ok = keys; val oh = has; val ov = vals
      cap <<= 1
      keys = new Array[Long](cap); has = new Array[Boolean](cap)
      vals = new Array[Double](cap)
      var i = 0
      while (i < oc) {
        if (oh(i)) {
          var j = slot(ok(i), cap)
          while (has(j)) j = (j + 1) & (cap - 1)
          has(j) = true; keys(j) = ok(i); vals(j) = ov(i)
        }
        i += 1
      }
    }
    @inline private def find(id: Long): Int = {
      var i = slot(id, cap)
      while (has(i) && keys(i) != id) i = (i + 1) & (cap - 1)
      i
    }
    /** First write wins (the identical-score spill-copy dedup). */
    def putIfAbsent(id: Long, s: Double): Unit = {
      val i = find(id)
      if (!has(i)) {
        has(i) = true; keys(i) = id; vals(i) = s; n += 1
        if (n * 2 > cap) grow()
      }
    }
    /** Best copy wins (the residual-quantized spill-copy rule). */
    def putMax(id: Long, s: Double): Unit = {
      val i = find(id)
      if (!has(i)) {
        has(i) = true; keys(i) = id; vals(i) = s; n += 1
        if (n * 2 > cap) grow()
      } else if (s > vals(i)) vals(i) = s
    }
    /** Top-k of the accumulated entries, best-first — no boxing. */
    def topHits(k: Int): Array[(Long, Double)] = {
      val h = new TopHitsHeap(k)
      var i = 0
      while (i < cap) { if (has(i)) h.offer(keys(i), vals(i)); i += 1 }
      h.result()
    }
  }

  /** Open-addressed primitive long→int index (id → row offset) for the
    * driver-local vector snapshots: a boxed Map[Long, Array[Float]] at 5M
    * entries spends ~400 MB on entry objects and boxed keys alone. Built
    * once, read-only after; -1 = absent. */
  private[graft] final class LongIntIndex(expected: Int) {
    private val cap = {
      var c = 16
      val want = math.max(16, expected) * 2L
      while (c < want && c < (1 << 30)) c <<= 1
      c
    }
    private val keys = new Array[Long](cap)
    private val has = new Array[Boolean](cap)
    private val vals = new Array[Int](cap)
    /** Heap footprint of the three backing arrays (residency accounting). */
    def residentBytes: Long = cap * (8L + 1L + 4L)
    @inline private def slot(id: Long): Int = {
      var h = id * -0x61c8864680b583ebL
      h ^= (h >>> 32)
      (h & (cap - 1)).toInt
    }
    def put(id: Long, v: Int): Unit = {
      var i = slot(id)
      while (has(i) && keys(i) != id) i = (i + 1) & (cap - 1)
      has(i) = true; keys(i) = id; vals(i) = v
    }
    def get(id: Long): Int = {
      var i = slot(id)
      while (has(i)) {
        if (keys(i) == id) return vals(i)
        i = (i + 1) & (cap - 1)
      }
      -1
    }
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
