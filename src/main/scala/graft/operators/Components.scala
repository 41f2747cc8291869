package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components — the shared primitive behind
  * near-duplicate GROUPING (pairs → clusters → keep-one-representative) and
  * DBSCAN's core-point clustering.
  *
  * Adaptive execution, like Spark's own broadcast-threshold choice:
  *
  *  - Small edge sets (≤ `driverMaxEdges`, the common case — near-dup
  *    graphs are sparse AFTER group collapse, even over huge corpora)
  *    collect to the driver and run union-find with path compression:
  *    one job, no iteration. The driver path is all primitive arrays —
  *    a flat Array[Long] of endpoints (5M edges = 80 MB), a sorted
  *    distinct-id Array[Long] (≤ 80 MB), and an Array[Int] parent table
  *    (≤ 40 MB) — so the 5M threshold genuinely fits a 1 GB driver; no
  *    boxed tuples or HashMaps are materialized. The alternative is ~10
  *    shuffle-join rounds whose fixed scheduling cost dwarfs the data.
  *
  *  - Larger graphs run iterative min-label propagation with pointer
  *    doubling: each round (a) hooks every node to the min label among its
  *    neighbors and (b) compresses paths via label := label(label), so
  *    convergence is O(log diameter) rounds. localCheckpoint per round caps
  *    lineage. The only shuffles are edge-key joins over the pair set,
  *    never the corpus.
  */
object Components {

  /** @param edges undirected edge list with two long columns `a`, `b`
    *              (each pair listed once, either orientation)
    * @return (id, component) for every endpoint; component = min node id
    *         reachable, a deterministic representative
    */
  def minLabel(
      edges: DataFrame,
      maxIter: Int = 50,
      driverMaxEdges: Long = 5000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // cache so the size probe and the chosen path compute the (possibly
    // expensive) edge plan exactly once
    val e = edges.select(col("a").cast("long"), col("b").cast("long")).cache()
    val nEdges = e.count()
    if (nEdges <= driverMaxEdges) {
      // one job, reads the cache; RDD[Long] collects to a primitive array
      val flat: Array[Long] = e.rdd
        .mapPartitions(_.flatMap(r => Iterator(r.getLong(0), r.getLong(1))))
        .collect()
      e.unpersist()
      // dense-index the node ids: sorted distinct array + binary search,
      // so union-find runs over an Array[Int] with no boxing
      val ids = flat.clone()
      java.util.Arrays.sort(ids)
      var n = 0
      var i = 0
      while (i < ids.length) {
        if (n == 0 || ids(i) != ids(n - 1)) { ids(n) = ids(i); n += 1 }
        i += 1
      }
      val parent = new Array[Int](n)
      i = 0; while (i < n) { parent(i) = i; i += 1 }
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x // path compression
        while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      i = 0
      while (i < flat.length) {
        val a = java.util.Arrays.binarySearch(ids, 0, n, flat(i))
        val b = java.util.Arrays.binarySearch(ids, 0, n, flat(i + 1))
        val (ra, rb) = (find(a), find(b))
        // ids is ascending, so min index = min id: pointing the larger root
        // at the smaller keeps every root the component-min id
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        i += 2
      }
      val comp = new Array[Long](n)
      i = 0; while (i < n) { comp(i) = ids(find(i)); i += 1 }
      // ship the two primitive arrays out once; build rows executor-side
      val sc = spark.sparkContext
      val idsB = sc.broadcast(java.util.Arrays.copyOf(ids, n))
      val compB = sc.broadcast(comp)
      val slices = math.max(1, math.min(spark.sessionState.conf.numShufflePartitions, n))
      spark
        .createDataFrame(
          sc.range(0L, n.toLong, 1L, slices)
            .map(j => org.apache.spark.sql.Row(idsB.value(j.toInt), compB.value(j.toInt))),
          new org.apache.spark.sql.types.StructType()
            .add("id", "long", nullable = false)
            .add("component", "long", nullable = false))
    } else {
      val labeled = propagate(e, maxIter)
      e.unpersist()
      labeled
    }
  }

  private def propagate(edges: DataFrame, maxIter: Int): DataFrame = {
    val sym = edges
      .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("label")).localCheckpoint()

    // exact decimal sum: labels can be full-range 64-bit hashes, and the
    // convergence test (sum stopped decreasing ⇒ no label changed, since
    // labels only ever decrease) must not wrap
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("label").cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO))).head().getDecimal(0)

    var prevSum = labelSum(labels)
    var it = 0
    var converged = labels.isEmpty
    while (!converged && it < maxIter) {
      // hook: min label over direct neighbors
      val prop = sym.join(labels.withColumnRenamed("id", "b")
          .withColumnRenamed("label", "nbl"), Seq("b"))
        .groupBy(col("a").as("id")).agg(min("nbl").as("nbl"))
      val hooked = labels.join(prop, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbl"), col("label"))).as("label"))
      // pointer doubling: label := label(label) (labels are node ids present
      // in the table, so the self-join lookup is total)
      val updated = hooked.as("l1")
        .join(hooked.select(col("id").as("label"), col("label").as("ll")).as("l2"),
          Seq("label"))
        .select(col("id"), least(col("label"), col("ll")).as("label"))
        .localCheckpoint()
      val s = labelSum(updated)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = updated
      it += 1
    }
    labels.select(col("id"), col("label").as("component"))
  }
}
