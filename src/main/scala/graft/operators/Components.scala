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
  *    one job, no iteration. 5M edges ≈ 80 MB of longs — well under any
  *    sane driver heap; the alternative is ~10 shuffle-join rounds whose
  *    fixed scheduling cost dwarfs the data.
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
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x // path compression
        while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      val collected = e.as[(Long, Long)].collect() // one job, reads the cache
      e.unpersist()
      collected.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // second pass: root → min member id (roots are already component-min
      // because unions always point the larger root at the smaller)
      val out = parent.keysIterator.map(id => (id, find(id))).toSeq
      spark.createDataFrame(out).toDF("id", "component")
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
