package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation with
  * pointer doubling — the shared primitive behind near-duplicate GROUPING
  * (pairs → clusters → keep-one-representative) and DBSCAN's core-point
  * clustering.
  *
  * Each round does (a) a hook step — every node takes the min label among
  * its direct neighbors — and (b) a path-compression step — label :=
  * label(label) — which squares pointer-chain lengths, so convergence is
  * O(log diameter) Spark jobs instead of O(diameter). localCheckpoint per
  * round caps lineage growth. The only shuffles are the edge-key joins; at
  * 100 TB this propagates labels over the (tiny) near-dup pair set, never
  * the corpus.
  */
object Components {

  /** @param edges undirected edge list with two long columns `a`, `b`
    *              (each pair listed once, either orientation)
    * @return (id, component) for every endpoint; component = min node id
    *         reachable, a deterministic representative
    */
  def minLabel(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("label")).localCheckpoint()

    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum("label"), lit(0L))).head().getLong(0)

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
      converged = s == prevSum
      prevSum = s
      labels = updated
      it += 1
    }
    labels.select(col("id"), col("label").as("component"))
  }
}
