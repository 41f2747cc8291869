package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed DBSCAN (Ester et al., KDD'96) — closes the reference's
  * sklearn clustering-family gap (pgml-extension/src/bindings/sklearn.rs
  * `dbscan`; `optics` maps here too as its eps-clustering special case).
  * sklearn's DBSCAN has no `predict` — it labels the fitted set — so this
  * is an operator producing labels, not a Trainer estimator.
  *
  * Spark-first design (no O(n²) self-join):
  *  1. Grid-block candidate generation: each point lands in the
  *     `floor(x_i/eps)` cell; a point can only have eps-neighbors in its
  *     3^d adjacent cells. One side of the join is exploded to its
  *     neighbor-cell keys, the other keyed by its own cell → one shuffle
  *     on cell id, candidate count ∝ local density (not n²).
  *  2. Core points: directed neighbor count (+1 for self) >= minPts.
  *  3. Clusters: connected components over core–core edges by iterative
  *     min-label propagation (label = min core id in the component —
  *     deterministic). localCheckpoint per round caps lineage; rounds ≤
  *     graph diameter.
  *  4. Border points attach to the smallest cluster label among their core
  *     neighbors; everything else is noise (-1).
  *
  * The 3^d neighbor-cell expansion limits this to low-dimensional feature
  * spaces (d ≤ 6 enforced) — which is also where DBSCAN is meaningful;
  * density estimation in high-d needs an ANN graph (IvfIndex) instead.
  */
object Dbscan {

  /** @param featureCols numeric coordinate columns (d ≤ 6)
    * @return (idCol, cluster) for every input row; cluster = min core id of
    *         the component, or -1 for noise
    */
  def run(
      df: DataFrame,
      idCol: String,
      featureCols: Seq[String],
      eps: Double,
      minPts: Int,
      maxIter: Int = 50): DataFrame = {
    require(featureCols.nonEmpty && featureCols.size <= 6,
      s"grid-blocked DBSCAN supports 1..6 dims, got ${featureCols.size}")
    val d = featureCols.size

    val pts = df.select(
      (col(idCol).cast("long").as("id") +:
        featureCols.zipWithIndex.map { case (c, i) => col(c).cast("double").as(s"x$i") }): _*)
      .localCheckpoint() // stable ids/coords for the iterations below

    def cellExpr(offsets: Seq[Int]): Column =
      concat_ws(",", offsets.zipWithIndex.map { case (o, i) =>
        (floor(col(s"x$i") / eps).cast("long") + o).cast("string")
      }: _*)

    // all 3^d neighbor offsets (own cell included)
    val offsets: Seq[Seq[Int]] =
      (0 until d).foldLeft(Seq(Seq.empty[Int]))((acc, _) =>
        acc.flatMap(p => Seq(-1, 0, 1).map(p :+ _)))

    val own = pts.withColumn("cell", cellExpr(Seq.fill(d)(0)))
    val exploded = pts.withColumn("cell",
      explode(array(offsets.map(cellExpr): _*)))

    val dist2 = (0 until d).map { i =>
      val diff = col(s"a.x$i") - col(s"b.x$i"); diff * diff
    }.reduce(_ + _)

    // directed eps-neighbor list: (id, nb) for every ordered close pair
    val nbrs = own.as("a").join(exploded.as("b"), Seq("cell"))
      .where(col("a.id") =!= col("b.id") && dist2 <= lit(eps * eps))
      .select(col("a.id").as("id"), col("b.id").as("nb"))
      .localCheckpoint()

    val core = nbrs.groupBy("id").agg(count(lit(1)).as("n"))
      .where(col("n") + 1 >= minPts) // DBSCAN counts the point itself
      .select("id")

    // all-noise input: no core points means no clusters and no propagation
    if (core.isEmpty) {
      return pts.select(col("id").as(idCol), lit(-1L).as("cluster"))
    }

    // cluster = connected components over core-core edges (min-label
    // propagation with pointer doubling — shared Components primitive);
    // cores with NO core neighbor are their own single-core cluster
    val edges = nbrs
      .join(core, Seq("id"))
      .join(core.withColumnRenamed("id", "nb"), Seq("nb"))
      .select(col("id").as("a"), col("nb").as("b"))
    val connected = Components.minLabel(edges, maxIter)
      .select(col("id"), col("component").as("label"))
    val isolated = core.join(connected, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("label"))
    val coreLabeled = connected.unionByName(isolated).localCheckpoint() // (id, label)
    val borderLabels = nbrs
      .join(core.withColumnRenamed("id", "nb"), Seq("nb")) // neighbor is core
      .join(coreLabeled.withColumnRenamed("id", "nb"), Seq("nb"))
      .join(core, Seq("id"), "left_anti") // self is NOT core
      .groupBy("id").agg(min("label").as("label"))

    pts.select("id")
      .join(coreLabeled.unionByName(borderLabels), Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col("label"), lit(-1L)).as("cluster"))
  }
}
