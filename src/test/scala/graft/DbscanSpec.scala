package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dbscan

/** Distributed DBSCAN vs an in-memory brute-force reference. */
class DbscanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.session
  import spark.implicits._

  /** Brute-force DBSCAN with the same label convention (cluster = min core
    * id of the component; border → min core-neighbor's component; -1 noise). */
  private def bruteForce(
      pts: Seq[(Long, Array[Double])], eps: Double, minPts: Int): Map[Long, Long] = {
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val nbrs = pts.map { case (id, v) =>
      id -> pts.filter { case (o, w) => o != id && d2(v, w) <= eps * eps }.map(_._1)
    }.toMap
    val core = pts.map(_._1).filter(id => nbrs(id).size + 1 >= minPts).toSet
    // union-find over core-core edges
    val parent = scala.collection.mutable.Map(core.toSeq.map(c => c -> c): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (c <- core; n <- nbrs(c) if core(n)) {
      val (ra, rb) = (find(c), find(n))
      if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
    }
    val compLabel = core.map { c =>
      c -> core.filter(o => find(o) == find(c)).min
    }.toMap
    pts.map { case (id, _) =>
      id -> {
        if (core(id)) compLabel(id)
        else {
          val coreNb = nbrs(id).filter(core.contains)
          if (coreNb.nonEmpty) coreNb.map(compLabel).min else -1L
        }
      }
    }.toMap
  }

  private def runBoth(pts: Seq[(Long, Double, Double)], eps: Double, minPts: Int): Unit = {
    val df = pts.toDF("id", "x", "y")
    val got = Dbscan.run(df, "id", Seq("x", "y"), eps, minPts)
      .as[(Long, Long)].collect().toMap
    val want = bruteForce(pts.map(p => (p._1, Array(p._2, p._3))), eps, minPts)
    assert(got === want)
  }

  test("two blobs + noise match brute force, including cross-cell neighbors") {
    // blob A around (0,0), blob B around (1,1), two isolated noise points;
    // points straddle eps-grid cell boundaries (eps=0.3 → cells at 0.3k)
    val pts = Seq[(Long, Double, Double)](
      (1L, 0.0, 0.0), (2L, 0.1, 0.05), (3L, 0.29, 0.0), (4L, 0.31, 0.05), (5L, 0.15, 0.2),
      (10L, 1.0, 1.0), (11L, 1.1, 1.05), (12L, 0.95, 1.1), (13L, 1.05, 0.9),
      (20L, 2.5, -2.0), (21L, -1.5, 3.0))
    runBoth(pts, eps = 0.3, minPts = 3)
  }

  test("border point attaches to nearest-labeled cluster; chain stays one component") {
    // a chain of core points spanning many grid cells (forces >1 label
    // propagation round) with a border point hanging off the end
    val chain = (0 until 12).map(i => (i.toLong, i * 0.25, 0.0))
    val border = Seq((100L, 11 * 0.25 + 0.2, 0.1))
    val noise = Seq((200L, 50.0, 50.0))
    runBoth(chain ++ border ++ noise, eps = 0.3, minPts = 3)
  }

  test("all-noise when eps is tiny; single cluster when eps is huge") {
    val pts = Seq[(Long, Double, Double)]((1L, 0.0, 0.0), (2L, 1.0, 0.0), (3L, 0.0, 1.0), (4L, 1.0, 1.0))
    runBoth(pts, eps = 0.01, minPts = 2)
    runBoth(pts, eps = 10.0, minPts = 2)
  }

  test("trainer maps the wider sklearn clustering family") {
    val reg = java.nio.file.Files.createTempDirectory("graft_dbscan_reg_").toString
    val tr = new graft.ml.Trainer(spark, reg)
    val df = Tables.load(spark, TestSpark.sf0001, "embeddings")
      .select((0 until 4).map(i => element_at(col("embedding"), i + 1).as(s"e$i")): _*)
    for (algo <- Seq("agglomerative", "gaussian_mixture")) {
      val res = tr.train(s"proj_$algo", "clustering", df, None, algo,
        hyperparams = Map("n_clusters" -> 3))
      assert(res.metrics.contains("silhouette"))
      assert(tr.registry.predictWithModel(res.modelId, df).count() === df.count())
    }
    val ex = intercept[IllegalArgumentException] {
      tr.train("proj_db", "clustering", df, None, "dbscan")
    }
    assert(ex.getMessage.contains("Dbscan"))
  }
}
