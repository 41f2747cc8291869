package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml._

class SnapshotStatsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("histogram: 20 equi-width bins, max value lands in the last bin") {
    val df = spark.range(0, 100).select($"id".cast("double").as("x"))
    val h = Snapshot.histogram(df, "x", bins = 20).collect()
    assert(h.length == 20)
    assert(h.map(_.getLong(1)).sum == 100)
    assert(h.forall(_.getLong(1) == 5)) // uniform 0..99 → 5 per bin
  }

  test("ventiles are exact 1/20 quantiles") {
    val df = spark.range(1, 21).select($"id".cast("double").as("x")) // 1..20
    val v = Snapshot.ventiles(df, "x")
    assert(v.length == 19)
    assert(v.head <= 2.0 && v.last >= 19.0)
    assert(v == v.sorted)
  }

  test("end-to-end train+predict with a text categorical feature (serving path)") {
    // label depends on the categorical: "big" → +100 offset
    val df = (1 to 120).map { i =>
      val cat = if (i % 2 == 0) "big" else "small"
      (cat, (i % 10).toDouble, (i % 10).toDouble * 2 + (if (cat == "big") 100.0 else 0.0))
    }.toDF("size_cat", "x", "y")
    val t = new Trainer(spark, Files.createTempDirectory("graft_cat_").toString)
    val res = t.train("cat_model", "regression", df, Some("y"), "linear",
      preprocess = Map("size_cat" -> ColumnPlan("size_cat", encode = "one_hot")),
      testSampling = "last")
    assert(res.metrics("r2") > 0.999)
    // serving: known categories round-trip through stored preprocessing
    val serve = Seq(("big", 5.0, 0.0), ("small", 5.0, 0.0), ("UNSEEN", 5.0, 0.0))
      .toDF("size_cat", "x", "y")
    val preds = t.registry.predict("cat_model", serve)
      .select("prediction").as[Double].collect()
    assert(math.abs(preds(0) - 110.0) < 1e-6)
    assert(math.abs(preds(1) - 10.0) < 1e-6)
    // unseen category: all one-hot columns 0 → behaves as the dropped base
    // category, prediction stays finite (no NaN leakage into serving)
    assert(!preds(2).isNaN)
  }
}
