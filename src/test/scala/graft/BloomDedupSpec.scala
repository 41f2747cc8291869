package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Bloom-prefiltered incremental dedup (Dedup.exactAgainst/newAgainst):
  * exact results regardless of filter fpp, the gate keeps only genuinely
  * new documents, and the plan probes the sketch map-side before any
  * join.
  */
class BloomDedupSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val corpus = (1 to 200)
    .map(i => (i, s"historical document number $i with stable text")).toDF("id", "text")
  // batch: 30 exact dups of corpus texts (fresh ids), 30 new texts
  private lazy val batch = (
    (1 to 30).map(i => (1000 + i, s"historical document number $i with stable text")) ++
    (1 to 30).map(i => (2000 + i, s"freshly crawled page $i never seen before"))
  ).toDF("id", "text")

  test("exactAgainst flags exactly the true duplicates — exact at any fpp") {
    for (fpp <- Seq(0.5, 0.01)) { // a half-wrong filter must not change results
      val flags = Dedup.exactAgainst(corpus, batch, "id", "text", fpp = fpp)
        .collect().map(r => r.getInt(0) -> r.getBoolean(1)).toMap
      assert(flags.size == 60)
      assert((1 to 30).forall(i => flags(1000 + i)), s"missed dup at fpp=$fpp")
      assert((1 to 30).forall(i => !flags(2000 + i)), s"false dup at fpp=$fpp")
    }
  }

  test("newAgainst keeps only the never-seen documents") {
    val kept = Dedup.newAgainst(corpus, batch, "id", "text")
      .select("id").as[Int].collect().toSet
    assert(kept == (2001 to 2030).toSet)
  }

  test("the corpus streams through broadcast joins — never shuffled for the verify") {
    val plan = Dedup.exactAgainst(corpus, batch, "id", "text")
      .queryExecution.executedPlan.toString
    // the sketch probe is a filter (UDF by necessity); the exact verify
    // semi-probes the BROADCAST positive-hash set with the corpus on the
    // streaming side — a sort-merge join here would mean the corpus hash
    // set is being exchanged, the exact cost this operator exists to avoid
    assert(plan.contains("LeftSemi") && plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("semDedup: near-identical vectors in one cluster keep only the min id") {
    // two tight clouds; ids 10/11/12 are near-identical, 20/21 distinct
    def v(base: Array[Float], eps: Float) = base.zipWithIndex.map {
      case (x, i) => x + (if (i == 0) eps else 0f) }
    val c1 = Array(1f, 0f, 0f, 0f)
    val c2 = Array(0f, 1f, 0f, 0f)
    val rows = Seq(
      (10, v(c1, 0.00f)), (11, v(c1, 0.01f)), (12, v(c1, 0.02f)),
      (20, v(c2, 0.00f)), (21, Array(0f, 0.2f, 0.98f, 0f))).toDF("id", "vec")
    val out = graft.operators.Dedup.semDedup(rows, "id", "vec",
        k = 2, threshold = 0.999, seed = 7L)
      .collect().map(r => r.getInt(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(out(10)._2 && !out(11)._2 && !out(12)._2, s"cloud-1 keep rule broke: $out")
    assert(out(20)._2 && out(21)._2, s"distinct vectors dropped: $out")
    // the three near-identical vectors share a cluster
    assert(out(10)._1 == out(11)._1 && out(11)._1 == out(12)._1)
    val kept = graft.operators.Dedup.semDeduplicate(rows, "id", "vec",
      k = 2, threshold = 0.999, seed = 7L).select("id").as[Int].collect().toSet
    assert(kept == Set(10, 20, 21))
  }

  test("semDedup pair work is cluster-keyed (no corpus-wide cartesian)") {
    val rows = (1 to 50).map(i =>
      (i, Array(math.cos(i / 7.0).toFloat, math.sin(i / 7.0).toFloat))).toDF("id", "vec")
    val plan = graft.operators.Dedup.semDedup(rows, "id", "vec", k = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("explicit expectedItems skips the sizing count and stays exact") {
    val flags = Dedup.exactAgainst(corpus, batch, "id", "text",
        expectedItems = 500L)
      .where(col("is_dup")).count()
    assert(flags == 30)
  }
}
