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

  test("the probe runs before the verify join (bloom-positive rows only shuffle)") {
    val plan = Dedup.exactAgainst(corpus, batch, "id", "text")
      .queryExecution.executedPlan.toString
    // the sketch probe is a filter (UDF by necessity); the exact verify is
    // a semi join above it; nothing degenerates to a cartesian
    assert(plan.contains("LeftSemi"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("explicit expectedItems skips the sizing count and stays exact") {
    val flags = Dedup.exactAgainst(corpus, batch, "id", "text",
        expectedItems = 500L)
      .where(col("is_dup")).count()
    assert(flags == 30)
  }
}
