package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ScaleOps

class ScaleOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.session
  import spark.implicits._

  test("saltedJoin equals plain join on a skewed key distribution") {
    // 90% of left rows share one hot key
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i)).toDF("k", "lv")
    val right = (1 to 50).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .as[(Long, Int, String)].collect().sorted.toSeq
    val salted = ScaleOps.saltedJoin(left, right, "k", salts = 8)
      .select("k", "lv", "rv").as[(Long, Int, String)].collect().sorted.toSeq
    assert(salted === plain)
    // the join key really is (k, salt): 8 reducers share the hot key
    val plan = ScaleOps.saltedJoin(left, right, "k", salts = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"))
  }

  test("saltedJoin survives inputs that already have a __salt column") {
    val left = Seq((1L, 10, "keep_l"), (1L, 11, "keep_l2"), (2L, 20, "x"))
      .toDF("k", "lv", "__salt")
    val right = Seq((1L, "a"), (2L, "b")).toDF("k", "rv")
    val out = ScaleOps.saltedJoin(left, right, "k", salts = 4)
    // caller's __salt column passes through untouched; join is uncorrupted
    assert(out.columns.toSeq == Seq("k", "lv", "__salt", "rv"))
    val rows = out.select("k", "lv", "__salt", "rv")
      .as[(Long, Int, String, String)].collect().sorted.toSeq
    assert(rows == Seq((1L, 10, "keep_l", "a"), (1L, 11, "keep_l2", "a"), (2L, 20, "x", "b")))
  }

  test("bucketed tables join without an exchange") {
    val a = Tables.load(spark, TestSpark.sf0001, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val b = Tables.load(spark, TestSpark.sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
    ScaleOps.writeBucketed(a, "orders_b", "o_orderkey", numBuckets = 4)
    ScaleOps.writeBucketed(b.withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", "o_orderkey", numBuckets = 4)
    // disable broadcast so the planner must pick the shuffle path — at real
    // scale neither side broadcasts and this is exactly the join shape
    // bucketing exists to serve
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = ScaleOps.bucketed(spark, "orders_b")
        .join(ScaleOps.bucketed(spark, "lineitem_b"), Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("hashpartitioning"),
        s"expected exchange-free bucketed join, got:\n$plan")
      // and the result matches the plain join
      val expected = a.join(b, a("o_orderkey") === b("l_orderkey")).count()
      assert(joined.count() === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
