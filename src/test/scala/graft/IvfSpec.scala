package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfIndex, VectorSearch}

class IvfSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("IVF search: high recall vs exact brute force, full recall at nprobe=nlist") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val q = emb.where($"vec_id" === 7).select("embedding").as[Array[Float]].head()

    val exact = VectorSearch.topK(emb, "embedding", q, 10, Seq("vec_id"))
      .select("vec_id").as[Long].collect().toSet

    val idx = IvfIndex.build(spark, emb, "embedding", nlist = 16)
    // probing every cluster must reproduce brute force exactly
    val full = idx.search(q, 10, nprobe = 16, Seq("vec_id"))
      .select("vec_id").as[Long].collect().toSet
    assert(full == exact)

    // few probes: decent recall at a fraction of the scan (random uniform
    // vectors are IVF's worst case; real embedding clusters do far better)
    val approx = idx.search(q, 10, nprobe = 4, Seq("vec_id"))
      .select("vec_id").as[Long].collect().toSet
    assert(approx.intersect(exact).size >= 5)
    // the probed scan reads at most nprobe/nlist of the data (+ skew)
    val scanned = idx.data.where(
      org.apache.spark.sql.functions.col("cluster_id").isin(0 to 15: _*)).count()
    assert(scanned == emb.count())
  }
}
