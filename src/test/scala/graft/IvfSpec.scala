package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfIndex, VectorSearch}

class IvfSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")

  private def exactIds(q: Array[Float]): Set[Long] =
    VectorSearch.topK(emb, "embedding", q, 10, Seq("vec_id"))
      .select("vec_id").as[Long].collect().toSet

  test("IVF search: gated recall vs exact brute force, full recall at nprobe=nlist") {
    val q = emb.where($"vec_id" === 7).select("embedding").as[Array[Float]].head()
    val exact = exactIds(q)

    val idx = IvfIndex.build(spark, emb, "embedding", nlist = 16)
    // probing every cluster must reproduce brute force exactly
    val full = idx.search(q, 10, nprobe = 16, Seq("vec_id"))
      .select("vec_id").as[Long].collect().toSet
    assert(full == exact)

    // recall gate at nprobe=4/nlist=16, MEAN over 20 query vectors (the
    // IvfRecallProbe methodology, floored below its measured number —
    // random uniform vectors are IVF's worst case; real embedding
    // clusters do far better)
    val queries = emb.where($"vec_id" % 50 === 7)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().take(20)
    val recalls = queries.map { case (_, qv) =>
      val approx = idx.search(qv, 10, nprobe = 4, Seq("vec_id"))
        .select("vec_id").as[Long].collect().toSet
      approx.intersect(exactIds(qv)).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.60, f"mean recall@10 $mean%.3f below gate")
    assert(recalls.min >= 0.3, f"min recall@10 ${recalls.min}%.2f below gate")

    // spill assignment stores each vector in exactly nassign=3 clusters
    val scanned = idx.data.where(col("cluster_id").isin(0 to 15: _*)).count()
    assert(scanned == 3 * emb.count())
    idx.data.unpersist()
  }

  test("persisted IVF: save→load round-trip identical, probes prune partitions") {
    val q = emb.where($"vec_id" === 7).select("embedding").as[Array[Float]].head()
    val idx = IvfIndex.build(spark, emb, "embedding", nlist = 16)
    val home = java.nio.file.Files.createTempDirectory("graft_ivf_spec_").toString + "/idx"
    idx.save(home)
    assert(IvfIndex.existsAt(spark, home))

    val loaded = IvfIndex.load(spark, home, "embedding")
    assert(loaded.centroids.map(_.toSeq).toSeq == idx.centroids.map(_.toSeq).toSeq)
    for (np <- Seq(4, 16)) {
      val a = idx.search(q, 10, np, Seq("vec_id")).select("vec_id").as[Long].collect().toSeq
      val b = loaded.search(q, 10, np, Seq("vec_id")).select("vec_id").as[Long].collect().toSeq
      assert(a == b, s"nprobe=$np loaded != in-memory")
    }

    // loadOrBuild on an existing home must LOAD — the by-name df is never
    // evaluated, so a rebuild would throw here
    val served = IvfIndex.loadOrBuild(
      spark, home, sys.error("loadOrBuild rebuilt an existing index"), "embedding")
    assert(served.centroids.length == 16)

    // the probe's cluster_id IN (…) must prune directories at the parquet
    // scan (the 100 TB serving contract: read ~nprobe/nlist of the files)
    val plan = loaded.search(q, 10, 4, Seq("vec_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster_id"),
      s"no cluster_id PartitionFilters in probe plan:\n$plan")
    assert("PartitionFilters: \\[[^\\]]*cluster_id".r.findFirstIn(plan).isDefined,
      "cluster_id filter not inside PartitionFilters")
    idx.data.unpersist()
  }

  test("Collection sync builds the persisted index; probe matches brute force") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ivf_coll_").toString
    val c = new graft.store.Collection(spark, "ivfc", wh)
    val docs = Tables.load(spark, TestSpark.sf0001, "documents").limit(200)
      .select(org.apache.spark.sql.functions.to_json(
        org.apache.spark.sql.functions.struct(col("doc_id").as("id"), col("text")))
        .as("document"))
    c.upsertDocuments(docs)
    val p = graft.store.Pipeline("p", Seq(graft.store.PipelineField(
      "text", splitter = Some((100000, 0)), vectorIndex = Some(8))))
    c.syncPipeline(p)

    val idx = c.ivfIndex(p, "text")
    assert(idx.centroids.length == 8)
    val qv = graft.functions.HashEmbedder(64).embedOne("spark query table join")
    val viaIvf = idx.search(qv, 5, nprobe = 8, Seq("document_id", "chunk_index"))
      .select("document_id").as[String].collect().toSeq
    val exact = VectorSearch.topK(c.embeddings(p, "text"), "embedding", qv, 5,
        Seq("document_id", "chunk_index"))
      .select("document_id").as[String].collect().toSeq
    assert(viaIvf == exact)
  }
}
