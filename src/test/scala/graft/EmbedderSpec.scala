package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Embedder, HashBackedClient, HashEmbedder, RemoteEmbedder}
import graft.store._

/** Second Embedder implementation behind the trait boundary — the
  * remote-endpoint batch contract (remote_embeddings.rs:1-197) served by a
  * deterministic local stand-in, proven vector-identical to the column
  * kernel and batch-shaped at ingest.
  */
class EmbedderSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private val texts = Seq(
    "spark native analytics engine", "vector search over chunks",
    "deterministic hash projection", "remote endpoint batch contract",
    "", "one more row of text")

  test("RemoteEmbedder(HashBackedClient) is vector-identical to HashEmbedder") {
    val hash = HashEmbedder(64)
    val remote = RemoteEmbedder(HashBackedClient(64), dim = 64, batchSize = 2)
    val df = texts.toDF("t")
    val viaCol = df.select(hash.embedCol(col("t")).as("e")).as[Array[Float]].collect()
    val viaFrame = remote.embedFrame(df, col("t"), "e")
      .select("e").as[Array[Float]].collect()
    assert(viaCol.length == viaFrame.length)
    viaCol.zip(viaFrame).foreach { case (a, b) => assert(a.sameElements(b)) }
    // driver-side query path agrees too
    assert(hash.embedOne("query text").sameElements(remote.embedOne("query text")))
  }

  test("embedFrame groups rows into batchSize slices — one client call per slice") {
    // the client leaks its per-call batch size into element 0 of every
    // embedding, so the call pattern is visible in the output without
    // side-channel state: 10 rows in 1 partition at batchSize=4 → calls of
    // 4, 4, 2
    val remote = RemoteEmbedder(EmbedderSpec.ProbeClient(4), dim = 4, batchSize = 4)
    val df = (0 until 10).map(i => s"text $i").toDF("t").repartition(1)
    val sizes = remote.embedFrame(df, col("t"), "e")
      .select(element_at(col("e"), 1)).as[Float].collect().toSeq
    assert(sizes.count(_ == 4.0f) == 8 && sizes.count(_ == 2.0f) == 2,
      s"batch sizes seen: $sizes")
  }

  test("embedFrame: reserved/output column collisions are safe") {
    val remote = RemoteEmbedder(HashBackedClient(8), dim = 8, batchSize = 2)
    // a pre-existing __embed_in column survives untouched (unique temp name)
    val df = Seq(("a", 1), ("b", 2)).toDF("t", "__embed_in")
    val out = remote.embedFrame(df, col("t"), "e")
    assert(out.columns.toSeq == Seq("t", "__embed_in", "e"))
    assert(out.select("__embed_in").as[Int].collect().sorted.sameElements(Array(1, 2)))
    // an output name already present fails loudly instead of clobbering
    intercept[IllegalArgumentException] {
      remote.embedFrame(df, col("t"), "__embed_in")
    }
  }

  test("embedFrame: NULL text yields NULL embedding and never reaches the client") {
    val remote = RemoteEmbedder(EmbedderSpec.StrictClient(8), dim = 8, batchSize = 3)
    val df = Seq(Some("a"), None, Some("b"), None).toDF("t")
    val out = remote.embedFrame(df, col("t"), "e").select("t", "e").collect()
    out.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1)) else assert(!r.isNullAt(1))
    }
  }

  test("vector_search is embedder-agnostic: remote-backed pipeline matches hash pipeline") {
    def collectionWith(emb: Embedder, name: String): (Collection, Pipeline) = {
      val wh = Files.createTempDirectory("graft_wh_").toString
      val c = new Collection(spark, name, wh)
      val docs = (0 until 25).map { i =>
        s"""{"id": $i, "body": "document $i about ${Seq("spark", "vectors", "parquet")(i % 3)} processing"}"""
      }.toDF("document")
      c.upsertDocuments(docs)
      val p = Pipeline("p", Seq(PipelineField("body", splitter = Some((64, 8)),
        semanticSearch = Some(emb))))
      c.syncPipeline(p)
      (c, p)
    }
    val (c1, p1) = collectionWith(HashEmbedder(64), "emb_hash")
    val (c2, p2) = collectionWith(RemoteEmbedder(HashBackedClient(64), 64, batchSize = 7), "emb_remote")
    def results(c: Collection, p: Pipeline) =
      c.vectorSearch(p, Seq(VectorSearchField("body", "spark processing")), limit = 5)
        .select("document_id", "chunk", "score").collect().toSeq
    assert(results(c1, p1) == results(c2, p2))
  }
}

object EmbedderSpec {
  // top-level so the task closure serializes the client alone, not the suite
  final case class ProbeClient(dim: Int) extends graft.functions.RemoteEmbeddingsClient {
    override def model = "probe"
    override def embedBatch(ts: Seq[String]): Seq[Array[Float]] =
      ts.map { _ => val a = new Array[Float](dim); a(0) = ts.length.toFloat; a }
  }
  final case class StrictClient(dim: Int) extends graft.functions.RemoteEmbeddingsClient {
    override def model = "strict"
    override def embedBatch(ts: Seq[String]): Seq[Array[Float]] = {
      require(ts.forall(_ != null), "client must not see NULLs")
      graft.functions.HashBackedClient(dim).embedBatch(ts)
    }
  }
}
