package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Embedder, HashEmbedder}
import graft.store._

/** Counting embedder: tracks how many chunks actually get embedded (local
  * mode shares one JVM, so the static counter observes executor work). */
object CountingEmbedder {
  val calls = new AtomicLong(0)
}
final case class CountingEmbedder(dim: Int = 16) extends Embedder {
  private val inner = HashEmbedder(dim)
  private val countingUdf = udf((s: String) => {
    CountingEmbedder.calls.incrementAndGet()
    graft.functions.HashEmbedKernel.embed(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), dim).toFloatArray()
  })
  override def embedCol(text: Column): Column = countingUdf(text)
  override def embedOne(text: String): Array[Float] = inner.embedOne(text)
}

class IncrementalSyncSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("incremental sync embeds only changed chunks, drops stale, keeps rest") {
    val c = new Collection(spark, "inc", Files.createTempDirectory("graft_inc_").toString)
    val emb = CountingEmbedder(16)
    val p = Pipeline("p", Seq(PipelineField("body",
      splitter = Some((64, 0)), semanticSearch = Some(emb), fullTextSearch = true)))

    c.upsertDocuments((0 until 10).map(i =>
      s"""{"id": $i, "body": "document $i original content body"}""").toDF("document"))
    CountingEmbedder.calls.set(0)
    c.syncPipelineIncremental(p)
    val firstCalls = CountingEmbedder.calls.get()
    assert(firstCalls == 10) // every chunk embedded on first sync
    val embBefore = c.embeddings(p, "body").count()
    assert(embBefore == 10)

    // update one doc, add one doc, leave 9 untouched
    c.upsertDocuments(Seq(
      """{"id": 3, "body": "document 3 CHANGED content body"}""",
      """{"id": 99, "body": "document 99 brand new body"}""").toDF("document"))
    CountingEmbedder.calls.set(0)
    c.syncPipelineIncremental(p)
    assert(CountingEmbedder.calls.get() == 2) // ONLY changed + new embedded
    assert(c.embeddings(p, "body").count() == 11)
    assert(c.chunks(p, "body").count() == 11)

    // deleting a doc drops its chunks/embeddings on next sync
    c.deleteDocuments("""{"id": {"$eq": 0}}""")
    c.syncPipelineIncremental(p)
    assert(c.embeddings(p, "body").count() == 10)
    assert(c.tsvectors(p, "body").count() == 10)

    // results equal a full resync (same rows)
    val incEmb = c.embeddings(p, "body").orderBy("document_id", "chunk_index")
      .select("document_id", "chunk_index").collect().toSeq
    c.syncPipeline(p)
    val fullEmb = c.embeddings(p, "body").orderBy("document_id", "chunk_index")
      .select("document_id", "chunk_index").collect().toSeq
    assert(incEmb == fullEmb)
  }

  test("incremental sync rebuilds the persisted IVF index for indexed fields") {
    val c = new Collection(spark, "incivf", Files.createTempDirectory("graft_incivf_").toString)
    val p = Pipeline("p", Seq(PipelineField("body",
      splitter = Some((100000, 0)), semanticSearch = Some(HashEmbedder(64)),
      vectorIndex = Some(4))))
    c.upsertDocuments((0 until 60).map(i =>
      s"""{"id": $i, "body": "document $i body ${"spark data " * (i % 5 + 1)}"}""")
      .toDF("document"))
    c.syncPipelineIncremental(p)
    assert(c.ivfIndex(p, "body").centroids.length == 4)

    // a new document arrives; after the incremental sync its embedding must
    // be probe-able through the PERSISTED index (a stale index would miss it)
    c.upsertDocuments(Seq(
      """{"id": 777, "body": "completely unique zanzibar quixotic phrase"}""").toDF("document"))
    c.syncPipelineIncremental(p)
    val qv = HashEmbedder(64).embedOne("completely unique zanzibar quixotic phrase")
    val hit = c.ivfIndex(p, "body")
      .search(qv, 1, nprobe = 4, Seq("document_id", "chunk_index"))
      .select("document_id").as[String].head()
    val expected = c.documents
      .where(get_json_object(col("document"), "$.id") === "777")
      .select("source_uuid").as[String].head()
    assert(hit == expected)
  }
}
