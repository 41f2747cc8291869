package graft.store

import java.nio.file.Files
import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.HashEmbedder

/** The background segment merge (staged compaction): a sync that trips the
  * merge policy must return in O(batch) time while the O(corpus)
  * compact-and-rebuild runs on the merge thread, and delta-served results
  * must stay correct across the publish swap — including syncs that land
  * BETWEEN the merge's snapshot and its publish (carry-over), and full
  * rewrites that supersede the merge entirely (generation abort). In the
  * reference, index maintenance never stalls ingest (Postgres HNSW inserts
  * amortize, VACUUM runs in background); this is the Spark-warehouse
  * equivalent. */
class BackgroundMergeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def mkCollection(tag: String): (Collection, String) = {
    val wh = Files.createTempDirectory(s"graft_bgm_${tag}_").toString
    (new Collection(spark, tag, wh), wh)
  }

  private def pipeline: Pipeline = Pipeline("p", Seq(PipelineField("body",
    splitter = Some((100000, 0)), semanticSearch = Some(HashEmbedder(32)),
    hnswIndex = Some((8, 32)), binaryIndex = true, fullTextSearch = true)))

  private def seed(c: Collection, n: Int): Unit =
    c.upsertDocuments((0 until n).map(i =>
      s"""{"id": $i, "body": "merge doc $i ${"idea " * (i % 5 + 1)}"}""").toDF("document"))

  private def searchTop(c: Collection, p: Pipeline, q: String): String =
    c.hnswSearch(p, "body", HashEmbedder(32).embedOne(q), 1, ef = 500)
      .select("document_id").as[String].head()

  private def uuidOf(c: Collection, id: Int): String =
    c.documents.where(get_json_object(col("document"), "$.id") === id.toString)
      .select("source_uuid").as[String].head()

  test("the triggering sync returns in O(batch); serving stays correct before and after the swap") {
    val (c, wh) = mkCollection("async")
    c.mergeEvery = 2
    val p = pipeline
    seed(c, 40)
    c.syncPipelineIncremental(p) // full build

    val chunksP = s"$wh/async/p/body_chunks"
    c.upsertDocuments(Seq("""{"id": 100, "body": "first delta doc"}""").toDF("document"))
    c.syncPipelineIncremental(p)
    assert(DeltaTable.segmentCount(chunksP) == 2)

    // Jam the (single) merge thread behind a latch so the merge scheduled
    // by the next sync provably cannot start until we let it — then the
    // state right after the sync returns is, deterministically, "sync done,
    // merge pending".
    val gate = new CountDownLatch(1)
    Collection.mergeEc.execute { () => gate.await() }
    c.upsertDocuments(Seq("""{"id": 101, "body": "second delta doc"}""").toDF("document"))
    c.syncPipelineIncremental(p) // trips mergeEvery=2, returns without compacting
    assert(DeltaTable.segmentCount(chunksP) == 3,
      "the triggering sync must NOT compact inline")
    assert(Collection.pendingMerges.keys.exists(_.contains("async")),
      "a merge must be pending for this pipeline")

    // pre-swap serving: delta segments answer
    val expect101 = uuidOf(c, 101)
    assert(searchTop(c, p, "second delta doc") == expect101)
    val preCount = c.embeddings(p, "body").count()

    gate.countDown()
    c.awaitMaintenance()
    assert(DeltaTable.segmentCount(chunksP) == 1, "merge did not compact chunks")
    assert(DeltaTable.segmentCount(s"$wh/async/p/body_embeddings") == 1)
    // post-swap serving: same answers from the rebuilt base
    assert(searchTop(c, p, "second delta doc") == expect101)
    assert(c.embeddings(p, "body").count() == preCount)
    assert(c.binarySearch(p, "body", HashEmbedder(32).embedOne("second delta doc"),
      1, rerank = 1000).select("document_id").as[String].head() == expect101)
    assert(!new java.io.File(chunksP + "_mergestage").exists())
  }

  test("a sync landing between snapshot and publish is carried over, not lost") {
    val (c, wh) = mkCollection("carry")
    c.mergeEvery = 1000 // no auto-merge; we drive the phases by hand
    val p = pipeline
    seed(c, 30)
    c.syncPipelineIncremental(p)
    c.upsertDocuments(Seq("""{"id": 200, "body": "pre snapshot delta doc"}""").toDF("document"))
    c.syncPipelineIncremental(p)

    // run the merge synchronously, injecting a LATE sync after its
    // snapshot (mergeEvery flips back so the injected sync cannot schedule
    // a second, racing merge — this test pins the carry-over itself)
    c.mergeEvery = 1
    c.runStagedMerge(p, afterSnapshot = () => {
      c.mergeEvery = 1000
      c.upsertDocuments(Seq(
        """{"id": 201, "body": "late mid merge doc"}""").toDF("document"))
      c.syncPipelineIncremental(p)
    })

    val chunksP = s"$wh/carry/p/body_chunks"
    // compacted base (seg 0) + the carried late segment
    assert(DeltaTable.segmentCount(chunksP) == 2,
      s"expected base + carried late segment, got ${DeltaTable.segmentCount(chunksP)}")
    assert(c.embeddings(p, "body").count() == 32)
    assert(c.chunks(p, "body").count() == 32)
    // both the pre-snapshot doc (absorbed into the base) and the late doc
    // (carried) serve through HNSW and exact search
    assert(searchTop(c, p, "pre snapshot delta doc") == uuidOf(c, 200))
    assert(searchTop(c, p, "late mid merge doc") == uuidOf(c, 201))
    // the late sync's counter survived the publish's state subtraction
    assert(Collection.pendingMerges.isEmpty)
  }

  test("a full sync landing mid-merge bumps the generation and the publish aborts") {
    val (c, wh) = mkCollection("abort")
    c.mergeEvery = 1000
    val p = pipeline
    seed(c, 20)
    c.syncPipelineIncremental(p)
    c.upsertDocuments(Seq("""{"id": 300, "body": "delta before abort"}""").toDF("document"))
    c.syncPipelineIncremental(p)

    c.mergeEvery = 1
    c.runStagedMerge(p, afterSnapshot = () => {
      c.mergeEvery = 1000
      c.syncPipeline(p) // full rewrite supersedes the in-flight merge
    })

    val chunksP = s"$wh/abort/p/body_chunks"
    assert(!new java.io.File(chunksP + "_mergestage").exists(),
      "aborted merge must clean its staged dir")
    // the full sync's state stands: one fresh base, all rows present
    assert(DeltaTable.segmentCount(chunksP) == 1)
    assert(c.embeddings(p, "body").count() == 21)
    assert(searchTop(c, p, "delta before abort") == uuidOf(c, 300))
  }

  test("content-keyed hids are identical across compaction (swap-order independence)") {
    val (c, wh) = mkCollection("hids")
    c.mergeEvery = 1000
    val p = pipeline
    seed(c, 25)
    c.syncPipelineIncremental(p)
    c.upsertDocuments(Seq("""{"id": 400, "body": "hid stability doc"}""").toDF("document"))
    c.syncPipelineIncremental(p)

    val embP = s"$wh/hids/p/body_embeddings"
    val before = DeltaTable.read(spark, embP)
      .select("document_id", "chunk_index", "hid")
      .as[(String, Int, Long)].collect().toSet
    c.mergeEvery = 1
    c.runStagedMerge(p)
    val after = DeltaTable.read(spark, embP)
      .select("document_id", "chunk_index", "hid")
      .as[(String, Int, Long)].collect().toSet
    assert(before == after,
      "compaction must not change stored HNSW node ids — the old graph and " +
        "the new table must agree during the swap window")
    assert(DeltaTable.segmentCount(embP) == 1)
  }
}
