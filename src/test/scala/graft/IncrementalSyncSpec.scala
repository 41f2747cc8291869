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
  // the event-sized sync path embeds driver-side (embedMany → embedOne);
  // the invariant under test is "only changed chunks reach the MODEL",
  // whichever path carries them — count both
  override def embedOne(text: String): Array[Float] = {
    CountingEmbedder.calls.incrementAndGet()
    inner.embedOne(text)
  }
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
    val ivfWh = Files.createTempDirectory("graft_incivf_").toString
    val c = new Collection(spark, "incivf", ivfWh)
    val p = Pipeline("p", Seq(PipelineField("body",
      splitter = Some((100000, 0)), semanticSearch = Some(HashEmbedder(64)),
      vectorIndex = Some(4))))
    c.upsertDocuments((0 until 60).map(i =>
      s"""{"id": $i, "body": "document $i body ${"spark data " * (i % 5 + 1)}"}""")
      .toDF("document"))
    c.syncPipelineIncremental(p)
    assert(c.ivfIndex(p, "body").centroids.length == 4)

    // a new document arrives; after the incremental sync its embedding must
    // be probe-able through the PERSISTED index (a stale index would miss
    // it) — and the base cluster files must be untouched (delta segment
    // appended, never a rebuild)
    def ivfDataFiles(sub: String): Map[String, Long] = {
      val root = new java.io.File(s"$ivfWh/incivf/p/body_ivf/$sub")
      if (!root.isDirectory) Map.empty
      else {
        val out = scala.collection.mutable.Map[String, Long]()
        def walk(f: java.io.File): Unit =
          if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(walk)
          else if (f.getName.endsWith(".parquet"))
            out(f.getAbsolutePath.stripPrefix(root.getAbsolutePath)) = f.length
        walk(root)
        out.toMap
      }
    }
    val baseBefore = ivfDataFiles("data")
    assert(baseBefore.nonEmpty && ivfDataFiles("delta").isEmpty)
    c.upsertDocuments(Seq(
      """{"id": 777, "body": "completely unique zanzibar quixotic phrase"}""").toDF("document"))
    c.syncPipelineIncremental(p)
    assert(ivfDataFiles("data") == baseBefore, "IVF base cluster files were rewritten")
    assert(ivfDataFiles("delta").nonEmpty, "no IVF delta segment appended")
    val qv = HashEmbedder(64).embedOne("completely unique zanzibar quixotic phrase")
    val hit = c.ivfIndex(p, "body")
      .search(qv, 1, nprobe = 4, Seq("document_id", "chunk_index"))
      .select("document_id").as[String].head()
    val expected = c.documents
      .where(get_json_object(col("document"), "$.id") === "777")
      .select("source_uuid").as[String].head()
    assert(hit == expected)

    // UPDATE an existing doc: the delta segment must supersede its old
    // vector in the index — the probe must score the NEW embedding, exactly
    // as a brute-force scan over the resolved embeddings does
    c.upsertDocuments(Seq(
      """{"id": 7, "body": "renamed to utterly different xylophone cadence"}""").toDF("document"))
    c.syncPipelineIncremental(p)
    val qv2 = HashEmbedder(64).embedOne("utterly different xylophone cadence")
    val ivfTop = c.ivfIndex(p, "body")
      .search(qv2, 3, nprobe = 4, Seq("document_id", "chunk_index"))
      .select("document_id", "score").as[(String, Double)].collect().toSeq
    val bruteTop = c.embeddings(p, "body")
      .select(col("document_id"),
        graft.functions.VecFunctions.cosineSimilarity(col("embedding"),
          graft.functions.VecFunctions.floatVec(qv2.toIndexedSeq)).as("score"))
      .orderBy(col("score").desc, col("document_id"))
      .limit(3).as[(String, Double)].collect().toSeq
    assert(ivfTop.map(_._1) == bruteTop.map(_._1))
    ivfTop.zip(bruteTop).foreach { case ((_, a), (_, b)) => assert(math.abs(a - b) < 1e-9) }
  }

  /** Sum of task output metrics (bytes/records written) across everything
    * `body` runs — local mode shares the JVM, so a listener sees all tasks.
    * Polls for listener-bus quiescence instead of the private waitUntilEmpty. */
  private def measureWrites(body: => Unit): (Long, Long) = {
    val bytes = new AtomicLong(0)
    val records = new AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val om = t.taskMetrics.outputMetrics
        bytes.addAndGet(om.bytesWritten)
        records.addAndGet(om.recordsWritten)
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      var last = -1L
      var stable = 0
      val deadline = System.currentTimeMillis() + 10000
      while (stable < 3 && System.currentTimeMillis() < deadline) {
        Thread.sleep(150)
        val now = bytes.get() + records.get()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    (bytes.get(), records.get())
  }

  test("a 1-doc re-sync reads and writes O(doc), not O(corpus)") {
    val c = new Collection(spark, "incbig", Files.createTempDirectory("graft_incbig_").toString)
    val p = Pipeline("p", Seq(PipelineField("body",
      splitter = Some((64, 0)), semanticSearch = Some(HashEmbedder(16)),
      fullTextSearch = true)))
    c.upsertDocuments((0 until 300).map(i =>
      s"""{"id": $i, "body": "corpus document $i steady content"}""").toDF("document"))
    val (fullBytes, fullRecords) = measureWrites(c.syncPipelineIncremental(p))
    assert(fullRecords >= 900) // 300 chunks + 300 embeddings + 300 tsvectors

    c.upsertDocuments(Seq(
      """{"id": 42, "body": "corpus document 42 revised content"}""").toDF("document"))
    val (deltaBytes, deltaRecords) = measureWrites(c.syncPipelineIncremental(p))
    // 1 chunk + 1 embedding + 1 tsvector + 3 one-row manifest entries.
    // Records is the scale-faithful probe; the bytes bound is loose because
    // at this toy scale parquet footers (~1 KB/file) dominate the payload.
    assert(deltaRecords <= 12, s"1-doc sync wrote $deltaRecords records")
    assert(deltaBytes * 4 < fullBytes,
      s"1-doc sync wrote $deltaBytes bytes vs full sync's $fullBytes")
    // and the old-row reads push the changed-doc In filter into the scan
    // (below the resolution join, down to the parquet source)
    val plan = c.chunks(p, "body")
      .where(col("document_id").isin("someid", "otherid")).queryExecution
      .executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(document_id"),
      s"changed-doc filter not pushed to scan:\n$plan")

    // the UPSERT itself is O(batch) too: one delta segment + manifest row +
    // changelog row, never a corpus rewrite (the documents table is a delta
    // table keyed by source_uuid)
    val (_, upsertRecords) = measureWrites(
      c.upsertDocuments(Seq(
        """{"id": 43, "body": "corpus document 43 revised content"}""").toDF("document")))
    assert(upsertRecords <= 6, s"1-doc upsert wrote $upsertRecords records")
  }

  test("merge policy: past mergeEvery delta syncs tables compact and indexes rebuild") {
    val wh = Files.createTempDirectory("graft_incmerge_").toString
    val c = new Collection(spark, "incm", wh)
    c.mergeEvery = 2
    val p = Pipeline("p", Seq(PipelineField("body",
      splitter = Some((100000, 0)), semanticSearch = Some(HashEmbedder(32)),
      hnswIndex = Some((8, 32)), binaryIndex = true)))
    c.upsertDocuments((0 until 40).map(i =>
      s"""{"id": $i, "body": "merge doc $i ${"idea " * (i % 5 + 1)}"}""").toDF("document"))
    c.syncPipelineIncremental(p) // full build

    import graft.store.DeltaTable
    val chunksP = s"$wh/incm/p/body_chunks"
    val embP = s"$wh/incm/p/body_embeddings"
    c.upsertDocuments(Seq("""{"id": 100, "body": "first delta doc"}""").toDF("document"))
    c.syncPipelineIncremental(p)
    assert(DeltaTable.segmentCount(chunksP) == 2) // base + one delta
    // second delta sync crosses mergeEvery=2 → compaction + index rebuild
    // on the background merge thread (the sync itself returns in O(batch))
    c.upsertDocuments(Seq("""{"id": 101, "body": "second delta doc"}""").toDF("document"))
    c.syncPipelineIncremental(p)
    c.awaitMaintenance()
    assert(DeltaTable.segmentCount(chunksP) == 1, "chunks did not compact")
    assert(DeltaTable.segmentCount(embP) == 1, "embeddings did not compact")
    assert(c.embeddings(p, "body").count() == 42)
    // the compacted read is back on the fast path (no resolution join)
    assert(!c.chunks(p, "body").queryExecution.executedPlan.toString
      .toLowerCase.contains("join"))

    // post-merge searches serve the rebuilt indexes correctly
    val qv = HashEmbedder(32).embedOne("second delta doc")
    val hit = c.hnswSearch(p, "body", qv, 1, ef = 500)
      .select("document_id").as[String].head()
    val expect = c.documents
      .where(get_json_object(col("document"), "$.id") === "101")
      .select("source_uuid").as[String].head()
    assert(hit == expect)
    assert(c.binarySearch(p, "body", qv, 1, rerank = 1000)
      .select("document_id").as[String].head() == expect)
    // and the NEXT delta sync appends onto the fresh base without issue
    c.upsertDocuments(Seq("""{"id": 102, "body": "post merge doc"}""").toDF("document"))
    c.syncPipelineIncremental(p)
    assert(c.embeddings(p, "body").count() == 43)
  }

  test("a lagging pipeline cannot resurrect deleted documents from the changelog") {
    val c = new Collection(spark, "inclag", Files.createTempDirectory("graft_inclag_").toString)
    val mkField = PipelineField("body", splitter = Some((64, 0)),
      semanticSearch = Some(HashEmbedder(16)))
    val pa = Pipeline("pa", Seq(mkField))
    val pb = Pipeline("pb", Seq(mkField))
    c.upsertDocuments((0 until 5).map(i =>
      s"""{"id": $i, "body": "lag doc $i body"}""").toDF("document"))
    c.syncPipelineIncremental(pa)
    c.syncPipelineIncremental(pb)

    // pa consumes the new doc's batch; pb lags behind it
    c.upsertDocuments(Seq("""{"id": 9, "body": "doomed document body"}""").toDF("document"))
    c.syncPipelineIncremental(pa)
    assert(c.chunks(pa, "body").count() == 6)
    // the doc dies BEFORE pb ever consumed its upsert batch
    c.deleteDocuments("""{"id": {"$eq": 9}}""")
    c.syncPipelineIncremental(pb)
    // without the delete marker pb would replay the unconsumed upsert and
    // resurrect the doc's chunks/embeddings in its delta tables
    assert(c.chunks(pb, "body").count() == 5)
    assert(c.embeddings(pb, "body").count() == 5)
    // pa (already synced past the upsert) was handled by the cascade
    // tombstone, and its own marker replay keeps it at 5 too
    c.syncPipelineIncremental(pa)
    assert(c.chunks(pa, "body").count() == 5)
    assert(c.embeddings(pa, "body").count() == 5)
  }

  test("a field added to a synced pipeline gets a full build; consumed changelog batches prune") {
    val wh = Files.createTempDirectory("graft_incfield_").toString
    val c = new Collection(spark, "incf", wh)
    val body = PipelineField("body", splitter = Some((64, 0)),
      semanticSearch = Some(HashEmbedder(16)))
    c.upsertDocuments((0 until 20).map(i =>
      s"""{"id": $i, "body": "field doc $i body", "title": "t$i heading"}""")
      .toDF("document"))
    val p1 = Pipeline("p", Seq(body))
    c.syncPipelineIncremental(p1)

    // widen the pipeline: the new field must build over ALL documents even
    // though the changelog has nothing new for this pipeline
    val title = PipelineField("title", splitter = Some((64, 0)),
      semanticSearch = Some(HashEmbedder(16)))
    val p2 = Pipeline("p", Seq(body, title))
    c.syncPipelineIncremental(p2)
    assert(c.chunks(p2, "title").count() == 20)
    assert(c.embeddings(p2, "title").count() == 20)

    // and incremental updates now flow to both fields
    c.upsertDocuments(Seq(
      """{"id": 3, "body": "revised body three", "title": "revised title three"}""")
      .toDF("document"))
    c.syncPipelineIncremental(p2)
    assert(c.chunks(p2, "body").where(col("chunk").contains("revised body")).count() == 1)
    assert(c.chunks(p2, "title").where(col("chunk").contains("revised title")).count() == 1)

    // consumed batches prune (the newest dir is always retained so batch
    // numbering stays monotonic past the watermark)
    def batchDirs = Option(new java.io.File(s"$wh/incf/_changelog").listFiles())
      .getOrElse(Array.empty).count(_.getName.startsWith("batch="))
    assert(batchDirs == 1, s"expected pruned changelog, found $batchDirs batch dirs")
    // a subsequent upsert + sync still lands correctly after pruning
    c.upsertDocuments(Seq(
      """{"id": 99, "body": "post prune body", "title": "post prune title"}""")
      .toDF("document"))
    c.syncPipelineIncremental(p2)
    assert(c.chunks(p2, "body").count() == 21)
    assert(c.chunks(p2, "title").count() == 21)
  }

  test("delta sync appends HNSW forest segments without rebuilding, results equal a full rebuild") {
    val wh = Files.createTempDirectory("graft_inchnsw_").toString
    val c = new Collection(spark, "inchnsw", wh)
    val p = Pipeline("p", Seq(PipelineField("body",
      splitter = Some((100000, 0)), semanticSearch = Some(HashEmbedder(32)),
      hnswIndex = Some((8, 32)), binaryIndex = true)))
    c.upsertDocuments((0 until 80).map(i =>
      s"""{"id": $i, "body": "hnsw base doc $i ${"theme " * (i % 7 + 1)}"}""").toDF("document"))
    c.syncPipelineIncremental(p) // full build

    // base blobs live under data/, delta segments under delta/seg=N
    def hnswDataFiles: Map[String, Long] = {
      val root = new java.io.File(s"$wh/inchnsw/p/body_hnsw")
      val out = scala.collection.mutable.Map[String, Long]()
      def walk(f: java.io.File): Unit =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(walk)
        else if (f.getName.endsWith(".parquet"))
          out(f.getAbsolutePath.stripPrefix(root.getAbsolutePath)) = f.length
      walk(new java.io.File(root, "data")); walk(new java.io.File(root, "delta"))
      out.toMap
    }
    val before = hnswDataFiles
    assert(before.nonEmpty)

    // micro-batch: one updated doc + one new doc
    c.upsertDocuments(Seq(
      """{"id": 11, "body": "hnsw doc 11 replaced with novel saxophone motif"}""",
      """{"id": 900, "body": "hnsw brand new doc about quasar lensing"}""").toDF("document"))
    c.syncPipelineIncremental(p)
    val after = hnswDataFiles
    // existing graph blobs are untouched — appended, never rebuilt
    before.foreach { case (name, len) =>
      assert(after.get(name).contains(len), s"segment file $name was rewritten") }
    assert(after.size > before.size, "no delta segment was appended")

    // exact-regime parity: delta-served results == full-rebuild results
    val qv = HashEmbedder(32).embedOne("novel saxophone motif")
    def top(k: Int) = c.hnswSearch(p, "body", qv, k, ef = 500)
      .select("document_id", "chunk_index", "score")
      .as[(String, Int, Double)].collect().toSeq
    val viaDelta = top(5)
    val binViaDelta = c.binarySearch(p, "body", qv, 5, rerank = 1000)
      .as[(String, Int, Double)].collect().toSeq
    c.syncPipeline(p) // full rebuild
    val viaRebuild = top(5)
    assert(viaDelta.map(t => (t._1, t._2)) == viaRebuild.map(t => (t._1, t._2)))
    viaDelta.zip(viaRebuild).foreach { case (a, b) => assert(math.abs(a._3 - b._3) < 1e-9) }
    val binViaRebuild = c.binarySearch(p, "body", qv, 5, rerank = 1000)
      .as[(String, Int, Double)].collect().toSeq
    assert(binViaDelta.map(t => (t._1, t._2)) == binViaRebuild.map(t => (t._1, t._2)))
  }
}
