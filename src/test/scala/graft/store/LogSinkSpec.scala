package graft.store

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.HashEmbedder

/** The auxiliary log sinks (upsert changelog, search logging, registry
  * appends) are concurrent BY NATURE — the reference logs every search
  * inside the query statement (search_query_builder.rs:476-518) and
  * upserts land from many sessions. These probes pin the commit protocol
  * they now share with the data segments: write-ahead batch numbering
  * (concurrent writers get DISTINCT ids — the old read-then-append
  * `max+1` could not guarantee that), stage-then-rename publication (no
  * shared `_temporary` dir to clobber), and the consumer-side settled
  * bound (a later batch publishing before an earlier in-flight one never
  * makes a sync watermark skip the straggler). */
class LogSinkSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmp(tag: String) =
    Files.createTempDirectory(s"graft_logsink_${tag}_").toString

  private def inParallel(n: Int)(body: Int => Unit): Unit = {
    val pool = Executors.newFixedThreadPool(n)
    val start = new CountDownLatch(1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val futs = (0 until n).map { i =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try body(i) catch { case t: Throwable => failures.add(t) }
        }
      })
    }
    start.countDown()
    futs.foreach(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    if (!failures.isEmpty) throw failures.peek()
  }

  test("concurrent allocLogBatch hands out distinct batch numbers") {
    val p = tmp("alloc") + "/log"
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    inParallel(4) { _ =>
      (0 until 16).foreach(_ => got.add(DeltaTable.allocLogBatch(p)))
    }
    val ids = got.toArray(Array.empty[java.lang.Long]).map(_.toLong)
    assert(ids.length == 64)
    assert(ids.distinct.length == 64, "two writers were handed the same batch id")
  }

  test("concurrent alloc+publish batches are all visible with their own rows") {
    val p = tmp("pub") + "/log"
    inParallel(4) { i =>
      (0 until 5).foreach { j =>
        val b = DeltaTable.allocLogBatch(p)
        DeltaTable.publishLogBatch(
          Seq((s"w$i-$j", b)).toDF("payload", "alloc"), p, b)
      }
    }
    val out = spark.read.parquet(p)
    assert(out.count() == 20, "an append was clobbered by a concurrent writer")
    // every row sits in exactly the batch dir its writer allocated
    assert(out.where(col("batch") =!= col("alloc")).count() == 0)
    assert(DeltaTable.settledLogBatch(p) ==
      out.agg(max("batch")).as[Long].head())
  }

  test("settled bound: an in-flight lower batch holds consumers back; burn/publish release it") {
    val p = tmp("settled") + "/log"
    val b0 = DeltaTable.allocLogBatch(p)
    DeltaTable.publishLogBatch(Seq(("x", 0)).toDF("a", "b"), p, b0)
    val straggler = DeltaTable.allocLogBatch(p)   // in flight, not published
    val b2 = DeltaTable.allocLogBatch(p)
    DeltaTable.publishLogBatch(Seq(("y", 0)).toDF("a", "b"), p, b2)
    // consumers stop short of the straggler even though a later batch landed
    assert(DeltaTable.settledLogBatch(p) == straggler - 1)
    // the straggler publishing releases the bound past both batches
    DeltaTable.publishLogBatch(Seq(("z", 0)).toDF("a", "b"), p, straggler)
    assert(DeltaTable.settledLogBatch(p) == b2)
  }

  test("a failed publish burns its number instead of stalling consumers") {
    val p = tmp("burn") + "/log"
    val b0 = DeltaTable.allocLogBatch(p)
    DeltaTable.publishLogBatch(Seq(("x", 0)).toDF("a", "b"), p, b0)
    val doomed = DeltaTable.allocLogBatch(p)
    val boom = udf((s: String) => { throw new RuntimeException("boom"); s })
    intercept[Exception] {
      DeltaTable.publishLogBatch(
        Seq(("x", 0)).toDF("a", "b").withColumn("a", boom(col("a"))), p, doomed)
    }
    assert(DeltaTable.settledLogBatch(p) == doomed,
      "burned batch should settle (nothing to read there)")
  }

  test("a writer that dies without burning stalls only until the grace period") {
    val p = tmp("grace") + "/log"
    val b0 = DeltaTable.allocLogBatch(p)
    DeltaTable.publishLogBatch(Seq(("x", 0)).toDF("a", "b"), p, b0)
    val orphan = DeltaTable.allocLogBatch(p) // simulated JVM kill: no publish, no burn
    assert(DeltaTable.settledLogBatch(p) == orphan - 1)
    val saved = DeltaTable.logAllocGraceMs
    try {
      DeltaTable.logAllocGraceMs = 1L
      Thread.sleep(20)
      assert(DeltaTable.settledLogBatch(p) == orphan)
    } finally DeltaTable.logAllocGraceMs = saved
  }

  test("a slow-but-alive publish re-allocs past the grace window instead of losing its rows") {
    val p = tmp("slow") + "/log"
    val b0 = DeltaTable.allocLogBatch(p)
    DeltaTable.publishLogBatch(Seq(("x", 0)).toDF("a", "b"), p, b0)
    val slow = DeltaTable.allocLogBatch(p)
    val saved = DeltaTable.logAllocGraceMs
    try {
      DeltaTable.logAllocGraceMs = 10L
      Thread.sleep(30) // marker ages past the FULL grace window:
      // consumers have presumed the writer dead and advanced over it
      assert(DeltaTable.settledLogBatch(p) == slow,
        "precondition: consumers advanced over the in-flight batch")
      // the slow writer's publish completes AFTER that — under the stale
      // number its rows would sit below every watermark forever
      val landed = DeltaTable.publishLogBatch(
        Seq(("late", 1)).toDF("a", "b"), p, slow)
      assert(landed > slow, s"late batch landed under its stale number $landed")
      assert(DeltaTable.settledLogBatch(p) >= landed)
      val out = spark.read.parquet(p)
      assert(out.where(col("a") === "late").count() == 1)
      assert(out.count() == 2)
    } finally DeltaTable.logAllocGraceMs = saved
  }

  test("a publish failing AFTER slow-writer re-allocation burns the fresh number too") {
    // the r11 advice find: the catch burned only the ORIGINAL batch, so a
    // rename failure after re-allocation left the fresh alloc marker
    // pending — holding settledLogBatch (and every consumer watermark)
    // back for the full grace window — and leaked the stage dir
    val p = tmp("lateburn") + "/log"
    val b0 = DeltaTable.allocLogBatch(p)
    DeltaTable.publishLogBatch(Seq(("x", 0)).toDF("a", "b"), p, b0)
    val slow = DeltaTable.allocLogBatch(p)
    val saved = DeltaTable.logAllocGraceMs
    try {
      DeltaTable.logAllocGraceMs = 10L
      Thread.sleep(30) // marker goes stale → publish will re-alloc
      // sabotage the fresh number's landing spot: a plain FILE named
      // batch=<slow+1> makes the final rename fail (ENOTDIR)
      new java.io.File(p, s"batch=${slow + 1}").createNewFile()
      intercept[java.io.IOException] {
        DeltaTable.publishLogBatch(Seq(("late", 1)).toDF("a", "b"), p, slow)
      }
      // BOTH numbers burned: nothing pending, consumers settle past them
      assert(DeltaTable.settledLogBatch(p) == slow + 1,
        "a pending fresh alloc is stalling consumers after the failed publish")
      // and the staged data is not litter
      val stages = Option(new java.io.File(p).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("_stage-"))
      assert(stages.isEmpty, s"stage litter left behind: ${stages.toSeq}")
    } finally DeltaTable.logAllocGraceMs = saved
  }

  test("pruneLogMarkers sweeps orphaned stage dirs past the grace window") {
    val p = tmp("sweep") + "/log"
    val b0 = DeltaTable.allocLogBatch(p)
    DeltaTable.publishLogBatch(Seq(("x", 0)).toDF("a", "b"), p, b0)
    val dead = new java.io.File(p, "_stage-deadbeef")
    dead.mkdirs()
    val deadPart = new java.io.File(dead, "part-0.parquet")
    deadPart.createNewFile()
    // age the WHOLE subtree: the sweep judges by the newest mtime under
    // the stage (the top dir's mtime doesn't refresh while Spark lands
    // part files in _temporary subdirs, so it alone proves nothing)
    val old = System.currentTimeMillis() - DeltaTable.logAllocGraceMs - 60000
    deadPart.setLastModified(old)
    dead.setLastModified(old)
    // a live writer mid-write: stale TOP dir but a FRESH deep part file —
    // must NOT be swept (the bulk-backfill-in-progress shape)
    val live = new java.io.File(p, "_stage-live/_temporary/0")
    live.mkdirs()
    new java.io.File(live, "part-1.parquet").createNewFile()
    new java.io.File(p, "_stage-live").setLastModified(old)
    DeltaTable.pruneLogMarkers(p, -1L)
    assert(!dead.exists(), "orphaned stage dir past the grace window survived")
    assert(new java.io.File(p, "_stage-live").exists(),
      "a live writer's mid-write stage (fresh deep file, stale top dir) was swept")
    assert(spark.read.parquet(p).count() == 1)
  }

  test("concurrent appendLogFiles lose no rows (searches-table shape)") {
    val p = tmp("files") + "/searches"
    inParallel(4) { i =>
      (0 until 8).foreach { j =>
        DeltaTable.appendLogFiles(
          Seq((i.toLong * 100 + j, s"q$i-$j")).toDF("search_id", "query"), p)
      }
    }
    val out = spark.read.parquet(p)
    assert(out.count() == 32)
    assert(out.select("search_id").as[Long].collect().distinct.length == 32)
  }

  test("concurrent appendLogFilesLocal lose no rows; Spark reads the mixed schema kinds") {
    // the zero-job path the registry and search logs now take: UUID-named
    // files rename in atomically, and the required-typed local columns
    // (long/string/int/double) must read back alongside each other
    val p = tmp("local") + "/results"
    inParallel(4) { i =>
      (0 until 8).foreach { j =>
        DeltaTable.appendLogFilesLocal(p,
          Seq("search_id" -> "long", "document_id" -> "string",
            "rank" -> "int", "score" -> "double"),
          Seq(Seq(i.toLong * 100 + j, s"d$i-$j", j + 1, j / 8.0)))
      }
    }
    val out = spark.read.parquet(p)
    assert(out.count() == 32)
    assert(out.select("search_id").as[Long].collect().distinct.length == 32)
    assert(out.schema("score").dataType == org.apache.spark.sql.types.DoubleType)
    assert(out.schema("rank").dataType == org.apache.spark.sql.types.IntegerType)
    assert(out.where(col("rank") === 8).select("score").as[Double]
      .collect().forall(_ == 7 / 8.0))
  }

  test("concurrent upserts: both batches visible, distinct changelog batch ids, sync consumes both") {
    val wh = tmp("upsert")
    val c = new Collection(spark, "c_conc", wh)
    c.upsertDocuments(Seq("""{"id": "seed", "body": "seed doc"}""").toDF("document"))
    val p = Pipeline("p", Seq(PipelineField("body", splitter = Some((64, 8)),
      semanticSearch = Some(HashEmbedder(16)))))
    c.syncPipeline(p)
    inParallel(2) { i =>
      c.upsertDocuments(
        Seq(s"""{"id": "w$i", "body": "writer $i body"}""").toDF("document"))
    }
    assert(c.documents.count() == 3, "a concurrent upsert batch was lost")
    val changelog = new java.io.File(s"$wh/c_conc/_changelog")
    val batchDirs = Option(changelog.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.getName).toSeq
    assert(batchDirs.distinct.size == batchDirs.size)
    // the synced seed batch may already be pruned; the two concurrent
    // writers' batches must both exist under their own ids
    assert(batchDirs.size >= 2)
    c.syncPipelineIncremental(p)
    assert(c.chunks(p, "body").select("document_id").distinct().count() == 3,
      "incremental sync missed a concurrently-logged batch")
  }

  test("concurrent searchAndLog: every search and its results land") {
    val wh = tmp("search")
    val c = new Collection(spark, "c_slog", wh)
    c.upsertDocuments((0 until 6).map(i =>
      s"""{"id": $i, "body": "searchable text number $i about sparks"}""")
      .toDF("document"))
    val p = Pipeline("p", Seq(PipelineField("body", splitter = Some((64, 8)),
      semanticSearch = Some(HashEmbedder(16)), fullTextSearch = true)))
    c.syncPipeline(p)
    val ids = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    inParallel(3) { i =>
      val (sid, _) = c.searchAndLog(p,
        semantic = Seq(VectorSearchField("body", s"sparks $i")), limit = 3)
      ids.add(sid)
    }
    val logged = c.searches.select("search_id").as[Long].collect().toSet
    assert(ids.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSet
      .subsetOf(logged), "a concurrent search log append was clobbered")
    assert(c.searches.count() == 3)
    val withResults = c.searchResults.select("search_id").as[Long].collect().toSet
    assert(withResults == logged, "search_results lost a concurrent append")
  }

  // the registry now writes driver-side (appendLogFilesLocal, covered
  // above); this pins the DISTRIBUTED log append kept for driver-too-big
  // batches
  test("concurrent distributed appendLogFiles both land (models-table shape)") {
    val p = tmp("registry") + "/models"
    inParallel(2) { i =>
      DeltaTable.appendLogFiles(
        Seq((i.toLong, s"proj$i", "regression")).toDF("model_id", "project", "task"), p)
    }
    assert(spark.read.parquet(p).count() == 2)
  }
}
