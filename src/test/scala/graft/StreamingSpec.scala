package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EventRow, EventStreams}

/** Streaming semantics: drive each transform through a real streaming query
  * (file source → memory sink, processAllAvailable) and check equivalence
  * with the batch run of the same transform — the property that matters for
  * an engine exposing one logical operator over both modes.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def eventsBatch = graft.Tables.load(spark, TestSpark.sf0001, "events")

  test("windowed agg: streaming (complete) result equals batch result") {
    // stage the parquet through our loader to normalize the nanos timestamp
    val dir = Files.createTempDirectory("graft_stream_").toString
    eventsBatch.write.parquet(s"$dir/in")
    val schema = eventsBatch.schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")

    val q = EventStreams.hourlyStats(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly_out")
        .select("hour_start", "event_type", "n", "sum_value")
        .orderBy("hour_start", "event_type")
        .collect()
      val batch = EventStreams.hourlyStats(eventsBatch)
        .orderBy("hour_start", "event_type").collect()
      assert(streamed.length == batch.length && streamed.length > 0)
      assert(streamed.zip(batch).forall { case (a, b) => a == b })
    } finally q.stop()
  }

  test("streaming dedup removes duplicate event ids") {
    val dir = Files.createTempDirectory("graft_stream_").toString
    val dup = eventsBatch.limit(100).union(eventsBatch.limit(50)) // 50 dups
    dup.write.parquet(s"$dir/in")
    val stream = spark.readStream.schema(dup.schema).parquet(s"$dir/in")
    val q = EventStreams.dedupedEvents(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 100)
      assert(spark.table("dedup_out").select("event_id").distinct().count() == 100)
    } finally q.stop()
  }

  test("streaming curation: stateless gates + watermarked dedup, batch-equivalent") {
    val dir = Files.createTempDirectory("graft_stream_").toString
    val docs0 = graft.Tables.load(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id").as("id"), col("text")).limit(50)
    // re-send 10 texts under new ids: exact dups the dedup must collapse
    val dup = docs0.union(
        docs0.limit(10).withColumn("id", col("id") + 100000L))
      .withColumn("ts", to_timestamp(lit("2026-01-01 00:00:00")))
    dup.write.parquet(s"$dir/in")
    val stream = spark.readStream.schema(dup.schema).parquet(s"$dir/in")
    val curated = graft.operators.Corpus.curateStream(
      stream, "id", "text", "ts", minQuality = 0.2, maxDup3 = 0.9)
    // the dedup must be the state-BOUNDED within-watermark variant: a
    // plain dropDuplicates(md5) never evicts (the event-time column is
    // not among its keys), so state grows with every distinct text ever
    // seen — the finite input here can't surface that, so pin the plan
    assert(curated.queryExecution.logical.collect {
      case d: org.apache.spark.sql.catalyst.plans.logical.DeduplicateWithinWatermark => d
    }.nonEmpty, "streaming curation dedup must be watermark-bounded")
    val q = curated.writeStream.outputMode("append")
      .format("memory").queryName("curate_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("curate_out")
      // the same transform on the same data in batch mode (one logical
      // operator over both modes); which id represents a dup text may
      // differ, so compare the id-free profile multiset
      val batch = graft.operators.Corpus.curateStream(
        spark.read.parquet(s"$dir/in"), "id", "text", "ts",
        minQuality = 0.2, maxDup3 = 0.9)
      def profile(df: org.apache.spark.sql.DataFrame) = df
        .select("lang", "quality", "dup3_frac", "n_tokens")
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      assert(streamed.count() > 0)
      assert(profile(streamed) == profile(batch))
      // every duplicated text collapsed to one survivor
      val perText = streamed
        .join(dup.select(col("id"), md5(col("text")).as("h")), Seq("id"))
        .groupBy("h").count().agg(max("count")).as[Long].head()
      assert(perText == 1L)
    } finally q.stop()
  }

  test("sessionization: event-time gaps close sessions (batch-mode check)") {
    val t0 = 1700000000000L
    def ts(minOffset: Long) = new java.sql.Timestamp(t0 + minOffset * 60000)
    val rows = Seq(
      EventRow(1, ts(0), 7L, "click", 1.0, "{}"),
      EventRow(2, ts(5), 7L, "click", 2.0, "{}"),
      EventRow(3, ts(90), 7L, "click", 4.0, "{}"), // 85-min gap → new session
      EventRow(4, ts(95), 7L, "click", 8.0, "{}"),
      EventRow(5, ts(0), 9L, "view", 1.0, "{}")
    ).toDS()
    // flatMapGroupsWithState emits *closed* sessions; user 7's first session
    // (events 1+2) closes when event 3 arrives
    val out = EventStreams.sessionize(rows, gapMinutes = 30)
      .as[EventStreams.SessionOut].collect()
    assert(out.toSet == Set(EventStreams.SessionOut(7L, 2L, 3.0)))
  }

  test("sessionization: bounded reorder buffer matches full sort under bounded disorder") {
    val t0 = 1700000000000L
    // one user, 2000 events in 40 sessions (50 events each, 60-min gaps),
    // locally shuffled in blocks of 4 (disorder < buffer of 8)
    val ordered = (0 until 2000).map { i =>
      val session = i / 50; val step = i % 50
      val ts = new java.sql.Timestamp(t0 + session * 3600000L + step * 1000L)
      EventRow(i.toLong, ts, 1L, "click", 1.0, "{}")
    }
    val shuffled = ordered.grouped(4).flatMap(_.reverse).toSeq
    val exact = EventStreams.sessionize(ordered.toDS(), gapMinutes = 30)
      .as[EventStreams.SessionOut].collect().toSeq.sortBy(_.n_events)
    val bounded = EventStreams.sessionize(shuffled.toDS(), gapMinutes = 30,
        maxBufferedPerKey = 8)
      .as[EventStreams.SessionOut].collect().toSeq.sortBy(_.n_events)
    // 39 closed sessions of 50 events each (the 40th stays open in state)
    assert(exact.length == 39 && exact.forall(s => s.n_events == 50L && s.sum_value == 50.0))
    assert(bounded == exact)
  }

  test("sessionization: disorder beyond the buffer is counted, exact order counts zero") {
    val t0 = 1700000000000L
    val ordered = (0 until 512).map { i =>
      EventRow(i.toLong, new java.sql.Timestamp(t0 + i * 1000L), 1L, "click", 1.0, "{}")
    }
    // in exact order (or disorder within the buffer) nothing folds out of order
    val (exactDf, exactCtr) = EventStreams.sessionizeCounted(ordered.toDS(),
      gapMinutes = 30, maxBufferedPerKey = 8)
    exactDf.collect()
    assert(exactCtr.value == 0L)
    // blocks of 64 reversed against a buffer of 8 → degradation is visible
    val shuffled = ordered.grouped(64).flatMap(_.reverse).toSeq
    val (degradedDf, degradedCtr) = EventStreams.sessionizeCounted(shuffled.toDS(),
      gapMinutes = 30, maxBufferedPerKey = 8)
    degradedDf.collect()
    assert(degradedCtr.value > 0L,
      "out-of-order folds beyond the reorder buffer must be observable")
  }

  test("sessionization: one pathological key streams through a small buffer") {
    val t0 = 1700000000000L
    // a 200k-event bot key folded through a 1024-slot buffer: per-key memory
    // is the buffer, not the group — the unbounded-buffer OOM shape
    val n = 200000
    val rows = (0 until n).map { i =>
      // a session boundary every 1000 events (gap > 30 min)
      val ts = new java.sql.Timestamp(t0 + (i / 1000) * 3600000L + (i % 1000) * 100L)
      EventRow(i.toLong, ts, 42L, "click", 1.0, "{}")
    }
    val out = EventStreams.sessionize(rows.toDS(), gapMinutes = 30,
        maxBufferedPerKey = 1024)
      .as[EventStreams.SessionOut].collect()
    assert(out.length == n / 1000 - 1)
    assert(out.forall(s => s.user_id == 42L && s.n_events == 1000L))
  }

  test("continuous ingest: streamed upserts sync pipelines batch-for-batch") {
    import org.apache.spark.sql.functions.{col, get_json_object}
    val dir = Files.createTempDirectory("graft_syncstream_").toString
    val wh = s"$dir/wh"
    val c = new graft.store.Collection(spark, "cs", wh)
    val p = graft.store.Pipeline("p", Seq(graft.store.PipelineField(
      "body", splitter = Some((80, 10)), fullTextSearch = true)))

    val b1 = Seq(
      """{"id":"a","body":"spark streams documents into the analytics store"}""",
      """{"id":"b","body":"vector search over freshly embedded chunks"}""").toDF("document")
    val b2 = Seq(
      """{"id":"a","body":"spark streams documents into the analytics store continuously"}""",
      """{"id":"c","body":"a third document arrives in the second micro batch"}""").toDF("document")

    b1.write.parquet(s"$dir/in/batch1")
    val stream = spark.readStream.schema(b1.schema).parquet(s"$dir/in/*")
    val q = c.syncStream(stream, Seq(p), s"$dir/ckpt")
    try {
      q.processAllAvailable()
      assert(c.documents.count() == 2)
      b2.write.parquet(s"$dir/in/batch2")
      q.processAllAvailable()
    } finally q.stop()

    // the streamed collection must equal a batch-mode collection over the
    // same upsert sequence — chunks, embeddings, and tsvectors alike
    val ref = new graft.store.Collection(spark, "ref", wh)
    ref.upsertDocuments(b1); ref.syncPipelineIncremental(p)
    ref.upsertDocuments(b2); ref.syncPipelineIncremental(p)
    assert(c.documents.count() == 3)
    // doc "a" was updated by batch 2 (longest body wins = latest upsert)
    val bodyA = c.documents
      .where(get_json_object(col("document"), "$.id") === "a")
      .select(get_json_object(col("document"), "$.body")).as[String].head()
    assert(bodyA.endsWith("continuously"))
    def rows(cc: graft.store.Collection, kind: String): Set[String] = {
      val df = kind match {
        case "chunks" => cc.chunks(p, "body").select(col("document_id"),
          col("chunk_index"), col("chunk").as("v"))
        case "emb" => cc.embeddings(p, "body").select(col("document_id"),
          col("chunk_index"), col("embedding").cast("string").as("v"))
        case _ => cc.tsvectors(p, "body").select(col("document_id"),
          col("chunk_index"), col("terms").cast("string").as("v"))
      }
      df.collect().map(_.mkString("|")).toSet
    }
    for (kind <- Seq("chunks", "emb", "ts"))
      assert(rows(c, kind) == rows(ref, kind), s"streamed $kind != batch $kind")
  }

  test("continuous ingest appends index delta segments; micro-batches never rebuild") {
    val dir = Files.createTempDirectory("graft_syncidx_").toString
    val wh = s"$dir/wh"
    val c = new graft.store.Collection(spark, "csx", wh)
    val p = graft.store.Pipeline("p", Seq(graft.store.PipelineField(
      "body", splitter = Some((100000, 0)),
      semanticSearch = Some(graft.functions.HashEmbedder(32)),
      hnswIndex = Some((8, 32)))))

    val b1 = (0 until 60).map(i =>
      s"""{"id": $i, "body": "stream corpus doc $i ${"topic " * (i % 5 + 1)}"}""")
      .toDF("document")
    b1.write.parquet(s"$dir/in/batch1")
    val stream = spark.readStream.schema(b1.schema).parquet(s"$dir/in/*")
    val q = c.syncStream(stream, Seq(p), s"$dir/ckpt")
    // base blobs live under data/, delta segments under delta/seg=N —
    // walk both so "existing blobs byte-identical + new segment appended"
    // covers the whole forest
    def hnswDataFiles: Map[String, Long] = {
      val root = new java.io.File(s"$wh/csx/p/body_hnsw")
      val out = scala.collection.mutable.Map[String, Long]()
      def walk(f: java.io.File): Unit =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(walk)
        else if (f.getName.endsWith(".parquet"))
          out(f.getAbsolutePath.stripPrefix(root.getAbsolutePath)) = f.length
      walk(new java.io.File(root, "data")); walk(new java.io.File(root, "delta"))
      out.toMap
    }
    try {
      q.processAllAvailable()
      val before = hnswDataFiles
      assert(before.nonEmpty)
      // second micro-batch: 2 new docs — the index must absorb them as a
      // delta segment, leaving every existing graph blob byte-identical
      Seq("""{"id": 900, "body": "streamed doc about glacier acoustics"}""",
          """{"id": 901, "body": "streamed doc about tidal resonance"}""")
        .toDF("document").write.parquet(s"$dir/in/batch2")
      q.processAllAvailable()
      val after = hnswDataFiles
      before.foreach { case (name, len) =>
        assert(after.get(name).contains(len), s"micro-batch rebuilt segment $name") }
      assert(after.size > before.size, "micro-batch appended no delta segment")
    } finally q.stop()

    // delta-served search equals a full rebuild (exact regime)
    val qv = graft.functions.HashEmbedder(32).embedOne("glacier acoustics")
    def top = c.hnswSearch(p, "body", qv, 3, ef = 500)
      .select("document_id", "chunk_index").as[(String, Int)].collect().toSeq
    val viaDelta = top
    c.syncPipeline(p)
    assert(viaDelta == top)
  }

  test("transform task dispatch runs unchanged on an unbounded stream") {
    // the Spark-native transform_stream: the same Transform operator applied
    // to readStream — outputs arrive per micro-batch instead of per token
    val dir = Files.createTempDirectory("graft_stream_").toString
    val docs = Seq(
      (1L, "this is a great fast product i love it"),
      (2L, "terrible slow broken experience i hate it"),
      (3L, "neutral words about a table")).toDF("id", "text")
    docs.write.parquet(s"$dir/in")
    val stream = spark.readStream.schema(docs.schema).parquet(s"$dir/in")
    val q = graft.operators.Transform(stream, "text-classification", "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("transform_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("transform_out")
        .select("id", "output").as[(Long, String)].collect().toMap
      val batch = graft.operators.Transform(docs, "text-classification", "text")
        .select("id", "output").as[(Long, String)].collect().toMap
      assert(streamed == batch && streamed(1L).contains("POSITIVE")
        && streamed(2L).contains("NEGATIVE"))
    } finally q.stop()
  }

  test("C4 cleaning and trained quality scoring run unchanged on an unbounded stream") {
    // both operators are stateless scan-stage expressions, so the SAME
    // code path serves batch and streaming — the curation front door's
    // stream-native contract extends to the round's new gates
    val dir = Files.createTempDirectory("graft_stream_c4_").toString
    val docs = Seq(
      (1L, "a fine sentence with plenty of words lands here.\nshort."),
      (2L, "first keeper sentence sits right here. second one follows along too! third question wraps it up?"),
      (3L, "lorem ipsum filler page with a sentence. more sentences arrive now! and a third one lands?")).toDF("id", "text")
    docs.write.parquet(s"$dir/in")
    val model = graft.operators.QualityClassifier.fit(
      docs.where($"id" =!= 3L), docs.where($"id" === 3L), "text", dim = 64)
    val stream = spark.readStream.schema(docs.schema).parquet(s"$dir/in")

    // c4Clean is pure scan-stage expressions → streams directly (append)
    val cleanQ = graft.operators.Corpus.c4Clean(stream, "id", "text", minSentences = 1)
      .writeStream.outputMode("append").format("memory").queryName("c4_out").start()
    // scores() carries a per-document fold (an aggregation), so on a
    // stream it applies per micro-batch — the foreachBatch serving shape
    // continuous ingest already uses for sync
    val scored = new java.util.concurrent.ConcurrentHashMap[Long, Double]()
    val scoreQ = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.QualityClassifier.scores(batch, "id", "text", model)
          .select("id", "score").as[(Long, Double)].collect()
          .foreach { case (i, s) => scored.put(i, s) }
        ()
      }.start()
    try {
      cleanQ.processAllAvailable(); scoreQ.processAllAvailable()
      val cleanS = spark.table("c4_out")
        .select("id", "text_clean").as[(Long, String)].collect().toMap
      val cleanB = graft.operators.Corpus.c4Clean(docs, "id", "text", minSentences = 1)
        .select("id", "text_clean").as[(Long, String)].collect().toMap
      assert(cleanS == cleanB && !cleanS.contains(3L) && cleanS(1L).endsWith("here."))
      val scoreB = graft.operators.QualityClassifier.scores(docs, "id", "text", model)
        .select("id", "score").as[(Long, Double)].collect().toMap
      assert(scored.size == 3 && scoreB.forall { case (i, s) => scored.get(i) == s })
    } finally { cleanQ.stop(); scoreQ.stop() }
  }
}
