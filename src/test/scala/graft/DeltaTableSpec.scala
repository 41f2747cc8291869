package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.DeltaTable

class DeltaTableSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_delta_").toString + "/t"

  test("base write reads back unchanged with no manifest join") {
    val p = tmp()
    val df = Seq(("a", 0, "x"), ("a", 1, "y"), ("b", 0, "z"))
      .toDF("document_id", "chunk_index", "chunk")
    DeltaTable.writeBase(df, p)
    val out = DeltaTable.read(spark, p)
    assert(out.collect().toSet == df.collect().toSet)
    // fast path: the physical plan contains no join at all
    assert(!out.queryExecution.executedPlan.toString.toLowerCase.contains("join"))
  }

  test("delta segment supersedes a document's rows wholesale") {
    val p = tmp()
    DeltaTable.writeBase(Seq(("a", 0, "x"), ("a", 1, "y"), ("b", 0, "z"))
      .toDF("document_id", "chunk_index", "chunk"), p)
    // doc a shrinks from 2 chunks to 1 with new content; doc c is new
    val delta = Seq(("a", 0, "x2"), ("c", 0, "w"))
      .toDF("document_id", "chunk_index", "chunk")
    DeltaTable.appendDelta(spark, p, delta,
      Seq("a", "c").toDF("document_id"))
    val out = DeltaTable.read(spark, p).collect().toSet.map((r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getInt(1), r.getString(2)))
    assert(out == Set(("a", 0, "x2"), ("b", 0, "z"), ("c", 0, "w")))
    // a compaction-bounded manifest resolves via the cached map literal:
    // no join in the plan even while segments are live
    assert(!DeltaTable.read(spark, p).queryExecution.executedPlan
      .toString.toLowerCase.contains("join"))
  }

  test("a doc id listed with no rows in the delta loses all rows; tombstone ditto") {
    val p = tmp()
    DeltaTable.writeBase(Seq(("a", 0, "x"), ("b", 0, "z"), ("d", 0, "q"))
      .toDF("document_id", "chunk_index", "chunk"), p)
    // a's field vanished (zero chunks now); d deleted via tombstone
    DeltaTable.appendDelta(spark, p,
      Seq.empty[(String, Int, String)].toDF("document_id", "chunk_index", "chunk"),
      Seq("a").toDF("document_id"))
    DeltaTable.tombstone(spark, p, Seq("d").toDF("document_id"))
    val out = DeltaTable.read(spark, p).select("document_id").as[String].collect().toSet
    assert(out == Set("b"))
  }

  test("delete-then-readd resurrects through a later segment") {
    val p = tmp()
    DeltaTable.writeBase(Seq(("a", 0, "x")).toDF("document_id", "chunk_index", "chunk"), p)
    DeltaTable.tombstone(spark, p, Seq("a").toDF("document_id"))
    DeltaTable.appendDelta(spark, p,
      Seq(("a", 0, "x3")).toDF("document_id", "chunk_index", "chunk"),
      Seq("a").toDF("document_id"))
    val out = DeltaTable.read(spark, p).select("chunk").as[String].collect().toSeq
    assert(out == Seq("x3"))
  }

  test("compaction preserves the resolved rows and restores the fast path") {
    val p = tmp()
    DeltaTable.writeBase(Seq(("a", 0, "x"), ("b", 0, "z"))
      .toDF("document_id", "chunk_index", "chunk"), p)
    for (i <- 1 to 5)
      DeltaTable.appendDelta(spark, p,
        Seq(("a", 0, s"x$i")).toDF("document_id", "chunk_index", "chunk"),
        Seq("a").toDF("document_id"))
    val before = DeltaTable.read(spark, p).collect().toSet
    assert(DeltaTable.segmentCount(p) == 6)
    assert(DeltaTable.compactIfNeeded(spark, p, maxSegments = 3))
    assert(DeltaTable.segmentCount(p) == 1)
    val after = DeltaTable.read(spark, p)
    assert(after.collect().toSet == before)
    assert(!after.queryExecution.executedPlan.toString.toLowerCase.contains("join"))
    assert(!DeltaTable.compactIfNeeded(spark, p, maxSegments = 3)) // already compact
  }

  test("a crashed append (no commit marker) is invisible; a retry recovers") {
    val p = tmp()
    DeltaTable.writeBase(Seq(("a", 0, "x"), ("b", 0, "z"))
      .toDF("document_id", "chunk_index", "chunk"), p)
    val delta = Seq(("a", 0, "x2")).toDF("document_id", "chunk_index", "chunk")
    val seg = DeltaTable.appendDelta(spark, p, delta, Seq("a").toDF("document_id"))
    // simulate a crash between the manifest write and the commit marker
    assert(new java.io.File(s"$p/_commits/seg-$seg").delete())
    val rolledBack = DeltaTable.read(spark, p).collect().toSet
      .map((r: org.apache.spark.sql.Row) => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(rolledBack == Set(("a", 0, "x"), ("b", 0, "z")))
    // the retried append takes a fresh segment number and wins
    val seg2 = DeltaTable.appendDelta(spark, p, delta, Seq("a").toDF("document_id"))
    assert(seg2 > seg)
    val recovered = DeltaTable.read(spark, p).collect().toSet
      .map((r: org.apache.spark.sql.Row) => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(recovered == Set(("a", 0, "x2"), ("b", 0, "z")))
  }

  test("a crashed tombstone deletes nothing; numbering never reuses its slot") {
    val p = tmp()
    DeltaTable.writeBase(Seq(("a", 0, "x"), ("b", 0, "z"))
      .toDF("document_id", "chunk_index", "chunk"), p)
    DeltaTable.tombstone(spark, p, Seq("a").toDF("document_id"))
    assert(new java.io.File(s"$p/_commits/seg-1").delete()) // crash mid-tombstone
    val alive = DeltaTable.read(spark, p).select("document_id").as[String].collect().toSet
    assert(alive == Set("a", "b"))
    // the retry takes a FRESH number (the crashed call's alloc marker burns
    // seg 1) and lands
    DeltaTable.tombstone(spark, p, Seq("a").toDF("document_id"))
    assert(DeltaTable.read(spark, p).select("document_id").as[String].collect().toSet == Set("b"))
    // neither the burned slot nor the committed tombstone's (data-less)
    // number is ever handed out again
    val seg = DeltaTable.appendDelta(spark, p,
      Seq(("c", 0, "w")).toDF("document_id", "chunk_index", "chunk"),
      Seq("c").toDF("document_id"))
    assert(seg == 3)
  }

  test("a later append can never retroactively commit a crashed tombstone's orphan row") {
    val p = tmp()
    DeltaTable.writeBase(Seq(("a", 0, "x"), ("b", 0, "z"))
      .toDF("document_id", "chunk_index", "chunk"), p)
    DeltaTable.tombstone(spark, p, Seq("a").toDF("document_id"))
    assert(new java.io.File(s"$p/_commits/seg-1").delete()) // crash mid-tombstone
    // an UNRELATED append must take a fresh number — were it to reuse
    // seg 1, its commit marker would bless the orphan manifest row and
    // silently delete 'a'
    val seg = DeltaTable.appendDelta(spark, p,
      Seq(("c", 0, "w")).toDF("document_id", "chunk_index", "chunk"),
      Seq("c").toDF("document_id"))
    assert(seg == 2)
    val alive = DeltaTable.read(spark, p).select("document_id").as[String].collect().toSet
    assert(alive == Set("a", "b", "c"))
  }

  test("a 0-row batch publishes no data dir; its manifest entries still shrink docs to zero") {
    val p = tmp()
    DeltaTable.writeBase(Seq(("a", 0, "x"), ("b", 0, "y"))
      .toDF("document_id", "chunk_index", "chunk"), p)
    DeltaTable.appendDelta(spark, p,
      Seq.empty[(String, Int, String)].toDF("document_id", "chunk_index", "chunk"),
      Seq("a").toDF("document_id"))
    // doc a shrank to zero rows through the manifest alone…
    assert(DeltaTable.read(spark, p).select("document_id")
      .as[String].collect().toSet == Set("b"))
    // …and no empty seg dir fragments the table (Collection's changelog
    // guard and the compaction trigger both key on data dirs existing)
    assert(DeltaTable.segmentCount(p) == 1)
  }

  test("a foreign (cross-process) append invalidates the cached manifest map") {
    // the literal-map cache advances with THIS JVM's appends; files
    // another process lands must force a re-collect, never be absorbed —
    // a stale map would serve the foreign process's documents from their
    // superseded segments
    val p = tmp()
    DeltaTable.writeBase(Seq(("a", 0, "x"), ("b", 0, "y"))
      .toDF("document_id", "chunk_index", "chunk"), p)
    DeltaTable.appendDelta(spark, p,
      Seq(("a", 0, "x2")).toDF("document_id", "chunk_index", "chunk"),
      Seq("a").toDF("document_id"), knownIds = Some(Seq("a")))
    // prime + advance the cache through a read and a second local append
    assert(DeltaTable.read(spark, p).where(col("document_id") === "a")
      .select("chunk").as[String].head() == "x2")
    DeltaTable.appendDelta(spark, p,
      Seq(("a", 0, "x3")).toDF("document_id", "chunk_index", "chunk"),
      Seq("a").toDF("document_id"), knownIds = Some(Seq("a")))
    assert(DeltaTable.read(spark, p).where(col("document_id") === "a")
      .select("chunk").as[String].head() == "x3")
    // simulate ANOTHER PROCESS appending seg 9 for doc b: data dir,
    // manifest rows, and commit marker land on disk without this JVM's
    // cache hearing about it
    val stage = Files.createTempDirectory("graft_foreign_").toString
    Seq(("b", 0, "FOREIGN")).toDF("document_id", "chunk_index", "chunk")
      .coalesce(1).write.parquet(s"$stage/data")
    Seq(("b", 9)).toDF("document_id", "seg")
      .coalesce(1).write.parquet(s"$stage/manifest")
    def onePart(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val segDir = new java.io.File(p, "seg=9"); segDir.mkdirs()
    assert(onePart(s"$stage/data").renameTo(new java.io.File(segDir, "part-foreign.parquet")))
    assert(onePart(s"$stage/manifest").renameTo(
      new java.io.File(s"$p/_manifest", "part-foreign-9.parquet")))
    new java.io.File(s"$p/_commits", "seg-9").createNewFile()
    // the read MUST see the foreign supersession (stale cache would
    // still serve doc b's base row "y")
    assert(DeltaTable.read(spark, p).where(col("document_id") === "b")
      .select("chunk").as[String].head() == "FOREIGN",
      "stale manifest cache served a superseded foreign document")
  }

  test("concurrent knownIds appends to one table: cache advance under the lock stays correct") {
    val p = tmp()
    DeltaTable.writeBase(
      (0 until 8).map(i => (s"d$i", 0, "base")).toDF("document_id", "chunk_index", "chunk"), p)
    DeltaTable.read(spark, p).count() // prime the manifest cache path
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val futs = (0 until 8).map { i =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          DeltaTable.appendDelta(spark, p,
            Seq((s"d$i", 0, s"new$i")).toDF("document_id", "chunk_index", "chunk"),
            Seq(s"d$i").toDF("document_id"), knownIds = Some(Seq(s"d$i")))
          ()
        }
      })
    }
    futs.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    val out = DeltaTable.read(spark, p)
      .select("document_id", "chunk").as[(String, String)].collect().toMap
    assert(out == (0 until 8).map(i => s"d$i" -> s"new$i").toMap,
      s"concurrent appends resolved wrong: $out")
  }

  test("randomized op sequence matches an in-memory model (seeded)") {
    // model-based stress: 40 random append/tombstone/compact ops against a
    // Map[doc -> rows] model, read-equivalence checked after EVERY op —
    // the test class that catches supersession/compaction interactions no
    // example-based case pins. Seeded, so failures replay exactly.
    val p = tmp()
    val rng = new scala.util.Random(0xD317AL)
    val docPool = ('a' to 'j').map(_.toString)
    var model = Map.empty[String, Set[(String, Int, String)]]
    def randRows(doc: String): Set[(String, Int, String)] =
      (0 until rng.nextInt(4)).map(i => (doc, i, s"${doc}_v${rng.nextInt(1000)}")).toSet
    DeltaTable.writeBase(
      docPool.take(4).flatMap { d =>
        val rows = randRows(d); model += d -> rows; rows
      }.toDF("document_id", "chunk_index", "chunk"), p)
    for (op <- 1 to 40) {
      rng.nextInt(5) match {
        case 0 => // tombstone 1-2 docs (possibly absent ones — must no-op)
          val docs = (0 until 1 + rng.nextInt(2)).map(_ => docPool(rng.nextInt(docPool.size)))
          DeltaTable.tombstone(spark, p, docs.toDF("document_id"))
          docs.foreach(d => model -= d)
        case 4 =>
          DeltaTable.compactIfNeeded(spark, p, maxSegments = rng.nextInt(3))
        case _ => // append: rewrite 1-3 docs wholesale (some may get 0 rows)
          val docs = (0 until 1 + rng.nextInt(3))
            .map(_ => docPool(rng.nextInt(docPool.size))).distinct
          val rows = docs.flatMap { d =>
            val r = randRows(d); model += d -> r; r
          }
          DeltaTable.appendDelta(spark, p,
            rows.toDF("document_id", "chunk_index", "chunk"),
            docs.toDF("document_id"))
      }
      val got = DeltaTable.read(spark, p).as[(String, Int, String)].collect().toSet
      assert(got == model.values.flatten.toSet, s"divergence after op $op")
    }
  }

  test("compaction sweeps crash-orphaned stage dirs") {
    val p = tmp()
    DeltaTable.writeBase(Seq(("a", 0, "x"), ("b", 0, "y"))
      .toDF("document_id", "chunk_index", "chunk"), p)
    DeltaTable.appendDelta(spark, p,
      Seq(("a", 0, "x2")).toDF("document_id", "chunk_index", "chunk"),
      Seq("a").toDF("document_id"))
    // simulate an append that died between stage write and rename
    val orphan = new java.io.File(s"$p/_stage-seg9")
    assert(orphan.mkdirs())
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$p/_stage-seg9/part-orphan.parquet"), "junk")
    // invisible to readers (underscore dir)…
    assert(DeltaTable.read(spark, p).count() == 2)
    // …and gone after the compaction swap
    assert(DeltaTable.compactIfNeeded(spark, p, maxSegments = 1))
    assert(!orphan.exists(), "compaction must sweep crashed stage dirs")
    assert(DeltaTable.read(spark, p).select("document_id", "chunk")
      .as[(String, String)].collect().toSet == Set(("a", "x2"), ("b", "y")))
  }

  test("concurrent appends take distinct segments and both commit") {
    val p = tmp()
    DeltaTable.writeBase(Seq(("a", 0, "x")).toDF("document_id", "chunk_index", "chunk"), p)
    // the allocSeg createNewFile race is the only arbiter — drive it from
    // two threads appending different documents at once (the sync path
    // runs its three chains concurrently against SEPARATE tables; this
    // pins the same-table case a multi-pipeline collection can hit)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val segs = Await.result(Future.sequence(Seq("b", "c").map(d => Future {
      DeltaTable.appendDelta(spark, p,
        Seq((d, 0, s"v_$d")).toDF("document_id", "chunk_index", "chunk"),
        Seq(d).toDF("document_id"))
    })), Duration.Inf)
    assert(segs.toSet.size == 2, s"concurrent appends shared a segment: $segs")
    val out = DeltaTable.read(spark, p).select("document_id", "chunk")
      .as[(String, String)].collect().toSet
    assert(out == Set(("a", "x"), ("b", "v_b"), ("c", "v_c")))
  }

  test("file:-scheme homes resolve supersession and tombstones like plain paths") {
    val p = "file://" + tmp() // file:///tmp/... — Spark-legal, java.io-hostile
    DeltaTable.writeBase(Seq(("a", 0, "x"), ("b", 0, "y"))
      .toDF("document_id", "chunk_index", "chunk"), p)
    DeltaTable.appendDelta(spark, p,
      Seq(("a", 0, "x2")).toDF("document_id", "chunk_index", "chunk"),
      Seq("a").toDF("document_id"))
    val rows = DeltaTable.read(spark, p).select("document_id", "chunk")
      .as[(String, String)].collect().toSet
    assert(rows == Set(("a", "x2"), ("b", "y")),
      "supersession must not be skipped on a file:-scheme home")
    DeltaTable.tombstone(spark, p, Seq("b").toDF("document_id"))
    assert(DeltaTable.read(spark, p).select("document_id")
      .as[String].collect().toSet == Set("a"))
  }

  test("a pre-marker layout (no _commits dir) reads every segment") {
    val p = tmp()
    DeltaTable.writeBase(Seq(("a", 0, "x")).toDF("document_id", "chunk_index", "chunk"), p)
    DeltaTable.appendDelta(spark, p,
      Seq(("a", 0, "x2")).toDF("document_id", "chunk_index", "chunk"),
      Seq("a").toDF("document_id"))
    DeltaTable.deleteRecursively(new java.io.File(s"$p/_commits"))
    val out = DeltaTable.read(spark, p).select("chunk").as[String].collect().toSeq
    assert(out == Seq("x2"))
  }

  test("readWithSeg keys rewritten rows to their owning segment") {
    val p = tmp()
    DeltaTable.writeBase(Seq(("a", 0, "x"), ("b", 0, "z"))
      .toDF("document_id", "chunk_index", "chunk"), p)
    DeltaTable.appendDelta(spark, p,
      Seq(("a", 0, "x2")).toDF("document_id", "chunk_index", "chunk"),
      Seq("a").toDF("document_id"))
    val segs = DeltaTable.readWithSeg(spark, p)
      .select("document_id", "seg").as[(String, Int)].collect().toMap
    assert(segs == Map("a" -> 1, "b" -> 0))
  }
}
