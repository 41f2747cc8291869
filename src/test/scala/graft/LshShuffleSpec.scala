package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** The LSH band exchange must stay payload-free: it ships (g, sz, band,
  * bucket) fixed-width rows, never the per-group token-hash arrays — for
  * long documents the array payload (×2 sides ×16 bands ≈ 256 B per unique
  * token) would dominate the shuffle and sink the operator at corpus scale.
  */
class LshShuffleSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("band exchange carries no token arrays (plan) and total shuffle stays near token bytes") {
    // 200 docs × ~300 unique tokens: the inline regime's band exchange
    // alone would move ≥ 2·16·60k·8B ≈ 15 MB of token hashes. A corpus
    // this small takes the inline path by default, so pin the SLIM (scale)
    // regime for the whole test — this is the 100 TB contract under test.
    val savedGate = Dedup.inlineVerifyMaxCorpusBytes
    Dedup.inlineVerifyMaxCorpusBytes = 0L
    try {
    val docs = (0 until 200).map { i =>
      val toks = (0 until 300).map(t => s"w${i}_$t")
      (i.toLong, toks.mkString(" "))
    }.toDF("id", "text")

    val pairs = Dedup.minhashLshPairs(docs, "id", "text", 0.8)

    val shuffleBytes = new AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val n = try {
      val out = pairs.count()
      var last = -1L
      var stable = 0
      val deadline = System.currentTimeMillis() + 10000
      while (stable < 3 && System.currentTimeMillis() < deadline) {
        Thread.sleep(150)
        val now = shuffleBytes.get()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      out
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(n == 0) // all-unique corpus: no near-dups, only shuffle cost
    // group formation legitimately shuffles the token strings once (~1.5 MB
    // here); the band join adds only slim rows. The old array-bearing band
    // exchange pushed this past 16 MB.
    assert(shuffleBytes.get() < 8L * 1024 * 1024,
      s"LSH shuffled ${shuffleBytes.get()} bytes — band exchange is carrying payload again")

    // plan: every exchange below the (band, bucket) join is array-free
    // (AQE planned lazily hides exchanges behind unexecuted stages — turn
    // it off for the plan inspection only)
    // also pin the join to a real shuffle (at this toy scale the band join
    // broadcasts and no exchange exists at all — at corpus scale it is a
    // shuffle, and THAT payload is what the assertion guards)
    val plan =
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        Dedup.minhashLshPairs(docs, "id", "text", 0.8).queryExecution.executedPlan
      } finally {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      }
    val bandExchanges = collectWithSubqueries(plan) {
      case e: ShuffleExchangeLike
          if e.output.exists(_.name == "band") && e.output.exists(_.name == "bucket") => e
    }
    assert(bandExchanges.nonEmpty, "no band/bucket exchange found in plan")
    bandExchanges.foreach { e =>
      val arrayCols = e.output.filter(
        _.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
      assert(arrayCols.isEmpty,
        s"band exchange ships array payload: ${arrayCols.map(_.name).mkString(",")}")
    }
    } finally Dedup.inlineVerifyMaxCorpusBytes = savedGate
  }

  test("slim exchange returns identical pairs on a near-dup corpus") {
    // overlapping docs with known pair structure: base docs are identical
    // (jaccard 1.0); variant i swaps ONE distinct base token (tok_i) for a
    // unique one → base-variant 59/61 ≈ 0.967, variant-variant (different
    // swapped tokens) 58/62 ≈ 0.935. Threshold 0.95 keeps exactly the
    // base-base and base-variant pairs.
    val docs = (0 until 60).map { i =>
      val base = (0 until 60).map(t => s"tok$t")
      val variant =
        if (i % 3 == 0) base
        else base.patch(i, Nil, 1) :+ s"x$i"
      (i.toLong, variant.mkString(" "))
    }.toDF("id", "text")
    // run BOTH verify regimes over the same corpus: the strategy gate may
    // only change cost, never the pair set
    val savedGate = Dedup.inlineVerifyMaxCorpusBytes
    val (inlinePairs, slimPairs) =
      try {
        Dedup.inlineVerifyMaxCorpusBytes = Long.MaxValue
        val i = Dedup.minhashLshPairs(docs, "id", "text", 0.95)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
        Dedup.inlineVerifyMaxCorpusBytes = 0L
        val s = Dedup.minhashLshPairs(docs, "id", "text", 0.95)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
        (i, s)
      } finally Dedup.inlineVerifyMaxCorpusBytes = savedGate
    val base = (0 until 60).filter(_ % 3 == 0).map(_.toLong)
    val variants = (0 until 60).filter(_ % 3 != 0).map(_.toLong)
    val expected =
      (for (a <- base; b <- base if a < b) yield (a, b)).toSet ++
      (for (a <- base; b <- variants) yield (math.min(a, b), math.max(a, b))).toSet
    assert(inlinePairs == expected, "inline-verify regime pair set wrong")
    assert(slimPairs == expected, "slim-exchange regime pair set wrong")
  }

  test("size-class band key loses no cross-class candidates") {
    // pairs whose sizes differ WITHIN the jaccard ratio but straddle a
    // multiplicative size-class boundary: doc 2i has 60 tokens, doc 2i+1
    // the same 60 plus 2 extra (jaccard 60/62 ≈ 0.968 ≥ 0.95, size ratio
    // 60/62 ≈ 0.968 ≥ 0.95). With class width ln(1/0.95) ≈ 0.0513,
    // ln(62)−ln(60) ≈ 0.0328 keeps them within one class width but the
    // floor boundary can fall between them — the probe side's cls+1
    // emission must still surface the pair in BOTH verify regimes.
    val docs = (0 until 40).flatMap { i =>
      val base = (0 until 60).map(t => s"p${i}_$t")
      Seq((2L * i, base.mkString(" ")),
        (2L * i + 1, (base ++ Seq(s"q${i}_a", s"q${i}_b")).mkString(" ")))
    }.toDF("id", "text")
    val expected = (0 until 40).map(i => (2L * i, 2L * i + 1)).toSet
    val savedGate = Dedup.inlineVerifyMaxCorpusBytes
    try {
      Dedup.inlineVerifyMaxCorpusBytes = Long.MaxValue
      val inlineP = Dedup.minhashLshPairs(docs, "id", "text", 0.95)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      Dedup.inlineVerifyMaxCorpusBytes = 0L
      val slimP = Dedup.minhashLshPairs(docs, "id", "text", 0.95)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(inlineP == expected, "inline regime dropped a cross-class pair")
      assert(slimP == expected, "slim regime dropped a cross-class pair")
    } finally Dedup.inlineVerifyMaxCorpusBytes = savedGate
  }
}
