package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityClassifier

/** Trained quality classifier (operators/QualityClassifier.scala): the
  * fitted logistic model separates reference-like prose from garble, the
  * serving path's occurrence-fold score equals the model's own tf dot
  * product, the gate keeps what it should, fits are run-deterministic,
  * and the model round-trips through its JSON sidecar.
  */
class QualityClassifierSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  // deterministic corpus: "good" docs are stopword-rich English-ish prose,
  // "bad" docs are digit/punctuation garble — disjoint token distributions
  // a linear model over hashed bag-of-words separates cleanly
  private val goodWords =
    Array("the", "quick", "brown", "fox", "jumps", "over", "a", "lazy",
      "dog", "and", "runs", "to", "market", "for", "fresh", "bread")
  private val badWords =
    Array("x9z!", "0101", "$$$", "#ref", "qwrtp", "zzz4", "@@@@", "7f7f",
      "----", "null0", "0xdead", "%%%", "!!!!", "][][", "~~~", "&&&&")

  private def doc(words: Array[String], seed: Long, n: Int): String = {
    val r = new java.util.SplittableRandom(seed)
    (0 until n).map(_ => words(r.nextInt(words.length))).mkString(" ")
  }

  private lazy val pos =
    (1 to 80).map(i => (i, doc(goodWords, i * 31L, 20 + i % 10))).toDF("id", "text")
  private lazy val neg =
    (1 to 80).map(i => (i + 1000, doc(badWords, i * 37L, 20 + i % 10))).toDF("id", "text")
  private lazy val model =
    QualityClassifier.fit(pos.limit(60), neg.limit(60), "text", dim = 256)

  test("classifier separates held-out prose from garble") {
    val held = pos.orderBy(desc("id")).limit(20).withColumn("label", lit(1.0))
      .unionByName(neg.orderBy(desc("id")).limit(20).withColumn("label", lit(0.0)))
    val scored = QualityClassifier.scores(held, "id", "text", model)
      .join(held.select("id", "label"), "id")
      .select(col("label"), col("score")).collect()
    val posScores = scored.filter(_.getDouble(0) == 1.0).map(_.getDouble(1))
    val negScores = scored.filter(_.getDouble(0) == 0.0).map(_.getDouble(1))
    assert(posScores.min > negScores.max,
      s"held-out separation failed: min pos ${posScores.min} <= max neg ${negScores.max}")
    assert(posScores.min > 0.5 && negScores.max < 0.5)
  }

  test("serving fold equals the model's own tf dot product") {
    val text = doc(goodWords, 99L, 25)
    val served = QualityClassifier.scores(
        Seq((1, text)).toDF("id", "text"), "id", "text", model)
      .select("score").head().getDouble(0)
    // reference: build the tf vector by hand with the same kernel
    val toks = graft.functions.TextKernels.tokens(text)
    val z = model.intercept + toks.map(t =>
      model.weights((graft.functions.TextKernels.fnv1a64(t) & (model.dim - 1)).toInt)
        / toks.length.toDouble).sum
    val expected = 1.0 / (1.0 + math.exp(-z))
    assert(math.abs(served - expected) < 1e-12)
  }

  test("empty document scores the model prior sigmoid(intercept)") {
    val served = QualityClassifier.scores(
        Seq((1, "")).toDF("id", "text"), "id", "text", model)
      .collect().head
    assert(served.getLong(1) == 0L)
    val prior = 1.0 / (1.0 + math.exp(-model.intercept))
    assert(math.abs(served.getDouble(2) - prior) < 1e-15)
  }

  test("filterByScore keeps prose, drops garble") {
    val mixed = pos.limit(10).unionByName(neg.limit(10))
    val kept = QualityClassifier.filterByScore(mixed, "id", "text", model, 0.5)
    assert(kept.count() == 10)
    assert(kept.where(col("id") > 1000).count() == 0)
  }

  test("one-class fit returns the clamped MLE limit, not a crash") {
    // a unanimous distillation labeling (every doc kept / every doc
    // positive) must still yield a finite, servable model — the seed-sweep
    // harness hit exactly this on a 500-doc regenerated corpus
    val allPos = QualityClassifier.fit(pos.limit(20), neg.limit(0), "text", dim = 256)
    assert(allPos.intercept == QualityClassifier.OneClassIntercept)
    assert(allPos.weights.forall(_ == 0.0))
    val allNeg = QualityClassifier.fit(pos.limit(0), neg.limit(20), "text", dim = 256)
    assert(allNeg.intercept == -QualityClassifier.OneClassIntercept)
    // scores are decisively one-sided on both
    val s = QualityClassifier.scores(pos.limit(5), "id", "text", allPos)
      .collect().map(_.getDouble(2))
    assert(s.forall(_ > 0.999))
    intercept[IllegalArgumentException] {
      QualityClassifier.fit(pos.limit(0), neg.limit(0), "text", dim = 256)
    }
  }

  test("fit is deterministic across runs") {
    val m2 = QualityClassifier.fit(pos.limit(60), neg.limit(60), "text", dim = 256)
    assert(m2.intercept == model.intercept)
    assert(m2.weights.sameElements(model.weights))
  }

  test("model round-trips through the JSON sidecar") {
    val dir = java.nio.file.Files.createTempDirectory("graft_qc_").toString
    model.save(spark, dir)
    val loaded = QualityClassifier.load(spark, dir)
    assert(loaded.dim == model.dim)
    assert(loaded.intercept == model.intercept)
    assert(loaded.weights.sameElements(model.weights))
  }

  test("literal-fold and broadcast-join scoring paths agree bitwise") {
    val docs = pos.limit(10).unionByName(neg.limit(10))
    val viaLiteral = QualityClassifier.scores(docs, "id", "text", model)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    val saved = QualityClassifier.literalMaxDim
    QualityClassifier.literalMaxDim = 0 // force the large-model join path
    try {
      val viaJoin = QualityClassifier.scores(docs, "id", "text", model)
        .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
      // same token-order left-assoc fold on both paths → identical doubles
      assert(viaJoin == viaLiteral)
    } finally QualityClassifier.literalMaxDim = saved
  }

  test("a fully empty corpus is refused") {
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.fit(pos.limit(0), neg.limit(0), "text", dim = 64)
    }
    assert(e.getMessage.contains("both classes are empty"))
  }

  test("non-power-of-two dim is refused") {
    intercept[IllegalArgumentException] {
      QualityClassifier.fit(pos, neg, "text", dim = 1000)
    }
  }
}
