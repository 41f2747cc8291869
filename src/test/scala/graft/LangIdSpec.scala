package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LangIdClassifier, LangIdFixtures}

class LangIdSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.session

  // fit once for the suite — the same memoized model the t12 query serves
  private lazy val model = graft.queries.T12OracleSql.fitted(spark)

  test("trained langid separates held-out sentences of all five languages") {
    // held-out = a DISJOINT seed base: same generator, sentences the fit
    // never saw
    val held = LangIdFixtures.corpus(spark, 50, seedBase = 0x1ee7L)
    val heldIdx = held.withColumn("id", monotonically_increasing_id())
      .withColumnRenamed("lang", "true_lang")
    val p2 = LangIdClassifier.predictions(heldIdx, "id", "text", model)
      .join(heldIdx.select("id", "true_lang"), "id")
    assert(p2.count() == 250L)
    val accuracy = p2.where(col("lang") === col("true_lang")).count().toDouble / 250.0
    assert(accuracy >= 0.98, s"held-out accuracy $accuracy < 0.98")
  }

  test("trained langid classifies vocab the stopword heuristic has never seen") {
    // sentences built ONLY from words absent from every stopword table —
    // the heuristic returns 'und' (no hits), the trained model still reads
    // the orthography from char bigrams
    val texts = Seq(
      "zwischen verschiedenen möglichkeiten wählen bedeutet verantwortung übernehmen", // de
      "aprovechar oportunidades requiere preparación constante durante años", // es
      "plusieurs possibilités différentes demandent beaucoup réflexion") // fr
    val expected = Seq("de", "es", "fr")
    texts.zip(expected).foreach { case (t, want) =>
      val (got, conf) = model.predictOne(t)
      assert(got == want, s"'$t' predicted $got (conf $conf), want $want")
      val heuristic = graft.functions.TextKernels.langId(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)).toString
      assert(heuristic == "und",
        s"expected the stopword heuristic to fail on '$t', got $heuristic")
    }
  }

  test("driver-local predictOne agrees bitwise with the distributed path") {
    import spark.implicits._
    val held = LangIdFixtures.vocab.keys.toSeq.sorted.flatMap(l =>
      LangIdFixtures.sentences(l, 5, 0xabcL))
    val df = held.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val dist = LangIdClassifier.predictions(df, "id", "text", model)
      .orderBy("id").collect()
    held.zipWithIndex.foreach { case (t, i) =>
      val (lang, conf) = model.predictOne(t)
      assert(dist(i).getString(1) == lang, s"row $i lang mismatch")
      assert(dist(i).getDouble(2) == conf,
        s"row $i confidence ${dist(i).getDouble(2)} != $conf (not bitwise)")
    }
  }

  test("empty and shorter-than-n text predicts the model prior, confidence in (0,1]") {
    val (lang, conf) = model.predictOne("")
    val (lang1, conf1) = model.predictOne("a")
    assert(model.labels.contains(lang) && model.labels.contains(lang1))
    assert(conf > 0.0 && conf <= 1.0 && conf1 > 0.0 && conf1 <= 1.0)
  }

  test("filterByLang keeps only confidently-identified target languages") {
    import spark.implicits._
    val mixed = (LangIdFixtures.sentences("en", 20, 0xfeedL) ++
      LangIdFixtures.sentences("zh", 20, 0xfeedL))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val kept = LangIdClassifier.filterByLang(
      mixed, "id", "text", model, keep = Set("en"), minConfidence = 0.6)
    val keptIds = kept.select("id").as[Long].collect().toSet
    assert(keptIds.nonEmpty && keptIds.forall(_ < 20L),
      s"zh rows leaked through the en gate: ${keptIds.filter(_ >= 20L)}")
    assert(keptIds.size >= 18, s"only ${keptIds.size}/20 en rows kept")
  }
}
