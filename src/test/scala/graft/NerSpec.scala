package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{NerClassifier, TaskModels, TrainedNerModel, Transform}

/** Trained token-classification (x9's operator): the per-token logistic
  * over window features must genuinely beat the capitalization regex
  * stand-in on held-out data — recall on lowercase trigger-context
  * entities the regex cannot see, precision on capitalized non-entities
  * it cannot reject. */
class NerSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  // fixture: entities are EXACTLY the trigger-followers; half the
  // sentences carry capitalized mid-sentence distractors (regex false
  // positives) and lowercase entities (regex false negatives)
  private val people = Seq("Alice", "Borg", "Chen", "Dietz", "Evans")
  private val places = Seq("london", "paris", "oslo", "madrid", "quito")
  private val distract = Seq("Quarterly Report", "Annual Review", "Budget Memo")

  /** (text, 1-based entity indices). */
  private def sentence(i: Int): (String, Seq[Int]) = {
    val p = people(i % people.length)
    val c = places((i / 2) % places.length)
    val d = distract(i % distract.length)
    if (i % 2 == 0)
      // Mr <P> filed the <D1> <D2> in <c> -> entities at 2 and 8
      (s"Mr $p filed the $d in $c", Seq(2, 8))
    else
      // the team from <c> met Dr <P> about the case -> entities at 4, 7
      (s"the team from $c met Dr $p about the case", Seq(4, 7))
  }

  private def f1(pred: Set[(Int, Int)], truth: Set[(Int, Int)]): Double = {
    val tp = pred.intersect(truth).size.toDouble
    if (pred.isEmpty || truth.isEmpty || tp == 0) 0.0
    else {
      val prec = tp / pred.size
      val rec = tp / truth.size
      2 * prec * rec / (prec + rec)
    }
  }

  test("trained NER beats the regex stand-in on held-out F1") {
    val train = (0 until 300).map(sentence)
    val heldOut = (300 until 400).map(sentence)
    val m = NerClassifier.fit(
      train.toDF("text", "ents"), "text", "ents")

    val truth = heldOut.zipWithIndex.flatMap { case ((_, es), s) =>
      es.map(e => (s, e))
    }.toSet
    // trained predictions (sentence, 1-based index)
    val trained = heldOut.zipWithIndex.flatMap { case ((text, _), s) =>
      val toks = text.split("\\s+")
      toks.indices.filter(i => m.scoreToken(toks, i) >= 0.5).map(i => (s, i + 1))
    }.toSet
    // regex stand-in: capitalized tokens past position 0 (its 0-based
    // index i == our 1-based i+1... the stand-in reports index i for the
    // i-th 0-based token, i.e. 1-based position i+1)
    val regex = heldOut.zipWithIndex.flatMap { case ((text, _), s) =>
      val toks = text.split("\\s+")
      toks.indices.filter(i => i > 0 && toks(i).nonEmpty && toks(i).head.isUpper)
        .map(i => (s, i + 1))
    }.toSet

    val f1Trained = f1(trained, truth)
    val f1Regex = f1(regex, truth)
    assert(f1Trained > f1Regex,
      f"trained $f1Trained%.3f must beat regex $f1Regex%.3f")
    assert(f1Trained > 0.95, f"trained held-out F1 too low: $f1Trained%.3f")
  }

  test("trained NER serves through the transform dispatch with the HF envelope") {
    val m = NerClassifier.fit(
      (0 until 200).map(sentence).toDF("text", "ents"), "text", "ents")
    Transform.registerModel("ner-spec", TrainedNerModel(m))
    try {
      val df = Seq((1L, "Mr Chen filed the Annual Review in oslo")).toDF("id", "text")
      val out = Transform(df, "token-classification", "text",
        args = Map("model" -> "ner-spec"))
        .select(explode(from_json(col("output"),
          org.apache.spark.sql.types.DataType.fromDDL(
            "array<struct<word:string,entity:string,score:double,index:int>>"))).as("e"))
        .select("e.word", "e.index").as[(String, Int)].collect().toSet
      assert(out == Set(("Chen", 2), ("oslo", 8)), s"served entities: $out")
      // the dispatch still refuses a task-mismatched model
      intercept[IllegalArgumentException] {
        Transform(df, "summarization", "text", args = Map("model" -> "ner-spec"))
      }
    } finally Transform.unregisterModel("ner-spec")
  }
}
