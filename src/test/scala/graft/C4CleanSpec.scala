package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Corpus

/** C4 line/page cleaning (Corpus.c4Clean — Raffel et al. 2020 §2.2):
  * each published rule exercised on a hand-built multi-line corpus.
  */
class C4CleanSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def clean(rows: (Int, String)*) =
    Corpus.c4Clean(rows.toSeq.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  test("line rules: terminal punctuation, min words, javascript") {
    val good = "this line has five words here."
    val out = clean(1 ->
      Seq(good,
        "no terminal punctuation on this line",
        "too short.",
        "a javascript mention disqualifies this entire line.",
        "an exclamation also counts as terminal here!",
        "so does a question mark at the end?").mkString("\n"))
    val (nLines, nKept, text) = out(1)
    assert(nLines == 6 && nKept == 3)
    assert(text == Seq(good,
      "an exclamation also counts as terminal here!",
      "so does a question mark at the end?").mkString("\n"))
  }

  test("page rules: lorem ipsum, curly braces, sentence count") {
    val threeSentences =
      "first sentence with enough words inside. second sentence also counts here! third question mark sentence counts too?"
    val out = clean(
      1 -> threeSentences,
      2 -> (threeSentences + "\nsome Lorem Ipsum boilerplate."),
      3 -> (threeSentences + "\ncode with a { brace in it."),
      4 -> "only one qualifying sentence lives here.")
    assert(out.keySet == Set(1))
    assert(out(1)._3 == threeSentences)
  }

  test("CRLF pages clean identically to LF pages") {
    val lf = "first sentence with enough words inside.\nsecond sentence also counts here!\nthird question mark sentence counts too?"
    val crlf = lf.replace("\n", "\r\n")
    val out = clean(1 -> lf, 2 -> crlf)
    assert(out.contains(2), "CRLF page was silently discarded")
    assert(out(1)._2 == out(2)._2 && out(1)._3 == out(2)._3)
  }

  test("gopher rules: each published gate trips on its own violation, in isolation") {
    import org.apache.spark.sql.Row
    val base = ("the words be to of and that have with plenty more filler " * 6).trim // 72 words, all rules pass
    // every violating doc is built so ONLY the named gate trips — long
    // bullet/ellipsis lines keep alpha/symbol/mean-length healthy, so a
    // co-tripping sibling rule can't mask a regression in the named one
    val bulletLine = "- the words keep flowing along here today again"
    val ellipsisLine = "the words keep flowing along here and then they trail away..."
    val rows = Seq(
      1 -> base,
      2 -> "the be to of short doc.", // word count < minWords
      3 -> (base + " " + Seq.fill(9)("#x #x the words flow onward here").mkString(" ")), // symbol ratio only
      4 -> Seq.fill(12)(bulletLine).mkString("\n"), // 12/12 bullet lines; 1 of 9 words non-alpha
      5 -> base.replaceAll("the|be|to|of|and|that|have|with", "xxx"), // no stop words
      6 -> Seq.fill(12)(ellipsisLine).mkString("\n"), // 12/12 ellipsis lines; 1 of 11 words symbolic
      7 -> ("the be to of and that have with " + Seq.fill(60)("a b").mkString(" ")) // mean word length < 3
    ).toDF("id", "text")
    val out = graft.operators.Corpus.gopherRules(rows, "id", "text")
      .collect().map { case Row(id: Int, nw: Long, ml: Double, sr: Double,
          af: Double, bf: Double, ef: Double, sh: Long, keep: Boolean) =>
        id -> ((nw, ml, sr, af, bf, ef, sh, keep)) }.toMap
    assert(out(1)._8, s"clean doc dropped: ${out(1)}")
    assert(!out(2)._8 && out(2)._1 < 50)
    assert(!out(3)._8 && out(3)._3 > 0.1 &&
      out(3)._4 >= 0.8 && out(3)._2 >= 3.0, s"symbol not isolated: ${out(3)}")
    assert(!out(4)._8 && out(4)._5 > 0.9 &&
      out(4)._3 <= 0.1 && out(4)._4 >= 0.8 && out(4)._2 >= 3.0,
      s"bullet not isolated: ${out(4)}")
    assert(!out(5)._8 && out(5)._7 < 2)
    assert(!out(6)._8 && out(6)._6 > 0.3 &&
      out(6)._3 <= 0.1 && out(6)._4 >= 0.8, s"ellipsis not isolated: ${out(6)}")
    assert(!out(7)._8 && out(7)._2 < 3.0 &&
      out(7)._1 >= 50 && out(7)._7 >= 2, s"mean-length not isolated: ${out(7)}")
    // the maxWords upper bound, via the parameter (a 100k-word literal
    // would be all cost, no extra coverage)
    val capped = graft.operators.Corpus.gopherRules(
        Seq(1 -> base).toDF("id", "text"), "id", "text", maxWords = 60)
      .select("keep").as[Boolean].head()
    assert(!capped)
    val kept = graft.operators.Corpus.gopherFilter(rows, "id", "text")
      .select("id").as[Int].collect().toSet
    assert(kept == Set(1))
  }

  test("quoted-speech lines keep (closing quote is terminal)") {
    val q = "she said the words \"hello there general kenobi.\""
    val filler = "more sentences to pass the gate. another one lands right here! is this enough now?"
    val out = clean(1 -> (q + "\n" + filler))
    assert(out(1)._2 == 2 && out(1)._3.startsWith(q))
  }
}
