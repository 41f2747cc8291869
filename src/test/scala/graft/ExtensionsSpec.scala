package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Trainer

class ExtensionsSpec extends AnyFunSuite {

  test("full SQL function surface resolves through the shared registration table") {
    // spark.sql.extensions is a static conf (needs a fresh SparkContext) —
    // the config path is driven by `Test/runMain graft.ExtCheck` (forked
    // JVM); here we exercise the same registration table on a live session.
    val spark = TestSpark.session
    graft.functions.VecFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)) c,
        |       vec_norm_l2(array(3.0D, 4.0D)) n,
        |       simhash64('hello world') h,
        |       size(chunk_text('one two three four five', 10, 2)) nc,
        |       size(chunk_text('a\n\nvery long paragraph here', 8, 0, 'character')) cc,
        |       size(embed_text('hello', 32)) d,
        |       lang_id('the cat is on the mat and it is happy') l,
        |       size(ts_vector('queries running')) t""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(r.getDouble(1) - 5.0) < 1e-9)
    assert(r.getLong(2) != 0L)
    assert(r.getInt(3) >= 2)
    // character splitter keeps the oversized paragraph whole: 2 chunks
    assert(r.getInt(4) == 2)
    assert(r.getInt(5) == 32)
    assert(r.getString(6) == "en")
    assert(r.getInt(7) == 2)
    val agg = spark.sql(
      "SELECT vec_sum(v) FROM VALUES (array(1.0D,2.0D)), (array(3.0D,4.0D)) t(v)")
      .head().getSeq[Double](0)
    assert(agg == Seq(4.0, 6.0))
  }

  test("chunk_text splitter argument: NULL and non-literal refused loudly") {
    val spark = TestSpark.session
    graft.functions.VecFunctions.registerAll(spark)
    val nullErr = intercept[Exception] {
      spark.sql("SELECT chunk_text('a b c', 10, 2, NULL)").head()
    }
    assert(nullErr.getMessage.contains("must not be NULL"))
    val colErr = intercept[Exception] {
      spark.sql("SELECT chunk_text('a b c', 10, 2, s) FROM VALUES ('markdown') t(s)").head()
    }
    assert(colErr.getMessage.contains("must be a literal"))
    // a proper literal still routes to the named splitter
    assert(spark.sql("SELECT size(chunk_text('x\n## y\nz', 4, 0, 'markdown'))")
      .head().getInt(0) >= 2)
  }

  test("tune + generate + decompose registry surfaces") {
    val spark = TestSpark.session
    import spark.implicits._
    val texts = (1 to 80).map { i =>
      if (i % 2 == 0) (s"great fast excellent item $i", 1.0)
      else (s"terrible slow broken item $i", 0.0)
    }.toDF("text", "label")
    val t = new Trainer(spark, Files.createTempDirectory("graft_tune_").toString)
    val res = t.tune("sentiment", "text_classification", texts, "text", "label",
      "stand-in-base-model")
    assert(res.deployed)
    assert(res.metrics("f1") > 0.9) // separable via embedded wordlists

    val gen = t.registry.generate("sentiment", "tell me about spark")
    assert(gen.contains("generated_text"))

    val df = (1 to 50).map(i => ((i % 10).toDouble, (i % 7).toDouble)).toDF("a", "b")
    t.train("pca_proj", "decomposition", df, None, "pca",
      hyperparams = Map("n_components" -> 2))
    val dec = t.registry.decompose("pca_proj", df.limit(3))
    assert(dec.select("pca_arr").as[Seq[Double]].head().size == 2)
  }
}
