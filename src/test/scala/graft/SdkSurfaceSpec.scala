package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml._
import graft.store._

class SdkSurfaceSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("grid search picks the best regularization and records search results") {
    // y = 4x with noise-free data: alpha=0 (ridge->OLS) must beat alpha=100
    val df = (1 to 80).map(i => (i.toDouble, 4.0 * i)).toDF("x", "y")
    val t = new Trainer(spark, Files.createTempDirectory("graft_gs_").toString)
    val res = t.trainWithSearch("gs", "regression", df, Some("y"), "ridge",
      searchParams = Map("alpha" -> Seq(0.001, 1000.0)), cv = 3)
    assert(res.metrics("r2") > 0.999) // best combo (small alpha) won
    val sr = t.registry.searchResults(res.modelId)
    assert(sr.contains("mean_test_score") && sr.contains("0.001") && sr.contains("1000"))
  }

  test("train_joint trains one model per target") {
    val df = (1 to 60).map(i => (i.toDouble, 2.0 * i, -1.0 * i)).toDF("x", "y1", "y2")
    val t = new Trainer(spark, Files.createTempDirectory("graft_tj_").toString)
    val rs = t.trainJoint("tj", "regression", df, Seq("y1", "y2"))
    assert(rs.map(_.projectName) == Seq("tj:y1", "tj:y2"))
    val p1 = t.registry.predict("tj:y1", Seq((10.0, 0.0, 0.0)).toDF("x", "y1", "y2"))
      .select("prediction").as[Double].head()
    val p2 = t.registry.predict("tj:y2", Seq((10.0, 0.0, 0.0)).toDF("x", "y1", "y2"))
      .select("prediction").as[Double].head()
    assert(math.abs(p1 - 20.0) < 1e-6 && math.abs(p2 + 10.0) < 1e-6)
  }

  test("predict_proba and predict_batch surfaces") {
    val df = (1 to 100).map(i => (i.toDouble, if (i > 50) 1.0 else 0.0)).toDF("x", "label")
    val t = new Trainer(spark, Files.createTempDirectory("graft_pb_").toString)
    t.train("pb", "classification", df, Some("label"), "linear")
    val proba = t.registry.predictProba("pb", Seq((80.0, 0.0)).toDF("x", "label"))
      .select("proba").as[Seq[Double]].head()
    assert(proba.length == 2 && math.abs(proba.sum - 1.0) < 1e-9)
    assert(proba(1) > 0.9) // x=80 is deep in class 1
    val batch = t.registry.predictBatch("pb", Seq(10.0, 90.0), numFeatures = 1)
    assert(batch == Seq(0.0, 1.0))
    // by-model-id proba overload answers identically for the deployed model
    val dep = t.registry.deployments.orderBy(desc("seq"))
      .select("model_id").as[Long].head()
    val probaById = t.registry.predictProbaWithModel(dep,
        Seq((80.0, 0.0)).toDF("x", "label"))
      .select("proba").as[Seq[Double]].head()
    assert(probaById == proba)
  }

  test("registry dump/load round-trips model rows") {
    val df = (1 to 40).map(i => (i.toDouble, 2.0 * i)).toDF("x", "y")
    val dir = Files.createTempDirectory("graft_dump_").toString
    val t = new Trainer(spark, dir)
    t.train("dmp", "regression", df, Some("y"), "linear")
    t.registry.dumpAll(s"$dir/dump")
    val (m, d) = t.registry.loadAll(s"$dir/dump")
    assert(m.count() == 1 && d.count() == 1)
    assert(m.select("project").as[String].head() == "dmp")
  }

  test("upsertDirectory ingests files as documents") {
    val dir = Files.createTempDirectory("graft_files_")
    Files.writeString(dir.resolve("a.txt"), "alpha file contents here")
    Files.writeString(dir.resolve("b.txt"), "beta file contents here")
    val c = new Collection(spark, "files", Files.createTempDirectory("graft_fwh_").toString)
    c.upsertDirectory(dir.toString)
    assert(c.documents.count() == 2)
    val texts = c.documents
      .select(get_json_object(col("document"), "$.text")).as[String].collect()
    assert(texts.exists(_.contains("alpha")) && texts.exists(_.contains("beta")))
  }

  test("search logging writes searches/results and accepts events") {
    val c = new Collection(spark, "log", Files.createTempDirectory("graft_lwh_").toString)
    c.upsertDocuments((0 until 6).map(i =>
      s"""{"id": $i, "body": "doc $i spark engine data"}""").toDF("document"))
    val p = Pipeline("p", Seq(PipelineField("body", splitter = Some((64, 8)),
      fullTextSearch = true)))
    c.syncPipeline(p)
    val (sid, res) = c.searchAndLog(p,
      semantic = Seq(VectorSearchField("body", "spark engine")), limit = 3)
    assert(res.count() == 3)
    assert(c.searches.where(col("search_id") === sid).count() == 1)
    val ranked = c.searchResults.where(col("search_id") === sid)
    assert(ranked.count() == 3)
    assert(ranked.select(max("rank")).as[Int].head() == 3)
    val docId = ranked.where(col("rank") === 1).select("document_id").as[String].head()
    c.addSearchEvent(sid, docId, """{"clicked": true}""")
    assert(c.searchEvents.where(col("search_id") === sid).count() == 1)
  }

  test("query builder facade and OpenSourceAI chat") {
    val c = new Collection(spark, "qb", Files.createTempDirectory("graft_qwh_").toString)
    c.upsertDocuments((0 until 5).map(i =>
      s"""{"id": $i, "body": "text $i about spark"}""").toDF("document"))
    val p = Pipeline("p", Seq(PipelineField("body", splitter = Some((64, 8)))))
    c.syncPipeline(p)
    val res = c.query().vectorRecall("spark text", p).limit(2)
      .filter("""{"id": {"$gte": 1}}""").fetchAll()
    assert(res.count() == 2)

    val chat = OpenSourceAI.chatCompletionsCreate("any-model",
      Seq(("system", "you are helpful"), ("user", "say something about spark")))
    assert(chat.contains("\"choices\"") && chat.contains("assistant"))
    val toks = OpenSourceAI.chatCompletionsCreateStream("any-model",
      Seq(("user", "hello"))).toList
    assert(toks.nonEmpty)
  }
}
