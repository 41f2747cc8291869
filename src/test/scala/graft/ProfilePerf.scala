package graft

import org.apache.spark.sql.functions._

/** Ad-hoc step timer for the slow bench queries (m1, s4, d1) at sf0.1.
  * Not a test — run with `Test/runMain graft.ProfilePerf`.
  */
object ProfilePerf {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROFILE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // ---- m1 decomposition
    val li = time("m1 load") {
      val d = graft.Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
      d.count(); d
    }
    val reg = java.nio.file.Files.createTempDirectory("graft_prof_reg_").toString
    val tr = new graft.ml.Trainer(spark, reg)
    val res = time("m1 train total") {
      tr.train("q_lin", "regression",
        li.select(col("l_quantity"), col("l_extendedprice")), Some("l_extendedprice"),
        "linear", testSize = 0.0)
    }
    time("m1 predict+sort+limit") {
      tr.registry.predict("q_lin", li)
        .select(col("l_orderkey"), col("l_linenumber"), round(col("prediction"), 3).as("pred"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(100).count()
    }
    // second run: JIT-warm
    time("m1 train total (warm)") {
      tr.train("q_lin2", "regression",
        li.select(col("l_quantity"), col("l_extendedprice")), Some("l_extendedprice"),
        "linear", testSize = 0.0)
    }
    time("m1 predict (warm)") {
      tr.registry.predict("q_lin2", li)
        .select(col("l_orderkey"), col("l_linenumber"), round(col("prediction"), 3).as("pred"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(100).count()
    }

    // ---- m1 train internals (warm)
    {
      val rel = li.select(col("l_quantity"), col("l_extendedprice"))
      val plans = Seq(graft.ml.ColumnPlan("l_quantity", impute = "zero"))
      val fitted = time("m1i preproc fit") { graft.ml.Preprocessor.fit(rel, plans, "l_extendedprice") }
      val assembler = new org.apache.spark.ml.feature.VectorAssembler()
        .setInputCols(graft.ml.Preprocessor.featureNames(fitted).toArray).setOutputCol("features")
      val prep = assembler.transform(graft.ml.Preprocessor.transform(rel, fitted))
      val cached = time("m1i cache+count") { val c = prep.cache(); c.count(); c }
      val model = time("m1i lr fit") {
        new org.apache.spark.ml.regression.LinearRegression()
          .setSolver("normal").setRegParam(0.0)
          .setLabelCol("l_extendedprice").setFeaturesCol("features").fit(cached)
      }
      val pred = model.transform(cached)
      time("m1i metrics") { graft.ml.Metrics.regression(pred, "l_extendedprice", "prediction") }
      time("m1i mllib save") { model.write.overwrite().save("/tmp/graft_prof_model") }
      time("m1i fit nocache") {
        new org.apache.spark.ml.regression.LinearRegression()
          .setSolver("normal").setRegParam(0.0)
          .setLabelCol("l_extendedprice").setFeaturesCol("features").fit(prep)
      }
      cached.unpersist()
    }

    // ---- s4 decomposition
    val wh = java.nio.file.Files.createTempDirectory("graft_prof_wh_").toString
    val c = new graft.store.Collection(spark, "docs", wh)
    time("s4 upsert") {
      c.upsertDocuments(
        graft.Tables.load(spark, dir, "documents").select(
          to_json(struct(col("doc_id").as("id"), col("text"), col("lang"),
            col("source"), col("n_chars"))).as("document")))
    }
    val p = graft.store.Pipeline("p", Seq(graft.store.PipelineField(
      "text", splitter = Some((200, 20)),
      semanticSearch = Some(graft.functions.HashEmbedder(64)), fullTextSearch = true)))
    time("s4 sync") { c.syncPipeline(p) }
    time("s4 vectorSearch") {
      c.vectorSearch(p,
        Seq(graft.store.VectorSearchField("text", "spark query table join")), limit = 10).count()
    }

    // ---- d3 structure
    {
      val docs = graft.Tables.load(spark, dir, "documents")
      val pairs = time("d3 lsh pairs (warm-ish)") {
        val p = graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text", 0.9)
        p.count()
      }
      println(s"PROFILE d3 id-pairs = $pairs")
      val groups = time("d3 groups count") {
        docs.select(org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.array_sort(org.apache.spark.sql.functions.array_distinct(
            org.apache.spark.sql.functions.split(trim(lower(col("text"))), "\\s+")))).as("g"))
          .distinct().count()
      }
      println(s"PROFILE d3 unique groups = $groups")
      time("d3 nearDupGroups") {
        graft.operators.Dedup.nearDupGroups(docs, "doc_id", "text", 0.9).count()
      }
      time("d3 nearDupGroups (warm)") {
        graft.operators.Dedup.nearDupGroups(docs, "doc_id", "text", 0.9).count()
      }
    }

    // ---- d1
    time("d1 lsh pairs") {
      graft.operators.Dedup.minhashLshPairs(
        graft.Tables.load(spark, dir, "documents"), "doc_id", "text", 0.9).count()
    }
    time("d1 lsh pairs (warm)") {
      graft.operators.Dedup.minhashLshPairs(
        graft.Tables.load(spark, dir, "documents"), "doc_id", "text", 0.9).count()
    }
    spark.stop()
  }
}
