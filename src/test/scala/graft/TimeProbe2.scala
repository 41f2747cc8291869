package graft

import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.LinearRegression
import graft.ml._

/** One-off: per-stage timing inside the m1 train path. */
object TimeProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.session
    val dir = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_quantity"), col("l_extendedprice"))
    li.count() // warm footer cache
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val plans = Seq(ColumnPlan("l_quantity", impute = "zero"))
      val fitted = time("preproc.fit")(Preprocessor.fit(li, plans, "l_extendedprice"))
      val assembler = new VectorAssembler()
        .setInputCols(Preprocessor.featureNames(fitted).toArray).setOutputCol("features")
      val prep = assembler.transform(Preprocessor.transform(li, fitted))
      val model = time("wls fit") {
        new LinearRegression().setSolver("normal").setRegParam(0.0)
          .setLabelCol("l_extendedprice").setFeaturesCol("features").fit(prep)
      }
      val pred = time("transform") (model.transform(prep))
      val mets = time("metrics") (Metrics.regression(pred, "l_extendedprice", "prediction"))
      val reg = java.nio.file.Files.createTempDirectory("graft_probe2_").toString
      val registry = new Registry(spark, reg)
      val id = time("saveModel") {
        registry.saveModel("p", "regression", "linear", Map.empty, mets, model,
          fitted, Preprocessor.featureNames(fitted))
      }
      time("maybeDeploy") (registry.maybeDeploy("p", "regression", id, mets))
    }
    spark.stop()
  }
}
