package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ml._

/** `pgml.load_dataset` built-ins (api.rs:561-587): named fixtures load with
  * the reference schemas, register in the catalog, honor limit, and feed
  * the train lifecycle end-to-end.
  */
class DatasetsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("all six built-ins load with reference schemas and row counts") {
    val expect = Map(
      "iris" -> (150L, Seq("sepal_length", "sepal_width", "petal_length", "petal_width", "target")),
      "diabetes" -> (442L, Seq("age", "sex", "bmi", "bp", "s1", "s2", "s3", "s4", "s5", "s6", "target")),
      "wine" -> (178L, Seq("alcohol", "malic_acid", "ash", "alcalinity_of_ash", "magnesium",
        "total_phenols", "flavanoids", "nonflavanoid_phenols", "proanthocyanins",
        "hue", "color_intensity", "od280/od315_of_diluted_wines", "proline", "target")),
      "linnerud" -> (20L, Seq("chins", "situps", "jumps", "weight", "waist", "pulse")),
      "digits" -> (1797L, Seq("image", "target")),
      "breast_cancer" -> (569L, Nil)) // 31 cols, spot-checked below
    for ((name, (rows, cols)) <- expect) {
      val (table, n) = Datasets.loadDataset(spark, name)
      assert(table == s"pgml_$name" && n == rows, s"$name: $table/$n")
      val df = spark.table(table)
      if (cols.nonEmpty) assert(df.columns.toSeq == cols, s"$name columns: ${df.columns.toSeq}")
    }
    val bc = spark.table("pgml_breast_cancer")
    assert(bc.columns.length == 31 && bc.columns.contains("mean radius")
      && bc.columns.contains("worst fractal dimension") && bc.columns.contains("malignant"))
    // digits images are 8x8 in the 0..16 pixel range
    val img = spark.table("pgml_digits").select("image")
      .as[Seq[Seq[Short]]].head()
    assert(img.length == 8 && img.forall(r => r.length == 8 && r.forall(p => p >= 0 && p <= 16)))
  }

  test("limit and determinism") {
    val (_, n) = Datasets.loadDataset(spark, "iris", limit = Some(30))
    assert(n == 30)
    val a = Datasets.frame(spark, "wine").collect()
    val b = Datasets.frame(spark, "wine").collect()
    assert(a.sameElements(b))
    intercept[IllegalArgumentException] { Datasets.frame(spark, "nope") }
  }

  test("train on loaded datasets end-to-end: iris classification, diabetes regression") {
    val t = new Trainer(spark, Files.createTempDirectory("graft_ds_").toString)
    val iris = Datasets.frame(spark, "iris")
      .withColumn("target", org.apache.spark.sql.functions.col("target").cast("double"))
    val rc = t.train("ds_iris", "classification", iris, Some("target"), "linear")
    assert(rc.deployed && rc.metrics("f1") > 0.9, s"iris metrics: ${rc.metrics}")
    val dia = Datasets.frame(spark, "diabetes")
    val rr = t.train("ds_diabetes", "regression", dia, Some("target"), "linear")
    assert(rr.deployed && rr.metrics("r2") > 0.8, s"diabetes metrics: ${rr.metrics}")
  }
}
