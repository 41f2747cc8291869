package graft.ml

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.functions.TextKernels

/** `pgml.load_dataset(source, limit)` built-ins (pgml-extension/src/
  * api.rs:561-587; loaders orm/dataset.rs:206-718): the six sklearn fixture
  * datasets, loaded by name into the session catalog as `pgml_<name>` so
  * the train/tune flows can snapshot them like any relation.
  *
  * Schemas mirror the reference tables column-for-column. Row CONTENT is a
  * deterministic synthetic fixture (seeded splitmix streams with
  * class-dependent structure): the reference embeds the gzipped sklearn
  * CSVs in its binary, which aren't available offline — and every consumer
  * of this surface (snapshot → train → predict e2e) needs shape, types,
  * and a learnable signal, not the 1936 measurements. Same name + limit ⇒
  * byte-identical frame, every session.
  */
object Datasets {

  val names: Seq[String] =
    Seq("breast_cancer", "diabetes", "digits", "iris", "linnerud", "wine")

  /** Load a named dataset, register it as temp view `pgml_<name>`, return
    * (table_name, rows) — the reference's TableIterator contract. */
  def loadDataset(spark: SparkSession, source: String,
      limit: Option[Int] = None): (String, Long) = {
    val df = frame(spark, source, limit)
    val table = s"pgml_$source"
    df.createOrReplaceTempView(table)
    (table, df.count())
  }

  /** The dataset as a DataFrame without catalog registration. */
  def frame(spark: SparkSession, source: String, limit: Option[Int] = None): DataFrame = {
    val full = source match {
      case "iris" => iris(spark)
      case "diabetes" => diabetes(spark)
      case "wine" => wine(spark)
      case "breast_cancer" => breastCancer(spark)
      case "linnerud" => linnerud(spark)
      case "digits" => digits(spark)
      case other => throw new IllegalArgumentException(
        s"unknown dataset $other; built-ins: ${names.mkString(", ")}")
    }
    limit.map(full.limit).getOrElse(full)
  }

  // deterministic uniform in [0,1) from (seed, row, column) — splitmix-style
  private def u(seed: Long, i: Long, j: Long): Double = {
    val h = TextKernels.mix(TextKernels.mix(seed, i), j)
    ((h >>> 11).toDouble / (1L << 53).toDouble)
  }
  // sum of 4 uniforms, recentred: cheap deterministic approximately-normal
  private def g(seed: Long, i: Long, j: Long): Double =
    (0 until 4).map(k => u(seed, i, j * 64 + k)).sum - 2.0

  private def floatField(n: String) = StructField(n, FloatType, nullable = false)

  private def build(spark: SparkSession, schema: StructType, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.length / 512)), schema)

  /** 150 rows, 3 separated classes (orm/dataset.rs:511-566 schema). */
  private def iris(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq("sepal_length", "sepal_width", "petal_length", "petal_width")
      .map(floatField) :+ StructField("target", IntegerType, nullable = false))
    // class means roughly shaped like the real species clusters
    val means = Array(
      Array(5.0, 3.4, 1.5, 0.25), Array(5.9, 2.8, 4.3, 1.3), Array(6.6, 3.0, 5.5, 2.0))
    val rows = (0 until 150).map { i =>
      val c = i % 3
      val vs = (0 until 4).map(j => (means(c)(j) + 0.25 * g(1L, i, j)).toFloat)
      Row(vs(0), vs(1), vs(2), vs(3), c)
    }
    build(spark, schema, rows)
  }

  /** 442 rows, standardized features, linear target (dataset.rs:400-464). */
  private def diabetes(spark: SparkSession): DataFrame = {
    val feats = Seq("age", "sex", "bmi", "bp", "s1", "s2", "s3", "s4", "s5", "s6")
    val schema = StructType(feats.map(floatField) :+ floatField("target"))
    val coef = Array(30.0, -12.0, 55.0, 35.0, -20.0, 10.0, -18.0, 14.0, 48.0, 6.0)
    val rows = (0 until 442).map { i =>
      val x = (0 until 10).map(j => 0.05 * g(2L, i, j))
      val y = 152.0 + x.zip(coef).map { case (a, b) => a * b }.sum + 2.0 * g(2L, i, 99)
      Row((x.map(_.toFloat) :+ y.toFloat): _*)
    }
    build(spark, schema, rows)
  }

  /** 178 rows, 3 classes, 13 features (dataset.rs:637-718). */
  private def wine(spark: SparkSession): DataFrame = {
    val feats = Seq("alcohol", "malic_acid", "ash", "alcalinity_of_ash", "magnesium",
      "total_phenols", "flavanoids", "nonflavanoid_phenols", "proanthocyanins",
      "hue", "color_intensity", "od280/od315_of_diluted_wines", "proline")
    val schema = StructType(feats.map(floatField) :+
      StructField("target", IntegerType, nullable = false))
    val base = Array(13.0, 2.3, 2.4, 19.0, 100.0, 2.3, 2.0, 0.36, 1.6, 0.96, 5.0, 2.6, 750.0)
    val rows = (0 until 178).map { i =>
      val c = i % 3
      val vs = base.indices.map { j =>
        (base(j) * (1.0 + 0.12 * c) + 0.05 * base(j) * g(3L, i, j)).toFloat
      }
      Row((vs :+ c): _*)
    }
    build(spark, schema, rows)
  }

  /** 569 rows, 30 features, boolean `malignant` label (dataset.rs:206-398;
    * the reference keeps the sklearn column names, spaces included). */
  private def breastCancer(spark: SparkSession): DataFrame = {
    val stats = Seq("radius", "texture", "perimeter", "area", "smoothness",
      "compactness", "concavity", "concave points", "symmetry", "fractal dimension")
    val feats = stats.map("mean " + _) ++ stats.map(_ + " error") ++ stats.map("worst " + _)
    val schema = StructType(feats.map(floatField) :+
      StructField("malignant", BooleanType, nullable = false))
    val rows = (0 until 569).map { i =>
      val malignant = i % 5 < 2 // ~40% positive, deterministic
      val shift = if (malignant) 1.0 else 0.0
      val vs = (0 until 30).map(j => (10.0 + 2.0 * shift + g(4L, i, j)).toFloat)
      Row((vs :+ malignant): _*)
    }
    build(spark, schema, rows)
  }

  /** 20 rows, 3 exercise + 3 physiological columns (dataset.rs:569-635). */
  private def linnerud(spark: SparkSession): DataFrame = {
    val schema = StructType(
      Seq("chins", "situps", "jumps", "weight", "waist", "pulse").map(floatField))
    val rows = (0 until 20).map { i =>
      val fit = u(5L, i, 0) // latent fitness drives both blocks
      Row(
        (2 + 12 * fit + g(5L, i, 1)).toFloat,
        (80 + 120 * fit + 5 * g(5L, i, 2)).toFloat,
        (30 + 70 * fit + 5 * g(5L, i, 3)).toFloat,
        (210 - 40 * fit + 3 * g(5L, i, 4)).toFloat,
        (38 - 4 * fit + g(5L, i, 5)).toFloat,
        (62 - 8 * fit + 2 * g(5L, i, 6)).toFloat)
    }
    build(spark, schema, rows)
  }

  /** 1797 rows, 8×8 smallint image + target (dataset.rs:466-509:
    * `image SMALLINT[][], target SMALLINT`). Each digit's image is a
    * deterministic per-class glyph plus noise, so classifiers can learn. */
  private def digits(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("image", ArrayType(ArrayType(ShortType, containsNull = false),
        containsNull = false), nullable = false),
      StructField("target", ShortType, nullable = false)))
    val rows = (0 until 1797).map { i =>
      val c = i % 10
      val img = (0 until 8).map { r =>
        (0 until 8).map { cl =>
          // class-dependent banding + noise, clipped to the 0..16 pixel range
          val base = if ((r * 8 + cl) % 10 == c) 12.0 else 4.0
          math.max(0, math.min(16, (base + 2.0 * g(6L, i, r * 8 + cl)).round.toInt)).toShort
        }
      }
      Row(img, c.toShort)
    }
    build(spark, schema, rows)
  }
}
