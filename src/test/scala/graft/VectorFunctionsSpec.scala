package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VecFunctions._

/** Exact-value fixtures for the vector surface, mirroring the reference's
  * `#[pg_test]` assertions (pgml-extension/src/vectors.rs:902-1222):
  * f32 tolerance 3e-7-ish, known closed-form results on small vectors.
  */
class VectorFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private val eps = 1e-6

  private def df = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)),
    (3L, Array(-1.0f, 2.0f, -3.0f), Array(2.0f, -4.0f, 6.0f))
  ).toDF("id", "a", "b")

  test("dot product matches BLAS sdot semantics") {
    val got = df.orderBy("id").select(vecDot($"a", $"b")).as[Double].collect()
    assert(math.abs(got(0) - 32.0) < eps)          // 4+10+18
    assert(math.abs(got(1) - 0.0) < eps)
    assert(math.abs(got(2) - (-2 - 8 - 18)) < eps) // -28
  }

  test("cosine similarity: identical direction = 1, opposite = -1, zero vec = 0") {
    val got = df.orderBy("id").select(cosineSimilarity($"a", $"b")).as[Double].collect()
    val expected0 = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(got(0) - expected0) < eps)
    assert(got(1) == 0.0) // zero-vector guard
    assert(math.abs(got(2) - (-1.0)) < eps) // b = -2a → cos = -1
  }

  test("norms l0/l1/l2/max") {
    val r = df.where($"id" === 3)
      .select(vecNormL0($"a"), vecNormL1($"a"), vecNormL2($"a"), vecNormMax($"a"))
      .as[(Double, Double, Double, Double)].head()
    assert(r._1 == 3.0)
    assert(math.abs(r._2 - 6.0) < eps)
    assert(math.abs(r._3 - math.sqrt(14.0)) < eps)
    assert(math.abs(r._4 - 3.0) < eps)
    val z = df.where($"id" === 2).select(vecNormL0($"a")).as[Double].head()
    assert(z == 0.0)
  }

  test("distances l1/l2") {
    val r = df.where($"id" === 1)
      .select(vecDistanceL1($"a", $"b"), vecDistanceL2($"a", $"b"))
      .as[(Double, Double)].head()
    assert(math.abs(r._1 - 9.0) < eps)
    assert(math.abs(r._2 - math.sqrt(27.0)) < eps)
  }

  test("normalize l2 yields unit vector; zero vector stays zero") {
    val r = df.where($"id" === 1).select(vecNormalizeL2($"a")).as[Array[Float]].head()
    val n = math.sqrt(r.map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-5)
    assert(math.abs(r(0) - (1.0 / math.sqrt(14.0))) < 1e-5)
    val z = df.where($"id" === 2).select(vecNormalizeL2($"a")).as[Array[Float]].head()
    assert(z.forall(_ == 0.0f))
  }

  test("elementwise vector/scalar and vector/vector arithmetic") {
    val r = df.where($"id" === 1)
      .select(
        vecAddScalar($"a", lit(1.0f)).as("as"),
        vecMulScalar($"a", lit(2.0f)).as("ms"),
        vecAdd($"a", $"b").as("av"),
        vecMul($"a", $"b").as("mv"))
      .as[(Array[Float], Array[Float], Array[Float], Array[Float])].head()
    assert(r._1.toSeq == Seq(2.0f, 3.0f, 4.0f))
    assert(r._2.toSeq == Seq(2.0f, 4.0f, 6.0f))
    assert(r._3.toSeq == Seq(5.0f, 7.0f, 9.0f))
    assert(r._4.toSeq == Seq(4.0f, 10.0f, 18.0f))
  }

  test("vector aggregates: sum/min/max/maxAbs elementwise with partial merge") {
    // force multiple partitions so merge() runs
    val vdf = spark.range(0, 100, 1, 8)
      .select($"id", array($"id".cast("float"), (-$"id").cast("float")).as("v"))
    val r = vdf.agg(
      vecSumAgg($"v").as("s"), vecMinAgg($"v").as("mn"),
      vecMaxAgg($"v").as("mx"), vecMaxAbsAgg($"v").as("ma"))
      .as[(Array[Double], Array[Double], Array[Double], Array[Double])].head()
    assert(r._1.toSeq == Seq(4950.0, -4950.0))
    assert(r._2.toSeq == Seq(0.0, -99.0))
    assert(r._3.toSeq == Seq(99.0, 0.0))
    assert(r._4.toSeq == Seq(99.0, 99.0))
  }

  test("grouped vector aggregate + avg idiom") {
    val vdf = Seq(
      ("a", Array(1.0f, 2.0f)), ("a", Array(3.0f, 4.0f)), ("b", Array(10.0f, 20.0f))
    ).toDF("k", "v")
    val r = vdf.groupBy($"k").agg(vecAvgAgg($"v").as("avg"))
      .orderBy($"k").as[(String, Array[Double])].collect()
    assert(r(0)._2.toSeq == Seq(2.0, 3.0))
    assert(r(1)._2.toSeq == Seq(10.0, 20.0))
  }

  test("SQL registration works end-to-end") {
    registerAll(spark)
    df.createOrReplaceTempView("vectors_test")
    val r = spark.sql(
      """SELECT vec_dot(a, b) d, cosine_similarity(a, b) c, vec_norm_l2(a) n
        |FROM vectors_test WHERE id = 1""".stripMargin)
      .as[(Double, Double, Double)].head()
    assert(math.abs(r._1 - 32.0) < eps)
    assert(math.abs(r._3 - math.sqrt(14.0)) < eps)
    val s = spark.sql("SELECT vec_sum(a) FROM vectors_test").as[Array[Double]].head()
    assert(s.toSeq == Seq(0.0, 4.0, 0.0))
  }
}
