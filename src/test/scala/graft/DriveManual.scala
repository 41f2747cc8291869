package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual end-to-end drive of the library's public surface against the real
  * testdata parquet — used for runtime verification outside ScalaTest.
  * Run: sbt "Test/runMain graft.DriveManual"
  */
object DriveManual {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.functions.VecFunctions._

    // Brute-force KNN over real embeddings: top-5 similar to vec_id 0
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where($"vec_id" === 0).select($"embedding").as[Array[Float]].head()
    val knn = emb.select($"vec_id",
        cosineSimilarity($"embedding", floatVec(q.toIndexedSeq)).as("score"))
      .orderBy($"score".desc).limit(5)
    knn.show(false)
    knn.explain("formatted")

    // SQL surface
    registerAll(spark)
    emb.createOrReplaceTempView("emb")
    spark.sql("SELECT round(vec_norm_l2(embedding),4) n2 FROM emb ORDER BY vec_id LIMIT 3").show()
    spark.sql("SELECT round(aggregate(vec_sum(embedding), 0D, (a,x) -> a + x),4) total FROM emb").show()

    // probe: length mismatch must fail loudly, not return garbage
    try {
      emb.select(cosineSimilarity($"embedding", floatVec(Seq(1f, 2f)))).head()
      println("PROBE-MISMATCH: no error (BAD)")
    } catch {
      case ex: Throwable =>
        println("PROBE-MISMATCH error: " + ex.getMessage.linesIterator.toSeq.take(3).mkString(" | "))
    }

    // probe: null vector row → null result, no crash
    val withNull = Seq((1L, Array(1f, 2f)), (2L, null.asInstanceOf[Array[Float]])).toDF("id", "v")
    withNull.select($"id", cosineSimilarity($"v", floatVec(Seq(1f, 2f))).as("c")).show()
    spark.stop()
  }
}
