package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection helper: prints formatted plans for scale-critical
  * queries. Run: sbt "Test/runMain graft.ExplainCheck"
  */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("q2_revenue_by_nation", "q3_filter_pushdown", "v1_knn_cosine")) {
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
