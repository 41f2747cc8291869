package graft

import org.apache.spark.sql.SparkSession

/** Drives the real `spark.sql.extensions` static-conf path in a forked JVM
  * (sbt forks runMain): builds a fresh SparkContext with GraftExtensions
  * and checks SQL resolution. Run: sbt "Test/runMain graft.ExtCheck"
  */
object ExtCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-check")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r = spark.sql(
      """SELECT cosine_similarity(array(1.0F,0.0F), array(1.0F,0.0F)) c,
        |       vec_norm_l2(array(3.0D,4.0D)) n""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9, "cosine via extensions")
    assert(math.abs(r.getDouble(1) - 5.0) < 1e-9, "norm via extensions")
    println("ExtCheck OK: extensions-injected functions resolve in SQL")
    spark.stop()
  }
}
