package graft

import org.apache.spark.sql.SparkSession

/** Mirrors the driver's t1 smoke: SparkEntry.entry on sf0.001, rows > 0.
  * Run: sbt "Test/runMain graft.EntrySmoke"
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    assert(n > 0, "entry returned no rows")
    println(s"EntrySmoke OK: entry() returned $n rows")
    spark.stop()
  }
}
