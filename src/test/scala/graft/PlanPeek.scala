package graft

/** One-off: print the s2 executed plan to inspect pushdown after the
  * filter-compiler double-cast change. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.session
    val df = SparkEntry.queries("s2_filter_compiler")(spark, TestSpark.sf0001)
    println("=== EXECUTED PLAN ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
