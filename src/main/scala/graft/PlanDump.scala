package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for catalog queries to files — the
  * optimization rounds' before/after plan evidence
  * (plans/rNN/<query>_<suffix>.txt). Bench-only imperative legs (s4_*,
  * the v*c/v*d serving loops) have no single plan and are skipped.
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_PLAN_OUT (out
  * dir, default plans/out), SPARK_GRAFT_PLAN_SUFFIX (default "before"),
  * SPARK_GRAFT_PLAN_QUERIES (comma list; default = every catalog query).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_OUT", "plans/out")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val only = sys.env.get("SPARK_GRAFT_PLAN_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val qs = SparkEntry.queries
    val names = qs.keys.toSeq.sorted.filter(n => only.forall(_.contains(n)))
    names.foreach { name =>
      try {
        val df = qs(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plandump] wrote $name")
      } catch { case e: Throwable =>
        println(s"[plandump] $name SKIPPED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
