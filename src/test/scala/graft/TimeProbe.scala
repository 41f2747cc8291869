package graft

import org.apache.spark.sql.functions._

/** One-off: stage-level timing for the slow bench queries (m1, s4). */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.session
    val dir = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm JIT + parquet footer cache with one full m1 run
    time("m1 cold full") {
      SparkEntry.queries("m1_linear_regression")(spark, dir).collect()
    }
    // steady-state decomposition
    val li = spark.read.parquet(s"$dir/lineitem.parquet").select(
      col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
    val reg = java.nio.file.Files.createTempDirectory("graft_probe_reg_").toString
    val tr = new graft.ml.Trainer(spark, reg)
    val res = time("m1 train") {
      tr.train("probe_lin", "regression",
        li.select(col("l_quantity"), col("l_extendedprice")), Some("l_extendedprice"),
        "linear", testSize = 0.0)
    }
    time("m1 predict+top100") {
      tr.registry.predict("probe_lin", li)
        .select(col("l_orderkey"), col("l_linenumber"), round(col("prediction"), 3).as("pred"))
        .orderBy(col("l_orderkey"), col("l_linenumber")).limit(100).collect()
    }
    time("m1 full warm") {
      SparkEntry.queries("m1_linear_regression")(spark, dir).collect()
    }
    time("s4 warm1") { SparkEntry.queries("s4_vector_search_e2e")(spark, dir).collect() }
    time("s4 warm2") { SparkEntry.queries("s4_vector_search_e2e")(spark, dir).collect() }
    time("d3 warm") { SparkEntry.queries("d3_dedup_groups")(spark, dir).collect() }
    time("d1 warm") { SparkEntry.queries("d1_minhash_lsh_pairs")(spark, dir).collect() }
    spark.stop()
  }
}
