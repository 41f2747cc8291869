package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loader for the driver-provided testdata star schema. */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.parquet carries TIMESTAMP(NANOS) which Spark refuses by
      // default; read nanos as long and convert (truncate) to micros.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every testdata table as a temp view (for spark.sql paths). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
