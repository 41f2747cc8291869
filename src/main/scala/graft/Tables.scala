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
      // the driver has shipped events.ts as TIMESTAMP(NANOS) in some
      // rounds and timestamp[us] in others — normalize either to a plain
      // session-TZ TIMESTAMP (sessions here run UTC), adapting by the type
      // actually read rather than assuming one writer
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => // nanos read as long
          df.withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
        case _: org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every testdata table as a temp view (for spark.sql paths). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
