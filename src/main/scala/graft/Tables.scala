package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loader for the driver-provided testdata star schema. */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  /** Tiny-input scan spread (optimization guide §2.5 "input skew", §1.2
    * step 1): the testdata tables arrive as ONE small parquet file with a
    * single row group, so every scan yields ONE task and the scan-fused
    * text kernels (tokenize, gram hashing, LM probes, BPE) serialize on
    * one core of the whole machine. A row-group-less file cannot be split
    * by `maxPartitionBytes`, so the only way to engage the other cores is
    * an explicit round-robin exchange of the (tiny) corpus right above
    * the scan. Strictly size-gated: it fires only when the whole table is
    * under `graft.spread.maxBytes` (default 64 MB) AND the scan would
    * yield fewer splits than the session's parallelism — at production
    * scale the corpus is thousands of splits and this is a no-op, so the
    * 100 TB "the corpus never re-shuffles" contracts hold exactly where
    * they matter. Round-robin (not keyed) and deterministic: Spark's
    * sort-before-repartition pins the row placement, and every operator
    * downstream is partition-agnostic by construction (the oracle gate).
    * Only `documents` is spread: its per-row work dominates its scan; the
    * agg-light TPC-H tables would pay a full-row shuffle for nothing. */
  private val sizeCache =
    scala.collection.concurrent.TrieMap.empty[String, Long]
  private def pathBytes(path: String): Long =
    sizeCache.getOrElseUpdate(path, {
      val f = new java.io.File(path)
      if (f.isFile) f.length
      else Option(f.listFiles).map(_.filter(_.isFile).map(_.length).sum)
        .getOrElse(0L)
    })
  private val spreadTables: Set[String] =
    sys.props.getOrElse("graft.spread.tables", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
  private val spreadMaxBytes: Long =
    sys.props.get("graft.spread.maxBytes").map(_.toLong).getOrElse(64L << 20)
  private def spreadIfTiny(spark: SparkSession, df: DataFrame, path: String,
      name: String, force: Boolean = false): DataFrame = {
    if (!force && !spreadTables.contains(name)) return df
    val cores = spark.sparkContext.defaultParallelism
    val bytes = pathBytes(path)
    val maxSplit = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
      .map(v => org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v))
      .getOrElse(128L << 20)
    val estSplits = (bytes / math.max(1L, maxSplit)) + 1
    if (bytes > 0 && bytes <= spreadMaxBytes && estSplits < cores)
      df.repartition(cores)
    else df
  }

  /** Prepared-plan memo: `spark.read.parquet` costs a driver-side listing
    * + footer/schema resolve on EVERY call (~40-200 ms), and a bench pass
    * makes ~100 load calls. The memoized value is a LAZY logical plan — a
    * prepared statement over the path, the reference's own serving shape —
    * so every execution still scans the parquet input; nothing about the
    * data is cached. Keyed per session identity (plans are session-bound)
    * and per (dir, table). */
  // weak session keys (identity equality — SparkSession defines none), so
  // a dead session's plans are collectable and a fresh session can never
  // alias a stale entry the way a recycled identity hash could
  private val planCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, String), DataFrame]]())

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = planCache.synchronized {
      var m = planCache.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
        planCache.put(spark, m)
      }
      m
    }
    perSession.getOrElseUpdate((dir, name), loadFresh(spark, dir, name))
  }

  /** [[load]] + unconditional tiny-input spread (see [[spreadIfTiny]]) —
    * the opt-in loader for query paths whose per-row scan-stage work
    * (tokenize → gram-hash → LM/classifier probes) measurably dominates
    * the scan: a single-row-group input otherwise serializes that work on
    * one core. Size-gated exactly like spreadIfTiny, so at production
    * input sizes it degenerates to [[load]]. Disable for A/B with
    * -Dgraft.spread.maxBytes=0. */
  def loadSpread(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = planCache.synchronized {
      var m = planCache.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
        planCache.put(spark, m)
      }
      m
    }
    perSession.getOrElseUpdate((dir, s"$name#spread"),
      spreadIfTiny(spark, load(spark, dir, name), s"$dir/$name.parquet",
        name, force = true))
  }

  private def loadFresh(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    def spread(df: DataFrame): DataFrame = spreadIfTiny(spark, df, path, name)
    if (name == "events") {
      // the driver has shipped events.ts as TIMESTAMP(NANOS) in some
      // rounds and timestamp[us] in others — normalize either to a plain
      // session-TZ TIMESTAMP (sessions here run UTC), adapting by the type
      // actually read rather than assuming one writer
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(path)
      spread(df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => // nanos read as long
          df.withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
        case _: org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      })
    } else spread(spark.read.parquet(path))
  }

  /** Register every testdata table as a temp view (for spark.sql paths). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
