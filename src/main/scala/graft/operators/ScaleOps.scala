package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities for the 100 TB deployment shape — the pieces that don't
  * change query RESULTS, only their shuffle/skew behavior, so they live as
  * composable helpers rather than inside each operator.
  *
  * - [[saltedJoin]]: hot-key mitigation for joins AQE can't fix (e.g. the
  *   build side is too large to broadcast and one key dominates — the
  *   events/user_id shape). The skewed side picks a random salt in
  *   [0, salts); the other side is replicated `salts` ways; joining on
  *   (key, salt) spreads each hot key over `salts` reducers.
  * - [[writeBucketed]] / [[bucketed]]: persist a table bucketed by its
  *   join/aggregation key so repeated joins and groupBys on that key are
  *   exchange-free (the parquet-snapshot analogue of the reference's
  *   indexed tables; Spark reads bucket files as pre-shuffled input).
  */
object ScaleOps {

  /** Inner equi-join with the LEFT side treated as skewed. Results equal
    * `left.join(right, Seq(key))` exactly; only the key distribution over
    * reducers changes. `right` is replicated `salts`× — keep it the
    * smaller side (but too big / too skew-joined to broadcast).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salts: Int = 8): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedLeft = left.withColumn("__salt",
      (rand(42) * salts).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Write `df` as a bucketed+sorted managed table (metastore-backed).
    * Joins and aggregations between tables bucketed the same way on the
    * same key run with NO exchange.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int = 32): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // clear an orphaned location (a killed write can leave the directory
    // behind without the metastore entry, which blocks CREATE TABLE)
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table) // managed: spark.sql.warehouse.dir
  }

  def bucketed(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
