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
    // pick a working-column name that collides with neither input — a fixed
    // "__salt" would silently overwrite a caller's column and corrupt the join
    val taken = (left.columns ++ right.columns).toSet
    val salt = Iterator.from(0).map(i => if (i == 0) "__salt" else s"__salt$i")
      .find(!taken.contains(_)).get
    val saltedLeft = left.withColumn(salt,
      (rand(42) * salts).cast("int"))
    val saltedRight = right.withColumn(salt,
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight, Seq(key, salt)).drop(salt)
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
    require(!table.contains("`") && table.nonEmpty,
      s"invalid table name '$table'")
    val spark = df.sparkSession
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    val catalog = spark.sessionState.catalog
    val defaultLoc = new org.apache.hadoop.fs.Path(catalog.defaultTablePath(ident))
    // only clear the default managed location when it's safe: either the
    // table doesn't exist (orphaned dir from a killed write blocks CREATE
    // TABLE) or the existing MANAGED table actually lives there. An external
    // table pointing elsewhere must not trigger a delete under the warehouse.
    val safeToClear =
      if (!catalog.tableExists(ident)) true
      else {
        val meta = catalog.getTableMetadata(ident)
        meta.tableType == org.apache.spark.sql.catalyst.catalog.CatalogTableType.MANAGED &&
          new org.apache.hadoop.fs.Path(meta.location) == defaultLoc
      }
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    if (safeToClear) {
      val fs = defaultLoc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(defaultLoc)) fs.delete(defaultLoc, true)
    }
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table) // managed: spark.sql.warehouse.dir
  }

  def bucketed(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
