package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  import graft.queries.QueryCatalog

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    QueryCatalog.v1KnnCosine.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryCatalog.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueryCatalog.all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** [[oracleSql]] plus the data-dependent oracles (fitted-model replays
    * whose literals must be generated against the scale factor under
    * test) — what Verify dumps to oracle_sql.json. `only` restricts
    * BEFORE the generators run: an unfiltered flatMap would train every
    * oracle model and build every index even for a one-query dev
    * pre-check. */
  def oracleSqlFor(spark: SparkSession, sfDir: String,
      only: Option[Set[String]] = None): Map[String, String] =
    QueryCatalog.all
      .filter(q => only.forall(_.contains(q.name)))
      .flatMap(q =>
        q.oracle.orElse(q.oracleGen.map(_(spark, sfDir))).map(q.name -> _)).toMap
}
