package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Snapshot column analysis — the per-column statistics the reference
  * computes at snapshot time (pgml-extension/src/orm/snapshot.rs:224-338:
  * min/max/mean/median/mode/variance/std_dev/missing/distinct + histogram/
  * ventiles).
  *
  * One pass per table (a single wide agg → one job), exact median via
  * `percentile` (the reference sorts all values — exact too).
  */
object Snapshot {

  /** Long-format stats: (column, metric, value). */
  def analyze(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      val x = col(c).cast("double")
      Seq(
        min(x).as(s"${c}__min"),
        max(x).as(s"${c}__max"),
        avg(x).as(s"${c}__mean"),
        expr(s"percentile(double($c), 0.5)").as(s"${c}__median"),
        stddev_pop(x).as(s"${c}__std_dev"),
        var_pop(x).as(s"${c}__variance"),
        (count(lit(1)) - count(x)).cast("double").as(s"${c}__missing"),
        countDistinct(x).cast("double").as(s"${c}__distinct"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val metrics = Seq("min", "max", "mean", "median", "std_dev", "variance", "missing", "distinct")
    val spark = df.sparkSession
    import spark.implicits._
    cols.flatMap { c =>
      metrics.zipWithIndex.map { case (m, i) =>
        (c, m, row.getDouble(cols.indexOf(c) * metrics.size + i))
      }
    }.toDF("column", "metric", "value")
  }

  /** 20-bin equi-width histogram counts for one column
    * (snapshot.rs histogram). */
  def histogram(df: DataFrame, c: String, bins: Int = 20): DataFrame = {
    val Row(mn: Double, mx: Double) =
      df.agg(min(col(c).cast("double")), max(col(c).cast("double"))).head()
    val width = if (mx == mn) 1.0 else (mx - mn) / bins
    df.select(least(floor((col(c).cast("double") - lit(mn)) / lit(width)),
        lit(bins - 1)).cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .orderBy("bin")
  }

  /** Ventiles (19 interior 1/20 quantiles, snapshot.rs ventiles). */
  def ventiles(df: DataFrame, c: String): Seq[Double] = {
    val qs = (1 to 19).map(_ / 20.0)
    df.stat.approxQuantile(c, qs.toArray, 0.0).toSeq // relErr 0 = exact
  }
}
