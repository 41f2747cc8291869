package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-column preprocessing with the reference's exact semantics
  * (pgml-extension/src/orm/snapshot.rs:70-248, 1200-1338):
  *
  *  - text columns are always categorical; `encode` ∈ native | target |
  *    one_hot | ordinal[values]
  *  - NULL is always the category `__NULL__` with value 0
  *    (snapshot.rs:154-160)
  *  - categories unseen at training time map to NaN, then go through
  *    imputation (snapshot.rs:203-216)
  *  - one_hot drops the last category (k-1 columns)
  *  - `impute` ∈ error(default) | mean | median | mode | min | max | zero,
  *    statistics always computed on the *train* split
  *  - `scale` ∈ preserve | standard | min_max | max_abs | robust
  *    (robust = (x − median)/(ventile16 − ventile6), i.e. 0.8/0.3 quantiles)
  *
  * Fit on train → pure Column transforms on any frame (train/test/serve):
  * the fitted state is a small driver-side map, broadcast inside literal
  * expressions, so transform is codegen'd and shuffle-free.
  */
final case class ColumnPlan(
    name: String,
    encode: String = "native",               // native | target | one_hot | ordinal
    ordinalValues: Seq[String] = Nil,
    impute: String = "error",
    scale: String = "preserve")

final case class FittedColumn(
    plan: ColumnPlan,
    categorical: Boolean,
    categories: Map[String, Double],         // category -> encoded value ("__NULL__" -> 0)
    imputeValue: Double,
    scaleOffset: Double, scaleDiv: Double,   // x' = (x - offset)/div
    oneHotCats: Seq[String])                 // k-1 retained categories

object Preprocessor {

  val NullCategory = "__NULL__"

  /** Fit plans on the train split. `target` must be numeric for
    * target-encoding. */
  def fit(train: DataFrame, plans: Seq[ColumnPlan], targetCol: String): Seq[FittedColumn] =
    plans.map { p =>
      val dt = train.schema(p.name).dataType.typeName
      val categorical = dt == "string" || p.encode != "native"
      if (categorical) fitCategorical(train, p, targetCol) else fitNumeric(train, p)
    }

  private def fitCategorical(train: DataFrame, p: ColumnPlan, targetCol: String): FittedColumn = {
    val c = coalesce(col(p.name).cast("string"), lit(NullCategory))
    val categories: Map[String, Double] = p.encode match {
      case "ordinal" =>
        // explicit value list; NULL first at 0 (snapshot.rs:162-173)
        (NullCategory +: p.ordinalValues).zipWithIndex
          .map { case (v, i) => v -> i.toDouble }.toMap
      case "target" =>
        // per-category mean of the first label (snapshot.rs:229-248)
        val stats = train.groupBy(c.as("cat")).agg(avg(col(targetCol)).as("m"))
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        stats + (NullCategory -> stats.getOrElse(NullCategory, 0.0))
      case _ => // native & one_hot: first-appearance ordering surrogate —
        // deterministic: NULL -> 0, then categories by first-seen train order
        val cats = train.select(c.as("cat")).distinct()
          .collect().map(_.getString(0)).filter(_ != NullCategory).sorted
        ((NullCategory, 0.0) +: cats.zipWithIndex.map { case (v, i) => (v, (i + 1).toDouble) }).toMap
    }
    val oneHot = if (p.encode == "one_hot") {
      val ordered = categories.toSeq.sortBy(_._2).map(_._1)
      ordered.dropRight(1) // drop last (k-1 columns)
    } else Nil
    FittedColumn(p, categorical = true, categories, imputeValue = 0.0,
      scaleOffset = 0.0, scaleDiv = 1.0, oneHotCats = oneHot)
  }

  private def fitNumeric(train: DataFrame, p: ColumnPlan): FittedColumn = {
    val x = col(p.name).cast("double")
    val valid = train.where(x.isNotNull && !isnan(x))
    // Only aggregate the stats this column's impute/scale strategies need —
    // the common path (impute zero/error, scale preserve) launches NO job,
    // and the exact (sort-based) percentile only runs for median/robust.
    val needMean = p.impute == "mean" || p.scale == "standard"
    val needMedian = p.impute == "median" || p.scale == "robust"
    val needMinMax = p.impute == "min" || p.impute == "max" || p.scale == "min_max"
    val aggs = Seq.newBuilder[(String, Column)]
    if (needMean) aggs += ("mean" -> avg(x))
    if (needMedian) aggs += ("median" -> expr(s"percentile(double(${p.name}), 0.5)"))
    if (needMinMax) { aggs += ("min" -> min(x)); aggs += ("max" -> max(x)) }
    if (p.scale == "standard") aggs += ("std" -> stddev_pop(x))
    if (p.scale == "max_abs") aggs += ("max_abs" -> max(abs(x)))
    if (p.scale == "robust") {
      aggs += ("q03" -> expr(s"percentile(double(${p.name}), 0.3)"))
      aggs += ("q08" -> expr(s"percentile(double(${p.name}), 0.8)"))
    }
    val built = aggs.result()
    val stats: Map[String, Double] =
      if (built.isEmpty) Map.empty
      else {
        val row = valid.agg(built.head._2.as(built.head._1),
          built.tail.map { case (n, c) => c.as(n) }: _*).head()
        built.map { case (n, _) =>
          // a NULL aggregate means the column had no valid values — imputing
          // with a silent 0.0 would corrupt the feature; fail loudly instead
          if (row.isNullAt(row.fieldIndex(n)))
            throw new IllegalArgumentException(
              s"column '${p.name}': stat '$n' is NULL (no non-null/non-NaN values) — " +
                s"impute='${p.impute}'/scale='${p.scale}' need it; use impute=zero or drop the column")
          n -> row.getAs[Double](n)
        }.toMap
      }
    val mean = stats.getOrElse("mean", 0.0); val median = stats.getOrElse("median", 0.0)
    val mn = stats.getOrElse("min", 0.0); val mx = stats.getOrElse("max", 0.0)
    val std = stats.getOrElse("std", 0.0); val maxAbs = stats.getOrElse("max_abs", 0.0)
    val q03 = stats.getOrElse("q03", 0.0); val q08 = stats.getOrElse("q08", 0.0)
    val mode = p.impute match {
      case "mode" =>
        val top = valid.groupBy(x.as("v")).count()
          .orderBy(col("count").desc, col("v")).limit(1).collect()
        if (top.isEmpty)
          throw new IllegalArgumentException(
            s"column '${p.name}': impute=mode but no non-null/non-NaN values exist")
        top.head.getDouble(0)
      case _ => 0.0
    }
    val imputeValue = p.impute match {
      case "mean" => mean
      case "median" => median
      case "mode" => mode
      case "min" => mn
      case "max" => mx
      case "zero" => 0.0
      case "error" => Double.NaN // sentinel: transform raises on NaN survival
      case other => throw new IllegalArgumentException(s"unknown impute strategy $other")
    }
    val (offset, div) = p.scale match {
      case "preserve" => (0.0, 1.0)
      case "standard" => (mean, if (std == 0.0) 1.0 else std)
      case "min_max" => (mn, if (mx - mn == 0.0) 1.0 else mx - mn)
      case "max_abs" => (0.0, if (maxAbs == 0.0) 1.0 else maxAbs)
      case "robust" => (median, if (q08 - q03 == 0.0) 1.0 else q08 - q03)
      case other => throw new IllegalArgumentException(s"unknown scale strategy $other")
    }
    FittedColumn(p, categorical = false, Map.empty, imputeValue, offset, div, Nil)
  }

  /** Output numeric feature column names after preprocessing. */
  def featureNames(fitted: Seq[FittedColumn]): Seq[String] = fitted.flatMap { f =>
    if (f.plan.encode == "one_hot") f.oneHotCats.map(c => s"${f.plan.name}__$c")
    else Seq(s"${f.plan.name}__f")
  }

  /** Apply fitted preprocessing — pure Column expressions. */
  def transform(df: DataFrame, fitted: Seq[FittedColumn]): DataFrame = {
    val cols: Seq[Column] = fitted.flatMap { f =>
      if (f.categorical) {
        val catStr = coalesce(col(f.plan.name).cast("string"), lit(NullCategory))
        if (f.plan.encode == "one_hot") {
          f.oneHotCats.map(c =>
            when(catStr === c, lit(1.0)).otherwise(lit(0.0)).as(s"${f.plan.name}__$c"))
        } else {
          // map via literal CASE chain; unseen categories -> NaN then impute
          val mapped = f.categories.foldLeft(lit(Double.NaN)) { case (acc, (cat, v)) =>
            when(catStr === cat, lit(v)).otherwise(acc)
          }
          val imputed =
            if (f.plan.impute == "error") mapped
            else when(isnan(mapped), lit(f.imputeValue)).otherwise(mapped)
          Seq(imputed.as(s"${f.plan.name}__f"))
        }
      } else {
        val x = col(f.plan.name).cast("double")
        val raw = coalesce(x, lit(Double.NaN))
        val imputed =
          if (f.plan.impute == "error") raw
          else when(isnan(raw), lit(f.imputeValue)).otherwise(raw)
        val scaled = (imputed - lit(f.scaleOffset)) / lit(f.scaleDiv)
        Seq(scaled.as(s"${f.plan.name}__f"))
      }
    }
    df.select(col("*") +: cols: _*)
  }
}
