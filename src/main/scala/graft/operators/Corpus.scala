package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Composed training-data curation: the standard pretraining front door
  * (language gate → quality gate → exact dedup → per-doc stats) as ONE
  * declarative pipeline, so Catalyst fuses the whole thing.
  *
  * Plan shape (the 100 TB contract): the language and quality gates are
  * pure codegen column kernels evaluated IN the parquet scan stage — no
  * shuffle, and the corpus shrinks before anything wide runs. The only
  * shuffle in the pipeline is the dedup window, keyed on the 16-byte
  * md5(text) of the SURVIVORS, so filter selectivity directly cuts
  * exchange bytes. Every stage is deterministic and SQL-replayable — the
  * c1 oracle replays gate → gate → dedup → stats end to end.
  */
object Corpus {

  /** Curate `docs(idCol, textCol)`: keep documents whose detected language
    * is `lang` and whose quality score (composite length / alpha-ratio /
    * stopword heuristic, [[TextFunctions.qualityScore]]) clears
    * `minQuality`, collapse byte-identical texts to their min-id
    * representative, then (optionally) near-deduplicate the survivors with
    * MinHash+LSH at `nearDupThreshold` keeping one representative per
    * near-dup component — the curation-grade stage real pretraining
    * pipelines run between exact dedup and tokenization. Near-dedup runs
    * AFTER the gates and exact dedup, so its LSH cost is paid only on the
    * documents that survived everything cheaper. Output: (idCol, lang,
    * quality, n_tokens, n_bpeish), one row per kept document. */
  def curate(
      docs: DataFrame, idCol: String, textCol: String,
      lang: String = "en", minQuality: Double = 0.3,
      nearDupThreshold: Option[Double] = None): DataFrame = {
    val gated = docs
      .withColumn("lang", TextFunctions.langId(col(textCol)))
      .where(col("lang") === lang)
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .where(col("quality") >= minQuality)
    val byText = Window.partitionBy(md5(col(textCol)))
    val exactKept = gated
      .withColumn("__rep", min(col(idCol)).over(byText))
      .where(col(idCol) === col("__rep"))
    val kept = nearDupThreshold.foldLeft(exactKept)((df, t) =>
      Dedup.deduplicate(df, idCol, textCol, t))
    kept.select(col(idCol), col("lang"), col("quality"),
      TextFunctions.tokenCount(col(textCol)).as("n_tokens"),
      TextFunctions.bpeishTokenCount(col(textCol)).as("n_bpeish"))
  }
}
