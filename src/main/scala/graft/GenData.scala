package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale-factor headroom generator: synthesizes `documents` and
  * `embeddings` tables with the SAME marginal structure as the driver's
  * testdata (measured empirically off /root/testdata/sf0.1) at an
  * arbitrary row count, so the bench's corpus-proportional legs can be
  * run one scale factor up (sf1 = 10× sf0.1) without touching the
  * read-only driver data.
  *
  * Measured structure reproduced here:
  *  - documents: text = `ntok ~ U(10,100)` draws, uniform over a shared
  *    31-word vocabulary; lang ∈ {en 41%, de/es/fr/zh ~14.75%};
  *    source ∈ src0..src19 uniform; n_chars = length(text);
  *    doc_id = 0..n−1 (bigint). Near-dup density is EMERGENT exactly as
  *    in the driver corpus: with a 31-word vocab and ~54 tokens, random
  *    docs already collide at Jaccard ≥ 0.9 at ~7% of pairs, so the dup
  *    graph densifies quadratically with corpus size by construction.
  *  - embeddings: 64-dim float32, i.i.d. gaussian L2-normalized (label
  *    centroid norms at sf0.1 match the pure-noise expectation
  *    1/√n — there is no planted cluster structure); label ~ U(0,9);
  *    vec_id = 0..n−1.
  *
  * Determinism: every row is generated from a SplittableRandom seeded by
  * (seed, row id) — independent of partitioning, repeatable across runs.
  *
  * Usage: runMain graft.GenData <outDir> <nDocs> <nVecs> [seed]
  */
object GenData {
  private val Vocab: Array[String] = Array(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window")
  private val Langs = Array("en", "de", "es", "fr", "zh")
  // en ≈ 41%, the rest split the remainder evenly (empirical sf0.1 mix)
  private val LangCum = Array(0.41, 0.5575, 0.705, 0.8525, 1.0)

  def documents(spark: SparkSession, n: Long, seed: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).mapPartitions { it =>
      it.map { id =>
        val r = new java.util.SplittableRandom(seed ^ (id * 0x9E3779B97F4A7C15L))
        val ntok = 10 + r.nextInt(91)
        val sb = new StringBuilder
        var i = 0
        while (i < ntok) {
          if (i > 0) sb.append(' ')
          sb.append(Vocab(r.nextInt(Vocab.length)))
          i += 1
        }
        val u = r.nextDouble()
        var li = 0
        while (LangCum(li) < u) li += 1
        val text = sb.toString
        (id, text, Langs(li), "src" + r.nextInt(20), text.length)
      }
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  def embeddings(spark: SparkSession, n: Long, dim: Int, seed: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).mapPartitions { it =>
      it.map { id =>
        val r = new java.util.SplittableRandom(seed ^ 0x6C62272E07BB0142L ^
          (id * 0x9E3779B97F4A7C15L))
        val v = Array.fill(dim)(r.nextGaussian().toFloat)
        var ss = 0.0
        var i = 0
        while (i < dim) { ss += v(i).toDouble * v(i); i += 1 }
        val inv = (1.0 / math.sqrt(ss)).toFloat
        i = 0
        while (i < dim) { v(i) *= inv; i += 1 }
        (id, v, r.nextInt(10))
      }
    }.toDF("vec_id", "embedding", "label")
  }

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val nDocs = args(1).toLong
    val nVecs = args(2).toLong
    val seed = if (args.length > 3) args(3).toLong else 42L
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .appName("graft-gendata")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    documents(spark, nDocs, seed)
      .repartition(32).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    embeddings(spark, nVecs, 64, seed)
      .repartition(8).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    println(s"wrote $nDocs docs + $nVecs vecs to $outDir")
    spark.stop()
  }
}
