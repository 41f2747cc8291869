package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale-factor headroom generator: synthesizes `documents` and
  * `embeddings` tables at an arbitrary row count, so the bench's
  * corpus-proportional legs can be run one scale factor up (sf1 = 10×
  * sf0.1) without touching the read-only driver data.
  *
  *  - documents: text = `ntok ~ U(10,100)` draws over a 5,000-word
  *    Zipf-distributed vocabulary (log-uniform rank draw ≈ zipf(1) —
  *    the published token-frequency shape), with PLANTED near-duplicates
  *    at a fixed per-document rate: every id ≡ 3 (mod 7) re-emits the
  *    token stream of its group leader (id − 3), verbatim for short
  *    leaders and with two token flips for leaders of ≥ 40 tokens (a
  *    borderline ~0.9-Jaccard pair — the case an LSH verify stage has to
  *    adjudicate). True-pair count therefore grows LINEARLY in n —
  *    realistic web-corpus dup density. The r10 generator drew uniformly
  *    from a 31-word vocab, where random 54-token docs already collide
  *    at Jaccard ≥ 0.9 for ~7% of ALL pairs: its d1/d3 numbers measured
  *    a quadratic-by-construction output, not the operator. With 5,000
  *    Zipf words the random-collision mass is negligible — the output IS
  *    the planted set.
  *  - lang ∈ {en 41%, de/es/fr/zh ~14.75%}; source ∈ src0..src19;
  *    n_chars = length(text); doc_id = 0..n−1 (bigint).
  *  - embeddings: 64-dim float32, i.i.d. gaussian L2-normalized;
  *    label ~ U(0,9); vec_id = 0..n−1.
  *
  * Determinism: every row is generated from a SplittableRandom seeded by
  * (seed, row id) — independent of partitioning, repeatable across runs;
  * a planted dup re-derives its LEADER's stream from the leader's seed,
  * so the pair structure is also partition-independent.
  *
  * Usage: runMain graft.GenData <outDir> <nDocs> <nVecs> [seed]
  */
object GenData {
  private val VocabSize = 5000
  private val Langs = Array("en", "de", "es", "fr", "zh")
  // en ≈ 41%, the rest split the remainder evenly (empirical sf0.1 mix)
  private val LangCum = Array(0.41, 0.5575, 0.705, 0.8525, 1.0)

  /** The Zipf HEAD is real high-frequency English (ranks 0 until
    * HeadWords.length — 48 words): a corpus
    * whose most common tokens are synthetic "w0 w1 …" fails every
    * stopword-based gate at once (curate keeps nothing → the c7
    * distillation has no positive set), which is corpus-realism breakage,
    * not operator signal. Tail ranks stay synthetic `w<k>`. */
  private val HeadWords: Array[String] =
    ("the and of to in is it that for on with as was at by from have not " +
      "this but are or an be they which you all we more can said there use " +
      "each how their if will up other about out many then them these so").split(' ')

  /** Zipf(1)-ish rank draw: log-uniform over [0, VocabSize). */
  private def zipfWord(r: java.util.SplittableRandom): String = {
    val k = math.max(0, math.min(VocabSize - 1,
      math.exp(r.nextDouble() * math.log(VocabSize.toDouble)).toInt - 1))
    if (k < HeadWords.length) HeadWords(k) else "w" + k
  }

  private def rngFor(seed: Long, id: Long) =
    new java.util.SplittableRandom(seed ^ (id * 0x9E3779B97F4A7C15L))

  /** The base token stream of document `id` (leaders and non-dups). */
  private def baseTokens(seed: Long, id: Long): Array[String] = {
    val r = rngFor(seed, id)
    val ntok = 10 + r.nextInt(91)
    Array.fill(ntok)(zipfWord(r))
  }

  def documents(spark: SparkSession, n: Long, seed: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).mapPartitions { it =>
      it.map { id =>
        val isDup = id % 7 == 3 && id >= 3
        val toks =
          if (!isDup) baseTokens(seed, id)
          else {
            val t = baseTokens(seed, id - 3)
            if (t.length >= 40) {
              // two token flips → a borderline ≥0.9-Jaccard near-dup
              val rd = rngFor(seed ^ 0x5eedL, id)
              t(rd.nextInt(t.length)) = zipfWord(rd)
              t(rd.nextInt(t.length)) = zipfWord(rd)
            }
            t
          }
        // lang/source draws come AFTER the text stream so a dup's
        // metadata varies while its text matches the leader's
        val r = rngFor(seed ^ 0x1a2b3cL, id)
        val u = r.nextDouble()
        var li = 0
        while (LangCum(li) < u) li += 1
        val text = toks.mkString(" ")
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
    // optional 5th arg: embedding dimension (default 64, the driver-data
    // width; 1024 = the reference's published operating width)
    val dim = if (args.length > 4) args(4).toInt else 64
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .appName("graft-gendata")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    documents(spark, nDocs, seed)
      .repartition(32).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    // keep parquet files in the ~0.5-1 GB class at any width (random
    // floats don't compress): 8 files at 64-d, 32 at 1024-d x 5M
    val embParts = math.max(8, (nVecs * dim * 4L / (768L << 20)).toInt)
    embeddings(spark, nVecs, dim, seed)
      .repartition(embParts).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    println(s"wrote $nDocs docs + $nVecs vecs (dim=$dim) to $outDir")
    spark.stop()
  }
}
