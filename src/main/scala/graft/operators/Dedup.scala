package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.VecFunctions._

/** Deduplication operators for training-data pipelines, each designed
  * around its shuffle profile at 100 TB:
  *
  *  - exact: groupBy on a 128-bit content hash (shuffles 16-byte keys,
  *    never full documents).
  *  - MinHash+LSH: signature → band keys → bucket self-join → exact
  *    verify. Only same-bucket pairs are joined, so the shuffle is
  *    O(docs × bands), not O(docs²).
  *  - SimHash: 64-bit sketch split into 4×16-bit bands (pigeonhole: any
  *    pair with Hamming ≤ 3 shares a band) → bucket join → bit_count
  *    verify.
  *  - n-gram Jaccard: exact verification primitive on candidate pairs.
  *  - embedding cosine: exact threshold pair-join (quadratic — correct
  *    baseline); the scale path blocks by LSH sign-bands first.
  */
object Dedup {

  /** Exact dedup: one representative (min id) + duplicate count per
    * identical content. */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  /** Token-set (unigram) Jaccard between two string columns, as a Column. */
  def tokenJaccard(a: Column, b: Column): Column = {
    val ta = array_distinct(split(trim(lower(a)), "\\s+"))
    val tb = array_distinct(split(trim(lower(b)), "\\s+"))
    val inter = size(array_intersect(ta, tb)).cast("double")
    val uni = size(array_union(ta, tb)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** MinHash + banded LSH near-duplicate pairs, exact-verified.
    *
    * With k=128, bands=32 (4 rows/band), a pair at Jaccard 0.9 is caught
    * with prob 1-(1-0.9⁴)^32 ≈ 1-1.5e-15 — candidate recall is effectively
    * exact at the threshold; false positives are removed by the exact
    * Jaccard verify.
    *
    * Shuffle discipline: the band self-join carries (band, bucket, id)
    * only — texts are joined back *after* the candidate-pair distinct, so
    * the wide LSH shuffle never moves document bodies.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      k: Int = 128,
      bands: Int = 32,
      shingle: Int = 1): DataFrame = {
    val rows = k / bands
    val base = df.select(col(idCol).as("id"), col(textCol).as("text"))
    val sig = base.select(col("id"),
      minhashSignature(col("text"), k, shingle).as("sig"))

    // band key = hash of the band's signature slice; ids only from here on
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(col("sig"), b * rows + 1, lit(rows))))).as(Seq("band", "bucket")))

    val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    candidates
      .join(base.select(col("id").as("id_a"), col("text").as("text_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("text").as("text_b")), "id_b")
      .withColumn("jaccard", tokenJaccard(col("text_a"), col("text_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-duplicate pairs with Hamming distance <= maxHamming (<=3
    * guaranteed caught by 4-band pigeonhole on the 64-bit sketch).
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sk = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sk"))
    val banded = sk.select(col("id"), col("sk"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("sk"), i * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("sk").as("sk_a"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("sk").as("sk_b"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sk_a"), col("sk_b")).distinct()
      .withColumn("hamming", hamming64(col("sk_a"), col("sk_b")))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Exact embedding near-duplicate pairs: all (a,b) with cosine >= threshold.
    * Quadratic self-join — the exact baseline. At cluster scale, call with a
    * pre-blocked frame (e.g. SRP sign buckets) or use [[srpBlockedPairs]].
    */
  def embeddingPairsExact(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", cosineSimilarity(col("v_a"), col("v_b")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Signed-random-projection blocked near-dup pairs: bucket by the sign
    * pattern of `nPlanes` fixed pseudo-random hyperplanes, compare within
    * buckets only. Approximate (high-cosine pairs agree on sign bits with
    * prob 1 - θ/π per plane); the scale path for [[embeddingPairsExact]].
    */
  def srpBlockedPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      nPlanes: Int = 8,
      seed: Long = 42L): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(nPlanes)(Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
    val bucketCol = (0 until nPlanes).map { p =>
      (vecDot(col(vecCol), floatVec(planes(p).toIndexedSeq)) > 0).cast("int") * (1 << p)
    }.reduce(_ + _)
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("v"), bucketCol.as("bucket"))
    val a = bucketed.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cos", cosineSimilarity(col("v_a"), col("v_b")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
