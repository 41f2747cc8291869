package graft.queries

/** DuckDB oracle for c3_sample_mixture: replays the keep decision —
  * splitmix64 avalanche of doc_id with the seed pre-mixed
  * (graft.functions.TextKernels.mix), top 24 bits under ⌊weight · 2²⁴⌋ —
  * in pure SQL. 64-bit wrap-around multiplication in 32-bit limbs so the
  * HUGEINT intermediates never overflow (same pattern as Mm1OracleSql);
  * the per-source thresholds are computed by the SAME ⌊w·2²⁴⌋ in Scala
  * that the operator uses, so the two sides cannot drift.
  */
object C3OracleSql {

  /** (a * c) mod 2^64 with a < 2^64 and c a 64-bit literal, via limbs. */
  private def mul(a: String, c: String): String =
    s"(((($a) >> 32) * ($c & 4294967295::HUGEINT) + (($a) & 4294967295::HUGEINT) * ($c >> 32)) " +
      s"% 4294967296::HUGEINT * 4294967296::HUGEINT " +
      s"+ (($a) & 4294967295::HUGEINT) * ($c & 4294967295::HUGEINT)) % 18446744073709551616::HUGEINT"

  private val C1 = "13787848793156543929::HUGEINT" // 0xbf58476d1ce4e5b9
  private val C2 = "10723151780598845931::HUGEINT" // 0x94d049bb133111eb

  // the c3 query's mixture: weights, default, seed — keep in sync with
  // QueryCatalog.c3SampleMixture
  val weights: Map[String, Double] = Map(
    "src0" -> 1.0, "src1" -> 0.75, "src2" -> 0.5, "src3" -> 0.25, "src4" -> 0.0)
  val defaultWeight = 0.1
  val seed = 7L

  private def th(w: Double): Long = math.floor(w * (1L << 24)).toLong

  // seed · golden-ratio constant, mod 2^64 (TextKernels.mix pre-mixes the
  // seed this way before the avalanche)
  private val seedMixed: BigInt =
    (BigInt(seed) * BigInt("11400714819323198485")) mod BigInt("18446744073709551616")

  val sql: String = {
    val cases = weights.toSeq.sortBy(_._1)
      .map { case (s, w) => s"WHEN '$s' THEN ${th(w)}" }.mkString(" ")
    s"""WITH m0 AS (SELECT doc_id, source,
       |    xor(doc_id::HUGEINT, $seedMixed::HUGEINT) AS z FROM documents),
       |m1 AS (SELECT doc_id, source, ${mul("xor(z, z >> 30)", C1)} AS z FROM m0),
       |m2 AS (SELECT doc_id, source, ${mul("xor(z, z >> 27)", C2)} AS z FROM m1),
       |m3 AS (SELECT doc_id, source, xor(z, z >> 31) >> 40 AS u FROM m2)
       |SELECT doc_id, source FROM m3
       |WHERE u < CASE source $cases ELSE ${th(defaultWeight)} END
       |ORDER BY doc_id""".stripMargin
  }
}
