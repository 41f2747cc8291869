package graft.queries

/** Shared DuckDB-SQL building blocks for replaying the house splitmix64
  * avalanche (graft.functions.TextKernels.mix) in HUGEINT arithmetic —
  * used by every oracle that gates on the deterministic hash draw
  * (c3 mixture sampling, c5 split assignment). 64-bit wrap-around
  * multiplication is done in 32-bit limbs so the INT128 intermediates
  * never overflow (the Mm1OracleSql pattern).
  */
object SplitmixSql {

  /** (a * c) mod 2^64 with a < 2^64 and c a 64-bit literal, via limbs. */
  def mul(a: String, c: String): String =
    s"(((($a) >> 32) * ($c & 4294967295::HUGEINT) + (($a) & 4294967295::HUGEINT) * ($c >> 32)) " +
      s"% 4294967296::HUGEINT * 4294967296::HUGEINT " +
      s"+ (($a) & 4294967295::HUGEINT) * ($c & 4294967295::HUGEINT)) % 18446744073709551616::HUGEINT"

  val Golden = "11400714819323198485::HUGEINT" // 0x9e3779b97f4a7c15
  val C1 = "13787848793156543929::HUGEINT" // 0xbf58476d1ce4e5b9
  val C2 = "10723151780598845931::HUGEINT" // 0x94d049bb133111eb

  /** seed · golden-ratio constant, mod 2^64 — TextKernels.mix pre-mixes
    * the seed this way before the avalanche. */
  def seedMixed(seed: Long): BigInt =
    (BigInt(seed) * BigInt("11400714819323198485")) mod BigInt("18446744073709551616")

  /** CTE chain computing `u` = top 24 bits of mix64(doc_id, seed) next to
    * the given passthrough columns; terminates in a relation named
    * `<p>3` with columns (passthrough..., u). `from` is the relation
    * scanned by the first link (the passthrough columns must exist on
    * it); `p` renames the chain so several draws compose in one WITH
    * clause (the c14 pipeline oracle). */
  def drawCtes(seed: Long, passthrough: String, from: String = "documents",
      p: String = "m"): String =
    s"""${p}0 AS (SELECT $passthrough,
       |    xor(doc_id::HUGEINT, ${seedMixed(seed)}::HUGEINT) AS z FROM $from),
       |${p}1 AS (SELECT $passthrough, ${mul("xor(z, z >> 30)", C1)} AS z FROM ${p}0),
       |${p}2 AS (SELECT $passthrough, ${mul("xor(z, z >> 27)", C2)} AS z FROM ${p}1),
       |${p}3 AS (SELECT $passthrough, xor(z, z >> 31) >> 40 AS u FROM ${p}2)""".stripMargin

  /** [[drawCtes]] but keeping the FULL 64-bit avalanche, folded to the
    * SIGNED BIGINT the JVM Long orders/mods by (the T6 rule); terminates
    * in a relation named `<p>3` with columns (passthrough..., b). */
  def signedCtes(seed: Long, passthrough: String, from: String = "documents",
      p: String = "m"): String =
    s"""${p}0 AS (SELECT $passthrough,
       |    xor(doc_id::HUGEINT, ${seedMixed(seed)}::HUGEINT) AS z FROM $from),
       |${p}1 AS (SELECT $passthrough, ${mul("xor(z, z >> 30)", C1)} AS z FROM ${p}0),
       |${p}2 AS (SELECT $passthrough, ${mul("xor(z, z >> 27)", C2)} AS z FROM ${p}1),
       |${p}3 AS (SELECT $passthrough,
       |    CASE WHEN xor(z, z >> 31) >= 9223372036854775808::HUGEINT
       |         THEN (xor(z, z >> 31) - 18446744073709551616::HUGEINT)::BIGINT
       |         ELSE xor(z, z >> 31)::BIGINT END AS b FROM ${p}2)""".stripMargin
}
