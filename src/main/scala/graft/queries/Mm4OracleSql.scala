package graft.queries

/** DuckDB oracle for mm4_video_frames: the synthetic animated GIFs'
  * frames are a splitmix64 recurrence (Multimodal.syntheticGifMedia —
  * gray pixel (x,y) of frame f in clip id is `mix(id, (f·8+y)·8+x) &
  * 0xff` over an explicit identity palette), and GIF's LZW + the PNG
  * frame re-encode are lossless, so the oracle recomputes the per-frame
  * pixel sums from the same recurrence in HUGEINT limb arithmetic
  * WITHOUT any codec. A hash match proves the animated-container parse,
  * frame seek, and frame re-encode reproduced every pixel bit-exactly.
  */
object Mm4OracleSql {

  /** (a * c) mod 2^64 with a < 2^64 and c a 64-bit literal, via limbs. */
  private def mul(a: String, c: String): String =
    s"(((($a) >> 32) * ($c & 4294967295::HUGEINT) + (($a) & 4294967295::HUGEINT) * ($c >> 32)) " +
      s"% 4294967296::HUGEINT * 4294967296::HUGEINT " +
      s"+ (($a) & 4294967295::HUGEINT) * ($c & 4294967295::HUGEINT)) % 18446744073709551616::HUGEINT"

  private val Golden = "11400714819323198485::HUGEINT" // 0x9e3779b97f4a7c15
  private val C1 = "13787848793156543929::HUGEINT" // 0xbf58476d1ce4e5b9
  private val C2 = "10723151780598845931::HUGEINT" // 0x94d049bb133111eb

  val sql: String =
    s"""WITH px AS (SELECT doc_id AS media_id, CAST(f AS INT) AS f,
       |    ((f * 8 + y) * 8 + x)::HUGEINT AS seed
       |  FROM (SELECT doc_id FROM documents WHERE doc_id < 40),
       |    range(0, 6) tf(f), range(0, 8) ty(y), range(0, 8) tx(x)),
       |z0 AS (SELECT media_id, f, xor(media_id::HUGEINT, ${mul("seed", Golden)}) AS z FROM px),
       |z1 AS (SELECT media_id, f, ${mul("xor(z, z >> 30)", C1)} AS z FROM z0),
       |z2 AS (SELECT media_id, f, ${mul("xor(z, z >> 27)", C2)} AS z FROM z1),
       |v AS (SELECT media_id, f, xor(z, z >> 31) & 255::HUGEINT AS val FROM z2)
       |SELECT media_id, f AS frame_index, CAST(sum(val) AS BIGINT) AS gray_sum
       |FROM v GROUP BY media_id, f ORDER BY media_id, frame_index""".stripMargin
}
