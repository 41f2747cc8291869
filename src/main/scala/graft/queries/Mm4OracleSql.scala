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

  // the shared limb-multiply + avalanche constants — one copy to fix
  import SplitmixSql.{mul, Golden, C1, C2}

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
