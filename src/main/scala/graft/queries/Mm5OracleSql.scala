package graft.queries

/** DuckDB oracle for mm5_image_resize: resizeImages' floor
  * nearest-neighbor contract says destination pixel (x,y) of the 8×8→4×4
  * downsample is source pixel (2x, 2y), and the source pixels are the
  * mm2 splitmix recurrence — so the oracle recomputes the RESIZED
  * per-channel sums by replaying the recurrence at even coordinates
  * only, in HUGEINT limb arithmetic, with no image code. A hash match
  * proves decode → pixel-exact resample → PNG re-encode end-to-end.
  */
object Mm5OracleSql {

  // the shared limb-multiply + avalanche constants — one copy to fix
  import SplitmixSql.{mul, Golden, C1, C2}

  val sql: String =
    s"""WITH px AS (SELECT doc_id AS media_id, CAST(c AS INT) AS c,
       |    ((c * 8 + 2 * y) * 8 + 2 * x)::HUGEINT AS seed
       |  FROM (SELECT doc_id FROM documents WHERE doc_id < 60),
       |    range(0, 3) tc(c), range(0, 4) ty(y), range(0, 4) tx(x)),
       |z0 AS (SELECT media_id, c, xor(media_id::HUGEINT, ${mul("seed", Golden)}) AS z FROM px),
       |z1 AS (SELECT media_id, c, ${mul("xor(z, z >> 30)", C1)} AS z FROM z0),
       |z2 AS (SELECT media_id, c, ${mul("xor(z, z >> 27)", C2)} AS z FROM z1),
       |v AS (SELECT media_id, c, xor(z, z >> 31) & 255::HUGEINT AS val FROM z2),
       |s AS (SELECT media_id, c, CAST(sum(val) AS BIGINT) AS sv FROM v GROUP BY media_id, c)
       |SELECT media_id, CAST(4 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
       |  max(CASE WHEN c = 0 THEN sv END) AS sum_r,
       |  max(CASE WHEN c = 1 THEN sv END) AS sum_g,
       |  max(CASE WHEN c = 2 THEN sv END) AS sum_b
       |FROM s GROUP BY media_id ORDER BY media_id""".stripMargin
}
