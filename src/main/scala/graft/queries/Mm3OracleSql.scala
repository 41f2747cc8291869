package graft.queries

/** DuckDB oracle for mm3_audio_decode: the synthetic WAVs' samples are a
  * splitmix64 recurrence (Multimodal.syntheticWavMedia — sample i of clip
  * id is `(mix(id, i) & 0xffff) − 32768`), and PCM16 is lossless, so the
  * oracle recomputes the sample statistics from the same recurrence in
  * HUGEINT limb arithmetic WITHOUT any audio library. The integer stats
  * (n, zero-crossings) are exact; mean/rms are one double division
  * (+ sqrt) of exact BIGINT sums followed by a float32 cast — IEEE
  * round-to-nearest on both engines, so the hash gate passes
  * float-for-float. A match proves the hand-assembled RIFF container →
  * javax.sound decode → stats path reproduced every sample bit-exactly.
  */
object Mm3OracleSql {

  // the shared limb-multiply + avalanche constants — one copy to fix
  import SplitmixSql.{mul, Golden, C1, C2}

  val sql: String =
    s"""WITH sm AS (SELECT doc_id AS media_id, i::HUGEINT AS seed, i
       |  FROM (SELECT doc_id FROM documents WHERE doc_id < 60),
       |    range(0, 256) ti(i)),
       |z0 AS (SELECT media_id, i, xor(media_id::HUGEINT, ${mul("seed", Golden)}) AS z FROM sm),
       |z1 AS (SELECT media_id, i, ${mul("xor(z, z >> 30)", C1)} AS z FROM z0),
       |z2 AS (SELECT media_id, i, ${mul("xor(z, z >> 27)", C2)} AS z FROM z1),
       |v AS (SELECT media_id, i,
       |  CAST(xor(z, z >> 31) & 65535::HUGEINT AS BIGINT) - 32768 AS val FROM z2),
       |zc AS (SELECT media_id, i, val,
       |  CASE WHEN i > 0 AND (val >= 0)
       |            != (lag(val) OVER (PARTITION BY media_id ORDER BY i) >= 0)
       |       THEN 1 ELSE 0 END AS flip FROM v),
       |agg AS (SELECT media_id, count(*) AS n, sum(val) AS sum_s,
       |  sum(val * val) AS sum_sq, sum(flip) AS zcr FROM zc GROUP BY media_id)
       |SELECT media_id, CAST(n AS BIGINT) AS n_samples,
       |  CAST(16000 AS BIGINT) AS sample_rate,
       |  CAST(CAST(CAST(sum_s AS DOUBLE) / n AS FLOAT) AS DOUBLE) AS mean_amp,
       |  CAST(CAST(sqrt(CAST(sum_sq AS DOUBLE) / n) AS FLOAT) AS DOUBLE) AS rms_amp,
       |  CAST(zcr AS BIGINT) AS zero_crossings
       |FROM agg ORDER BY media_id""".stripMargin
}
