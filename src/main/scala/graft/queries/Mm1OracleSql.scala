package graft.queries

/** DuckDB oracle for mm1_media_features: replays the StubCodec math —
  * FNV-1a-64 over the document's UTF-8 bytes, splitmix64 finalizer with
  * seed 0 (the d=0 feature), low-16-bit float32 scaling — in pure SQL.
  * 64-bit wrap-around multiplication is done in 32-bit limbs so the
  * INT128 (HUGEINT) intermediates never overflow.
  */
object Mm1OracleSql {

  // the shared limb-multiply + avalanche constants — one copy to fix
  import SplitmixSql.{mul, C1, C2}

  val sql: String =
    s"""WITH tb AS (SELECT doc_id,
       |  flatten(list_transform(string_split(text, ''), ch ->
       |    CASE WHEN unicode(ch) < 128 THEN [unicode(ch)]
       |         WHEN unicode(ch) < 2048 THEN [192 + unicode(ch) // 64, 128 + unicode(ch) % 64]
       |         WHEN unicode(ch) < 65536 THEN [224 + unicode(ch) // 4096, 128 + (unicode(ch) // 64) % 64, 128 + unicode(ch) % 64]
       |         ELSE [240 + unicode(ch) // 262144, 128 + (unicode(ch) // 4096) % 64, 128 + (unicode(ch) // 64) % 64, 128 + unicode(ch) % 64]
       |    END)) AS bytes FROM documents),
       |fh AS (SELECT doc_id, list_reduce(
       |    list_concat([14695981039346656037::HUGEINT], list_transform(bytes, b -> b::HUGEINT)),
       |    (h, b) -> (xor(h, b) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT) AS h
       |  FROM tb),
       |m1 AS (SELECT doc_id, ${mul("xor(h, h >> 30)", C1)} AS z FROM fh),
       |m2 AS (SELECT doc_id, ${mul("xor(z, z >> 27)", C2)} AS z FROM m1),
       |m3 AS (SELECT doc_id, xor(z, z >> 31) AS z FROM m2)
       |SELECT doc_id AS media_id,
       |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       |  round(CAST(CAST((z & 65535) AS FLOAT) / 65535::FLOAT - 0.5::FLOAT AS DOUBLE), 5) + 0.0 AS f0
       |FROM m3 ORDER BY media_id""".stripMargin
}
