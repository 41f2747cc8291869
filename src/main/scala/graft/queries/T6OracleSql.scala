package graft.queries

/** DuckDB oracle for t6_fingerprint: replays the winnowing fingerprint
  * (TextKernels.winnowFingerprint — rolling FNV-1a-64 over 8-byte char
  * grams of lower(text), min per 4-gram window, dedup + signed sort).
  *
  * The kernel's rightmost-min tie-break picks an INDEX; the published
  * fingerprint keeps only hash VALUES, and tied windows tie on equal
  * values — so a plain window list_min is value-identical. The JVM kernel
  * compares gram hashes as SIGNED Longs, so unsigned HUGEINT hashes fold
  * back to signed BIGINT BEFORE the window-min stage (an unsigned min
  * keeps a different value whenever a window mixes signs).
  */
object T6OracleSql {

  private val fnvInit = "14695981039346656037::HUGEINT"
  private val fnvPrime = "1099511628211::HUGEINT"
  private val m64 = "18446744073709551616::HUGEINT"

  private def fnv(list: String): String =
    s"list_reduce(list_concat([$fnvInit], list_transform($list, b -> b::HUGEINT)), " +
      s"(h, b) -> (xor(h, b) * $fnvPrime) % $m64)"

  val sql: String =
    s"""WITH tb AS (SELECT doc_id,
       |  flatten(list_transform(string_split(lower(text), ''), ch ->
       |    CASE WHEN unicode(ch) < 128 THEN [unicode(ch)]
       |         WHEN unicode(ch) < 2048 THEN [192 + unicode(ch) // 64, 128 + unicode(ch) % 64]
       |         WHEN unicode(ch) < 65536 THEN [224 + unicode(ch) // 4096, 128 + (unicode(ch) // 64) % 64, 128 + unicode(ch) % 64]
       |         ELSE [240 + unicode(ch) // 262144, 128 + (unicode(ch) // 4096) % 64, 128 + (unicode(ch) // 64) % 64, 128 + unicode(ch) % 64]
       |    END)) AS bytes FROM documents),
       |grams AS (SELECT doc_id,
       |    list_transform(
       |      CASE WHEN len(bytes) < 8 THEN [${fnv("bytes")}]
       |           ELSE list_transform(range(len(bytes) - 7),
       |                  i -> ${fnv("list_slice(bytes, i + 1, i + 8)")})
       |      END,
       |      h -> CASE WHEN h >= 9223372036854775808::HUGEINT
       |                THEN (h - $m64)::BIGINT ELSE h::BIGINT END) AS gh FROM tb),
       |wins AS (SELECT doc_id, gh, len(gh) AS ng,
       |    list_transform(range(greatest(len(gh) - 3, 1)),
       |      w -> list_min(list_slice(gh, w + 1, least(w + 4, len(gh))))) AS mins
       |  FROM grams),
       |kept AS (SELECT doc_id, list_sort(list_distinct(mins)) AS fp FROM wins)
       |SELECT doc_id, len(fp) AS fp_size, fp[1] AS fp_first
       |FROM kept ORDER BY doc_id""".stripMargin
}
