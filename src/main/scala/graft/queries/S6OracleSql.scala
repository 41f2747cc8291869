package graft.queries

/** DuckDB oracle for s6_vector_search_chunked: the FULL chunked e2e replay —
  * the (200, 20) greedy word-merge chunk fold (S1OracleSql's technique),
  * the FNV-1a-64 + splitmix64 ±1 bag-of-words projection with float32
  * rounding per CHUNK (the s4 embedding replay keyed by (doc, chunk)),
  * sequential-fold cosine against the embedded query, and the
  * (score desc, md5-uuid, chunk_index) top-k — the same ordering
  * vectorSearch applies over (score, document_id, chunk_index).
  */
object S6OracleSql {

  /** The CTE body alone (through `scored(doc_id, chunk_index, raw)`), so
    * the s13 rerank oracle can compose the SAME chunk-fold + hash-embed +
    * cosine replay and append its own feature/sigmoid stages. */
  val ctes: String =
    """f AS (SELECT doc_id, list_reduce(string_split(text, ' '),
      |    (a, b) -> CASE WHEN len(string_split(a, chr(31))[-1]) + 1 + len(b) > 200
      |                    AND string_split(a, chr(31))[-1] <> ''
      |      THEN a || chr(31) || right(string_split(a, chr(31))[-1], 20) || ' ' || b
      |      ELSE a || ' ' || b END) AS st FROM documents),
      |ch0 AS (SELECT doc_id, string_split(st, chr(31)) AS chunks FROM f),
      |chunks AS (
      |  SELECT doc_id, s.i AS chunk_index, s.c AS chunk FROM
      |    (SELECT doc_id, unnest(list_transform(range(len(chunks)),
      |        i -> {'i': i, 'c': chunks[i+1]})) AS s FROM ch0) t
      |  UNION ALL SELECT -1, 0, 'spark query table join'),
      |tok AS (SELECT doc_id, chunk_index,
      |    unnest(list_filter(string_split_regex(trim(lower(chunk)), '\s+'), t -> t <> '')) AS t
      |  FROM chunks),
      |toku AS (SELECT DISTINCT t FROM tok),
      |th AS (SELECT t, list_reduce(
      |    list_concat([14695981039346656037::HUGEINT],
      |      list_transform(flatten(list_transform(string_split(t, ''), ch ->
      |        CASE WHEN unicode(ch) < 128 THEN [unicode(ch)]
      |             WHEN unicode(ch) < 2048 THEN [192 + unicode(ch) // 64, 128 + unicode(ch) % 64]
      |             WHEN unicode(ch) < 65536 THEN [224 + unicode(ch) // 4096, 128 + (unicode(ch) // 64) % 64, 128 + unicode(ch) % 64]
      |             ELSE [240 + unicode(ch) // 262144, 128 + (unicode(ch) // 4096) % 64, 128 + (unicode(ch) // 64) % 64, 128 + unicode(ch) % 64]
      |        END)), b -> b::HUGEINT)),
      |    (h, b) -> (xor(h, b) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT) AS h
      |  FROM toku),
      |sgn AS (SELECT t, d,
      |    xor(h, (d::HUGEINT * 11400714819323198485::HUGEINT) % 18446744073709551616::HUGEINT) AS z0,
      |    xor(z0, z0 >> 30) AS x1,
      |    ((x1 % 4294967296::HUGEINT) * 13787848793156543929::HUGEINT
      |      + (((x1 // 4294967296::HUGEINT) * 484763065::HUGEINT) % 4294967296::HUGEINT)
      |        * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT AS z1,
      |    xor(z1, z1 >> 27) AS x2,
      |    ((x2 % 4294967296::HUGEINT) * 10723151780598845931::HUGEINT
      |      + (((x2 // 4294967296::HUGEINT) * 321982955::HUGEINT) % 4294967296::HUGEINT)
      |        * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT AS z2,
      |    xor(z2, z2 >> 31) AS r,
      |    CASE WHEN (r % 2::HUGEINT) = 0::HUGEINT THEN 1.0 ELSE -1.0 END AS s
      |  FROM th, (SELECT unnest(range(0, 64)) AS d)),
      |acc AS (SELECT tok.doc_id, tok.chunk_index, sgn.d, sum(sgn.s) AS a
      |  FROM tok JOIN sgn ON tok.t = sgn.t GROUP BY tok.doc_id, tok.chunk_index, sgn.d),
      |nrm AS (SELECT doc_id, chunk_index, sqrt(sum(a * a)) AS nr
      |  FROM acc GROUP BY doc_id, chunk_index),
      |fvec AS (SELECT acc.doc_id, acc.chunk_index, acc.d, CAST(acc.a * (1.0 / nrm.nr) AS REAL) AS f
      |  FROM acc JOIN nrm ON acc.doc_id = nrm.doc_id AND acc.chunk_index = nrm.chunk_index),
      |vecs AS (SELECT doc_id, chunk_index, list(CAST(f AS DOUBLE) ORDER BY d) AS v
      |  FROM fvec GROUP BY doc_id, chunk_index),
      |scored AS (SELECT dv.doc_id, dv.chunk_index,
      |    list_reduce(list_transform(range(1, 65), i -> dv.v[i] * q.v[i]), (x, y) -> x + y) AS dt,
      |    list_reduce(list_transform(range(1, 65), i -> dv.v[i] * dv.v[i]), (x, y) -> x + y) AS na,
      |    list_reduce(list_transform(range(1, 65), i -> q.v[i] * q.v[i]), (x, y) -> x + y) AS nb,
      |    CASE WHEN sqrt(na) * sqrt(nb) = 0 THEN 0.0 ELSE dt / (sqrt(na) * sqrt(nb)) END AS raw
      |  FROM vecs dv, (SELECT v FROM vecs WHERE doc_id = -1) q
      |  WHERE dv.doc_id >= 0)""".stripMargin

  val sql: String =
    s"""WITH $ctes
      |SELECT sc.doc_id, c.chunk, round(sc.raw, 5) AS score
      |FROM scored sc JOIN chunks c ON sc.doc_id = c.doc_id AND sc.chunk_index = c.chunk_index
      |ORDER BY sc.raw DESC, md5(CAST(sc.doc_id AS VARCHAR)), sc.chunk_index LIMIT 10""".stripMargin
}
