package graft.queries

/** DuckDB oracles for c10_dsir_weights / c11_dsir_select: a FULL
  * mechanism replay of DSIR importance weighting ([[graft.operators.Dsir]],
  * Xie et al. NeurIPS 2023) — unlike the c7/s13 fitted-literal oracles,
  * the "fit" here is pure counting, so the oracle RECOMPUTES the smoothed
  * bucket models from the raw tables (the stronger oracle class: a
  * counting bug on either side diverges).
  *
  * Replayed end to end in SQL: lowercase whitespace tokenization, word
  * unigrams + bigrams with positions, per-gram FNV-1a-64 over UTF-8 bytes
  * folded to the power-of-two bucket table (unsigned HUGEINT mod 2^k ==
  * the JVM's signed `& (dim-1)` — same masking contract as the c7
  * featurizer), add-α smoothed target/raw log-ratio per bucket, and the
  * per-document left-associative fold in (kind, pos) order — exactly the
  * engine's concat(unigrams, bigrams) gram order. `ln` is the only
  * transcendental; its cross-engine ulp spread is absorbed by round(4)
  * (the c9 convention), and c11's selection orders by the ROUNDED weight
  * on both sides so rank is rounding-stable.
  */
object C10OracleSql {

  val Dim = 4096
  val Alpha = 1.0
  val TargetLang = "en"
  val SelectN = 60

  private val fnvInit = "14695981039346656037::HUGEINT"
  private val fnvPrime = "1099511628211::HUGEINT"
  private val m64 = "18446744073709551616::HUGEINT"

  private def fnv(list: String): String =
    s"list_reduce(list_concat([$fnvInit], list_transform($list, b -> b::HUGEINT)), " +
      s"(h, b) -> (xor(h, b) * $fnvPrime) % $m64)"

  // UTF-8 byte expansion of a string (same helper shape as T6/C7OracleSql)
  private def utf8Bytes(s: String): String =
    s"flatten(list_transform(string_split($s, ''), ch -> " +
      "CASE WHEN unicode(ch) < 128 THEN [unicode(ch)] " +
      "WHEN unicode(ch) < 2048 THEN [192 + unicode(ch) // 64, 128 + unicode(ch) % 64] " +
      "WHEN unicode(ch) < 65536 THEN [224 + unicode(ch) // 4096, 128 + (unicode(ch) // 64) % 64, 128 + unicode(ch) % 64] " +
      "ELSE [240 + unicode(ch) // 262144, 128 + (unicode(ch) // 4096) % 64, 128 + (unicode(ch) // 64) % 64, 128 + unicode(ch) % 64] END))"

  /** Shared CTE chain ending in `dsir_agg(doc_id, n_grams, s)` (one row
    * per document WITH grams; gramless docs fall out of the LEFT JOIN in
    * the caller) and `dsir_tk(doc_id, ...)` for the domain. */
  private def ctes: String =
    s"""dsir_tk AS (SELECT doc_id, lang, list_filter(
       |    string_split_regex(lower(text), '\\s+'), t -> t <> '') AS t
       |  FROM documents),
       |dsir_g1 AS (SELECT doc_id, lang, unnest(t) AS g,
       |    unnest(range(1, len(t) + 1)) AS pos, 1 AS kind FROM dsir_tk),
       |dsir_g2 AS (SELECT doc_id, lang, t[i] || ' ' || t[i + 1] AS g,
       |    i AS pos, 2 AS kind
       |  FROM (SELECT doc_id, lang, t, unnest(range(1, len(t))) AS i FROM dsir_tk)),
       |dsir_gr AS (SELECT * FROM dsir_g1 UNION ALL SELECT * FROM dsir_g2),
       |dsir_bk AS (SELECT doc_id, lang, kind, pos,
       |    (${fnv(utf8Bytes("g"))} % $Dim::HUGEINT)::INT AS bucket FROM dsir_gr),
       |dsir_ct AS (SELECT bucket, count(*) AS c FROM dsir_bk
       |  WHERE lang = '$TargetLang' GROUP BY bucket),
       |dsir_cr AS (SELECT bucket, count(*) AS c FROM dsir_bk GROUP BY bucket),
       |dsir_tot AS (SELECT
       |    (SELECT coalesce(sum(c), 0) FROM dsir_ct) AS t_tot,
       |    (SELECT coalesce(sum(c), 0) FROM dsir_cr) AS r_tot),
       |dsir_lr AS (SELECT b.bucket,
       |    ln((coalesce(ct.c, 0) + $Alpha) / (tot.t_tot + $Alpha * $Dim))
       |      - ln((coalesce(cr.c, 0) + $Alpha) / (tot.r_tot + $Alpha * $Dim)) AS lr
       |  FROM (SELECT DISTINCT bucket FROM dsir_bk) b
       |  LEFT JOIN dsir_ct ct USING (bucket)
       |  LEFT JOIN dsir_cr cr USING (bucket), dsir_tot tot),
       |dsir_sc AS (SELECT bk.doc_id, bk.kind, bk.pos, lr.lr AS c
       |  FROM dsir_bk bk JOIN dsir_lr lr USING (bucket)),
       |dsir_agg AS (SELECT doc_id, count(*) AS n_grams,
       |    list_reduce(list(c ORDER BY kind, pos), (x, y) -> x + y) AS s
       |  FROM dsir_sc GROUP BY doc_id)""".stripMargin

  /** c10: every document's importance log-weight. */
  val weightsSql: String =
    s"""WITH $ctes
       |SELECT tk.doc_id,
       |  CAST(coalesce(agg.n_grams, 0) AS BIGINT) AS n_grams,
       |  round(coalesce(agg.s, 0.0), 4) + 0.0 AS log_weight
       |FROM dsir_tk tk LEFT JOIN dsir_agg agg USING (doc_id)
       |ORDER BY tk.doc_id""".stripMargin

  /** c11: the $SelectN most target-like documents, ordered by the ROUNDED
    * weight (rank is then rounding-stable across engines), id tiebreak. */
  val selectSql: String =
    s"""WITH $ctes
       |SELECT tk.doc_id,
       |  round(coalesce(agg.s, 0.0), 4) + 0.0 AS log_weight
       |FROM dsir_tk tk LEFT JOIN dsir_agg agg USING (doc_id)
       |ORDER BY log_weight DESC, tk.doc_id
       |LIMIT $SelectN""".stripMargin

  val ResampleSeed = 41L

  /** c15: Gumbel-top-k importance RESAMPLING — the paper's actual
    * selection (sampling without replacement ∝ exp(log_weight)), replayed
    * mechanism-for-mechanism: splitmix64(seed, doc_id) full avalanche →
    * u = (z >>> 11)·2⁻⁵³ + 2⁻⁵⁴ (exact IEEE ops, bit-identical across
    * engines) → key = log_weight − ln(−ln u) → top-k. `ln` spread is
    * absorbed by round(4) (the c9 convention); both sides rank by the
    * ROUNDED key with an id tiebreak (the c11 convention), so the
    * selected set is rounding-stable. */
  val resampleSql: String = {
    val m64 = "18446744073709551616::HUGEINT"
    s"""WITH $ctes,
       |g0 AS (SELECT doc_id, xor(doc_id::HUGEINT,
       |    ${SplitmixSql.seedMixed(ResampleSeed)}::HUGEINT) AS z FROM documents),
       |g1 AS (SELECT doc_id, ${SplitmixSql.mul("xor(z, z >> 30)", SplitmixSql.C1)} AS z FROM g0),
       |g2 AS (SELECT doc_id, ${SplitmixSql.mul("xor(z, z >> 27)", SplitmixSql.C2)} AS z FROM g1),
       |g3 AS (SELECT doc_id,
       |    ((xor(z, z >> 31) % $m64) >> 11)::DOUBLE / 9007199254740992.0
       |      + 5.551115123125783e-17 AS u FROM g2)
       |SELECT tk.doc_id,
       |  round(coalesce(agg.s, 0.0) - ln(-ln(g3.u)), 4) + 0.0 AS gumbel_key
       |FROM dsir_tk tk
       |LEFT JOIN dsir_agg agg USING (doc_id)
       |JOIN g3 USING (doc_id)
       |ORDER BY gumbel_key DESC, tk.doc_id
       |LIMIT $SelectN""".stripMargin
  }
}
