package graft.queries

/** DuckDB replay of the MinHash+LSH candidate MECHANISM
  * (graft.operators.Dedup.minhashLshPairs at the default k=128 / 16
  * bands / 8 rows per band, shingle=1) — the d1/d3/d4/c2 oracles gate the
  * operator's actual published semantics (banded-LSH candidates ∩ exact
  * unigram jaccard >= t, the Lee et al. 2022 / RefinedWeb operator)
  * instead of brute-force all-pairs jaccard, which an S-curve LSH at
  * production band width cannot and should not reproduce bit-for-bit.
  *
  * The replay is mechanism-exact:
  *  - per-token FNV-1a-64 over UTF-8 bytes + the kernel's shingle
  *    separator fold (TextKernels.minhashSignature), hashed once per
  *    DISTINCT token corpus-wide;
  *  - k=128 hash families via the splitmix64 avalanche mix(h, s)
  *    (TextKernels.mix) in HUGEINT limb arithmetic;
  *  - per-(doc, family) minimum taken over SIGNED BIGINT folds — the JVM
  *    kernel compares longs signed (the T6OracleSql rule);
  *  - candidates = doc pairs agreeing on ALL 8 family minima of at least
  *    one band. The engine keys buckets by xxhash64 of the band slice and
  *    additionally by the multiplicative size class; both are supersets
  *    in expectation-zero disagreement: an xxhash64 bucket collision
  *    surfaces a pair this replay lacks only if that pair ALSO passes
  *    exact jaccard >= t while sharing no real band (P < 1e-20), and the
  *    size-class key provably drops no band-sharing pair (LshShuffleSpec
  *    pins it).
  *
  * Ends in `lsh_pairs(ia, ib, jaccard)` with ia < ib, jaccard >= t.
  */
object LshOracleSql {
  import SplitmixSql.{mul, Golden, C1, C2}

  val K = 128
  val Bands = 16
  private val RowsPerBand = K / Bands

  private val FnvOffset = "14695981039346656037::HUGEINT"
  private val FnvPrime = "1099511628211::HUGEINT"
  private val Mod = "18446744073709551616::HUGEINT"

  /** CTE chain from `inRel(doc_id, toks)` — toks = DISTINCT lowercase
    * whitespace tokens — to `lsh_pairs(ia, ib, jaccard)`. Embed after a
    * `WITH` that already defines `inRel`.
    *
    * Empty-token rule: the JVM kernel (TextKernels.tokens) filters ''
    * before hashing, so a doc whose text carries edge whitespace that
    * survives trim (tab/newline) contributes no '' token to the ENGINE's
    * signature — the signature CTEs here filter '' to match, else band
    * keys diverge for such docs. '' stays in the jaccard verify (lsh_pairs
    * uses raw toks), which is also the engine's verify-side behavior. */
  def ctes(inRel: String, threshold: Double): String =
    s"""lsh_t AS (SELECT t FROM (SELECT DISTINCT unnest(toks) AS t FROM $inRel)
       |    WHERE t <> ''),
       |lsh_tb AS (SELECT t,
       |    flatten(list_transform(string_split(t, ''), ch ->
       |      CASE WHEN unicode(ch) < 128 THEN [unicode(ch)]
       |           WHEN unicode(ch) < 2048 THEN [192 + unicode(ch) // 64, 128 + unicode(ch) % 64]
       |           WHEN unicode(ch) < 65536 THEN [224 + unicode(ch) // 4096, 128 + (unicode(ch) // 64) % 64, 128 + unicode(ch) % 64]
       |           ELSE [240 + unicode(ch) // 262144, 128 + (unicode(ch) // 4096) % 64, 128 + (unicode(ch) // 64) % 64, 128 + unicode(ch) % 64]
       |      END)) AS bytes FROM lsh_t),
       |lsh_h AS (SELECT t, list_reduce(
       |      list_concat([$FnvOffset], list_transform(bytes, b -> b::HUGEINT)),
       |      (h, b) -> (xor(h, b) * $FnvPrime) % $Mod) AS h
       |    FROM lsh_tb),
       |lsh_hs AS (SELECT t, (xor(h, 32::HUGEINT) * $FnvPrime) % $Mod AS hb FROM lsh_h),
       |lsh_m0 AS (SELECT t, s, xor(hb, ${mul("s::HUGEINT", Golden)}) AS z
       |    FROM lsh_hs, (SELECT unnest(range(0, $K)) AS s)),
       |lsh_m1 AS (SELECT t, s, ${mul("xor(z, z >> 30)", C1)} AS z FROM lsh_m0),
       |lsh_m2 AS (SELECT t, s, ${mul("xor(z, z >> 27)", C2)} AS z FROM lsh_m1),
       |lsh_fv AS (SELECT t, s,
       |    CASE WHEN xor(z, z >> 31) >= 9223372036854775808::HUGEINT
       |         THEN CAST(xor(z, z >> 31) - $Mod AS BIGINT)
       |         ELSE CAST(xor(z, z >> 31) AS BIGINT) END AS v FROM lsh_m2),
       |lsh_sig AS (SELECT d.doc_id, f.s, min(f.v) AS m
       |    FROM (SELECT doc_id, t FROM
       |            (SELECT doc_id, unnest(toks) AS t FROM $inRel)
       |          WHERE t <> '') d
       |    JOIN lsh_fv f ON d.t = f.t GROUP BY d.doc_id, f.s),
       |lsh_band AS (SELECT doc_id, s // $RowsPerBand AS band,
       |      string_agg(CAST(m AS VARCHAR), ':' ORDER BY s) AS bkey
       |    FROM lsh_sig GROUP BY doc_id, s // $RowsPerBand),
       |lsh_cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
       |    FROM lsh_band a JOIN lsh_band b
       |      ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |lsh_pairs AS (SELECT c.ia, c.ib,
       |      CAST(len(list_intersect(x.toks, y.toks)) AS DOUBLE)
       |        / len(list_distinct(list_concat(x.toks, y.toks))) AS jaccard
       |    FROM lsh_cand c
       |    JOIN $inRel x ON c.ia = x.doc_id
       |    JOIN $inRel y ON c.ib = y.doc_id
       |    WHERE CAST(len(list_intersect(x.toks, y.toks)) AS DOUBLE)
       |        / len(list_distinct(list_concat(x.toks, y.toks))) >= $threshold)""".stripMargin
}
