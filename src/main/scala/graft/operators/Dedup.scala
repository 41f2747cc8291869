package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.VecFunctions._

/** Deduplication operators for training-data pipelines, each designed
  * around its shuffle profile at 100 TB:
  *
  *  - exact: groupBy on a 128-bit content hash (shuffles 16-byte keys,
  *    never full documents).
  *  - MinHash+LSH: signature → band keys → bucket self-join → exact
  *    verify. Only same-bucket pairs are joined, so the shuffle is
  *    O(docs × bands), not O(docs²).
  *  - SimHash: 64-bit sketch split into 4×16-bit bands (pigeonhole: any
  *    pair with Hamming ≤ 3 shares a band) → bucket join → bit_count
  *    verify.
  *  - n-gram Jaccard: exact verification primitive on candidate pairs.
  *  - embedding cosine: exact threshold pair-join (quadratic — correct
  *    baseline); the scale path blocks by LSH sign-bands first.
  */
object Dedup {

  /** One-slot registry of the scale-regime LSH signature cache: the next
    * lshGroupCandidates call releases the previous call's persist, so a
    * session never pins more than one signature frame (ADVICE r15).
    * Deliberate tradeoff: a caller that BUILDS candidate frames for two
    * corpora before EXECUTING the first one loses the first frame's cache
    * and re-pays its double minhash scan (results stay exact — the
    * persist is a cost optimization, and the sequential build-then-run
    * pattern of Verify/Bench/production pipelines keeps the slot live
    * through every job that needs it). Bounded memory wins over the
    * concurrent-builders corner. */
  private val lastScaleSig =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)
  /** One-slot registries for [[simhashPairs]]' sketch frame and
    * [[exactAgainst]]'s corpus-hash / bloom-positive frames — the same
    * bounded-pinning discipline as [[lastScaleSig]]: the next call
    * releases the previous call's persist, so a session never pins more
    * than one copy per operator family. */
  private val lastSimhashSk =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)
  private val lastAgainstCh =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)
  private val lastAgainstPos =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)
  /** One-slot registry for [[lshGroupCandidates]]' groups frame — the
    * tokenized corpus, the largest intermediate in the dedup family. It
    * used to be `.cache()`d with no release at all: every call pinned a
    * (g, ids, toks) copy for the session lifetime (unbounded storage pin
    * at 100 TB). Same bounded discipline as the other slots. */
  private val lastGroups =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)
  private[graft] def slotFrames: Seq[DataFrame] =
    Seq(lastScaleSig, lastSimhashSk, lastAgainstCh, lastAgainstPos, lastGroups)
      .flatMap(s => Option(s.get()))
  private def swapSlot(
      slot: java.util.concurrent.atomic.AtomicReference[DataFrame],
      next: DataFrame): Unit =
    Option(slot.getAndSet(next))
      .filter { prev =>
        // Spark's CacheManager matches cache entries by CANONICALIZED PLAN
        // (sameResult), not object identity. When a repeated call re-derives
        // a plan-identical frame (the memoized loader makes inputs
        // plan-identical), its persist() was a no-op against the EXISTING
        // entry — unpersisting `prev` here would evict the entry BOTH
        // frames share, leaving the fresh call silently uncached and
        // recomputing the sketch/signature on every join side. Keep the
        // shared entry; release only genuinely different plans.
        (prev ne next) &&
          !prev.queryExecution.analyzed.sameResult(next.queryExecution.analyzed)
      }
      .foreach(s => try { s.unpersist(); () } catch { case _: Throwable => () })

  /** Exact dedup: one representative (min id) + duplicate count per
    * identical content. */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  /** Corpus-size threshold for the LSH verify strategy. At or below it the
    * exact Jaccard verify runs INLINE in the band-join stream — the
    * candidate arrays ride the band exchange, one join, no pair-distinct
    * round-trip — which is cheaper when the whole corpus is small (the
    * ×2×bands payload blow-up of a sub-64 MB corpus is noise, while the
    * slim path's extra distinct + two verify joins cost two fixed shuffle
    * rounds). Above it, the band exchange ships only fixed-width
    * (g, sz, band, bucket) rows and candidate pairs verify once after a
    * 16-byte-row distinct — the 100 TB regime, where the array payload
    * (≈ 256 B per unique token across sides × bands) would dominate the
    * exchange. Judged from the input plan's Catalyst size estimate: no
    * extra job, deterministic per input. Tests pin a regime by setting
    * this (0 forces slim everywhere). */
  @volatile var inlineVerifyMaxCorpusBytes: Long =
    sys.props.get("graft.lsh.inlineVerifyMaxBytes").map(_.toLong)
      .getOrElse(64L * 1024 * 1024)

  /** Token-set (unigram) Jaccard between two string columns, as a Column. */
  def tokenJaccard(a: Column, b: Column): Column = {
    val ta = array_distinct(split(trim(lower(a)), "\\s+"))
    val tb = array_distinct(split(trim(lower(b)), "\\s+"))
    val inter = size(array_intersect(ta, tb)).cast("double")
    val uni = size(array_union(ta, tb)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** MinHash + banded LSH near-duplicate pairs, exact-verified.
    *
    * Banding defaults to the PRODUCTION shape: k=128, bands=16 → r=8 rows
    * per band (the Lee et al. 2022 / RefinedWeb regime, which runs r=8-20).
    * At the 0.9 threshold a true pair is caught with prob
    * 1-(1-0.9⁸)^16 ≈ 0.9999 (J=0.95 → 1-3e-8), while a random
    * stopword-sharing pair at J≈0.1-0.3 collides with prob J⁸ per band —
    * measured on a 1.5M-doc Zipf corpus this is the difference between
    * 172M false candidates (r=4: J_typ⁴·16·n²/2 — a quadratic knee, wall
    * b(last)=2.05 over the 500k→1.5M decade) and ~10⁵ (r=8: linear-work
    * asymptote restored). The r=4 setting is NOT scale-safe on natural
    * text: minhash argmins concentrate on head tokens, so 4-row bands
    * collide between unrelated documents at a constant per-pair rate.
    * Candidate recall is the LSH S-curve by contract (the published
    * operator's semantics); the exact Jaccard verify removes every false
    * positive, so precision is exact.
    *
    * Scale discipline (the measured hotspot on the very self-similar
    * corpus — 234 s → <20 s at sf0.1):
    *  1. docs with *identical token sets* collapse to one group up front
    *     (hash of the sorted distinct token array) — within-group pairs
    *     are jaccard 1.0 by construction, no LSH or verify needed;
    *  2. LSH and verification run over unique groups only;
    *  3. token-hash arrays are computed from the cached groups frame —
    *     candidate verification is a codegen merge-walk on precomputed
    *     sorted long arrays, never re-tokenization per pair;
    *  4. ABOVE the [[inlineVerifyMaxCorpusBytes]] gate, the band self-join
    *     exchanges ONLY (g, sz, band, bucket) — a fixed ~24 B/row payload
    *     independent of document length (the token-hash arrays never ride
    *     the ×bands shuffle);
    *  5. size-ratio prefilter: jaccard >= t forces
    *     min(|A|,|B|) >= t·max(|A|,|B|) — the multiplicative SIZE CLASS
    *     rides the band join KEY (qualifying pairs sit in the same or
    *     adjacent classes, so the probe side emits cls and cls+1 — exact,
    *     no candidate lost), splitting the stopword-driven giant buckets
    *     that otherwise make the self-join quadratic on heavy-head
    *     corpora; pairs that still straddle the ratio bound inside a
    *     class pair are dropped as they stream out of the join, before
    *     the pair-distinct;
    *  6. surviving candidate pairs distinct() on 16-byte (g_a, g_b) rows,
    *     then verify ONCE per pair by joining back to the cached groups
    *     (the small pair side broadcasts; worst case the token hashes
    *     shuffle once — never per band). AT OR BELOW the gate the verify
    *     instead runs inline in the band-join stream (arrays in the
    *     exchange, no pair-distinct round-trip) — cheaper when the whole
    *     corpus is small.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      k: Int = 128,
      bands: Int = 16,
      shingle: Int = 1): DataFrame = {
    val (groups, candidates) = lshGroupCandidates(df, idCol, textCol, threshold, k, bands, shingle)

    // (1) identical token sets: all within-group pairs at jaccard 1.0
    val within = groups.where(size(col("ids")) > 1)
      .select(col("ids"), explode(col("ids")).as("id_a"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .withColumn("jaccard", lit(1.0))

    // (4) expand group pairs to id pairs
    val ga = groups.select(col("g").as("g_a"), col("ids").as("ids_a"))
    val gb = groups.select(col("g").as("g_b"), col("ids").as("ids_b"))
    val cross = candidates
      .join(ga, "g_a").join(gb, "g_b")
      .select(col("ids_a"), col("ids_b"), col("jaccard"))
      .select(explode(col("ids_a")).as("ia"), col("ids_b"), col("jaccard"))
      .select(col("ia"), explode(col("ids_b")).as("ib"), col("jaccard"))
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), col("jaccard"))

    within.unionByName(cross)
  }

  /** Shared LSH core at GROUP granularity (docs with identical token sets
    * collapse to one node). Returns (groups = (g, ids, toks) cached,
    * candidates = verified distinct (g_a, g_b, jaccard) group pairs).
    */
  private def lshGroupCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      k: Int,
      bands: Int,
      shingle: Int): (DataFrame, DataFrame) = {
    val rows = k / bands
    val base = df.select(col(idCol).as("id"),
      array_sort(array_distinct(split(trim(lower(col(textCol))), "\\s+"))).as("toks"))

    val groups = base
      .groupBy(xxhash64(col("toks")).as("g"))
      .agg(collect_list(col("id")).as("ids"), first(col("toks")).as("toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bounded pinning (r18 verdict #2): the tokenized-corpus frame gets the
    // same one-slot release the signature frames have had since r15 —
    // without it every d1/d3/d4/c2 call pinned another full-corpus copy
    // for the session lifetime. MEMORY_AND_DISK, not the cache() default:
    // a corpus that outgrows storage memory must spill, not recompute the
    // tokenize on every consumer.
    swapSlot(lastGroups, groups)

    // verify-strategy choice (see [[inlineVerifyMaxCorpusBytes]]): the
    // Catalyst size estimate of the INPUT plan — file-size-derived for
    // scans, no job either way
    val inlineVerify =
      df.queryExecution.optimizedPlan.stats.sizeInBytes <=
        BigInt(inlineVerifyMaxCorpusBytes)

    // `th` = sorted 64-bit token hashes: the exact verify is a codegen
    // merge-walk over primitive longs, never per-pair re-tokenization (set
    // jaccard is hash-invariant).
    def thCol: Column = array_sort(transform(col("toks"), t => xxhash64(t)))
    def bandCols(sig: Column): Column =
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(sig, b * rows + 1, lit(rows)))))
    // size-ratio prefilter — necessary condition for jaccard >= t, applied
    // in the join stream before anything wider than the joined row exists
    def sizeCompatible: Column =
      least(col("sz_a"), col("sz_b")).cast("double") >=
        lit(threshold) * greatest(col("sz_a"), col("sz_b"))

    // SIZE-CLASS band key (the sf30 quadratic-knee fix, measured): on a
    // stopword-heavy corpus the minhash argmins concentrate on the few
    // head tokens, so band buckets collect O(n) unrelated docs and the
    // self-join materializes sum(m²) ∝ n² rows (measured 89M → 787M
    // candidate pairs over the 500k → 1.5M-doc decade). Valid pairs obey
    // min >= t·max, so multiplicative size classes of width ln(1/t) put
    // any qualifying pair in the SAME or ADJACENT classes — keying the
    // join by (band, bucket, class) with the probe side emitted at cls
    // and cls+1 splits the stopword buckets by size without dropping a
    // single candidate (a straddling pair joins via the probe's cls+1
    // emission; the 1e-9 slack absorbs ln() rounding at exact-ratio
    // boundaries). Orientation is decided per pair, not per row: same
    // class → keep g_a < g_b; adjacent classes → the match exists only at
    // the probe's cls+1 emission (a = larger class), exactly once.
    val sizeClass: Column => Column =
      if (threshold >= 1.0) sz => sz.cast("long")
      else {
        val w = -math.log(threshold) * (1 + 1e-9)
        sz => floor(log(sz.cast("double")) / lit(w)).cast("long")
      }
    def keepPair: Column =
      (col("cls") === col("cls_b") && col("g_a") < col("g_b")) ||
        col("cls") =!= col("cls_b")

    val candidates = if (inlineVerify) {
      // SMALL-CORPUS REGIME: arrays ride the band exchange and the verify
      // runs inline as pairs stream out of the join; only VERIFIED
      // near-dup pairs reach the distinct. One join, two shuffles total —
      // the payload blow-up is bounded by the corpus-size gate above.
      // persist here too (the scale regime always did): the a/b sides
      // below each re-derive `banded`, and WITHOUT the cache each would
      // recompute the k-hash minhash family over every group — measured
      // ~half of d1's CPU at sf0.1 duplicated. One-slot registry, same
      // bounded-pinning discipline as the scale branch.
      val sig = groups.select(col("g"), size(col("toks")).as("sz"),
        thCol.as("th"),
        minhashSignature(concat_ws(" ", col("toks")), k, shingle).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      swapSlot(lastScaleSig, sig)
      val banded = sig.select(col("g"), col("sz"), col("th"),
        bandCols(col("sig")).as(Seq("band", "bucket")))
      val a = banded.select(col("band"), col("bucket"),
        sizeClass(col("sz")).as("cls"), col("g").as("g_a"),
        col("sz").as("sz_a"), col("th").as("th_a"))
      val b = banded.select(col("band"), col("bucket"),
        explode(array(sizeClass(col("sz")), sizeClass(col("sz")) + 1)).as("cls"),
        sizeClass(col("sz")).as("cls_b"), col("g").as("g_b"),
        col("sz").as("sz_b"), col("th").as("th_b"))
      a.join(b, Seq("band", "bucket", "cls"))
        .where(keepPair)
        .where(sizeCompatible)
        .withColumn("jaccard",
          graft.functions.JaccardFunctions.sortedJaccardLong(col("th_a"), col("th_b")))
        .where(col("jaccard") >= threshold)
        .select(col("g_a"), col("g_b"), col("jaccard"))
        .distinct()
    } else {
      // SCALE REGIME: the band exchange ships ONLY (g, sz, band, bucket) —
      // 4 fixed-width columns, ~24 B/row regardless of document length
      // (token-hash arrays across sides × bands would otherwise dominate
      // the shuffle; LshShuffleSpec pins the slim payload in the plan).
      // persist the signature frame: the self-join's build and probe sides
      // would otherwise EACH recompute the k-family minhash over every
      // group (measured ~800 CPU-s per side at 1.5M docs); ~(8k+16) B/row
      // spills to disk if the corpus outgrows storage memory
      val sig = groups.select(col("g"), size(col("toks")).as("sz"),
        minhashSignature(concat_ws(" ", col("toks")), k, shingle).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // bounded pinning: release the PREVIOUS call's signature cache — a
      // Verify session running d1+d3+d4+c2 would otherwise accumulate one
      // ~(8k+16) B/group copy per call for the session lifetime. One-slot
      // registry instead of an eager checkpoint: the candidates must stay
      // a lazy plan (LshShuffleSpec pins the slim band exchange in it).
      swapSlot(lastScaleSig, sig)
      val banded = sig.select(col("g"), col("sz"),
        bandCols(col("sig")).as(Seq("band", "bucket")))
      val a = banded.select(col("band"), col("bucket"),
        sizeClass(col("sz")).as("cls"), col("g").as("g_a"), col("sz").as("sz_a"))
      val b = banded.select(col("band"), col("bucket"),
        explode(array(sizeClass(col("sz")), sizeClass(col("sz")) + 1)).as("cls"),
        sizeClass(col("sz")).as("cls_b"), col("g").as("g_b"), col("sz").as("sz_b"))

      // prefilter in the join stream, then distinct the surviving candidate
      // GROUP PAIRS — 16-byte rows — and verify each pair exactly once
      val candPairs = a.join(b, Seq("band", "bucket", "cls"))
        .where(keepPair)
        .where(sizeCompatible)
        .select(col("g_a"), col("g_b"))
        .distinct()

      // verify by joining the deduped pairs BACK to the cached groups: the
      // candidate side is small (true near-dups + size-compatible band
      // collisions), so AQE broadcasts it and the token-hash arrays are
      // computed map-side from the cache — they never enter a shuffle
      val th = groups.select(col("g"), thCol.as("th"))
      candPairs
        .join(th.select(col("g").as("g_a"), col("th").as("th_a")), Seq("g_a"))
        .join(th.select(col("g").as("g_b"), col("th").as("th_b")), Seq("g_b"))
        .withColumn("jaccard",
          graft.functions.JaccardFunctions.sortedJaccardLong(col("th_a"), col("th_b")))
        .where(col("jaccard") >= threshold)
        .select(col("g_a"), col("g_b"), col("jaccard"))
    }

    (groups, candidates)
  }

  /** Near-duplicate GROUPS: connected components over the verified
    * MinHash-LSH pair graph. Returns (id, group_id) for every document that
    * has at least one near-duplicate; group_id = min doc id in the
    * component (the canonical representative). Docs absent from the output
    * are singletons. This is the full dedup pipeline's clustering step —
    * "keep one per group" is then `where(col("id") === col("group_id"))`
    * anti-joined back, see [[deduplicate]].
    */
  def nearDupGroups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double): DataFrame = {
    // Components run over the GROUP graph (one node per unique token set),
    // never the expanded id-pair graph: identical docs form cliques whose
    // pair expansion is quadratic, but they're a single component node here.
    val (groups, cands) = lshGroupCandidates(df, idCol, textCol, threshold, 128, 16, 1)
    val comp = Components.minLabel(
      cands.select(col("g_a").as("a"), col("g_b").as("b")))
      .select(col("id").as("g"), col("component"))
    // active = groups with an external near-dup edge, plus multi-member
    // groups (internal jaccard-1.0 duplicates); component key = propagated
    // min group hash, or the group itself when only internal
    val active = groups.join(comp, Seq("g"), "left")
      .where(col("component").isNotNull || size(col("ids")) > 1)
      .select(coalesce(col("component"), col("g")).as("ck"), col("ids"))
    val exploded = active.select(col("ck"), explode(col("ids")).as("id"))
    // representative = min doc id across the whole component. A window min
    // over ck beats groupBy+self-join: one shuffle instead of two, and the
    // token-hashing `groups` lineage above is evaluated ONCE, not once per
    // consumer.
    exploded
      .withColumn("group_id",
        min("id").over(org.apache.spark.sql.expressions.Window.partitionBy("ck")))
      .select(col("id").as(idCol), col("group_id"))
  }

  /** End-to-end near-dup deduplication: drop every document whose group
    * representative (min id at `threshold` near-duplicity) is a different
    * document. Keeps all singletons plus one representative per group —
    * the operator a 100 TB pretraining pipeline runs before tokenization.
    */
  def deduplicate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double): DataFrame = {
    val drop = nearDupGroups(df, idCol, textCol, threshold)
      .where(col(idCol) =!= col("group_id"))
      .select(col(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** Exact dedup of an incoming batch AGAINST an existing corpus — the
    * incremental-crawl shape: "which of today's documents already exist in
    * the 100 TB historical corpus?" A plain join would shuffle the batch
    * against the corpus hash set; instead the corpus's content hashes fold
    * into a Bloom filter ONCE (one corpus scan, a few GB of bits for
    * billions of documents at 1% fpp), the filter broadcasts, and the
    * batch probes it MAP-SIDE. Only bloom-POSITIVE rows (true duplicates
    * plus the fpp sliver) reach the exact semi-join that removes false
    * positives — so the result is EXACT while the shuffle is O(duplicates),
    * not O(batch), and the corpus is never re-shuffled at all.
    *
    * Returns (idCol, is_dup) for every batch row. `expectedItems` sizes
    * the filter (0 ⇒ one count() of the corpus). The probe is a tiny UDF
    * by necessity — Spark's sketch lives outside codegen — but it runs
    * in the scan stage; everything downstream is BROADCAST hash joins
    * with the corpus always on the streaming side. The broadcast working
    * set is the positive-hash set (≈ duplicates + fpp·|batch|) — bounded
    * by the batch, which is the small side by the operator's definition.
    */
  def exactAgainst(
      corpus: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      expectedItems: Long = 0L,
      fpp: Double = 0.01): DataFrame = {
    // persist the corpus-hash column: the bloom build AND the exact
    // verify semi-join both need it, and without the cache each would
    // re-scan the corpus text + recompute md5 — at 100 TB that is two
    // full corpus passes where one suffices (the cached column is
    // ~48 B/row, spilling to disk past storage memory).
    val ch = corpus.select(md5(col(textCol)).as("__h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    swapSlot(lastAgainstCh, ch)
    val items = if (expectedItems > 0) expectedItems else math.max(1L, ch.count())
    val bf = ch.stat.bloomFilter("__h", items, fpp)
    val bfB = batch.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((h: String) => h != null && bfB.value.mightContainString(h))
    val b = batch.select(col(idCol), md5(col(textCol)).as("__h"))
    // persist the bloom-positive rows (duplicates + the fpp sliver — the
    // small side by the operator's contract): they feed BOTH the matched
    // broadcast and the confirmed join, and each consumer would
    // otherwise re-scan the batch text + md5 + bloom probe.
    val positives = b.where(mightContain(col("__h")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    swapSlot(lastAgainstPos, positives)
    // Verify with the CORPUS STREAMING and the small side broadcast-built:
    // Spark only broadcast-builds the LEFT of inner/right-outer joins, so
    // `positives left_semi corpus` would shuffle the whole corpus hash set
    // — exactly what this operator exists to avoid. Instead the corpus
    // semi-probes the broadcast positive-hash set map-side (its matching
    // hashes are duplicate-sized), and the batch resolves against those.
    val matched = ch
      .join(broadcast(positives.select(col("__h")).distinct()), Seq("__h"), "left_semi")
      .distinct()
    val confirmed = positives
      .join(broadcast(matched), Seq("__h"), "left_semi")
      .select(col(idCol)).withColumn("__dup", lit(true))
    // id frame straight off the batch (same rows as b.select(idCol), but
    // column-pruned at the scan — no md5 evaluation for the id list)
    batch.select(col(idCol)).join(broadcast(confirmed), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__dup"), lit(false)).as("is_dup"))
  }

  /** [[exactAgainst]] as a gate: the batch rows NOT already in the corpus
    * (what an incremental ingest appends). */
  def newAgainst(
      corpus: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      expectedItems: Long = 0L,
      fpp: Double = 0.01): DataFrame =
    batch.join(
      exactAgainst(corpus, batch, idCol, textCol, expectedItems, fpp)
        .where(!col("is_dup")).select(col(idCol)),
      Seq(idCol), "left_semi")

  /** SimHash near-dup pairs at Hamming distance <= maxHamming (default 3),
    * EXACT by multi-index pigeonhole (Norouzi et al., "Fast Search in
    * Hamming Space with Multi-Index Hashing", CVPR 2012): the 64-bit
    * sketch splits into m = ceil((maxHamming+1)/2) parts; <= 2m-1 total
    * errors means SOME part differs in <= 1 bit, so the probe side emits
    * each part value plus all its one-bit flips and the join key is the
    * part. Radius <= 3 uses 2x32-bit parts, radius 4..5 uses 3 parts of
    * 22/21/21 bits; above 5 the operator refuses (contract pinned in
    * TextDedupSpec) rather than degrade into <=16-bit parts.
    *
    * Scale shape: the previous 4x16-bit exact-match bands collide between
    * UNRELATED docs once n approaches 2^16 per band — bucket sizes grow
    * ~n/65536 and the self-join streams sum(m^2) ~ n^2/65536 candidate
    * pairs through the distinct (the d1 knee's sibling). 32-bit keys put
    * random collisions at ~n^2/2^32 (negligible through billions of
    * docs) and 21-bit keys at ~n^2/2^21 per band (sub-quadratic well past
    * 10M docs); the price is a fixed (width+1)x probe-side emission of
    * 12-byte rows, linear in n.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    // m one-bit-probed substrings are exact for hamming <= 2m-1 (some part
    // must then differ in <= 1 bit): radius <= 3 rides 2x32-bit parts
    // (collisions ~n²/2³²), radius <= 5 pays 3x~21-bit parts (~n²/2²¹ per
    // band — still sub-quadratic far past 10M docs, but a measurably
    // larger constant, so the narrow scheme stays the default). Beyond 5
    // the parts would shrink to <=16 bits — the bucket-saturation regime
    // the r15 knee hunt measured at b(last)=2.0 — so refuse loudly rather
    // than silently degrade.
    require(maxHamming <= 5,
      s"simhashPairs is exact only for maxHamming <= 5 " +
        s"(3-part multi-index pigeonhole); got $maxHamming")
    val nParts = if (maxHamming <= 3) 2 else 3
    // widths sum to 64; first part takes the remainder (22/21/21 at m=3)
    val widths = Array.tabulate(nParts)(i =>
      if (i == 0) 64 - (64 / nParts) * (nParts - 1) else 64 / nParts)
    val offsets = widths.scanLeft(0)(_ + _).init
    // persist the (id, sketch) frame: the band self-join's build and probe
    // sides would otherwise EACH re-run the full text scan + simhash64
    // fold (measured: two 1-task jobs of 0.7-1.0 s each at sf0.1, i.e.
    // two corpus scans at any scale — the sketch is 16 B/row, so caching
    // it costs ~nothing next to recomputing it). A/B'd WITHOUT a
    // pre-sketch spread exchange: the exchange cost ~2 extra cpu-s for
    // no wall win at sf0.1, so the sketch computes wherever the scan
    // runs and only the cached 16 B/row frame fans out.
    val sk = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    swapSlot(lastSimhashSk, sk)
    def part(i: Int): Column =
      shiftrightunsigned(col("sk"), offsets(i))
        .bitwiseAND(lit((1L << widths(i)) - 1))
    // build side: one row per part
    val a = sk.select(col("id").as("id_a"), col("sk").as("sk_a"),
      posexplode(array((0 until nParts).map(part): _*)).as(Seq("band", "bucket")))
    // probe side: each part value and its width_i one-bit flips
    val b = sk.select(col("id").as("id_b"), col("sk").as("sk_b"),
      posexplode(array((0 until nParts).map(i =>
        array(part(i) +: (0 until widths(i)).map(bit =>
          part(i).bitwiseXOR(lit(1L << bit))): _*)): _*))
        .as(Seq("band", "probes")))
      .select(col("id_b"), col("sk_b"), col("band"),
        explode(col("probes")).as("bucket"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sk_a"), col("sk_b")).distinct()
      .withColumn("hamming", hamming64(col("sk_a"), col("sk_b")))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Exact embedding near-duplicate pairs: all (a,b) with cosine >= threshold.
    * Quadratic self-join — the exact baseline. At cluster scale, call with a
    * pre-blocked frame (e.g. SRP sign buckets) or use [[srpBlockedPairs]].
    */
  def embeddingPairsExact(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", cosineSimilarity(col("v_a"), col("v_b")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", 2023): semantic
    * deduplication via CLUSTER-SCOPED cosine pruning. K-means partitions
    * the embedding space; near-duplicate pairs are only sought WITHIN a
    * cluster, so the quadratic pair work is bounded by cluster size
    * instead of corpus size — the published trick that makes semantic
    * dedup tractable at web scale. Deterministic keep rule (a
    * simplification of the paper's keep-one-per-group): a vector is
    * dropped iff a SMALLER-id vector above `threshold` cosine shares its
    * cluster.
    *
    * Spark shape: the seeded MLlib KMeans fits distributed; the fitted
    * centroids become plan literals, so assignment (argmax cosine, ties
    * to the lower centroid index) is a map-side expression — the only
    * shuffle is the within-cluster pair join, keyed by cluster id. For
    * cluster counts beyond a few hundred, assign through a broadcast
    * centroid join instead of literals (the IvfIndex path).
    *
    * Returns (idCol, cluster, is_kept) for every input row.
    */
  def semDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 16,
      threshold: Double = 0.97,
      seed: Long = 42L,
      maxIter: Int = 20,
      // pre-fit centroids (skips the KMeans; what the e2 oracle shares)
      fittedCenters: Option[Array[Array[Float]]] = None): DataFrame = {
    val centers = fittedCenters.getOrElse(
      semDedupCentroids(df, vecCol, k, seed, maxIter))
    val centStructs = array(centers.zipWithIndex.map { case (c, i) =>
      struct((-cosineSimilarity(col(vecCol), floatVec(c.toIndexedSeq))).as("d"),
        lit(i).as("ci"))
    }: _*)
    // cache: both pair-join sides would otherwise re-evaluate the k-cosine
    // assignment expression. The cache is RELEASED before returning —
    // the dropped-id set (one compact id column) materializes eagerly
    // while the cache is live, and the final join re-derives the
    // assignment in one map-side pass; a lazy return would instead pin
    // the cached relation for the session lifetime on every call.
    val assigned = df.select(col(idCol), col(vecCol),
      array_min(centStructs).getField("ci").as("cluster")).cache()
    val a = assigned.select(col("cluster"), col(idCol).as("__ida"), col(vecCol).as("__va"))
    val b = assigned.select(col("cluster"), col(idCol).as("__idb"), col(vecCol).as("__vb"))
    val dropped =
      try a.join(b, Seq("cluster"))
        .where(col("__ida") < col("__idb"))
        .where(cosineSimilarity(col("__va"), col("__vb")) >= threshold)
        .select(col("__idb").as(idCol)).distinct()
        .withColumn("__drop", lit(true))
        .localCheckpoint()
      finally assigned.unpersist()
    assigned.join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        coalesce(!col("__drop"), lit(true)).as("is_kept"))
  }

  /** [[semDedup]] as a gate: the semantically-deduplicated corpus. */
  def semDeduplicate(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int = 16, threshold: Double = 0.97, seed: Long = 42L): DataFrame =
    df.join(
      semDedup(df, idCol, vecCol, k, threshold, seed)
        .where(col("is_kept")).select(col(idCol)),
      Seq(idCol), "left_semi")

  /** Seeded distributed KMeans fit over an `array<float>` column — the
    * centroids behind [[semDedup]] (exposed so oracles can inline them). */
  def semDedupCentroids(
      df: DataFrame, vecCol: String, k: Int, seed: Long = 42L,
      maxIter: Int = 20): Array[Array[Float]] = {
    val toVec = udf { v: scala.collection.Seq[Float] =>
      org.apache.spark.ml.linalg.Vectors.dense(v.map(_.toDouble).toArray)
    }
    val feats = df.select(toVec(col(vecCol)).as("features"))
    new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setSeed(seed).setMaxIter(maxIter)
      .fit(feats).clusterCenters.map(_.toArray.map(_.toFloat))
  }

  /** Signed-random-projection blocked near-dup pairs: bucket by the sign
    * pattern of `nPlanes` fixed pseudo-random hyperplanes, compare within
    * buckets only. Approximate (high-cosine pairs agree on sign bits with
    * prob 1 - θ/π per plane); the scale path for [[embeddingPairsExact]].
    */
  def srpBlockedPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      nPlanes: Int = 8,
      seed: Long = 42L): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(nPlanes)(Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
    val bucketCol = (0 until nPlanes).map { p =>
      (vecDot(col(vecCol), floatVec(planes(p).toIndexedSeq)) > 0).cast("int") * (1 << p)
    }.reduce(_ + _)
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("v"), bucketCol.as("bucket"))
    val a = bucketed.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cos", cosineSimilarity(col("v_a"), col("v_b")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
