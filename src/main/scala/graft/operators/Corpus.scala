package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Composed training-data curation: the standard pretraining front door
  * (language gate → quality gate → exact dedup → per-doc stats) as ONE
  * declarative pipeline, so Catalyst fuses the whole thing.
  *
  * Plan shape (the 100 TB contract): the language and quality gates are
  * pure codegen column kernels evaluated IN the parquet scan stage — no
  * shuffle, and the corpus shrinks before anything wide runs. The only
  * shuffle in the pipeline is the dedup window, keyed on the 16-byte
  * md5(text) of the SURVIVORS, so filter selectivity directly cuts
  * exchange bytes. Every stage is deterministic and SQL-replayable — the
  * c1 oracle replays gate → gate → dedup → stats end to end.
  */
object Corpus {

  /** Curate `docs(idCol, textCol)`: keep documents whose detected language
    * is `lang` and whose quality score (composite length / alpha-ratio /
    * stopword heuristic, [[TextFunctions.qualityScore]]) clears
    * `minQuality`, collapse byte-identical texts to their min-id
    * representative, then (optionally) near-deduplicate the survivors with
    * MinHash+LSH at `nearDupThreshold` keeping one representative per
    * near-dup component — the curation-grade stage real pretraining
    * pipelines run between exact dedup and tokenization. Near-dedup runs
    * AFTER the gates and exact dedup, so its LSH cost is paid only on the
    * documents that survived everything cheaper. Output: (idCol, lang,
    * quality, n_tokens, n_bpeish), one row per kept document. */
  def curate(
      docs: DataFrame, idCol: String, textCol: String,
      lang: String = "en", minQuality: Double = 0.3,
      nearDupThreshold: Option[Double] = None): DataFrame = {
    val gated = docs
      .withColumn("lang", TextFunctions.langId(col(textCol)))
      .where(col("lang") === lang)
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .where(col("quality") >= minQuality)
    val byText = Window.partitionBy(md5(col(textCol)))
    val exactKept = gated
      .withColumn("__rep", min(col(idCol)).over(byText))
      .where(col(idCol) === col("__rep"))
    val kept = nearDupThreshold.foldLeft(exactKept)((df, t) =>
      Dedup.deduplicate(df, idCol, textCol, t))
    kept.select(col(idCol), col("lang"), col("quality"),
      TextFunctions.tokenCount(col(textCol)).as("n_tokens"),
      TextFunctions.bpeishTokenCount(col(textCol)).as("n_bpeish"))
  }

  /** md5 of every n-token window of the token-array column `toks` (empty
    * below n tokens) — all built-ins, so the grams compute inside the scan
    * stage and replay in SQL. `toks` MUST be a materialized column (an
    * attribute), not a `split(...)` expression: inside the transform
    * lambda an expression re-evaluates per window, turning the gram pass
    * quadratic in document length. */
  private def ngramHashes(toks: Column, n: Int): Column =
    // xxhash64, not md5: the gram key never leaves the plan (the d5 result
    // is doc_ids; its oracle joins RAW gram strings), so the only
    // requirements are determinism and collision-resistance at corpus
    // gram cardinality — xxhash64 is ~an order of magnitude cheaper per
    // gram than md5 and makes the semi-join key an 8-byte long instead of
    // a 32-char hex string (guide §2.3 "narrower types": smaller
    // broadcast, cheaper probe)
    transform(ngrams(toks, n), g => xxhash64(g))

  /** Benchmark decontamination — drop every corpus document sharing ANY
    * n-token window with the benchmark/eval corpus (the eval-leakage gate
    * pretraining pipelines run before training; n-gram overlap is the
    * standard published criterion). Shuffle profile at 100 TB: the
    * benchmark side is eval-set-sized, so its distinct gram hashes
    * BROADCAST; the corpus's exploded grams are filtered map-side by the
    * broadcast semi-join and only the (rare) contaminated ids reach the
    * distinct — the corpus itself is never shuffled. */
  def decontaminate(
      corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 8): DataFrame = {
    def grams(df: DataFrame, text: String, keep: Seq[Column]): DataFrame = df
      .withColumn("__toks", split(trim(lower(col(text))), "\\s+"))
      .select(keep :+ explode(ngramHashes(col("__toks"), n)).as("__g"): _*)
    val benchGrams = grams(benchmark, benchTextCol, Nil).distinct()
    val contaminated = grams(corpus, textCol, Seq(col(idCol)))
      .join(broadcast(benchGrams), Seq("__g"), "left_semi")
      .select(col(idCol)).distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Language-model perplexity scoring — the CCNet quality gate (Wenzek
    * et al., "CCNet: Extracting High Quality Monolingual Datasets from
    * Web Crawl Data", LREC 2020): score each document's perplexity under
    * an n-gram LM trained on a trusted reference corpus and filter on it
    * (low perplexity ≈ reference-like prose, high ≈ boilerplate/garble).
    * CCNet uses a KenLM 5-gram model; the offline stand-in here is an
    * add-α bigram LM with the same scoring contract —
    * P(w|h) = (c(h,w) + α) / (c(h) + α·V), ppl = exp(−Σ ln P / N) over a
    * document's N = len−1 bigrams, c(h) = Σ_w c(h,w), V = |vocab of the
    * reference corpus|.
    *
    * Spark-first and fully distributed: the LM lives as COUNT FRAMES, the
    * scoring join streams the corpus's (id, pos, w1, w2) rows against
    * them (the LM side is vocabulary-sized — Catalyst broadcasts it), and
    * the per-document sum folds LEFT-ASSOCIATIVELY over the
    * position-sorted ln-probabilities, so the float math is run-stable
    * and replays IEEE-identically in SQL — the c6 oracle gates the ppl
    * values themselves.
    *
    * Scale hardening: the LM frames carry an explicit broadcast() hint
    * (KenLM ships the model to every node — same architecture), the
    * lookup keys are 64-bit xxhash64 fingerprints so the stream side is
    * fixed-width, and the per-document fold is BLOCKED ([[blockedLnSum]])
    * so agg state stays bounded on million-token documents.
    *
    * Output: (idCol, n_bigrams, ppl), ppl null for docs under 2 tokens.
    */
  def perplexityStats(
      docs: DataFrame, idCol: String, textCol: String,
      lmCorpus: DataFrame, lmTextCol: String, alpha: Double = 0.1): DataFrame = {
    require(alpha > 0, s"smoothing alpha must be positive, got $alpha")
    def bigrams(df: DataFrame, text: String, keep: Seq[Column]): DataFrame = {
      val toked = df.withColumn("__toks", split(trim(lower(col(text))), "\\s+"))
      toked.select(keep :+ explode(
          when(size(col("__toks")) >= 2,
            transform(sequence(lit(1), size(col("__toks")) - 1),
              i => struct(i.as("pos"),
                element_at(col("__toks"), i).as("w1"),
                element_at(col("__toks"), i + 1).as("w2"))))
            .otherwise(array().cast("array<struct<pos:int,w1:string,w2:string>>"))
        ).as("__b"): _*)
        .select(keep :+ col("__b.pos") :+ col("__b.w1") :+ col("__b.w2"): _*)
    }
    val lmBigrams = bigrams(lmCorpus, lmTextCol, Nil)
    // localCheckpoint (eager): c2 feeds BOTH lookup frames (c2h directly,
    // c1 by re-aggregation) — without it the corpus-sized count aggregate
    // runs twice — and makes the broadcast-ceiling row count below a
    // metadata-cheap job instead of a second scan.
    val c2 = lmBigrams.groupBy("w1", "w2").agg(count(lit(1)).as("__c2"))
      .localCheckpoint()
    // c(h) = Σ_w c(h,w): derived from the vocabulary-sized c2 aggregate,
    // not a second corpus scan
    val c1 = c2.groupBy("w1").agg(sum(col("__c2")).as("__c1"))
    // 64-bit join fingerprints (codegen xxhash64): counts stay STRING-
    // keyed (exact), but the lookup joins carry only fixed-width hashes —
    // if the broadcast below ever fell back to an exchange it would ship
    // 8-byte keys, never word strings. Exactness modulo 64-bit collisions
    // (≈n²/2⁶⁵ expected merges — KenLM's own hashed probing accepts the
    // same class of risk).
    val c2h = c2.select(xxhash64(col("w1"), col("w2")).as("__j2"), col("__c2"))
    val c1h = c1.select(xxhash64(col("w1")).as("__j1"), col("__c1"))
    // V = reference-corpus vocabulary over ALL positions (a single-token
    // reference doc contributes to V though it yields no bigram). This is
    // an eager driver value — the smoothing term is a plan literal. The
    // broadcast-ceiling row count of the (checkpointed, cheap-to-rescan)
    // c2 frame folds into the SAME aggregate via a tagged union — the c9
    // trick: no standalone count() job just to size the gate.
    val tok = lmCorpus
      .select(explode(split(trim(lower(col(lmTextCol))), "\\s+")).as("w"),
        lit(true).as("__isTok"))
    val stats = tok.unionByName(
        c2.select(col("w1").as("w"), lit(false).as("__isTok")))
      .agg(countDistinct(when(col("__isTok"), col("w"))),
        count(when(!col("__isTok"), 1))).head()
    val v = stats.getLong(0)
    val c2Rows = stats.getLong(1)
    require(v > 0,
      "perplexityStats: the reference corpus is empty — an LM with V = 0 " +
        "has a zero smoothing denominator and cannot score anything")
    // the word strings are projected away BEFORE the joins: the stream
    // side carries (id, pos, j2, j1) fixed-width rows only. The LM frames
    // carry an EXPLICIT broadcast hint — the reference deployment (CCNet/
    // KenLM) ships the full model to every node, so the hint is the
    // honest contract, not the optimizer's 10 MB good mood (ExplainCheck
    // re-asserts the plan with autoBroadcastJoinThreshold disabled).
    val scored = bigrams(docs, textCol, Seq(col(idCol)))
      .select(col(idCol), col("pos"),
        xxhash64(col("w1"), col("w2")).as("__j2"),
        xxhash64(col("w1")).as("__j1"))
      .join(lmJoinSide(c2h, c2Rows), Seq("__j2"), "left")
      .join(lmJoinSide(c1h, c2Rows), Seq("__j1"), "left")
      .withColumn("__lnp", log(
        (coalesce(col("__c2"), lit(0L)) + lit(alpha)) /
          (coalesce(col("__c1"), lit(0L)) + lit(alpha * v))))
      .transform(blockedLnSum(idCol, "__lnp", "n_bigrams"))
      .withColumn("ppl", exp(-col("__s") / col("n_bigrams")))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"), col("ppl"))
  }

  /** Fold-block width for [[blockedLnSum]] — positions per level-1 block. */
  private[graft] val FoldBlockSize = 1024

  /** Broadcast ceiling for the LM count frames, in rows. Spark HARD-FAILS
    * broadcast relations past 8 GB, so an unconditional hint would turn a
    * giant reference corpus into a job abort where a shuffle join merely
    * degrades. These frames are fixed-width ((k,) 8-byte fingerprint,
    * 8-byte count — ~80 bytes/row as a HashedRelation). The scoring plan
    * holds TWO hinted frames live at once (c2h bigram + c1h unigram
    * lookups, both gated on the same c2 row count), so the ceiling is
    * sized for the PAIR: 25M rows ≈ 2 GB each, ≤ 4 GB summed — half the
    * hard limit even with both resident plus build overheads. */
  private[graft] val LmBroadcastMaxRows = 25L * 1000 * 1000

  /** The LM lookup side: broadcast (the KenLM ship-the-model architecture)
    * while the frame fits under [[LmBroadcastMaxRows]]; above it, hand the
    * frame to the optimizer un-hinted — the fallback exchange ships only
    * the fixed-width fingerprint keys, never gram strings. */
  private def lmJoinSide(frame: DataFrame, rows: Long): DataFrame =
    if (rows <= LmBroadcastMaxRows) broadcast(frame) else frame

  /** Per-document left-associative ln-score sum with BOUNDED aggregation
    * state: positions fold inside fixed-size blocks of [[FoldBlockSize]]
    * (each level-1 agg row buffers ≤ 1024 (pos, ln) structs), then the
    * block sums fold in block order (≤ ⌈maxPos/1024⌉ structs) — a
    * million-token document peaks at ~32 KB of agg state instead of the
    * ~16 MB a flat collect_list would buffer (the bounded-memory contract
    * c7's scan-fused fold already meets). Both levels seed 0.0 and add in
    * sorted order, so the result is deterministic and SQL-replayable; the
    * two-level grouping is PART of the float contract — the c6/c9 oracles
    * run the identical blocked fold ((b₁+b₂)+b₃ over block sums, not a
    * flat positional fold). Expects (idCol, pos, lnCol) rows; emits
    * (idCol, nCol, __s). */
  private def blockedLnSum(idCol: String, lnCol: String, nCol: String)(
      df: DataFrame): DataFrame =
    df.groupBy(col(idCol),
        floor((col("pos") - 1) / FoldBlockSize).cast("int").as("__blk"))
      .agg(count(lit(1)).as("__nb"),
        aggregate(
          sort_array(collect_list(struct(col("pos"), col(lnCol)))),
          lit(0.0),
          (acc, x) => acc + x.getField(lnCol)).as("__sb"))
      .groupBy(col(idCol))
      .agg(sum(col("__nb")).as(nCol),
        aggregate(
          sort_array(collect_list(struct(col("__blk"), col("__sb")))),
          lit(0.0),
          (acc, x) => acc + x.getField("__sb")).as("__s"))

  /** [[perplexityStats]] as a gate: keep documents at or under `maxPpl`
    * (docs too short to score pass — length gates own that case). */
  def perplexityFilter(
      docs: DataFrame, idCol: String, textCol: String,
      lmCorpus: DataFrame, lmTextCol: String,
      maxPpl: Double, alpha: Double = 0.1): DataFrame = {
    val stats = perplexityStats(docs, idCol, textCol, lmCorpus, lmTextCol, alpha)
    docs.join(
      stats.where(col("ppl").isNull || col("ppl") <= maxPpl).select(col(idCol)),
      Seq(idCol), "left_semi")
  }

  /** Per-position n-gram lookup rows for [[ngramLmStats]]: one row per
    * (document, position, gram order k ≤ min(pos, order)) carrying the
    * k-gram ENDING at the position (`g`) and its length-(k−1) history
    * (`h`, empty string at k=1). The same generator tokenizes the
    * reference corpus (count side) and the scored documents (query side),
    * so gram strings cannot drift between the two. */
  private def ngramRows(
      df: DataFrame, textCol: String, keep: Seq[Column], order: Int): DataFrame = {
    // empty tokens are FILTERED (split of a whitespace-only string yields
    // [""]): an empty document must produce zero positions — n_tokens 0,
    // ppl null, gate passes — not a single ""-token scored at the OOV
    // floor
    val toked = df
      .withColumn("__toks",
        filter(split(trim(lower(col(textCol))), "\\s+"), t => t =!= ""))
      .withColumn("__n", size(col("__toks")))
    toked.select(keep :+ explode(
        // guard: sequence(1, 0) would DESCEND ([1,0]) for an empty doc
        when(col("__n") >= 1, flatten(
          transform(sequence(lit(1), col("__n")), i =>
            transform(sequence(lit(1), least(i, lit(order))), k =>
              struct(i.as("pos"), k.as("k"),
                array_join(slice(col("__toks"), i - k + 1, k), " ").as("g"),
                array_join(slice(col("__toks"), i - k + 1, k - 1), " ").as("h"))))))
          .otherwise(array().cast(
            "array<struct<pos:int,k:int,g:string,h:string>>"))).as("__r"): _*)
      .select(keep ++ Seq(col("__r.pos"), col("__r.k"), col("__r.g"), col("__r.h")): _*)
  }

  /** Backoff 5-gram LM perplexity — the order CCNet's actual filter runs
    * at (Wenzek et al. 2020 score with a KenLM 5-gram; [[perplexityStats]]
    * remains the add-α bigram fallback for corpora too small to populate
    * higher orders). Smoothing is Stupid Backoff (Brants et al., "Large
    * Language Models in Machine Translation", EMNLP 2007 — the published
    * LARGE-SCALE choice precisely because it needs only raw counts, no
    * discount statistics): S(w|h) = c(h,w)/c(h) when the full gram was
    * seen, else λ·S(w|backoff(h)) with λ = 0.4, grounding at an add-α
    * unigram so OOV tokens score finitely. Scores are not normalized
    * probabilities (Brants' point); exp(−Σ ln S / N) is the same
    * reference-likeness ranking CCNet thresholds on.
    *
    * Spark-first shape, extending the bigram design: ALL orders' counts
    * live in ONE (k, gram, count) frame (built by the same position
    * generator that scores documents), each document position joins that
    * frame twice (gram hit + history count — the history is a contiguous
    * subgram, so a gram hit implies its history hit), the longest
    * matching order wins via struct-max, and the per-document sum is the
    * BLOCKED left-associative fold of [[blockedLnSum]] — run-stable,
    * bounded agg state, SQL-replayable (the c9 oracle replays the
    * identical two-level fold and gates the ppl values). The count
    * frame is reference-corpus-sized: CCNet's reference is
    * Wikipedia-scale, so at 100 TB the two joins broadcast the LM (KenLM
    * ships the same counts to every node as a binary blob) and the corpus
    * itself never shuffles for scoring — only the per-document fold
    * exchanges fixed-width (pos, lnS) rows.
    *
    * Output: (idCol, n_tokens, ppl) — every document with ≥1 token
    * scores (the unigram ground covers length-1 docs; the bigram op
    * nulls those).
    */
  def ngramLmStats(
      docs: DataFrame, idCol: String, textCol: String,
      lmCorpus: DataFrame, lmTextCol: String,
      order: Int = 5, lambda: Double = 0.4, alpha: Double = 0.1): DataFrame = {
    require(order >= 2, s"order must be >=2, got $order")
    require(lambda > 0 && lambda <= 1, s"backoff lambda must be in (0,1], got $lambda")
    require(alpha > 0, s"smoothing alpha must be positive, got $alpha")
    // localCheckpoint (eager): THREE consumers — the driver-side unigram
    // totals plus the two join sides — would each re-run the full
    // reference explode+aggregate otherwise (the reference is
    // Wikipedia-scale in the CCNet deployment this models)
    //
    // 64-bit gram fingerprints (codegen xxhash64) are taken BEFORE the
    // fit aggregate, so the fit exchange ships fixed-width (k, gid) keys
    // — never the up-to-5-token gram strings (guide §2.3 narrower keys;
    // the map-side partial agg then also hashes longs, not strings). The
    // scoring side likewise carries only (id, pos, k, gid, hid). Exactness
    // modulo 64-bit collisions (~n²/2⁶⁵ expected spurious merges;
    // negligible at Wikipedia-scale vocabularies, the same risk class
    // KenLM's hashed probing tables accept — and the same contract the
    // string-keyed fit already carried on its join side, where a collision
    // produced a duplicate lookup match).
    val counts = ngramRows(lmCorpus, lmTextCol, Nil, order)
      .groupBy(col("k"), xxhash64(col("g")).as("__gid"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val cg = counts.select(col("k"), col("__gid"), col("__c").as("__cg"))
    val chist = counts.select((col("k") + 1).as("k"),
      col("__gid").as("__hid"), col("__c").as("__ch"))
    val rows = ngramRows(docs, textCol, Seq(col(idCol)), order)
      .select(col(idCol), col("pos"), col("k"),
        xxhash64(col("g")).as("__gid"), xxhash64(col("h")).as("__hid"))
    // the add-α unigram ground: (c(w)+α) / (T+αV), T and V computed in
    // the SAME arithmetic order the SQL replay uses (T + α·V). Count is
    // read (and gated on) BEFORE the sum: an empty reference yields a
    // NULL sum and getLong would throw an opaque NPE ahead of the
    // diagnostic. The same (cheap, checkpointed-input) aggregate also
    // sizes the whole count frame for the broadcast-ceiling gate below.
    val unigrams = counts
      .agg(count(when(col("k") === 1, 1)),
        sum(when(col("k") === 1, col("__c"))).cast("long"),
        count(lit(1))).head()
    val v = unigrams.getLong(0)
    require(v > 0, "ngramLmStats: the reference corpus is empty")
    val t = unigrams.getLong(1)
    val frameRows = unigrams.getLong(2)
    // EXPLICIT broadcast while the frame fits: CCNet's production filter
    // ships the full KenLM model to every node — the hint is the published
    // architecture, not an optimizer-threshold accident (ExplainCheck
    // re-asserts the plan with autoBroadcastJoinThreshold disabled). Past
    // [[LmBroadcastMaxRows]] (Spark's 8 GB broadcast hard limit would
    // abort the job) the lookup degrades to a fingerprint-keyed exchange.
    val looked = rows
      .join(lmJoinSide(cg, frameRows), Seq("k", "__gid"), "left")
      .join(lmJoinSide(chist, frameRows), Seq("k", "__hid"), "left")
    val candidate = when(col("k") === 1,
        struct(lit(1).as("k"),
          log((coalesce(col("__cg"), lit(0L)) + lit(alpha)) /
            (lit(t) + lit(alpha) * lit(v))).as("lnp")))
      .otherwise(when(col("__cg").isNotNull,
        struct(col("k").as("k"), log(col("__cg") / col("__ch")).as("lnp"))))
    val perPos = looked
      .groupBy(col(idCol), col("pos"))
      // struct-max: the longest matched order wins (k=1 never null)
      .agg(max(candidate).as("__best"))
      .withColumn("__lnS",
        // ln λ rides as a JVM-computed literal (not log(lit(λ))) so a SQL
        // replay can inline the identical double instead of trusting the
        // two engines' ln to agree on one more argument
        (least(col("pos"), lit(order)) - col("__best.k")) * lit(math.log(lambda)) +
          col("__best.lnp"))
    val perDoc = perPos
      .transform(blockedLnSum(idCol, "__lnS", "n_tokens"))
      .withColumn("ppl", exp(-col("__s") / col("n_tokens")))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"), col("ppl"))
  }

  /** [[ngramLmStats]] as a gate: keep documents at or under `maxPpl`
    * (unscoreable empty docs pass — length gates own that case). */
  def ngramLmFilter(
      docs: DataFrame, idCol: String, textCol: String,
      lmCorpus: DataFrame, lmTextCol: String, maxPpl: Double,
      order: Int = 5, lambda: Double = 0.4, alpha: Double = 0.1): DataFrame = {
    val stats = ngramLmStats(docs, idCol, textCol, lmCorpus, lmTextCol,
      order, lambda, alpha)
    docs.join(
      stats.where(col("ppl").isNull || col("ppl") <= maxPpl).select(col(idCol)),
      Seq(idCol), "left_semi")
  }

  /** Exact-substring span deduplication (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", ACL 2022): remove every
    * NON-CANONICAL occurrence of any duplicated `n`-token window across
    * the corpus, keeping the canonical (lowest (doc, position))
    * occurrence's text intact — canonical ranges of duplicated windows
    * are protected from other overlapping grams' marks, so at least one
    * copy of every duplicated window ALWAYS survives. The published
    * implementation builds a
    * corpus-wide suffix array; the distributed shape here matches
    * duplicated spans of length ≥ n by their length-n windows instead —
    * same guarantee for spans ≥ n (every such span contains a duplicated
    * n-window; overlapping windows mark the whole span), linear work, no
    * global index.
    *
    * Shuffle profile at 100 TB: the occurrence exchange ships
    * (md5-gram, id, pos) FIXED-WIDTH rows — one per token, never the
    * text; document text is only touched in the final by-id join, and the
    * removal-mark aggregation carries ints. Stride>1 window sampling
    * would cut the exchange linearly at bounded recall loss for long
    * spans — not applied here (exactness keeps the oracle exact).
    *
    * Matching is EXACT (case- and punctuation-sensitive raw whitespace
    * tokens) like the reference algorithm. A document whose every token
    * is covered dedups to the empty string (the Lee et al. behavior —
    * downstream length gates drop it).
    *
    * Output: (idCol, n_tokens, n_removed, text_dedup), one row per input
    * document. Deterministic and fully SQL-replayable (t10's oracle).
    */
  def dedupSpans(
      df: DataFrame, idCol: String, textCol: String, n: Int = 20): DataFrame = {
    require(n >= 2, s"span window must be >= 2 tokens, got $n")
    val base = df.select(col(idCol), col(textCol))
      .withColumn("__toks", split(trim(col(textCol)), "\\s+"))
    // (pos, md5(window)) structs — built-ins only, computed in the scan
    // stage; pos is 1-based (slice/element_at convention)
    val windows = when(size(col("__toks")) >= n,
      transform(sequence(lit(1), size(col("__toks")) - (n - 1)),
        i => struct(i.as("pos"),
          md5(concat_ws(" ", slice(col("__toks"), i, lit(n)))).as("gh"))))
      .otherwise(array().cast("array<struct<pos:int,gh:string>>"))
    val occ = base
      .select(col(idCol).as("__id"), explode(windows).as("__o"))
      .select(col("__id"), col("__o.pos").as("__pos"), col("__o.gh").as("__gh"))
    // canonical occurrence per gram = min (doc, pos); every OTHER
    // occurrence is a removal mark over [pos, pos+n). Canonical
    // occurrences of DUPLICATED grams are additionally PROTECTED ranges:
    // a mark from some other overlapping gram must not eat the one copy
    // this operator promises to keep (protection is limited to duplicated
    // grams — every window of a typical document is the sole, trivially
    // canonical occurrence of its unique gram, and protecting those would
    // block all removal). A marked span overlapping a protected range
    // keeps the overlap's tokens: the cost of the keep-one guarantee is
    // that fragments of a duplicate may survive where duplicated spans
    // overlap.
    val owner = occ.groupBy(col("__gh"))
      .agg(min(struct(col("__id"), col("__pos"))).as("__own"),
        count(lit(1)).as("__cnt"))
    val tagged = occ.join(owner, Seq("__gh"))
      .withColumn("__canon",
        col("__id") === col("__own.__id") && col("__pos") === col("__own.__pos"))
    val marks = tagged
      .where(col("__cnt") > 1)
      .groupBy(col("__id"))
      .agg(
        sort_array(collect_set(when(!col("__canon"), col("__pos")))).as("__marks"),
        sort_array(collect_set(when(col("__canon"), col("__pos")))).as("__keeps"))
    base
      .join(marks.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .withColumn("__m", coalesce(col("__marks"), array().cast("array<int>")))
      .withColumn("__p", coalesce(col("__keeps"), array().cast("array<int>")))
      .withColumn("__kept",
        filter(sequence(lit(1), size(col("__toks"))),
          j => !exists(col("__m"), p => p <= j && j < p + n) ||
            exists(col("__p"), p => p <= j && j < p + n)))
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        (size(col("__toks")) - size(col("__kept"))).cast("long").as("n_removed"),
        concat_ws(" ",
          transform(col("__kept"), j => element_at(col("__toks"), j))).as("text_dedup"))
  }

  /** Streaming counterpart of [[curate]] for continuous document ingest
    * (`spark.readStream` in, append-mode out). The language / quality /
    * repetition gates are stateless column kernels, so they run unchanged
    * on an unbounded stream — still fused into the scan of each
    * micro-batch, still shuffle-free. Exact dedup becomes watermarked
    * `dropDuplicates` on md5(text): state is bounded by the watermark
    * horizon, and the FIRST arrival of a text wins (the streaming-correct
    * representative; batch [[curate]] keeps the min-id — a documented
    * divergence, since "first seen" is undefined in a batch). Near-dedup
    * needs corpus-wide state and stays a batch / merge-time concern — run
    * [[Dedup.deduplicate]] over the accumulated sink on compaction, the
    * same split the delta sync layer uses for its ANN merges. Output:
    * (idCol, tsCol, lang, quality, dup3_frac, n_tokens). */
  def curateStream(
      docs: DataFrame, idCol: String, textCol: String, tsCol: String,
      lang: String = "en", minQuality: Double = 0.3,
      maxDup3: Double = 1.0, watermark: String = "10 minutes"): DataFrame = {
    val gated = docs
      .withColumn("lang", TextFunctions.langId(col(textCol)))
      .where(col("lang") === lang)
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .where(col("quality") >= minQuality)
      .withColumn("__toks", split(trim(lower(col(textCol))), "\\s+"))
      .withColumn("__g3", ngrams(col("__toks"), 3))
      .withColumn("dup3_frac", dupFrac(col("__g3")))
      .where(col("dup3_frac") <= maxDup3)
      .withColumn("__text_md5", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
    // Streaming takes the WithinWatermark variant — the state-BOUNDED
    // one: a plain dropDuplicates(key) never evicts (the watermark column
    // is not among the keys), so every md5 ever seen would sit in the
    // state store forever on an unbounded stream. The trade-off is the
    // documented horizon: a duplicate arriving later than `watermark`
    // after its first sighting is NOT collapsed here — that is
    // near-dedup's compaction-time job (see above). Batch mode keeps the
    // plain (whole-corpus, horizon-free) dedup — WithinWatermark is
    // streaming-only in Spark, and unbounded lookback IS the right batch
    // semantic.
    val deduped =
      if (gated.isStreaming) gated.dropDuplicatesWithinWatermark("__text_md5")
      else gated.dropDuplicates("__text_md5")
    deduped
      // n_tokens from the already-materialized token array (lowercasing
      // never changes whitespace token counts) — no second regex split on
      // the streaming hot path
      .select(col(idCol), col(tsCol), col("lang"), col("quality"), col("dup3_frac"),
        size(col("__toks")).as("n_tokens"))
  }

  /** Raw n-token-window grams of the token-array column `toks` (empty
    * below n tokens) — same attribute-materialization caveat as
    * [[ngramHashes]]. */
  private def ngrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  private def dupFrac(g: Column): Column =
    when(size(g) > 0,
      round((size(g) - size(array_distinct(g))).cast("double") /
        size(g).cast("double"), 5))
      .otherwise(lit(0.0))

  /** Gopher-style repetition statistics — the duplicate-n-gram fraction
    * quality gate pretraining pipelines apply alongside the heuristic
    * score (a document whose 2-/3-grams are mostly repeats is boilerplate
    * or spam even when its length/alpha/stopword profile looks fine).
    * Output: (idCol, n_tokens, dup2_frac, dup3_frac) where dupN_frac =
    * 1 − distinct/total over the document's n-token windows. All
    * built-ins evaluated in the scan stage — no shuffle, no UDF; each
    * gram pass is linear in document length (`__toks`/`__gN` are
    * materialized attributes, see [[ngramHashes]]). */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("__toks", split(trim(lower(col(textCol))), "\\s+"))
      .select(col(idCol), col("__toks"))
      .withColumn("__g2", ngrams(col("__toks"), 2))
      .withColumn("__g3", ngrams(col("__toks"), 3))
      .select(col(idCol),
        size(col("__toks")).as("n_tokens"),
        dupFrac(col("__g2")).as("dup2_frac"),
        dupFrac(col("__g3")).as("dup3_frac"))

  /** C4-style line and page cleaning (Raffel et al., "Exploring the
    * Limits of Transfer Learning with a Unified Text-to-Text
    * Transformer", JMLR 2020, §2.2 — the published C4 heuristics):
    *
    *  - keep only lines that end in a terminal punctuation mark
    *    (`.` `!` `?` `"`), have at least `minLineWords` words, and do not
    *    mention "javascript";
    *  - drop whole pages that contain "lorem ipsum" or a curly brace, or
    *    whose CLEANED text has fewer than `minSentences` sentences
    *    (counted as terminal `.!?` marks).
    *
    * Output: surviving pages only, (idCol, n_lines, n_kept, text_clean)
    * with the retained lines rejoined by newline. Pure built-ins — the
    * line filter and page gates all evaluate in the scan stage
    * (shuffle-free, like the other curation gates), and every rule
    * replays in SQL (the c8 oracle rebuilds text_clean behind the hash
    * gate).
    */
  def c4Clean(
      docs: DataFrame, idCol: String, textCol: String,
      minLineWords: Int = 5, minSentences: Int = 3): DataFrame = {
    def lineKeep(l: Column): Column = {
      val r = rtrim(l)
      val last = substring(r, -1, 1)
      last.isin(".", "!", "?", "\"") &&
        size(split(trim(l), "\\s+")) >= minLineWords &&
        !lower(l).contains("javascript")
    }
    val cleaned = docs
      // \r?\n: Windows line endings would otherwise leave every line with
      // a trailing \r, which fails the terminal-punctuation check and
      // silently discards the whole page — crawl text is routinely CRLF
      .withColumn("__lines", split(col(textCol), "\r?\n"))
      .withColumn("__kept", filter(col("__lines"), lineKeep _))
      .withColumn("__clean", array_join(col("__kept"), "\n"))
    cleaned
      .where(!lower(col(textCol)).contains("lorem ipsum"))
      .where(!col(textCol).contains("{") && !col(textCol).contains("}"))
      .where(length(col("__clean")) -
        length(regexp_replace(col("__clean"), "[.!?]", "")) >= minSentences)
      .select(col(idCol),
        size(col("__lines")).cast("long").as("n_lines"),
        size(col("__kept")).cast("long").as("n_kept"),
        col("__clean").as("text_clean"))
  }

  /** Gopher quality rules (Rae et al., "Scaling Language Models: Methods,
    * Analysis & Insights from Training Gopher", 2021, §A1.1) — the other
    * canonical published heuristic set next to C4's ([[c4Clean]]):
    *
    *  - word count within [minWords, maxWords] (paper: 50–100,000);
    *  - mean word length within [3, 10] characters;
    *  - symbol-to-word ratio (`#` or `...`) at most 0.1;
    *  - at most 90% of lines starting with a bullet, at most 30% ending
    *    in an ellipsis;
    *  - at least 80% of words containing an alphabetic character;
    *  - at least 2 distinct members of the paper's 8-stop-word list.
    *
    * Output: one row per document with every measured statistic plus the
    * composite `keep` — pipelines gate on `keep` but tune on the stats.
    * Pure built-ins in the scan stage (shuffle-free like the other
    * gates); ratios rounded to 5 so the t11 oracle replays them exactly.
    */
  val gopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def gopherRules(
      docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val words = col("__words")
    val lines = col("__lines")
    val nWords = size(words)
    val nLines = size(lines)
    val meanLen = round(
      aggregate(words, lit(0L), (acc, w) => acc + length(w)).cast("double") /
        greatest(nWords.cast("double"), lit(1.0)), 5)
    val symbolRatio = round(
      size(filter(words, w => w.contains("#") || w.contains("..."))).cast("double") /
        greatest(nWords.cast("double"), lit(1.0)), 5)
    val alphaFrac = round(
      size(filter(words, w => w.rlike("[A-Za-z]"))).cast("double") /
        greatest(nWords.cast("double"), lit(1.0)), 5)
    val bulletFrac = round(
      size(filter(lines, l =>
        ltrim(l).startsWith("•") || ltrim(l).startsWith("- ") ||
          ltrim(l).startsWith("* "))).cast("double") /
        greatest(nLines.cast("double"), lit(1.0)), 5)
    val ellipsisFrac = round(
      size(filter(lines, l =>
        rtrim(l).endsWith("...") || rtrim(l).endsWith("…"))).cast("double") /
        greatest(nLines.cast("double"), lit(1.0)), 5)
    val stopHits = size(filter(
      typedLit(gopherStopWords),
      sw => array_contains(transform(words, w => lower(w)), sw)))
    docs
      .withColumn("__words",
        filter(split(trim(col(textCol)), "\\s+"), w => w =!= ""))
      .withColumn("__lines", split(col(textCol), "\r?\n"))
      .select(col(idCol),
        nWords.cast("long").as("n_words"),
        meanLen.as("mean_word_len"),
        symbolRatio.as("symbol_ratio"),
        alphaFrac.as("alpha_word_frac"),
        bulletFrac.as("bullet_line_frac"),
        ellipsisFrac.as("ellipsis_line_frac"),
        stopHits.cast("long").as("n_stop_hits"))
      .withColumn("keep",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("symbol_ratio") <= 0.1 &&
          col("bullet_line_frac") <= 0.9 &&
          col("ellipsis_line_frac") <= 0.3 &&
          col("alpha_word_frac") >= 0.8 &&
          col("n_stop_hits") >= 2)
  }

  /** [[gopherRules]] as a gate. */
  def gopherFilter(
      docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame =
    docs.join(
      gopherRules(docs, idCol, textCol, minWords, maxWords)
        .where(col("keep")).select(col(idCol)),
      Seq(idCol), "left_semi")

  /** Deterministic per-source mixture sampling — the domain-reweighting
    * step that turns a raw crawl into a target training mixture ("keep
    * 100% of wiki, 25% of crawl, …"). The keep decision for a document is
    * a pure function of (id, seed): the top 24 bits of splitmix64(id ^
    * seed·φ) must fall under ⌊weight · 2²⁴⌋. That makes the sample (a) a
    * map-side filter fused into the scan — at 100 TB nothing shuffles and
    * unsampled sources prune entirely when `weights` hits 0 — and (b)
    * stable across runs/retries/partitionings, so downstream stages can
    * checkpoint against it. Weights are per-`sourceCol` value, applied
    * via a map literal; sources absent from `weights` keep
    * `defaultWeight`. */
  def sampleMixture(
      docs: DataFrame, idCol: String, sourceCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      seed: Long = 0L): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0.0 && w <= 1.0),
      "weights must be in [0,1]")
    val u = draw24(docs, idCol, seed)
    val thresholds = weights.map { case (s, w) => s -> drawThreshold(w) }
    docs.where(u < coalesce(
      element_at(typedLit(thresholds), col(sourceCol)), lit(drawThreshold(defaultWeight))))
  }

  /** Top 24 bits of the seeded splitmix64 of the id — the uniform draw the
    * sampling operators share (numeric ids hash directly, string ids via
    * xxhash64; a long cast of a string id would null out). */
  private def draw24(docs: DataFrame, idCol: String, seed: Long): Column =
    shiftrightunsigned(TextFunctions.mix64(idHash64(docs, idCol), seed), 40)

  /** The id-as-long dispatch every striping/sampling operator shares:
    * numeric ids pass through (SQL-replayable — the c3/c5/t7 oracles),
    * string ids (e.g. the store's md5 uuids) go through xxhash64 — a long
    * cast of a string id would null out and collapse every row together. */
  private def idHash64(docs: DataFrame, idCol: String): Column = {
    val numericId = docs.schema(idCol).dataType.isInstanceOf[
      org.apache.spark.sql.types.NumericType]
    if (numericId) col(idCol).cast("long") else xxhash64(col(idCol))
  }

  /** ⌊w·2²⁴⌋ — the threshold arithmetic shared verbatim with the c3/c5
    * SQL oracles (they call these, so operator and oracle cannot drift). */
  private[graft] def drawThreshold(w: Double): Long =
    math.floor(w * (1L << 24)).toLong

  /** Cumulative split thresholds; the last bucket absorbs the rounding
    * tail so every draw is labeled. Shared with the c5 oracle. */
  private[graft] def cumulativeDrawThresholds(weights: Seq[Double]): Seq[Long] =
    weights.scanLeft(0.0)(_ + _).tail
      .map(c => math.floor(c * (1L << 24)).toLong)
      .init :+ (1L << 24)

  /** [[assignSplits]] draws from a DISTINCT hash family than
    * [[sampleMixture]]: a weight-w sample is exactly the bottom-w slice
    * of its draw, so with a shared family (same default seed) every
    * sampled survivor would land in the first split and val/test would be
    * empty. Shared with the c5 oracle. */
  private[graft] def splitDrawSeed(seed: Long): Long = seed ^ 0x53504c495453L // "SPLITS"

  /** Deterministic train/val/test split assignment — the same seeded
    * splitmix64 draw as [[sampleMixture]], bucketed by cumulative
    * thresholds: document d lands in the first split whose cumulative
    * ⌊Σw·2²⁴⌋ exceeds its 24-bit hash draw. Pure per-row function of
    * (id, seed): shuffle-free, stable across runs/retries/partitionings
    * (a document can never migrate between splits when the corpus grows),
    * and replayable in SQL. `splits` weights must sum to 1 (±1e-9); the
    * last split absorbs the rounding tail so every row is labeled. */
  def assignSplits(
      docs: DataFrame, idCol: String,
      splits: Seq[(String, Double)], seed: Long = 0L): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0.0) &&
      math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split weights must be non-negative and sum to 1")
    val cum = cumulativeDrawThresholds(splits.map(_._2))
    val u = draw24(docs, idCol, splitDrawSeed(seed))
    val label = splits.map(_._1).zip(cum).dropRight(1)
      .foldRight(lit(splits.last._1): Column) { case ((name, c), rest) =>
        when(u < c, name).otherwise(rest)
      }
    docs.withColumn("split", label)
  }

  /** Concat-and-chunk sequence packing: assign each document to the
    * fixed-token-budget pack its FIRST token lands in — the GPT-style
    * "concatenate the stream, cut every `budget` tokens" loader layout.
    * Documents stripe by id into `stripes` independent streams so the
    * running-count window parallelizes (one shuffle on the stripe key, no
    * global sort); within a stripe the order is id-ascending, so the
    * layout is deterministic and SQL-replayable. Output: (idCol, stripe,
    * pack_id, n_tokens, tok_start) — tok_start is the document's offset in
    * its stripe's token stream. */
  def packSequences(
      docs: DataFrame, idCol: String, textCol: String,
      budget: Int, stripes: Int = 32): DataFrame = {
    require(budget > 0 && stripes > 0, "budget and stripes must be positive")
    val stripeCol = pmod(idHash64(docs, idCol), lit(stripes.toLong))
    val w = Window.partitionBy(col("stripe")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol),
        stripeCol.cast("int").as("stripe"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("tok_start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", (col("tok_start") / budget).cast("long"))
      .select(col(idCol), col("stripe"), col("pack_id"), col("n_tokens"), col("tok_start"))
  }

  /** [[shuffleToShards]] / [[temperatureMixture]] draw from hash families
    * distinct from [[sampleMixture]]/[[assignSplits]] (same rationale as
    * [[splitDrawSeed]]: under one user seed, a shared family would make
    * the shard order correlate with the sample's survivor slice). */
  private[graft] def shardDrawSeed(seed: Long): Long = seed ^ 0x534841524453L // "SHARDS"
  private[graft] def temperDrawSeed(seed: Long): Long = seed ^ 0x54454d504552L // "TEMPER"

  /** Deterministic epoch shuffle into `numShards` shards — the global
    * reshuffle every pretraining pipeline runs between curation and
    * tokenization, so a training epoch streams documents in hash-random
    * order from uniformly-sized shard files instead of crawl order. Both
    * coordinates are pure functions of (id, seed): a document's shard is
    * pmod(mix64(id), numShards) and its within-shard position is the rank
    * of its draw (ties broken by id, so distinct ids make the layout
    * total) — stable across runs, retries, and partition layouts, so a
    * resumed epoch reads the identical order and a grown corpus never
    * migrates existing documents between positions of OTHER shards.
    *
    * Spark shape: ONE hash exchange (the window's partitioning on the
    * shard key) + a within-partition sort — there is no global sort. At
    * 100 TB pick numShards at least the cluster parallelism: each task
    * sorts ~corpus/numShards rows of (id, draw), and the materialized
    * layout is then `result.join(docs).write.partitionBy("shard")` (or
    * `repartition(col("shard")) + sortWithinPartitions(col("pos"))` for
    * exactly one ordered file per shard).
    *
    * Output: (idCol, shard, pos).
    */
  def shuffleToShards(
      docs: DataFrame, idCol: String,
      numShards: Int, seed: Long = 0L): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col("__draw"), col(idCol))
    docs
      .select(col(idCol),
        TextFunctions.mix64(idHash64(docs, idCol), shardDrawSeed(seed)).as("__draw"))
      .withColumn("shard", pmod(col("__draw"), lit(numShards.toLong)).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Temperature-α rate for one domain: keep-probability (nMin/n)^(1−α),
    * anchored at the smallest domain so every target is feasible without
    * replacement (expected kept size nMin^(1−α)·n^α ≤ n, i.e. sizes
    * ∝ n^α). α = 0.5 routes through sqrt — division and sqrt are
    * correctly-rounded IEEE ops in both the JVM and DuckDB, so the c12
    * oracle replays the arithmetic bit-exactly; other α go through
    * math.pow (1-ulp class, spec-covered in-JVM only). */
  private[graft] def temperatureRate(nMin: Long, n: Long, alpha: Double): Double =
    if (alpha == 0.5) math.sqrt(nMin.toDouble / n.toDouble)
    else math.pow(nMin.toDouble / n.toDouble, 1.0 - alpha)

  /** Materialize [[shuffleToShards]]'s layout on disk: one directory per
    * shard (parquet partitionBy), each holding exactly one file whose row
    * ORDER is the shard's draw order — the written order IS the rank, so
    * no position column ships and nothing beyond the one shard exchange
    * runs (the full rows, text included, shuffle exactly once; no window,
    * no join). A training epoch is then [[readShards]] (or a plain
    * `spark.read` of the shard directories in file order), and the layout
    * is bit-reproducible from (corpus, seed) alone. `coords ≡
    * shuffleToShards` is spec-pinned: shard k's file rows are exactly the
    * (shard = k, pos-ascending) sequence of the coordinate frame.
    *
    * The one-file-per-shard contract is PINNED against
    * `spark.sql.files.maxRecordsPerFile`: the writer sets the per-write
    * option to 0 (unlimited), so a session-level rolling knob — a common
    * prod setting — cannot silently split a shard mid-order (r16 verdict
    * #5; spec provokes a would-split row count). Each shard value's rows
    * all live in one task (hash partitioning on the shard key), so each
    * shard directory receives exactly one file even when several shards
    * co-reside in a task.
    */
  def writeShards(
      docs: DataFrame, idCol: String, dir: String,
      numShards: Int, seed: Long = 0L): Unit = {
    require(numShards > 0, "numShards must be positive")
    docs
      .withColumn("__draw",
        TextFunctions.mix64(idHash64(docs, idCol), shardDrawSeed(seed)))
      .withColumn("shard", pmod(col("__draw"), lit(numShards.toLong)).cast("int"))
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__draw"), col(idCol))
      .drop("__draw")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("maxRecordsPerFile", "0")
      .partitionBy("shard").parquet(dir)
  }

  /** Epoch reader for a [[writeShards]] layout: the documents with their
    * (shard, pos) coordinates reconstructed from the FILE layout — pos is
    * the row's position within its shard file (`_metadata.row_index`), so
    * the frame equals [[shuffleToShards]]'s coordinates exactly
    * (spec-pinned) without any column having been stored. `row_index` is
    * per-file and split-stable: a reader that splits a large shard file
    * into several input partitions still reconstructs the same positions,
    * which closes the ADVICE r16 caveat about multi-split reads.
    *
    * Refuses loudly if any shard directory holds more than one data file
    * (a foreign writer or a rolled file would make row order ≠ rank):
    * the check is one driver-side listing of numShards directories —
    * corpus-size-independent. */
  def readShards(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val shardDirs = fs.listStatus(path).filter(_.isDirectory)
      .filter(_.getPath.getName.startsWith("shard="))
    val multi = shardDirs.filter { d =>
      fs.listStatus(d.getPath)
        .count(f => f.isFile && f.getPath.getName.endsWith(".parquet")) > 1
    }
    require(multi.isEmpty,
      s"readShards($dir): ${multi.length} shard dir(s) hold >1 parquet file " +
        s"(first: ${multi.headOption.map(_.getPath.getName).getOrElse("")}) — " +
        "row order is only the rank for writeShards' one-file-per-shard layout")
    spark.read.parquet(dir)
      .withColumn("pos", col("_metadata.row_index"))
  }

  private[graft] def budgetDrawSeed(seed: Long): Long = seed ^ 0x425544474554L // "BUDGET"

  /** One-slot registry of [[tokenBudgetMixture]]'s slim persisted frame
    * (the [[Dedup.lastScaleSig]] pattern): the next call releases the
    * previous call's persist, so a session never pins more than one. */
  private val lastBudgetBase =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  /** Token-budget mixture selection — mixtures are really specified in
    * TOKENS, not documents ("40B tokens of web, 5B of code"): per domain,
    * take documents in the seeded-draw order until the domain's token
    * budget is exhausted (a document is kept iff it fits ENTIRELY:
    * tok_start + n_tokens ≤ budget). Deterministic: the order is the
    * signed splitmix64 draw (ties by id) under the distinct BUDGET hash
    * family, so the selected set is stable across runs, retries, and
    * partition layouts, and adding new documents never evicts an already
    * -selected one whose draw precedes the cut.
    *
    * Spark shape — the naive form is one window per domain (one reducer
    * per domain: dead at 100 TB). Instead the running token count is an
    * ORDER-PRESERVING striped prefix sum: bucket = the draw's top bits
    * (arithmetic shift — monotone in the signed draw, so buckets are
    * contiguous draw ranges AND uniformly sized, the draw being uniform),
    * per-(domain, bucket) window cumsums run with domains×buckets-way
    * parallelism, and the driver prefix-sums the |domains|·buckets bucket
    * totals (corpus-SIZE-independent collect — but |domains|·buckets
    * driver rows, so `sourceCol` must be a low-cardinality domain column,
    * not e.g. a per-URL key) into broadcast offsets — tok_start = offset
    * + within-bucket cumsum equals the global per-domain cumsum exactly.
    * That equivalence is what the c13 oracle proves: DuckDB computes the
    * NAIVE single global window per domain.
    *
    * Text is tokenized ONCE: the slim (id, domain, draw, n_tokens) frame
    * (~40 B/doc) persists inside the operator before the totals pass, so
    * the window pass reads the cache instead of re-running the most
    * expensive kernel over all text (r16 verdict #4). The persist lives
    * in a one-slot registry (the [[Dedup]] signature-cache pattern): the
    * next call releases the previous call's frame, so a session never
    * pins more than one — a caller interleaving two mixtures before
    * executing the first recomputes from lineage, exactly, at the cost of
    * a second tokenize.
    *
    * NOTE this operator (like [[temperatureMixture]]) runs an EAGER Spark
    * job at call time — the totals pass — unlike the lazy operators in
    * this file; compose accordingly. Determinism relies on DISTINCT ids:
    * the (draw, id) tie-break makes the per-domain order total (the
    * [[shuffleToShards]] precondition). Documents with NULL text have a
    * NULL token count and are dropped (they never contribute to a budget
    * and never select).
    *
    * Domains absent from `budgets` get `defaultBudget` (default: no cap).
    * Rows with a NULL domain are dropped. Output: (idCol, sourceCol,
    * n_tokens, tok_start) for the kept documents.
    */
  def tokenBudgetMixture(
      docs: DataFrame, idCol: String, textCol: String, sourceCol: String,
      budgets: Map[String, Long], defaultBudget: Long = Long.MaxValue,
      seed: Long = 0L, buckets: Int = 256): DataFrame = {
    require(budgets.values.forall(_ >= 0L) && defaultBudget >= 0L,
      "budgets must be non-negative")
    require(buckets > 0 && (buckets & (buckets - 1)) == 0 && buckets <= 65536,
      "buckets must be a power of two <= 65536")
    val shift = 64 - java.lang.Long.numberOfTrailingZeros(buckets.toLong).toInt
    val bucketCol =
      if (shift >= 64) lit(0) else shiftright(col("__draw"), shift).cast("int")
    val base = docs
      .where(col(sourceCol).isNotNull)
      .select(col(idCol), col(sourceCol),
        col(sourceCol).cast("string").as("__src"),
        TextFunctions.mix64(idHash64(docs, idCol), budgetDrawSeed(seed)).as("__draw"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("__bucket", bucketCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val prev = lastBudgetBase.getAndSet(base)
    if (prev != null && (prev ne base)) prev.unpersist(false)
    // |domains| x buckets rows — corpus-size-independent driver state.
    // This job also MATERIALIZES the slim persist above, so the window
    // pass below never re-tokenizes (ExplainCheck gates it). The sum is
    // NULL for an all-NULL-text group — coalesce, don't NPE (ADVICE r16).
    val totals = base.groupBy(col("__src"), col("__bucket"))
      .agg(coalesce(sum(col("n_tokens")), lit(0L)).as("__tot"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val offsets = totals.groupBy(_._1).toSeq.flatMap { case (src, ts) =>
      // ascending signed bucket order == ascending signed draw order
      val sorted = ts.sortBy(_._2)
      sorted.map(_._2).zip(sorted.map(_._3).scanLeft(0L)(_ + _).init)
        .map { case (bucket, off) => (src, bucket, off) }
    }
    val spark = docs.sparkSession
    import spark.implicits._
    val offsetsDf = offsets.toDF("__src", "__bucket", "__offset")
    val w = Window.partitionBy(col("__src"), col("__bucket"))
      .orderBy(col("__draw"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val budget = coalesce(
      element_at(typedLit(budgets), col("__src")), lit(defaultBudget))
    base
      .withColumn("__cum", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .join(broadcast(offsetsDf), Seq("__src", "__bucket"))
      .withColumn("tok_start", col("__offset") + col("__cum"))
      .where(col("tok_start") + col("n_tokens") <= budget)
      .select(col(idCol), col(sourceCol), col("n_tokens"), col("tok_start"))
  }

  /** Temperature-α domain reweighting — the multilingual/multi-source
    * sampling rule (mC4, XLM-R: p_i ∝ n_i^α) that flattens a natural
    * crawl mixture toward uniform domain sizes without upsampling: domain
    * i keeps each document independently with rate (n_min/n_i)^(1−α)
    * ([[temperatureRate]] — 1 for the smallest domain; α = 1 keeps
    * everything, α → 0 equalizes domain sizes at ~n_min). Unlike
    * [[sampleMixture]] the rates are LEARNED from the corpus (one count
    * per domain), not caller-supplied.
    *
    * Spark shape: ONE count aggregate over the domain column (map-side
    * partials, |domains| result rows to the driver — the semDedup
    * centroid convention) fixes the thresholds; the keep decision is then
    * the [[sampleMixture]] draw mechanics under a distinct hash family
    * ([[temperDrawSeed]]) against a plan-literal threshold map — a pure
    * map-side filter fused into the scan, so nothing about the corpus
    * itself ever shuffles and the decision is stable across runs,
    * retries, and partition layouts. Rows with a NULL domain are dropped
    * (no count, no threshold).
    *
    * NOTE: the count aggregate is an EAGER Spark job at call time (the
    * rates must be known to build the plan-literal thresholds), unlike
    * the lazy operators in this file — compose accordingly. The driver
    * state is |domains| rows, so `sourceCol` must be low-cardinality.
    */
  def temperatureMixture(
      docs: DataFrame, idCol: String, sourceCol: String,
      alpha: Double, seed: Long = 0L): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val counts = docs.where(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol).cast("string").as("__src")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) return docs.where(lit(false))
    val nMin = counts.values.min
    val thresholds = counts.map { case (s, n) =>
      s -> drawThreshold(temperatureRate(nMin, n, alpha))
    }
    val u = draw24(docs, idCol, temperDrawSeed(seed))
    docs.where(u < element_at(typedLit(thresholds), col(sourceCol).cast("string")))
  }
}
