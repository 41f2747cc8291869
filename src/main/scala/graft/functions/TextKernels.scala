package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic text kernels for large-scale training-data pipelines:
  * SimHash, MinHash signatures, winnowing fingerprints, and n-gram
  * language identification. Static methods so whole-stage codegen calls
  * them directly (same pattern as [[VectorKernels]]).
  *
  * All hashing is FNV-1a 64-bit — stable across JVMs and versions (unlike
  * `String.hashCode` weirdness or library-versioned hashes), cheap, and
  * good enough for sketching.
  */
object TextKernels {

  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  def fnv1a64(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = FnvOffset
    var i = from
    while (i < until) { h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1 }
    h
  }
  def fnv1a64(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    fnv1a64(b, 0, b.length)
  }

  /** Whitespace token count — the EXACT field count of
    * `size(split(trim(text), "\\s+", -1))` without materializing the
    * split: at 500k+ real documents the regex-split's per-row
    * UTF8String[] was a measured GC storm (the c13 decade run: per-pass
    * CPU escalating 38 → 799 s at fixed work), and a count needs no
    * array at all. Replayed semantics, byte for byte: SQL `trim` strips
    * only ' ' (0x20); Java-regex \s is [ \t\n\x0B\f\r]; split keeps ONE
    * empty field for a leading \s run and (limit -1) one for a trailing
    * \s run; the empty string yields 1. Counting over UTF-8 BYTES is
    * safe — the \s bytes are ASCII and multi-byte sequences contain no
    * bytes < 0x80. Equivalence to the split form is property-pinned in
    * TextDedupSpec over adversarial and fuzzed strings.
    */
  def tokenCount(s: UTF8String): Int = {
    val n = s.numBytes
    var i = 0
    var j = n
    while (i < j && s.getByte(i) == 0x20) i += 1
    while (j > i && s.getByte(j - 1) == 0x20) j -= 1
    if (i == j) return 1 // "" splits to [""]
    @inline def ws(b: Byte): Boolean =
      b == 0x20 || (b >= 0x09 && b <= 0x0d)
    var runs = 0
    var inRun = false
    var k = i
    while (k < j) {
      if (ws(s.getByte(k))) inRun = false
      else if (!inRun) { runs += 1; inRun = true }
      k += 1
    }
    runs + (if (ws(s.getByte(i))) 1 else 0) + (if (ws(s.getByte(j - 1))) 1 else 0)
  }

  /** Mix a base hash with a seed — gives k independent-enough hash families
    * from one pass (xor-fold + avalanche, splitmix64 finalizer).
    */
  def mix(h: Long, seed: Long): Long = {
    var z = h ^ (seed * 0x9e3779b97f4a7c15L)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Lowercase whitespace tokenization (the canonical tokenizer for the
    * sketching functions; quality/count metrics use Spark built-ins).
    */
  def tokens(text: String): Array[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty)

  // ------------------------------------------------------------- SimHash

  /** 64-bit SimHash over token unigrams: per-token 64-bit hash votes ±1 on
    * each bit position; the sign of each accumulated position becomes the
    * output bit. Near-duplicate docs have small Hamming distance.
    */
  def simhash64(text: UTF8String): Long = {
    val toks = tokens(text.toString)
    if (toks.isEmpty) return 0L
    val acc = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val h = fnv1a64(toks(t))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  // ------------------------------------------------------------- MinHash

  /** k-element MinHash signature over word `shingle`-grams. One pass over
    * the shingles; each of the k hash families is `mix(baseHash, seed)`.
    */
  def minhashSignature(text: UTF8String, k: Int, shingle: Int): ArrayData = {
    val toks = tokens(text.toString)
    val sig = Array.fill(k)(Long.MaxValue)
    val n = toks.length - shingle + 1
    if (n <= 0) return new GenericArrayData(Array.fill(k)(0L))
    var i = 0
    while (i < n) {
      var base = FnvOffset
      var j = 0
      while (j < shingle) {
        val b = toks(i + j).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var bi = 0
        while (bi < b.length) { base ^= (b(bi) & 0xffL); base *= FnvPrime; bi += 1 }
        base ^= ' '.toLong; base *= FnvPrime // shingle-internal separator
        j += 1
      }
      var s = 0
      while (s < k) {
        val h = mix(base, s.toLong)
        if (h < sig(s)) sig(s) = h
        s += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  // ---------------------------------------------------------- Winnowing

  /** Winnowing document fingerprint (Schleimer et al., SIGMOD'03): rolling
    * FNV over character `ngram`-grams, keep the min hash of every `window`
    * consecutive grams (rightmost min), dedup → sorted fingerprint set.
    */
  def winnowFingerprint(text: UTF8String, ngram: Int, window: Int): ArrayData = {
    val s = text.toString.toLowerCase
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val nGrams = bytes.length - ngram + 1
    if (nGrams <= 0)
      return new GenericArrayData(Array(fnv1a64(bytes, 0, bytes.length)))
    val grams = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) { grams(i) = fnv1a64(bytes, i, i + ngram); i += 1 }
    val kept = scala.collection.mutable.SortedSet.empty[Long]
    val nWin = math.max(1, nGrams - window + 1)
    var w = 0
    while (w < nWin) {
      var minIdx = w
      var j = w
      val end = math.min(w + window, nGrams)
      while (j < end) { if (grams(j) <= grams(minIdx)) minIdx = j; j += 1 }
      kept += grams(minIdx)
      w += 1
    }
    new GenericArrayData(kept.toArray)
  }

  // ------------------------------------------------------- Language ID

  /** Tiny stopword tables for the languages present in the corpus. A real
    * deployment swaps in char-n-gram profiles; the *operator shape* (pure
    * per-row function, broadcastable tables) is what matters here.
    */
  private val stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "a", "of", "and", "to", "in", "is", "it", "that", "for", "on", "with", "as", "was"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit", "auf", "für"),
    "es" -> Set("el", "la", "de", "y", "que", "en", "un", "una", "es", "no", "con", "por", "para"),
    "fr" -> Set("le", "la", "de", "et", "est", "un", "une", "que", "pour", "dans", "sur", "avec"),
    "zh" -> Set("的", "是", "了", "在", "和", "有", "我", "不", "这", "他"))

  /** Returns the language with the highest stopword hit-ratio, "und"
    * (undetermined) when nothing scores.
    */
  private val stopwordsSorted: Array[(String, Set[String])] =
    stopwords.toArray.sortBy(_._1)

  def langId(text: UTF8String): UTF8String = {
    val toks = tokens(text.toString)
    if (toks.isEmpty) return UTF8String.fromString("und")
    var bestLang = "und"
    var bestScore = 0.0
    // iterate languages in sorted order with a strict > so ties resolve to
    // the lexicographically-smallest language — deterministic across JVMs
    // (Map iteration order is not) and expressible as an ORDER BY oracle
    var l = 0
    while (l < stopwordsSorted.length) {
      val (lang, words) = stopwordsSorted(l)
      var hits = 0
      var i = 0
      while (i < toks.length) { if (words.contains(toks(i))) hits += 1; i += 1 }
      val score = hits.toDouble / toks.length
      if (score > bestScore) { bestScore = score; bestLang = lang }
      l += 1
    }
    UTF8String.fromString(bestLang)
  }

  /** Hamming distance between two 64-bit sketches. */
  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Per-token hashed feature buckets (in token order): FNV-1a-64 of each
    * canonical token folded to `dim` buckets. `dim` MUST be a power of two:
    * the fold is then the hash's low bits, which equals the UNSIGNED
    * `h mod dim` a SQL replay computes over HUGEINT hashes (for a non-power
    * -of-two dim the signed/unsigned residues diverge). The feature hasher
    * behind the trained quality classifier (fastText / GPT-3-quality-filter
    * lineage — hashed bag-of-words into a fixed-width vector).
    */
  def tokenFnvBuckets(text: UTF8String, dim: Int): ArrayData = {
    val toks = tokens(text.toString)
    val out = new Array[Int](toks.length)
    var i = 0
    while (i < toks.length) {
      out(i) = (fnv1a64(toks(i)) & (dim - 1)).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-position hashed WORD-n-gram buckets (in position order):
    * FNV-1a-64 of each n-token window of the lowercase whitespace tokens,
    * space-joined, folded to `dim` buckets (power of two — the same
    * signed/unsigned contract as [[tokenFnvBuckets]]; n = 1 produces
    * exactly tokenFnvBuckets). The hashed n-gram featurizer of DSIR-style
    * importance resampling (Xie et al., NeurIPS 2023: unigram+bigram
    * counts hashed into a fixed-width table).
    */
  def wordNgramFnvBuckets(text: UTF8String, n: Int, dim: Int): ArrayData = {
    val toks = tokens(text.toString)
    val count = toks.length - n + 1
    if (count <= 0) return new GenericArrayData(Array.emptyIntArray)
    val out = new Array[Int](count)
    var i = 0
    while (i < count) {
      val g = if (n == 1) toks(i)
        else {
          val sb = new java.lang.StringBuilder(toks(i))
          var j = 1
          while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
          sb.toString
        }
      out(i) = (fnv1a64(g) & (dim - 1)).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-position hashed CHARACTER-n-gram buckets (in position order):
    * FNV-1a-64 of each length-`n` character window of the lowercased text,
    * folded to `dim` buckets (power of two — same signed/unsigned contract
    * as [[tokenFnvBuckets]]). The fastText-shape featurizer for trained
    * language identification: char n-grams capture orthography (äöü, qu-,
    * -ción, CJK codepoints) without any tokenizer, so the one kernel
    * covers space-delimited and unsegmented scripts alike. Windows are
    * UTF-16-unit-based (= codepoint-based off the astral plane), matching
    * a SQL replay's per-character split for all BMP text.
    */
  def charNgramFnvBuckets(text: UTF8String, n: Int, dim: Int): ArrayData = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val count = s.length - n + 1
    if (count <= 0) return new GenericArrayData(Array.emptyIntArray)
    val out = new Array[Int](count)
    var i = 0
    while (i < count) {
      out(i) = (fnv1a64(s.substring(i, i + n)) & (dim - 1)).toInt
      i += 1
    }
    new GenericArrayData(out)
  }
}
