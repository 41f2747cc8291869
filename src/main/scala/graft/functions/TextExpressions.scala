package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Expression wrappers over [[TextKernels]] plus built-in compositions for
  * the text-analysis operator family (language-ID, quality scoring, token
  * counting, fingerprinting) — all codegen-friendly.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string input")
  override def nullSafeEval(v: Any): Any =
    TextKernels.simhash64(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.simhash64($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class MinHashSignature(child: Expression, k: Int, shingle: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k > 0 && shingle > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string input, k>0, shingle>0")
  override def nullSafeEval(v: Any): Any =
    TextKernels.minhashSignature(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, shingle)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.minhashSignature($a, $k, $shingle)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class WinnowFingerprint(child: Expression, ngram: Int, window: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprint"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && ngram > 0 && window > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string input, ngram>0, window>0")
  override def nullSafeEval(v: Any): Any =
    TextKernels.winnowFingerprint(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], ngram, window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.winnowFingerprint($a, $ngram, $window)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** splitmix64 avalanche of a long with a compile-time seed
  * ([[TextKernels.mix]]) — the deterministic uniform-hash primitive the
  * sampling operators draw from. */
case class Mix64(child: Expression, seed: Long) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mix64"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires bigint input")
  override def nullSafeEval(v: Any): Any =
    TextKernels.mix(v.asInstanceOf[Long], seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.mix($a, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Allocation-free whitespace token count ([[TextKernels.tokenCount]]) —
  * bit-identical to `size(split(trim(text), "\\s+"))` but without the
  * per-row split array (the measured GC storm at 500k+ docs). */
case class TokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_count"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string input")
  override def nullSafeEval(v: Any): Any =
    TextKernels.tokenCount(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.tokenCount($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-token FNV-1a-64 feature buckets ([[TextKernels.tokenFnvBuckets]]) —
  * the hashed bag-of-words featurizer behind the trained quality
  * classifier. `dim` must be a power of two (see the kernel's contract).
  */
case class TokenFnvBuckets(child: Expression, dim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_fnv_buckets"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && dim > 0 && (dim & (dim - 1)) == 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input and a power-of-two dim, got $dim")
  override def nullSafeEval(v: Any): Any =
    TextKernels.tokenFnvBuckets(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.tokenFnvBuckets($a, $dim)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-position hashed word-n-gram buckets
  * ([[TextKernels.wordNgramFnvBuckets]]) — the DSIR featurizer (hashed
  * unigram/bigram counts, Xie et al. 2023). */
case class WordNgramFnvBuckets(child: Expression, n: Int, dim: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngram_fnv_buckets"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n > 0 && dim > 0 && (dim & (dim - 1)) == 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, n>0, and a power-of-two dim, got n=$n dim=$dim")
  override def nullSafeEval(v: Any): Any =
    TextKernels.wordNgramFnvBuckets(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.wordNgramFnvBuckets($a, $n, $dim)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-position hashed char-n-gram buckets
  * ([[TextKernels.charNgramFnvBuckets]]) — the fastText-shape featurizer
  * behind trained language identification. */
case class CharNgramFnvBuckets(child: Expression, n: Int, dim: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_ngram_fnv_buckets"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n > 0 && dim > 0 && (dim & (dim - 1)) == 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, n>0, and a power-of-two dim, got n=$n dim=$dim")
  override def nullSafeEval(v: Any): Any =
    TextKernels.charNgramFnvBuckets(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.charNgramFnvBuckets($a, $n, $dim)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class LangId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lang_id"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string input")
  override def nullSafeEval(v: Any): Any =
    TextKernels.langId(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.langId($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object TextFunctions {
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expression(col)

  def simhash64(text: Column): Column = c(SimHash64(e(text)))
  def minhashSignature(text: Column, k: Int = 128, shingle: Int = 1): Column =
    c(MinHashSignature(e(text), k, shingle))
  def winnowFingerprint(text: Column, ngram: Int = 8, window: Int = 4): Column =
    c(WinnowFingerprint(e(text), ngram, window))
  def langId(text: Column): Column = c(LangId(e(text)))
  def mix64(x: Column, seed: Long): Column = c(Mix64(e(x), seed))
  def tokenFnvBuckets(text: Column, dim: Int): Column = c(TokenFnvBuckets(e(text), dim))
  def charNgramFnvBuckets(text: Column, n: Int, dim: Int): Column =
    c(CharNgramFnvBuckets(e(text), n, dim))
  def wordNgramFnvBuckets(text: Column, n: Int, dim: Int): Column =
    c(WordNgramFnvBuckets(e(text), n, dim))

  /** Whitespace token count — the allocation-free [[TokenCount]] kernel,
    * bit-identical to `size(split(trim(text), "\\s+"))` (equivalence
    * property-pinned in TextDedupSpec). Non-string inputs coerce through
    * a string cast, preserving the old split-form's implicit coercion
    * (the expression itself requires StringType exactly); the cast is a
    * no-op on string columns (SimplifyCasts removes it). */
  def tokenCount(text: Column): Column = c(TokenCount(e(text.cast("string"))))

  /** BPE-ish token count: letter runs, single digits, punctuation marks —
    * the GPT-2 pre-tokenizer shape, regex-only so it stays in codegen.
    */
  val bpeishPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeishPattern), lit(0)))

  /** English stopword list shared by qualityScore and its SQL oracle. */
  val qualityStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  /** Document quality score in [0,1]: composite of length saturation,
    * alpha ratio, and stopword hit ratio (the usual heuristic trio for
    * pretraining-corpus filtering). Pure built-ins → codegen + SQL-oracle
    * expressible.
    */
  def qualityScore(text: Column): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    val nTok = size(toks)
    val lenScore = least(col2double(length(text)) / lit(200.0), lit(1.0))
    val alphaRatio = col2double(length(regexp_replace(text, "[^A-Za-z ]", ""))) /
      greatest(col2double(length(text)), lit(1.0))
    val stopRatio = col2double(size(filter(toks,
      t => array_contains(typedLit(qualityStopwords), t)))) /
      greatest(col2double(nTok), lit(1.0))
    round((lenScore * 0.4 + alphaRatio * 0.4 + least(stopRatio * lit(5.0), lit(1.0)) * 0.2), 5)
  }
  private def col2double(c: Column): Column = c.cast("double")

  /** Hamming distance between two 64-bit sketches (bit_count is built-in). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** PII patterns shared between [[redactPii]] and its SQL oracle (the t9
    * oracle folds these same strings into its DuckDB SQL, so the two
    * engines cannot drift). Kept alternation- and lookaround-free: RE2
    * (DuckDB) has no lookaround, and greedy character-class quantifiers
    * match identically under Java's leftmost-first and RE2's semantics.
    * Applied email → ipv4 → phone. The phone pattern counts DIGITS, not
    * characters: ≥9 digits with at most 2 separator chars `()\s.-`
    * between consecutive digits. Dates (2024-05-01, 8 digits), prices
    * (9.99), ranges (12.50 - 13.75: the 3-char ` - ` gap also breaks the
    * run) and million-scale grouped numbers (1 000 000, 7 digits) all
    * survive; the known over-match is digit-grouped runs that reach 9
    * digits (billion-scale locale numbers, date+time runs like
    * `2024-05-01 12` — and 16-digit card numbers, which SHOULD scrub).
    * The accepted under-match: 7–8-digit numbers (US local dialing,
    * Danish/Norwegian/Singaporean national plans) pass through — ≥8
    * digits would scrub every ISO date, and corpus destruction is the
    * costlier error for a curation gate. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b" -> "<IP>",
    "\\+?\\(?(?:[0-9][()\\s.-]{0,2}){8,}[0-9]" -> "<PHONE>")

  /** Scrub emails / IPv4 addresses / phone-shaped digit runs to typed
    * placeholders — the C4/RefinedWeb-style PII pass of a pretraining
    * pipeline. A chain of codegen `regexp_replace`s: scan-fused,
    * shuffle-free, SQL-replayable. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, lit(pat), lit(repl))
    }
}
