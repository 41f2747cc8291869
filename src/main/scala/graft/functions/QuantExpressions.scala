package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Vector-quantization kernels: binary (sign-bit) signatures + Hamming
  * distance, and SQ8 scalar quantization with asymmetric-distance (ADC)
  * scoring.
  *
  * The reference serves vectors through pgvector indexes
  * (pgml-sdks/pgml/src/pipeline.rs:526-543); pgvector's public scale story
  * for oversized corpora is quantized scan — bit / halfvec expression
  * indexes — with an exact re-rank on the shortlist. These kernels are that
  * capability for a columnar engine: a 64-dim float32 embedding (256 B)
  * compresses to one 64-bit signature word (8 B, 32×) or 64 SQ8 codes
  * (64 B, 4×), so the candidate-generation scan reads a fraction of the
  * bytes and runs on integer ops inside whole-stage codegen.
  *
  * All kernels are deterministic pure functions of their inputs — the
  * candidate sets and scores replay exactly in ANSI SQL (the v11/v12
  * oracles).
  */
object QuantKernels {

  /** Pack sign bits little-endian into 64-bit words: bit `i & 63` of word
    * `i >> 6` is set iff `v(i) > 0`. (Zero and NaN pack as 0, matching SQL
    * `v > 0`.) */
  def signPackF(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val words = new Array[Long]((n + 63) >>> 6)
    var i = 0
    while (i < n) {
      if (a.getFloat(i) > 0f) words(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    new GenericArrayData(words)
  }

  def signPackD(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val words = new Array[Long]((n + 63) >>> 6)
    var i = 0
    while (i < n) {
      if (a.getDouble(i) > 0d) words(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    new GenericArrayData(words)
  }

  /** Σ popcount(aᵢ xor bᵢ) over packed signature words = the number of
    * dimensions whose signs disagree. */
  def hammingWords(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"signature length mismatch: $n vs ${b.numElements()}")
    var s = 0
    var i = 0
    while (i < n) {
      s += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    s
  }

  /** Per-dimension affine uint8 code: `round((v - min) / scale)` clamped to
    * [0, 255]; a degenerate dimension (scale = 0) codes as 0. Half-up
    * rounding — the argument is non-negative before clamping, where SQL
    * `round()` (half away from zero) agrees. */
  def sq8EncodeF(v: ArrayData, mins: ArrayData, scales: ArrayData): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val sc = scales.getDouble(i)
      if (sc != 0.0) {
        val c = math.floor((v.getFloat(i).toDouble - mins.getDouble(i)) / sc + 0.5).toInt
        out(i) = (if (c < 0) 0 else if (c > 255) 255 else c).toByte
      }
      i += 1
    }
    out
  }

  def sq8EncodeD(v: ArrayData, mins: ArrayData, scales: ArrayData): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val sc = scales.getDouble(i)
      if (sc != 0.0) {
        val c = math.floor((v.getDouble(i) - mins.getDouble(i)) / sc + 0.5).toInt
        out(i) = (if (c < 0) 0 else if (c > 255) 255 else c).toByte
      }
      i += 1
    }
    out
  }

  /** Asymmetric-distance inner product: `base + Σ weights(d) · code(d)`
    * where `weights(d) = q(d)·scale(d)` and `base = Σ q(d)·min(d)` are
    * precomputed once per query — the classic ADC factorization, so the
    * per-row cost is an int-weighted dot over bytes, never a dequantize. */
  def sq8AdcDot(codes: Array[Byte], weights: ArrayData, base: Double): Double = {
    val n = codes.length
    require(n == weights.numElements(),
      s"code length mismatch: $n vs ${weights.numElements()}")
    var s = base
    var i = 0
    while (i < n) {
      s += weights.getDouble(i) * (codes(i) & 0xFF)
      i += 1
    }
    s
  }

  /** Quadratic ADC: `base + Σ_d (wts(2d) + wts(2d+1)·code(d)) · code(d)`
    * over INTERLEAVED per-dim weight pairs (linear at 2d, quadratic at
    * 2d+1). This is the second ADC factorization SQ8 needs once the
    * serving metric is a parameter: with `a_d = q_d − min_d`,
    *   - w1 = 2·a·scale, w2 = −scale², base = −Σ a²  evaluates
    *     −‖q − v̂‖² (the higher-is-closer L2 score, pgvector `<->`);
    *   - w1 = 2·min·scale, w2 = scale², base = Σ min²  evaluates
    *     ‖v̂‖² (the reconstructed norm cosine needs for its denominator).
    * Per-row cost stays an integer-indexed fused multiply-add per dim —
    * no dequantize, same cost class as [[sq8AdcDot]]. */
  def sq8AdcPoly(codes: Array[Byte], wts: ArrayData, base: Double): Double = {
    val n = codes.length
    require(2 * n == wts.numElements(),
      s"weight length mismatch: ${wts.numElements()} vs 2*$n")
    var s = base
    var i = 0
    while (i < n) {
      val c = (codes(i) & 0xFF).toDouble
      s += (wts.getDouble(2 * i) + wts.getDouble(2 * i + 1) * c) * c
      i += 1
    }
    s
  }

  // ---- product quantization (Jégou et al., "Product Quantization for
  // Nearest Neighbor Search", TPAMI 2011 — the standard billion-scale
  // compression: dim floats → m bytes) ----

  /** Encode a vector against a flat codebook (m · k · subDim floats,
    * group-major): per group, the index of the L2-nearest centroid. */
  def pqEncodeF(v: ArrayData, codebook: ArrayData, m: Int, k: Int): Array[Byte] = {
    val dim = v.numElements()
    val subDim = dim / m
    val out = new Array[Byte](m)
    var g = 0
    while (g < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val off = (g * k + c) * subDim
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val diff = v.getFloat(g * subDim + j).toDouble - codebook.getFloat(off + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(g) = best.toByte
      g += 1
    }
    out
  }

  def pqEncodeD(v: ArrayData, codebook: ArrayData, m: Int, k: Int): Array[Byte] = {
    val dim = v.numElements()
    val subDim = dim / m
    val out = new Array[Byte](m)
    var g = 0
    while (g < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val off = (g * k + c) * subDim
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val diff = v.getDouble(g * subDim + j) - codebook.getFloat(off + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(g) = best.toByte
      g += 1
    }
    out
  }

  /** ADC lookup score: `Σ_g lut[g·k + code(g)]` — the per-row scan cost of
    * PQ search is m byte-indexed table reads; the query-dependent work
    * (dot of the query subvector with every centroid) happened ONCE in the
    * LUT build. k is derived from the shapes. */
  def pqAdcDot(codes: Array[Byte], lut: ArrayData): Double = {
    val m = codes.length
    val k = lut.numElements() / m
    var s = 0.0
    var g = 0
    while (g < m) {
      s += lut.getDouble(g * k + (codes(g) & 0xFF))
      g += 1
    }
    s
  }
}

/** `vec_sign_pack(array<float|double>) → array<bigint>` — codegen. */
case class SignPack(child: Expression) extends UnaryExpression {
  private lazy val floatElems: Boolean = VectorTypeUtils.elemIsFloat(child.dataType)
  private lazy val method: String = if (floatElems) "signPackF" else "signPackD"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_sign_pack"

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorTypeUtils.isVectorType(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${child.dataType.simpleString}")

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (floatElems) QuantKernels.signPackF(x) else QuantKernels.signPackD(x)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.QuantKernels.$method($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

/** `vec_hamming(array<bigint>, array<bigint>) → int` — popcount-of-xor over
  * packed signatures, codegen. */
case class HammingWords(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_hamming"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> signatures, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    QuantKernels.hammingWords(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.QuantKernels.hammingWords($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** `sq8_encode(vec, mins, scales) → binary` — per-dimension uint8 codes. */
case class Sq8Encode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  private lazy val floatElems: Boolean = VectorTypeUtils.elemIsFloat(first.dataType)
  private lazy val method: String = if (floatElems) "sq8EncodeF" else "sq8EncodeD"

  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq8_encode"

  override def checkInputDataTypes(): TypeCheckResult = {
    def dbl(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (VectorTypeUtils.isVectorType(first.dataType) &&
        dbl(second.dataType) && dbl(third.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<double>, array<double>), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, ${third.dataType.simpleString})")
  }

  override def nullSafeEval(v: Any, mins: Any, scales: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val mn = mins.asInstanceOf[ArrayData]
    val sc = scales.asInstanceOf[ArrayData]
    if (floatElems) QuantKernels.sq8EncodeF(x, mn, sc)
    else QuantKernels.sq8EncodeD(x, mn, sc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, mn, sc) => s"graft.functions.QuantKernels.$method($v, $mn, $sc)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** `pq_encode(vec, codebook; m, k) → binary` — m-byte PQ codes. The flat
  * codebook (m·k·subDim floats, group-major) is a literal/reference
  * object, never rebuilt per row. */
case class PqEncode(left: Expression, right: Expression, m: Int, k: Int)
    extends BinaryExpression {
  private lazy val floatElems: Boolean = VectorTypeUtils.elemIsFloat(left.dataType)
  private lazy val method: String = if (floatElems) "pqEncodeF" else "pqEncodeD"

  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = {
    val cbOk = right.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (VectorTypeUtils.isVectorType(left.dataType) && cbOk && m > 0 && k > 0 && k <= 256)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<float> codebook), m>0, 0<k<=256; got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString}, m=$m, k=$k)")
  }

  override def nullSafeEval(v: Any, cb: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val c = cb.asInstanceOf[ArrayData]
    if (floatElems) QuantKernels.pqEncodeF(x, c, m, k)
    else QuantKernels.pqEncodeD(x, c, m, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, cb) => s"graft.functions.QuantKernels.$method($v, $cb, $m, $k)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `pq_adc_dot(codes, lut) → double` — m table lookups per row. */
case class PqAdcDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    val lutOk = right.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (left.dataType == BinaryType && lutOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(codes: Any, lut: Any): Any =
    QuantKernels.pqAdcDot(codes.asInstanceOf[Array[Byte]], lut.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, l) => s"graft.functions.QuantKernels.pqAdcDot($c, $l)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** `sq8_adc_dot(codes, weights, base) → double` — ADC inner product. */
case class Sq8AdcDot(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq8_adc_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == BinaryType &&
      (second.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }) && third.dataType == DoubleType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, array<double>, double), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, ${third.dataType.simpleString})")
  }

  override def nullSafeEval(codes: Any, weights: Any, base: Any): Any =
    QuantKernels.sq8AdcDot(codes.asInstanceOf[Array[Byte]],
      weights.asInstanceOf[ArrayData], base.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (c, w, b) => s"graft.functions.QuantKernels.sq8AdcDot($c, $w, $b)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** `sq8_adc_poly(codes, interleaved_weights, base) → double` — quadratic
  * ADC (see [[QuantKernels.sq8AdcPoly]]): the factorization that serves
  * SQ8 under the l2 and cosine metrics without dequantizing. */
case class Sq8AdcPoly(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq8_adc_poly"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == BinaryType &&
      (second.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }) && third.dataType == DoubleType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, array<double>, double), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, ${third.dataType.simpleString})")
  }

  override def nullSafeEval(codes: Any, wts: Any, base: Any): Any =
    QuantKernels.sq8AdcPoly(codes.asInstanceOf[Array[Byte]],
      wts.asInstanceOf[ArrayData], base.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (c, w, b) => s"graft.functions.QuantKernels.sq8AdcPoly($c, $w, $b)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}
