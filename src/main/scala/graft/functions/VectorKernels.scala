package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Tight primitive loops over Catalyst `ArrayData` — the numeric core of the
  * vector function surface (reference: pgml-extension/src/vectors.rs, which
  * delegates to BLAS sdot/snrm2/sasum/isamax).
  *
  * These are plain static JVM methods so generated (whole-stage codegen) Java
  * can call them directly: the JIT inlines and vectorizes the loops, and no
  * boxing or Seq allocation happens on the hot path. Methods are specialized
  * by element type (`F` = float arrays, `D` = double arrays) — the dispatch
  * happens once at plan time in the corresponding `Expression`, never per row.
  *
  * Precondition: array elements are non-null (embeddings are dense vectors).
  */
object VectorKernels {

  // ---- Array[Float] twins of the float kernels ----
  // The driver-local serving tiers (IvfIndex.searchLocal /
  // IvfPq.searchLocal) score with THESE, so an in-process probe is
  // bit-identical to the codegen'd distributed scan: same loop, same
  // float→double widening, same accumulation order.
  def dotF(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == b.length, s"vector length mismatch: ${a.length} vs ${b.length}")
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }
    s
  }
  def cosineF(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == b.length, s"vector length mismatch: ${a.length} vs ${b.length}")
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }
  def distL2F(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == b.length, "vector length mismatch")
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  // ---- Strided twins over a FLAT posting blob ----
  // The driver-local IVF tier stores each cluster's vectors as one flat
  // float[] (n·dim, row-major): 15M spill rows as individual Array[Float]
  // objects cost ~1.5 GB of headers/padding and a pointer chase per row.
  // Same variable roles, same accumulation order as the Array twins above
  // — scores stay bit-identical (a(i) ↦ flat(off+i), b ↦ q).
  def dotFS(flat: Array[Float], off: Int, q: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < q.length) { s += flat(off + i).toDouble * q(i); i += 1 }
    s
  }
  def cosineFS(flat: Array[Float], off: Int, q: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < q.length) {
      val x = flat(off + i).toDouble; val y = q(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }
  def distL2FS(flat: Array[Float], off: Int, q: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < q.length) { val d = flat(off + i).toDouble - q(i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  // ---- dot product (vectors.rs:276-292) ----
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(), s"vector length mismatch: $n vs ${b.numElements()}")
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i); i += 1 }
    s
  }
  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(), s"vector length mismatch: $n vs ${b.numElements()}")
    var s = 0.0; var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  // ---- cosine similarity (vectors.rs:294-318): dot/(||a||*||b||) ----
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(), s"vector length mismatch: $n vs ${b.numElements()}")
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }
  def cosineD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(), s"vector length mismatch: $n vs ${b.numElements()}")
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  // ---- distances (vectors.rs:238-274) ----
  def distL1F(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements(); var s = 0.0; var i = 0
    require(n == b.numElements(), "vector length mismatch")
    while (i < n) { s += math.abs(a.getFloat(i).toDouble - b.getFloat(i)); i += 1 }
    s
  }
  def distL1D(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements(); var s = 0.0; var i = 0
    require(n == b.numElements(), "vector length mismatch")
    while (i < n) { s += math.abs(a.getDouble(i) - b.getDouble(i)); i += 1 }
    s
  }
  def distL2F(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements(); var s = 0.0; var i = 0
    require(n == b.numElements(), "vector length mismatch")
    while (i < n) { val d = a.getFloat(i).toDouble - b.getFloat(i); s += d * d; i += 1 }
    math.sqrt(s)
  }
  def distL2D(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements(); var s = 0.0; var i = 0
    require(n == b.numElements(), "vector length mismatch")
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  // ---- norms (vectors.rs:116-174) ----
  def normL0F(a: ArrayData): Double = {
    val n = a.numElements(); var c = 0L; var i = 0
    while (i < n) { if (a.getFloat(i) != 0.0f) c += 1; i += 1 }
    c.toDouble
  }
  def normL0D(a: ArrayData): Double = {
    val n = a.numElements(); var c = 0L; var i = 0
    while (i < n) { if (a.getDouble(i) != 0.0) c += 1; i += 1 }
    c.toDouble
  }
  def normL1F(a: ArrayData): Double = {
    val n = a.numElements(); var s = 0.0; var i = 0
    while (i < n) { s += math.abs(a.getFloat(i).toDouble); i += 1 }
    s
  }
  def normL1D(a: ArrayData): Double = {
    val n = a.numElements(); var s = 0.0; var i = 0
    while (i < n) { s += math.abs(a.getDouble(i)); i += 1 }
    s
  }
  def normL2F(a: ArrayData): Double = {
    val n = a.numElements(); var s = 0.0; var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }
  def normL2D(a: ArrayData): Double = {
    val n = a.numElements(); var s = 0.0; var i = 0
    while (i < n) { val x = a.getDouble(i); s += x * x; i += 1 }
    math.sqrt(s)
  }
  def normMaxF(a: ArrayData): Double = {
    val n = a.numElements(); var m = 0.0; var i = 0
    while (i < n) { val x = math.abs(a.getFloat(i).toDouble); if (x > m) m = x; i += 1 }
    m
  }
  def normMaxD(a: ArrayData): Double = {
    val n = a.numElements(); var m = 0.0; var i = 0
    while (i < n) { val x = math.abs(a.getDouble(i)); if (x > m) m = x; i += 1 }
    m
  }

  // ---- normalize (vectors.rs:176-236): v / norm, norm computed once ----
  def normalizeF(a: ArrayData, norm: Double): ArrayData = {
    val n = a.numElements(); val out = new Array[Float](n); var i = 0
    val inv = if (norm == 0.0) 0.0 else 1.0 / norm
    while (i < n) { out(i) = (a.getFloat(i) * inv).toFloat; i += 1 }
    new GenericArrayData(out)
  }
  def normalizeD(a: ArrayData, norm: Double): ArrayData = {
    val n = a.numElements(); val out = new Array[Double](n); var i = 0
    val inv = if (norm == 0.0) 0.0 else 1.0 / norm
    while (i < n) { out(i) = a.getDouble(i) * inv; i += 1 }
    new GenericArrayData(out)
  }
}
