package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Catalyst expressions for the vector-math surface of the reference
  * (pgml-extension/src/vectors.rs): dot product, cosine similarity, L1/L2
  * distance, norms, normalization. Scalar-returning expressions participate
  * in whole-stage codegen (`defineCodeGen` emits a direct static call into
  * [[VectorKernels]]), so a brute-force KNN scan stays in one codegen stage:
  * parquet scan → cosine → TakeOrderedAndProject.
  *
  * Element-type specialization (float vs double arrays) is resolved once at
  * plan time from the child's `ArrayType` element type.
  */
object VectorTypeUtils {
  def isVectorType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  def elemIsFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

abstract class BinaryVectorToDouble extends BinaryExpression {
  /** VectorKernels method prefix, e.g. "dot" → dotF / dotD. */
  protected def kernel: String

  protected lazy val floatElems: Boolean = VectorTypeUtils.elemIsFloat(left.dataType)
  private lazy val method: String = kernel + (if (floatElems) "F" else "D")

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    // compare element types only — containsNull differs between parquet
    // columns (nullable elements) and literals, but is irrelevant here
    def elem(dt: DataType) = dt.asInstanceOf[ArrayType].elementType
    if (VectorTypeUtils.isVectorType(left.dataType) &&
        VectorTypeUtils.isVectorType(right.dataType) &&
        elem(left.dataType) == elem(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> or two array<double> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    kernel match {
      case "dot"    => if (floatElems) VectorKernels.dotF(x, y) else VectorKernels.dotD(x, y)
      case "cosine" => if (floatElems) VectorKernels.cosineF(x, y) else VectorKernels.cosineD(x, y)
      case "distL1" => if (floatElems) VectorKernels.distL1F(x, y) else VectorKernels.distL1D(x, y)
      case "distL2" => if (floatElems) VectorKernels.distL2F(x, y) else VectorKernels.distL2D(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.$method($a, $b)")
}

/** Σ aᵢ·bᵢ — vectors.rs:276-292 (BLAS sdot). */
case class DotProduct(left: Expression, right: Expression) extends BinaryVectorToDouble {
  override protected def kernel: String = "dot"
  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** dot/(‖a‖‖b‖) — vectors.rs:294-318. pgvector's `<=>` is 1 − this. */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryVectorToDouble {
  override protected def kernel: String = "cosine"
  override def prettyName: String = "cosine_similarity"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Manhattan distance — vectors.rs:238-254. */
case class DistanceL1(left: Expression, right: Expression) extends BinaryVectorToDouble {
  override protected def kernel: String = "distL1"
  override def prettyName: String = "vec_distance_l1"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Euclidean distance — vectors.rs:256-274. */
case class DistanceL2(left: Expression, right: Expression) extends BinaryVectorToDouble {
  override protected def kernel: String = "distL2"
  override def prettyName: String = "vec_distance_l2"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

abstract class UnaryVectorToDouble extends UnaryExpression {
  protected def kernel: String
  protected lazy val floatElems: Boolean = VectorTypeUtils.elemIsFloat(child.dataType)
  private lazy val method: String = kernel + (if (floatElems) "F" else "D")

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorTypeUtils.isVectorType(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${child.dataType.simpleString}")

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    kernel match {
      case "normL0"  => if (floatElems) VectorKernels.normL0F(x) else VectorKernels.normL0D(x)
      case "normL1"  => if (floatElems) VectorKernels.normL1F(x) else VectorKernels.normL1D(x)
      case "normL2"  => if (floatElems) VectorKernels.normL2F(x) else VectorKernels.normL2D(x)
      case "normMax" => if (floatElems) VectorKernels.normMaxF(x) else VectorKernels.normMaxD(x)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.$method($a)")
}

/** #non-zero elements — vectors.rs:116-128. */
case class NormL0(child: Expression) extends UnaryVectorToDouble {
  override protected def kernel: String = "normL0"
  override def prettyName: String = "vec_norm_l0"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
/** Σ|xᵢ| — vectors.rs:130-142 (BLAS sasum). */
case class NormL1(child: Expression) extends UnaryVectorToDouble {
  override protected def kernel: String = "normL1"
  override def prettyName: String = "vec_norm_l1"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
/** √Σxᵢ² — vectors.rs:144-156 (BLAS snrm2). */
case class NormL2(child: Expression) extends UnaryVectorToDouble {
  override protected def kernel: String = "normL2"
  override def prettyName: String = "vec_norm_l2"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
/** max|xᵢ| — vectors.rs:158-174 (BLAS isamax). */
case class NormMax(child: Expression) extends UnaryVectorToDouble {
  override protected def kernel: String = "normMax"
  override def prettyName: String = "vec_norm_max"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** v / ‖v‖ with the norm computed once per row — vectors.rs:176-236.
  * `kind` ∈ l1 | l2 | max. Returns the input array type.
  */
case class NormalizeVector(child: Expression, kind: String) extends UnaryExpression {
  private lazy val floatElems = VectorTypeUtils.elemIsFloat(child.dataType)
  private lazy val suffix = if (floatElems) "F" else "D"
  private lazy val normMethod = kind match {
    case "l1" => "normL1" case "l2" => "normL2" case "max" => "normMax"
  }

  override def dataType: DataType = child.dataType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"vec_normalize_$kind"

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorTypeUtils.isVectorType(child.dataType) && Set("l1", "l2", "max").contains(kind))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> and kind in {l1,l2,max}")

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (floatElems) {
      val n = normMethod match {
        case "normL1" => VectorKernels.normL1F(x)
        case "normL2" => VectorKernels.normL2F(x)
        case "normMax" => VectorKernels.normMaxF(x)
      }
      VectorKernels.normalizeF(x, n)
    } else {
      val n = normMethod match {
        case "normL1" => VectorKernels.normL1D(x)
        case "normL2" => VectorKernels.normL2D(x)
        case "normMax" => VectorKernels.normMaxD(x)
      }
      VectorKernels.normalizeD(x, n)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VectorKernels.normalize$suffix($a, graft.functions.VectorKernels.$normMethod$suffix($a))")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
