package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fixed-dim vector math as native kernels. The flat expression-tree
  * forms these replace (64 element_at products reduced left-to-right)
  * were codegen-friendly in a Project, but Catalyst pushes a cosine
  * THRESHOLD through to the pair join's residual condition, where the
  * ~190-node tree is evaluated per probed pair OUTSIDE whole-stage
  * codegen — interpreted Predicate evaluation measured ~12 µs/pair
  * (3+ s for 270 k candidate pairs at sf0.1, the whole cost of
  * dedup_semantic's pair stage). A kernel is one static call wherever
  * the expression lands — join condition, generated code, or
  * interpreted eval — and can never meet Janino's 64 KB method cliff.
  *
  * Semantics are EXACTLY the flat forms': every element cast
  * float→double before multiplying, accumulation left-associative with
  * NO initial value (acc starts at the first product — the association
  * order of the DuckDB oracles' no-init list_reduce), result NULL if
  * either array is null, shorter than `dim`, or has a null element in
  * the first `dim` positions (element_at's out-of-bounds/null-element
  * null, propagated through + and *).
  */
object VectorKernels {

  private def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def dot(a: ArrayData, b: ArrayData, dim: Int,
      aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    if (a.numElements() < dim || b.numElements() < dim) return null
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      i += 1
    }
    var acc = get(a, 0, aFloat) * get(b, 0, bFloat)
    i = 1
    while (i < dim) {
      acc += get(a, i, aFloat) * get(b, i, bFloat)
      i += 1
    }
    acc
  }

  def sqNorm(a: ArrayData, dim: Int, aFloat: Boolean): java.lang.Double =
    dot(a, a, dim, aFloat, aFloat)

  def sqDist(a: ArrayData, b: ArrayData, dim: Int,
      aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    if (a.numElements() < dim || b.numElements() < dim) return null
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      i += 1
    }
    var d0 = get(a, 0, aFloat) - get(b, 0, bFloat)
    var acc = d0 * d0
    i = 1
    while (i < dim) {
      val d = get(a, i, aFloat) - get(b, i, bFloat)
      acc += d * d
      i += 1
    }
    acc
  }

  private[functions] def elemFloat(e: Expression, name: String): Boolean =
    e.dataType match {
      case ArrayType(FloatType, _)  => true
      case ArrayType(DoubleType, _) => false
      case other => throw new IllegalArgumentException(
        s"$name expects ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
    }

  private[functions] def checkVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
}

/** `vec_dot(a, b, dim)` — see [[VectorKernels.dot]]. */
case class VecDotExpr(left: Expression, right: Expression, dim: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorKernels.checkVec(left.dataType) && VectorKernels.checkVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects ARRAY<FLOAT|DOUBLE> operands, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"
  private lazy val aF = VectorKernels.elemFloat(left, "vec_dot")
  private lazy val bF = VectorKernels.elemFloat(right, "vec_dot")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], dim, aF, bF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double r = graft.functions.VectorKernels.dot($a, $b, $dim, $aF, $bF);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotExpr =
    copy(left = newLeft, right = newRight)
}

/** `vec_sqnorm(a, dim)` — see [[VectorKernels.sqNorm]]. */
case class VecSqNormExpr(child: Expression, dim: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorKernels.checkVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_sqnorm expects ARRAY<FLOAT|DOUBLE>, got ${child.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sqnorm"
  private lazy val aF = VectorKernels.elemFloat(child, "vec_sqnorm")

  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.sqNorm(a.asInstanceOf[ArrayData], dim, aF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      java.lang.Double r = graft.functions.VectorKernels.sqNorm($a, $dim, $aF);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
    """)

  override protected def withNewChildInternal(newChild: Expression): VecSqNormExpr =
    copy(child = newChild)
}

/** `vec_sqdist(a, b, dim)` — see [[VectorKernels.sqDist]]. */
case class VecSqDistExpr(left: Expression, right: Expression, dim: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorKernels.checkVec(left.dataType) && VectorKernels.checkVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_sqdist expects ARRAY<FLOAT|DOUBLE> operands, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sqdist"
  private lazy val aF = VectorKernels.elemFloat(left, "vec_sqdist")
  private lazy val bF = VectorKernels.elemFloat(right, "vec_sqdist")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], dim, aF, bF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double r = graft.functions.VectorKernels.sqDist($a, $b, $dim, $aF, $bF);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecSqDistExpr =
    copy(left = newLeft, right = newRight)
}
