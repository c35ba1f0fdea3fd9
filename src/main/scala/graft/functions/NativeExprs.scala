package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the two hottest scalar functions
  * (SURVEY §7.6 stretch): unlike Scala UDFs these stay INSIDE whole-stage
  * codegen — no encoder round-trip per row, null handling generated, and
  * the expression is visible to the optimizer (foldable on literal input,
  * null-propagating). Semantics are delegated to the same pure functions
  * the UDF path uses, so both paths are oracle-identical.
  */
object NativeExprs {

  /** Static entry points for generated code (must be stable JVM names). */
  def normalizeNameJvm(s: UTF8String): UTF8String =
    UTF8String.fromString(TextFns.normalizeName(s.toString))

  /** Returns NaN for unparseable input; the expression maps NaN -> null
    * (generated code cannot easily produce Option). */
  def durationToHoursJvm(s: UTF8String): Double =
    TextFns.convertDuration(s.toString, "hour").getOrElse(Double.NaN)

  /** See [[SortableBitsExpr]]. doubleToLongBits canonicalizes every NaN
    * to 0x7ff8…, which as a key lands above +Infinity's 0x7ff0…. */
  def sortableBitsJvm(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(if (d == 0.0) 0.0 else d)
    if (b >= 0) b else b ^ Long.MaxValue
  }
}

/** normalize_name as a codegen'd unary expression (reference
  * __init__.py:10-29). */
case class NormalizeNameExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"normalize_name_native expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_name_native"

  override protected def nullSafeEval(input: Any): Any =
    NativeExprs.normalizeNameJvm(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeExprs.normalizeNameJvm($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNameExpr =
    copy(child = newChild)
}

/** duration_to_hours as a codegen'd unary expression: "H:MM:SS"/"MM:SS"
  * (';' tolerated) -> hours rounded to 4 decimals, garbage -> null
  * (reference __init__.py:32-73). */
case class DurationToHoursExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"duration_to_hours_native expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "duration_to_hours_native"

  override protected def nullSafeEval(input: Any): Any = {
    val d = NativeExprs.durationToHoursJvm(input.asInstanceOf[UTF8String])
    if (d.isNaN) null else d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        double ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.NativeExprs.durationToHoursJvm(${childGen.value});
          if (Double.isNaN(${ev.value})) { ${ev.isNull} = true; ${ev.value} = 0.0; }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): DurationToHoursExpr =
    copy(child = newChild)
}

/** Order-preserving DOUBLE -> BIGINT ranking key:
  * `a < b  ⟺  sortable_bits(a) < sortable_bits(b)` under the engines'
  * shared total order (-0.0 keyed equal to 0.0 — both engines sort them
  * as ties; NaN keyed above +Infinity — both engines sort NaN largest).
  * The IEEE-754 trick: non-negative doubles compare like their raw bits;
  * negative doubles compare in REVERSED bit order, so flipping their 63
  * magnitude bits (keeping the sign bit, which already orders them below
  * the non-negatives as signed longs) makes the whole line monotone.
  * Purpose: lets the bounded TopKOps aggregator rank real-valued scores
  * map-side — the window-sort formulation it replaces is the classic
  * 100 TB anti-shape (see TopKOps scaladoc). */
case class SortableBitsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sortable_bits expects DOUBLE, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "sortable_bits"

  override protected def nullSafeEval(input: Any): Any =
    NativeExprs.sortableBitsJvm(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeExprs.sortableBitsJvm($c)")

  override protected def withNewChildInternal(newChild: Expression): SortableBitsExpr =
    copy(child = newChild)
}
