package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
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
