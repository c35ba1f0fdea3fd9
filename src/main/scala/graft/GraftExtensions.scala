package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DurationToHoursExpr, NormalizeNameExpr}

/** SparkSessionExtensions hook (enable with
  * `spark.sql.extensions=graft.GraftExtensions`, set by [[Sessions.builder]]):
  * registers the codegen'd native expressions in the session's function
  * registry so the SQL path gets them without UDF overhead. Per SURVEY
  * §4.2 no custom optimizer Rule / SparkStrategy is warranted — every
  * operator's semantics fit Catalyst's plan algebra — so function
  * injection is the only extension point the engine uses.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("normalize_name_native"),
      new ExpressionInfo(classOf[NormalizeNameExpr].getName, "normalize_name_native"),
      (children: Seq[Expression]) => NormalizeNameExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("duration_to_hours_native"),
      new ExpressionInfo(classOf[DurationToHoursExpr].getName, "duration_to_hours_native"),
      (children: Seq[Expression]) => DurationToHoursExpr(children.head)))
  }
}
