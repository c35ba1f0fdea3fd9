package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. Spark 4's unified Column wraps a
  * ColumnNode; the converters live in `classic.ExpressionUtils`, which is
  * private[sql] — this shim lives in an org.apache.spark.sql subpackage
  * solely to re-export the two conversions the engine's native
  * expressions need. No Spark internals are modified.
  */
object Shim {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
