package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `Column(expr)` / `Column.expr` bridge;
  * the supported conversion lives in the sql-private
  * `classic.ExpressionUtils`. This shim (in an `org.apache.spark.sql`
  * subpackage, the conventional extension point) re-exports just the
  * two conversions our custom Catalyst expressions need.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
