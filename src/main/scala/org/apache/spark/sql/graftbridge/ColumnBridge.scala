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

  /** Register a Catalyst expression builder as a session-scoped SQL
    * function (the extension point `SparkSessionExtensions.
    * injectFunction` uses; exposed here for post-hoc registration on
    * an existing session).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Apply a SparkSessionExtensions' injected functions to a registry
    * — the session-build step `spark.sql.extensions` performs,
    * exposed (it is `private[sql]`) so specs can prove an extensions
    * class injects what it claims without tearing down the shared
    * test session.
    */
  def applyInjectedFunctions(
      ext: org.apache.spark.sql.SparkSessionExtensions,
      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry): Unit = {
    ext.registerFunctions(registry)
    ()
  }
}
