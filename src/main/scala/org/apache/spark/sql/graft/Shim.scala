package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `private[sql]` Column <-> Expression conversion (Spark 4
  * moved Column onto ColumnNode; extensions reach Expressions through
  * org.apache.spark.sql.classic.ExpressionUtils). */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager ColumnNode -> Expression conversion for contexts that never
    * run the Dataset-side conversion (e.g. FunctionRegistry builders):
    * `expression` defers via ColumnNodeExpression, which the analyzer
    * resolves only on Dataset paths; this converts the whole tree now,
    * leaving ordinary (analyzer-resolvable) unresolved functions. */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Register a function builder in an existing session's registry
    * (the extension-free path; GraftExtensions covers session build). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
