package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression bridge for function registration.
  *
  * Spark 4 moved the conversions behind `private[sql]`
  * (classic.ExpressionUtils); a library that wants to register its
  * Column-composed operators in the SQL function registry still needs
  * them — `SparkSessionExtensions.injectFunction` builders receive and
  * return raw `Expression`s. Declaring this one-file shim inside the sql
  * package is the standard ecosystem-library pattern for that need; it
  * touches no internals beyond the two conversions, so graft's SQL
  * surface (see [[graft.functions.GraftExtensions]]) is EXACTLY the
  * Column API — one definition, two front doors, no formula duplication.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Convert through the REAL node→expression converter (not
    * ExpressionUtils.expression, whose ColumnNodeExpression wrapper is an
    * opaque leaf the analyzer will not traverse when the tree is returned
    * from a FunctionRegistry builder mid-resolution). */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
