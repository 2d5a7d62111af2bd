package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `org.apache.spark.sql` namespace: Spark 4 routes
  * Column construction through `ColumnNode`s and scopes the
  * Expression→Column conversion `private[sql]`, so a library adding a
  * custom Catalyst `Expression` needs this one-liner inside the sql
  * package to lift it into the public DataFrame API.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
