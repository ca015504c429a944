package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column <-> Expression conversion
  * (Spark 4 moved it behind `org.apache.spark.sql.classic.ExpressionUtils`).
  * This is the standard extension-library technique for exposing custom
  * Catalyst `Expression`s as user-facing `Column`s.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
