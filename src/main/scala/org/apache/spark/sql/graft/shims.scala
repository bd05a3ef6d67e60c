package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4 moved `Column` to a backend-agnostic representation
  * (`ColumnNode`) and made the Expression conversion `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Libraries that ship
  * native Catalyst expressions need this one-file shim in the
  * `org.apache.spark.sql` namespace — the same technique used by
  * open-source Spark extension libraries. Nothing else in graft reaches
  * into Spark internals.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
