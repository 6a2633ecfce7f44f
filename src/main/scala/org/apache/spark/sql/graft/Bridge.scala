package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 moved `Column` to a backend-agnostic node model; the classic
  * converters (`ExpressionUtils.column/expression`) are `private[sql]`, so
  * third-party Catalyst expressions need a shim inside the
  * `org.apache.spark.sql` namespace — the standard extension technique
  * (connector libraries do the same). This is the ONLY file outside the
  * `graft` namespace.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
