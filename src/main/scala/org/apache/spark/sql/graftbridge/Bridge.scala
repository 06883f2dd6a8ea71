package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for `private[sql]` Column↔Expression conversion —
  * the standard extension-point bridge for libraries shipping native
  * Catalyst expressions (same approach as spark packages like spark-xml
  * pre-merge). Nothing else from the private API surface is touched. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
