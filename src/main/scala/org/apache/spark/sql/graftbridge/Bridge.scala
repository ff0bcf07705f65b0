package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression conversion for custom Catalyst expressions.
  *
  * Spark 4's Column no longer exposes its Expression (the Connect
  * refactor); the classic-mode converters live in `private[sql]`
  * `ExpressionUtils`, so this one-file bridge sits inside the
  * `org.apache.spark.sql` namespace — the standard extension-library
  * pattern for registering native expressions without a full
  * SparkSessionExtensions round-trip.
  */
object Bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
