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

  /** Register a function builder on a LIVE session's registry (the
    * post-construction counterpart of `SparkSessionExtensions
    * .injectFunction`, which only applies while a session is being built).
    * `sessionState` is `private[sql]`, hence this lives in the bridge.
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
