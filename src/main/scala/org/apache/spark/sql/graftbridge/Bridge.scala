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

  /** Spark's internal bloom-filter expressions (the machinery behind
    * runtime row-level filtering), exposed as Columns for explicit
    * build-side→probe-side pruning. Not in the public function registry,
    * hence surfaced through the bridge like the Column⇄Expression
    * converters above.
    */
  def bloomFilterAgg(child: Column, expectedItems: Long): Column =
    ExpressionUtils.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        ExpressionUtils.expression(child), expectedItems).toAggregateExpression())

  /** `might_contain(bloomBytes, value)` over a DRIVER-COLLECTED serialized
    * bloom (a Literal, satisfying the expression's constant-input
    * requirement) — the sketch is bounded (~KBs–MBs), the same class of
    * artifact as a broadcast codebook.
    */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(bloomBytes,
          org.apache.spark.sql.types.BinaryType),
        ExpressionUtils.expression(value)))

  /** DataFrame ⇄ LogicalPlan conversion for custom logical operators
    * (`Dataset.ofRows` and `queryExecution` are `private[sql]`/classic-
    * only in Spark 4). `analyzedPlan` returns the ANALYZED child — custom
    * nodes built from analyzed children are themselves resolved, so the
    * composite re-enters the analyzer as a no-op.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def analyzedPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed

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
