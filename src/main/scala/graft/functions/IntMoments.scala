package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact integer moment sums (n, Σx, Σx²) of a BIGINT column. */
case class Moments(n: Long, total: Long, total_sq: Long)

/** Typed `Aggregator` (the Dataset-native UDAF surface, registered
  * through `functions.udaf`) accumulating EXACT integer moments — count,
  * sum, sum of squares — from which mean/variance derive without any
  * order-sensitive floating accumulation. This exercises the one
  * extension API the library's native expressions don't cover:
  * [[SpaceSavingTopK]] is a Catalyst `TypedImperativeAggregate` (SQL
  * side); this is the typed-`Encoder` aggregation path a Scala user
  * reaches first, and Spark plans it with the same partial/final split —
  * `merge` runs map-side, so the shuffle carries one 3-long buffer per
  * group per partition.
  *
  * Caller contract: inputs must be small enough that Σx² fits a signed
  * 64-bit long (max·max·rows < 2⁶³) — true for bounded quantities; use
  * DECIMAL(38,0) sums beyond that.
  */
object IntMomentsAgg extends Aggregator[Long, Moments, Moments] {
  override def zero: Moments = Moments(0L, 0L, 0L)
  override def reduce(b: Moments, x: Long): Moments =
    Moments(b.n + 1, b.total + x, b.total_sq + x * x)
  override def merge(a: Moments, b: Moments): Moments =
    Moments(a.n + b.n, a.total + b.total, a.total_sq + b.total_sq)
  override def finish(r: Moments): Moments = r
  override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
  override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
}
