package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** THE rank-based exact-percentile idiom, defined once: value at rank
  * ceil(a·n/b) per partition — `(a·n + b−1) div b` in pure integers, so
  * no interpolated float quantile ever exists on either engine (the
  * dq_outlier_fences / events_hourly_p95 discipline; their oracles spell
  * the identical arithmetic). One partition-keyed rank window + one
  * partition-keyed aggregate; ties break on the tie column so the rank
  * assignment is deterministic (equal values make the SELECTED value
  * identical regardless of tie order — the tie column only pins the
  * window's physical determinism).
  *
  * At 100 TB the same report swaps the exact ranks for per-partition
  * `approx_percentile` with an identical output shape — the documented
  * tradeoff, not a different operator.
  */
object RankStats {

  /** Per `part` group: `n` plus, for each (alias, a, b), the value of
    * `value` at rank ceil(a·n/b) under (value, tie) ascending order.
    *
    * CONTRACT: `part`/`value`/`tie` are COLUMN NAMES (not expression
    * strings — `value` is interpolated into the rank-threshold `expr`),
    * and `__rn`/`__n` are reserved helper names the caller's frame must
    * not already carry — both are rejected eagerly rather than silently
    * miscomputing.
    */
  def valueAtCeilRanks(df: DataFrame, part: String, value: String, tie: String,
      fracs: Seq[(String, Int, Int)]): DataFrame = {
    require(Seq(part, value, tie).forall(df.columns.contains),
      s"part/value/tie must be existing column names; have ${df.columns.mkString(",")}")
    require(!df.columns.contains("__rn") && !df.columns.contains("__n"),
      "__rn/__n are reserved helper columns of valueAtCeilRanks")
    val byP = Window.partitionBy(col(part))
    val ranked = df
      .withColumn("__rn", row_number().over(byP.orderBy(col(value), col(tie))))
      .withColumn("__n", count(lit(1)).over(byP))
    val aggs: Seq[Column] = max(col("__n")).as("n") +:
      fracs.map { case (alias, a, b) =>
        max(when(col("__rn") <= expr(s"($a * __n + ${b - 1}) div $b"), col(value)))
          .as(alias)
      }
    ranked.groupBy(col(part)).agg(aggs.head, aggs.tail: _*)
  }
}
