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

  /** EXACT ntile(k) over the total order (measure ±, tie) with NO
    * data-sized window and NO driver round-trip — the scale-safe global
    * quantile assignment (generalized from `events_rfm`'s quartiles).
    * `blk` must be a MONOTONE function of the measure under the sort
    * direction (so block ranges never interleave; integer `div` of a
    * non-negative measure qualifies) with cardinality bounded by the
    * measure's VALUE RANGE, not by data size. Global rank = rows in
    * strictly-prior blocks (an in-plan prefix sum over the tiny block
    * frame, broadcast back as an equi-join) + row_number within the
    * block (a key-partitioned window); the bucket is ntile's exact
    * arithmetic off the grand total, computed in the SAME block-frame
    * pass and carried on the broadcast join (one df scan total): with
    * N = kq + r, buckets 1..r take q+1 rows. Reserved helper columns:
    * __blk/__off/__rn/__n.
    */
  def blockedNtile(df: DataFrame, out: String, k: Int, m: String, tie: String,
      desc: Boolean, blk: Column): DataFrame = {
    require(k >= 2, s"ntile needs k >= 2, got $k")
    require(Seq("__blk", "__off", "__rn", "__n").forall(!df.columns.contains(_)),
      "__blk/__off/__rn/__n are reserved helper columns of blockedNtile")
    val cnts = df.withColumn("__blk", blk.cast("long"))
      .groupBy("__blk").agg(count(lit(1)).as("__c"))
    val bw = Window.orderBy(if (desc) col("__blk").desc else col("__blk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // prefix offsets AND the grand total from ONE pass over the bounded
    // block frame (both windows share its single partition) — a separate
    // cnts.agg(sum) would re-execute the whole df scan + block shuffle
    // for one number, and the fused __n removes the crossJoin entirely
    val offDf = broadcast(
      cnts.select(col("__blk"),
        coalesce(sum(col("__c")).over(bw), lit(0L)).as("__off"),
        sum(col("__c")).over(Window.partitionBy()).as("__n")))
    val ord =
      if (desc) Seq(col(m).desc, col(tie).asc)
      else Seq(col(m).asc, col(tie).asc)
    val w = Window.partitionBy(col("__blk")).orderBy(ord: _*)
    df.withColumn("__blk", blk.cast("long"))
      .join(offDf, "__blk")
      .withColumn("__rn", (col("__off") + row_number().over(w)).cast("long"))
      .withColumn(out, expr(
        s"""CAST(CASE WHEN __rn <= (__n % $k) * ((__n div $k) + 1)
           |  THEN ((__rn - 1) div ((__n div $k) + 1)) + 1
           |  ELSE (__n % $k) + ((__rn - (__n % $k) * ((__n div $k) + 1) - 1)
           |    div greatest(__n div $k, 1L)) + 1
           |  END AS BIGINT)""".stripMargin))
      .drop("__blk", "__off", "__rn", "__n")
  }
}
