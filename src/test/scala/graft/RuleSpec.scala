package graft

import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.rules.BloomSemiJoinPrefilter

/** The injected-optimizer-rule extension point: BloomSemiJoinPrefilter
  * must (a) rewrite qualifying semi joins to carry a might_contain
  * runtime prefilter, (b) never change results, (c) respect its
  * size-statistics guards, and (d) be idempotent.
  */
class RuleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def semiJoin() = {
    val urgent = ops.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    ops.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_returnflag"))
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  private def withRule[T](rule: BloomSemiJoinPrefilter)(body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ rule
    try body finally spark.experimental.extraOptimizations = prev
  }

  private def hasPrefilter(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists(
      _.expressions.exists(_.exists(_.isInstanceOf[BloomFilterMightContain])))

  test("rule injects might_contain on qualifying semi joins, results unchanged") {
    val baseline = semiJoin().collect().map(_.toSeq).toSeq
    withRule(new BloomSemiJoinPrefilter(probeMinBytes = 1L)) {
      val df = semiJoin()
      assert(hasPrefilter(df), "prefilter not injected:\n" +
        df.queryExecution.optimizedPlan.treeString)
      assert(df.collect().map(_.toSeq).toSeq == baseline)
    }
  }

  test("size guards hold: a huge probe floor or tiny build cap leaves the plan alone") {
    withRule(new BloomSemiJoinPrefilter(probeMinBytes = Long.MaxValue)) {
      assert(!hasPrefilter(semiJoin()), "probe floor ignored")
    }
    withRule(new BloomSemiJoinPrefilter(buildMaxBytes = 0L, probeMinBytes = 1L)) {
      assert(!hasPrefilter(semiJoin()), "build cap ignored")
    }
  }

  test("rule is idempotent: double application injects exactly one prefilter") {
    val rule = new BloomSemiJoinPrefilter(probeMinBytes = 1L)
    withRule(rule) {
      val optimized = semiJoin().queryExecution.optimizedPlan
      val twice = rule(rule(optimized))
      val n = twice.collect { case p =>
        p.expressions.map(_.collect {
          case b: BloomFilterMightContain => b
        }.size).sum
      }.sum
      assert(n == 1, s"expected exactly 1 prefilter after re-application, got $n")
    }
  }
}
