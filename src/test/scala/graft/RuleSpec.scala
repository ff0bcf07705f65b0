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

  private def semiJoin(s: org.apache.spark.sql.SparkSession = spark) = {
    val urgent = ops.Tables.orders(s, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    ops.Tables.lineitem(s, sf)
      .select(col("l_orderkey"), col("l_returnflag"))
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  private def prefilterCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.map(_.collect {
        case b: BloomFilterMightContain => b
      }.size).sum
    }.sum

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

  test("guard survives a Project between the prefilter and the join child " +
      "(the fixed-point ColumnPruning interleaving)") {
    // Simulates what ColumnPruning/PushDownPredicates do between
    // fixed-point iterations: once a Project separates the injected
    // Filter from the join's immediate child, an immediate-child guard
    // re-triggers and duplicates the bloom subquery. The subtree-wide
    // attribute-keyed guard must treat the relocated filter as done.
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val rule = new BloomSemiJoinPrefilter(probeMinBytes = 1L)
    val once = rule(semiJoin().queryExecution.optimizedPlan)
    // wrap every injected Filter's child in a no-op Project (alias-free),
    // then re-apply: the Filter is no longer the join's immediate child
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val relocated = once.transformUp {
      case f @ Filter(cond, child)
          if cond.exists(_.isInstanceOf[BloomFilterMightContain]) =>
        Project(child.output, f)
    }
    val again = rule(relocated)
    val n = again.collect { case p =>
      p.expressions.map(_.collect {
        case b: BloomFilterMightContain => b
      }.size).sum
    }.sum
    assert(n == 1, s"expected 1 prefilter after relocation + re-apply, got $n\n" +
      again.treeString)
  }

  test("extension-injected path: the real optimizer injects exactly one " +
      "prefilter (pre-CBO Once batch) with unchanged results") {
    // Drives the GraftExtensions deployment point — injectPreCBORule, a
    // `Once` batch after the fixed-point operator-optimization batches —
    // through a real session built withExtensions. Placement matters:
    // injected into the fixed point instead, InferFiltersFromConstraints
    // copies the might_contain across the join equality onto the build
    // side (self-probe), which this assertion would catch as a second
    // prefilter. Thresholds lowered via constructor so the rule fires at
    // sf0.001.
    import org.apache.spark.sql.SparkSession
    val baseline = semiJoin().collect().map(_.toSeq).toSeq
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(ext => ext.injectPreCBORule(_ =>
        new BloomSemiJoinPrefilter(probeMinBytes = 1L)))
      .getOrCreate()
    try {
      val df = semiJoin(s2)
      val n = prefilterCount(df)
      assert(n == 1, s"expected exactly 1 prefilter via the injected " +
        s"optimizer batch, got $n:\n${df.queryExecution.optimizedPlan.treeString}")
      assert(df.collect().map(_.toSeq).toSeq == baseline)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
