package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the rank definition of exact-mode `percentile_approx` (accuracy ≥
  * n): the returned element is the value at rank ⌈p·n⌉ of the sorted
  * column. Both the `q_percentiles_approx` oracle (window form:
  * `min(v) FILTER (rn >= ceil(p*n))`) and, since the r12 redesign, the
  * engine's exact per-value-counts path (smallest value whose cumulative
  * count ≥ ⌈p·n⌉) implement exactly this rule, so this test — on tie-FREE
  * data, where off-by-one rank definitions actually diverge — is what
  * keeps the three definitions honest against each other.
  */
class PercentilePinSpec extends AnyFunSuite {
  test("exact-mode percentile_approx returns the value at rank ceil(p*n)") {
    val spark = TestSpark.spark
    for (n <- Seq(4, 5, 7, 10, 100, 101); p <- Seq(0.25, 0.5, 0.9)) {
      val df = spark.range(1, n + 1).select(col("id").cast("double").as("v"))
      val got = df.agg(expr(s"percentile_approx(v, ${p}D, 1000000)")).head().getDouble(0)
      val want = math.ceil(p * n)
      assert(got == want, s"n=$n p=$p got=$got want=$want (rank rule drifted)")
    }
  }
}
