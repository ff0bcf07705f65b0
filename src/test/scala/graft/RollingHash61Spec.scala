package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RollingHash61
import graft.functions.RollingHash61.rollingHash61

/** The native rolling hash must agree with an exact BigInt reference of
  * the same polynomial, be order-sensitive (unlike the bag fingerprints),
  * and run codegen'd.
  */
class RollingHash61Spec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def bigIntReference(s: String): Long = {
    val p = BigInt(RollingHash61.Mod)
    s.getBytes("UTF-8").foldLeft(BigInt(0))((h, b) =>
      (h * RollingHash61.Base + (b & 0xff)) mod p).toLong
  }

  test("rolling_hash61 matches the exact BigInt polynomial on varied inputs") {
    val inputs = Seq("", "a", "ab", "ba", "hello world", "中文-ünïcode", "x" * 5000) ++
      (0 until 500).map(i => s"token stream number $i with tail")
    inputs.foreach { in =>
      assert(RollingHash61.hash(in.getBytes("UTF-8")) == bigIntReference(in), s"input=$in")
    }
  }

  test("rolling_hash61 is order-sensitive and codegen-evaluated in a query") {
    val s = spark
    import s.implicits._
    val df = Seq("alpha beta", "beta alpha").toDF("v")
      .select(col("v"), rollingHash61(col("v")).as("h"))
    val out = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("alpha beta") != out("beta alpha"))
    val agg = df.agg(sum(col("h")))
    agg.collect()
    assert(agg.queryExecution.executedPlan.toString.contains("*(1)"))
  }
}
