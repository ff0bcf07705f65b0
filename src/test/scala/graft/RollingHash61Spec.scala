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

  test("BaseInv is the modular inverse of Base, and the linear window-hash " +
    "identity used by the dedup_cdc_chunks oracle holds") {
    assert(RollingHash61.mulmod(RollingHash61.Base, RollingHash61.BaseInv) == 1L)
    // H_i over chars [i-15, i] == B^i · Σ c_j·BaseInv^j (mod M) — the
    // identity the rewritten DuckDB replay rests on, checked against the
    // direct fold on a concrete window.
    val text = "the quick brown fox jumps over the lazy dog".getBytes("US-ASCII")
    val i = 20 // window = chars 5..20 (1-indexed j in [i-15, i])
    val direct = RollingHash61.hash(text.slice(i - 16, i))
    var s = 0L
    var powB = 1L // B^j at j=0
    var powIB = 1L
    val pows = (0 to i).map { j =>
      val p = (powB, powIB); powB = RollingHash61.mulmod(powB, RollingHash61.Base)
      powIB = RollingHash61.mulmod(powIB, RollingHash61.BaseInv); p
    }
    ((i - 15) to i).foreach { j =>
      val c = text(j - 1) & 0xffL
      s = (s + RollingHash61.mulmod(c, pows(j)._2)) % RollingHash61.Mod
    }
    assert(RollingHash61.mulmod(s, pows(i)._1) == direct)
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
