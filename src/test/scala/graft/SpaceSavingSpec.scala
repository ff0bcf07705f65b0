package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SpaceSavingTopK.topKFreq

/** Space-Saving top-k aggregate: exact when capacity ≥ distinct values,
  * error-bounded in the constrained regime, correct across partition
  * merges.
  */
class SpaceSavingSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("exact regime: matches groupBy top-k when capacity covers all values") {
    val s = spark
    import s.implicits._
    // zipf-ish: value i appears (20 - i) times
    val rows = (0 until 20).flatMap(i => Seq.fill(20 - i)(s"v$i"))
    val df = s.sparkContext.parallelize(rows, 8).toDF("v") // 8 partitions → merges
    val sketch = df.agg(topKFreq(col("v"), 5, 64).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.value"), col("e.count"), col("e.error"))
      .collect()
    val exact = df.groupBy("v").count().orderBy(col("count").desc, col("v"))
      .limit(5).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(sketch.map(r => (r.getString(0), r.getLong(1))).toSeq == exact.toSeq)
    assert(sketch.forall(_.getLong(2) == 0L)) // exact ⇒ zero error bounds
  }

  test("constrained regime: heavy hitter survives and counts respect error bounds") {
    val s = spark
    import s.implicits._
    val rows = Seq.fill(500)("heavy") ++ (0 until 200).map(i => s"light$i")
    // fixed seed: Space-Saving merge results are row-order-dependent, and
    // an unseeded shuffle would make any order-sensitive failure
    // unreproducible (repo convention: fixed seeds everywhere)
    val shuffled = new scala.util.Random(42L).shuffle(rows)
    val df = s.sparkContext.parallelize(shuffled, 4).toDF("v")
    val sketch = df.agg(topKFreq(col("v"), 3, 16).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.value"), col("e.count"), col("e.error"))
      .collect()
    val top = sketch.head
    assert(top.getString(0) == "heavy")
    // space-saving overestimates: true ≤ count ≤ true + error
    assert(top.getLong(1) >= 500L)
    assert(top.getLong(1) - top.getLong(2) <= 500L)
  }

  test("exact_topk heap agg equals the window formulation, keeps duplicates, skips nulls") {
    val s = spark
    import s.implicits._
    // duplicates at the cut (two 90s), a null, and > k values per group
    val rows = Seq(("a", Some(100L)), ("a", Some(90L)), ("a", Some(90L)),
      ("a", Some(80L)), ("a", Some(10L)), ("a", None),
      ("b", Some(5L)), ("b", Some(7L)))
    val df = s.sparkContext.parallelize(rows, 3)
      .toDF("g", "v").select(col("g"), col("v").cast("long").as("v"))
    val got = df.groupBy(col("g"))
      .agg(graft.functions.ExactTopK.exactTopKLong(col("v"), 3).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    assert(got("a") == List(100L, 90L, 90L), got) // duplicate 90 retained
    assert(got("b") == List(7L, 5L), got) // fewer than k → all, sorted desc
    // the SQL surface resolves too (registered via GraftExtensions)
    graft.GraftExtensions.register(s)
    df.createOrReplaceTempView("exact_topk_in")
    val viaSql = s.sql(
      "SELECT g, exact_topk(v, 3) AS top FROM exact_topk_in GROUP BY g")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    assert(viaSql == got)
  }
}
