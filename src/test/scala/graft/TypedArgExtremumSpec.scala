package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TypedArgExtremum.{typed_max_by, typed_min_by}

/** Semantics of the typed argmax against the builtin `max_by`/`min_by`
  * (which it replaces on plans where the builtin's struct buffer forces a
  * SortAggregate): identical results on struct keys, struct payloads,
  * NULL keys ignored, deterministic ties via in-key tiebreaks, and
  * partial-buffer serialization exercised through a real repartitioned
  * aggregation.
  */
class TypedArgExtremumSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("typed_max_by / typed_min_by match the builtins on scalar keys and payloads") {
    val df = Seq(
      ("a", 3L, "x"), ("a", 7L, "y"), ("a", 5L, "z"),
      ("b", 1L, "p"), ("b", 1L, "p")).toDF("g", "k", "v")
      .repartition(3, col("g")) // force partial buffers through serialize/merge
    val got = df.groupBy("g")
      .agg(typed_max_by(col("v"), col("k")).as("vmax"),
        typed_min_by(col("v"), col("k")).as("vmin"))
      .orderBy("g").collect().toSeq
    val want = df.groupBy("g")
      .agg(max_by(col("v"), col("k")).as("vmax"), min_by(col("v"), col("k")).as("vmin"))
      .orderBy("g").collect().toSeq
    assert(got == want)
  }

  test("struct key with struct payload: full compact-latest shape, ties broken in-key") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00.000001", 10L, 1.5),
      (1L, "2024-01-01 10:00:00.000001", 12L, 2.5), // same ts — id breaks the tie
      (1L, "2024-01-01 09:00:00.000000", 99L, 9.9),
      (2L, "2024-01-02 00:00:00.000000", 7L, 0.25))
      .toDF("g", "ts_s", "id", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
      .repartition(4)
    val r = df.groupBy("g")
      .agg(typed_max_by(struct(col("id"), col("ts"), col("value")),
        struct(col("ts"), col("id"))).as("l"))
      .select(col("g"), col("l.id"), col("l.value"))
      .orderBy("g").collect().toSeq
    assert(r == Seq(Row(1L, 12L, 2.5), Row(2L, 7L, 0.25)))
  }

  test("NULL keys are ignored; all-null-key group yields NULL, like max_by") {
    val df = Seq((1L, Option(5L), "kept"), (1L, None, "ignored"),
      (2L, None, "only-null")).toDF("g", "k", "v")
    val r = df.groupBy("g").agg(typed_max_by(col("v"), col("k")).as("v"))
      .orderBy("g").collect().toSeq
    assert(r == Seq(Row(1L, "kept"), Row(2L, null)))
  }

  test("string key extremum = builtin min/max over strings (the profile use)") {
    val df = Seq("pear", "apple", "quince", "fig").toDF("s").repartition(3)
    val r = df.agg(typed_min_by(col("s"), col("s")).as("lo"),
      typed_max_by(col("s"), col("s")).as("hi"),
      min(col("s")).as("blo"), max(col("s")).as("bhi")).collect()(0)
    assert(r.getString(0) == r.getString(2) && r.getString(1) == r.getString(3))
  }

  test("NaN key orders greatest, matching Spark sort semantics") {
    val df = Seq((1L, 0.5, "half"), (1L, Double.NaN, "nan"), (1L, 0.9, "most"))
      .toDF("g", "k", "v")
    val r = df.groupBy("g").agg(typed_max_by(col("v"), col("k")).as("v")).collect()(0)
    assert(r.getString(1) == "nan")
  }

  test("empty input evaluates to NULL") {
    val df = Seq((1L, 2L, "v")).toDF("g", "k", "v").filter(col("g") < 0)
    val r = df.agg(typed_max_by(col("v"), col("k")).as("v")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("plans as ObjectHashAggregate (the point of the typed form)") {
    val df = Seq((1L, 2L, "v")).toDF("g", "k", "v")
    val plan = df.groupBy("g")
      .agg(typed_max_by(struct(col("v")), struct(col("k"), col("v"))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("SortAggregate"), plan)
  }
}
