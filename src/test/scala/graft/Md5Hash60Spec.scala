package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Md5Hash60.md5hash60

/** The native 60-bit md5 expression must agree bit-for-bit with the
  * composable built-in form it replaces (and therefore with the DuckDB
  * oracle expression), in both interpreted and codegen paths.
  */
class Md5Hash60Spec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("md5hash60 equals conv(substr(md5(x),1,15),16,10) on varied inputs") {
    val s = spark
    import s.implicits._
    val inputs = Seq("", "a", "hello world", "τοκεν-ünïcode-中文", "x" * 10000) ++
      (0 until 1000).map(i => s"doc-$i-token")
    val df = inputs.toDF("v")
      .withColumn("native", md5hash60(col("v")))
      .withColumn("composed",
        conv(substring(md5(col("v").cast("binary")), 1, 15), 16, 10).cast("long"))
    assert(df.filter(col("native") =!= col("composed")).count() == 0)
    // null-safety
    val nulls = Seq[Option[String]](None, Some("x")).toDF("v")
      .withColumn("native", md5hash60(col("v")))
    assert(nulls.filter(col("v").isNull && col("native").isNotNull).count() == 0)
  }

  test("md5hash60 participates in whole-stage codegen") {
    val s = spark
    import s.implicits._
    val df = (0 until 10).map(_.toString).toDF("v")
      .select(md5hash60(col("v")).as("h"))
      .agg(sum(col("h")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"), plan)
  }
}
