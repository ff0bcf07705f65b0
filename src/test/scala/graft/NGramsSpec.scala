package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native ngrams Generator must agree row-for-row with the composed
  * transform(sequence)+explode form it replaces, and honor the
  * short-input / NULL zero-row contract.
  */
class NGramsSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("ngrams(text, n) equals the composed transform+explode shingling") {
    val s = spark
    import s.implicits._
    GraftExtensions.register(s)
    val inputs = Seq(
      "a b c d e", "one two three", "single", "", "x y",
      "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")
    inputs.toDF("text").createOrReplaceTempView("ngrams_spec_in")
    for (n <- Seq(1, 2, 3, 5)) {
      val native = s.sql(
        s"SELECT text, pos, gram FROM ngrams_spec_in LATERAL VIEW ngrams(text, $n) t AS pos, gram")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
      val composed = s.sql(
        s"""SELECT text, pos, gram FROM (
           |  SELECT text, posexplode(CASE WHEN size(split(text, ' ')) >= $n
           |    THEN transform(sequence(1, size(split(text, ' ')) - ($n - 1)),
           |           i -> array_join(slice(split(text, ' '), i, $n), ' '))
           |    ELSE array() END) AS (p0, gram), p0 + 1 AS pos
           |  FROM ngrams_spec_in)""".stripMargin)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
      assert(native == composed, s"n=$n diff=${(native diff composed) ++ (composed diff native)}")
    }
  }

  test("ngrams yields zero rows for NULL and shorter-than-n input") {
    val s = spark
    import s.implicits._
    GraftExtensions.register(s)
    Seq(Option("a b"), None).toDF("text").createOrReplaceTempView("ngrams_spec_null")
    val out = s.sql(
      "SELECT * FROM ngrams_spec_null LATERAL VIEW ngrams(text, 3) t AS pos, gram")
    assert(out.count() == 0)
  }

  test("typed udaf plans partial/final object aggregation, not whole-group collect") {
    val df = SparkEntry.queries("q_typed_udaf")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"), plan)
    // partial + final = the aggregator's merge runs map-side
    assert(plan.contains("partial_"), plan)
  }
}
