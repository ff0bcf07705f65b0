package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Quality

/** Crafted-input tests for the data-quality family: the registered queries
  * run over CONSISTENT testdata (orphan counts 0, most rules pass), so the
  * violation paths are proven here on frames built to violate.
  */
class QualitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("fkOrphans counts unmatched and NULL fact keys, zero on consistent data") {
    val fact = Seq(Some(1L), Some(2L), Some(2L), Some(99L), None)
      .toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val out = Quality.fkOrphans("t", fact, "fk", dim, "pk").collect().head
    assert(out.getAs[Long]("n_rows") == 5L)
    // 99 (no match) + NULL (never matches) = 2 orphans
    assert(out.getAs[Long]("n_orphans") == 2L)

    val clean = Quality.fkOrphans("t", Seq(1L, 2L).toDF("fk"), "fk", dim, "pk")
      .collect().head
    assert(clean.getAs[Long]("n_orphans") == 0L)
  }

  test("kmin_distinct: exact k smallest distinct values, ascending, null-skipping") {
    import graft.functions.KMinDistinct.kminDistinctLong
    val vals = Seq[Option[Long]](Some(7L), Some(3L), Some(7L), Some(1L), None,
      Some(9L), Some(3L), Some(5L), Some(11L))
    val arr = vals.toDF("v").repartition(4) // exercise partial merge
      .agg(kminDistinctLong(col("v"), 3).as("kmv"))
      .collect().head.getSeq[Long](0)
    assert(arr == Seq(1L, 3L, 5L), arr)
    // fewer distinct than k: the sketch IS the exact distinct set
    val small = Seq(4L, 4L, 2L).toDF("v")
      .agg(kminDistinctLong(col("v"), 8).as("kmv"))
      .collect().head.getSeq[Long](0)
    assert(small == Seq(2L, 4L), small)
  }

  test("deploy profile: KMV estimate within the +-20%+10 envelope of exact distinct") {
    val sf = "/root/testdata/sf0.001"
    val specs = Seq("l_orderkey" -> Quality.NumCol, "l_quantity" -> Quality.NumCol,
      "l_returnflag" -> Quality.StrCol, "l_shipdate" -> Quality.TsCol)
    val li = graft.ops.Tables.lineitem(spark, sf)
    val dep = Quality.profileApproxDeploy("lineitem", li, specs)
      .select("col_name", "n_rows", "n_null", "est_distinct")
    val exact = Quality.profile("lineitem", li, specs)
      .select(col("col_name"), col("n_rows").as("n_rows_x"),
        col("n_null").as("n_null_x"), col("n_distinct"))
    val joined = dep.join(exact, "col_name").collect()
    assert(joined.length == specs.size)
    joined.foreach { r =>
      assert(r.getAs[Long]("n_rows") == r.getAs[Long]("n_rows_x"), r)
      assert(r.getAs[Long]("n_null") == r.getAs[Long]("n_null_x"), r)
      val (est, ex) = (r.getAs[Double]("est_distinct"),
        r.getAs[Long]("n_distinct").toDouble)
      assert(math.abs(est - ex) <= ex * 0.2 + 10,
        s"${r.getAs[String]("col_name")}: est=$est exact=$ex")
    }
  }

  test("profile reports nulls, exact distinct, and kind-routed min/max") {
    val df = Seq(
      (Some(10L), Some("b")),
      (Some(20L), Some("a")),
      (Some(20L), None),
      (None, Some("c"))).toDF("num", "str")
    val rows = Quality.profile("t", df,
      Seq("num" -> Quality.NumCol, "str" -> Quality.StrCol))
      .orderBy("col_name").collect()
    val num = rows(0)
    assert(num.getAs[String]("col_name") == "num")
    assert(num.getAs[Long]("n_rows") == 4L)
    assert(num.getAs[Long]("n_null") == 1L)
    assert(num.getAs[Long]("n_distinct") == 2L)
    assert(num.getAs[Double]("min_num") == 10.0 && num.getAs[Double]("max_num") == 20.0)
    assert(num.isNullAt(num.fieldIndex("min_str")))
    val str = rows(1)
    assert(str.getAs[Long]("n_null") == 1L)
    assert(str.getAs[Long]("n_distinct") == 3L)
    assert(str.getAs[String]("min_str") == "a" && str.getAs[String]("max_str") == "c")
    assert(str.isNullAt(str.fieldIndex("min_num")))
  }

  test("expectation suite distinguishes pass from fail on the real testdata") {
    val out = SparkEntry.queries("dq_expectations")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[String]("rule") ->
        (r.getAs[Long]("n_violations"), r.getAs[Boolean]("passed"))).toMap
    // the two deliberately tight rules must FAIL with live violation counts
    assert(!out("li_quantity_le_40")._2 && out("li_quantity_le_40")._1 > 0)
    assert(!out("ord_totalprice_le_400k")._2 && out("ord_totalprice_le_400k")._1 > 0)
    // the domain/range/format rules must PASS with zero violations
    Seq("li_discount_range", "li_linestatus_domain", "li_quantity_range",
      "li_returnflag_domain", "li_shipdate_nonnull", "ord_priority_format",
      "ord_status_domain", "ord_totalprice_positive").foreach { r =>
      assert(out(r)._2 && out(r)._1 == 0L, s"rule $r: ${out(r)}")
    }
  }

  test("split-leakage composition flags exactly the cross-split shingle shares") {
    import graft.ops.Pipeline
    // find ids landing in different splits under the REAL hash split
    val ids = Pipeline.hashSplit((0L until 200L).toDF("doc_id")
        .withColumn("text", lit("")))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val trainId = ids.collectFirst { case (i, "train") => i }.get
    val valId = ids.collectFirst { case (i, "val") => i }.get
    val val2Id = ids.collect { case (i, "val") => i }.apply(1)
    val shared = "w1 w2 w3 w4 w5 w6 w7 w8" // one exact 8-gram
    val docs = Seq(
      trainId -> s"prefix $shared suffix tail pad pad2 pad3",
      valId -> s"other head $shared closing words here now",
      val2Id -> "entirely distinct content with no overlap at all eight")
      .toDF("doc_id", "text")
    val sp = Pipeline.hashSplit(docs)
    val leaked = Pipeline.shingleHashes(sp.filter(col("split") =!= "train"), 8)
      .join(Pipeline.shingleHashes(sp.filter(col("split") === "train"), 8)
        .select("shash").distinct(), Seq("shash"), "left_semi")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(leaked == Set(valId), s"leaked=$leaked expected {$valId}")
  }

  test("prefix containment flags truncations on token boundaries only") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      10L -> base,                                  // full doc (SMALLER id than its truncation)
      11L -> (1 to 20).map(i => s"w$i").mkString(" "), // true truncation of 10
      12L -> ((1 to 19).map(i => s"w$i").mkString(" ") + " w2"), // shares 16-prefix, diverges
      13L -> base)                                  // exact copy of 10
      .toDF("doc_id", "text")
    // same construction as the registered query, over the crafted frame
    import graft.functions.Md5Hash60.md5hash60
    val p = docs.filter(size(split(col("text"), " ")) >= 16)
      .select(col("doc_id"), col("text"), length(col("text")).as("len"),
        md5hash60(expr("array_join(slice(split(text, ' '), 1, 16), ' ')")).as("pfp"))
    val a = p.select(col("doc_id").as("doc_short"), col("text").as("ta"),
      col("len").as("len_short"), col("pfp"))
    val b = p.select(col("doc_id").as("doc_long"), col("text").as("tb"),
      col("len").as("len_long"), col("pfp"))
    val out = a.join(b, Seq("pfp"))
      .filter(col("len_short") < col("len_long") ||
        (col("len_short") === col("len_long") && col("doc_short") < col("doc_long")))
      .filter(expr("substr(tb, 1, CAST(len_short AS INT)) = ta") &&
        expr("substr(tb, CAST(len_short AS INT) + 1, 1) IN ('', ' ')"))
      .select(col("doc_short"), col("doc_long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // truncation 11 pairs with BOTH full copies despite its LARGER id
    // (pairs order by length, not id); 12 diverges after the shared
    // prefix — "…w19 w2" vs "…w19 w20" pins the token-boundary guard
    assert(out == Set((11L, 10L), (11L, 13L), (10L, 13L)), out.toString)
  }

  test("referential audit is clean on the real testdata and one scan per relation") {
    val out = SparkEntry.queries("dq_referential")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[String]("rel") -> r.getAs[Long]("n_orphans")).toMap
    assert(out.size == 4 && out.values.forall(_ == 0L))
  }

  test("l-diversity flags the homogeneous group a k-anonymity check misses") {
    // group (1, A): k=3 AND l=3 (bands 0, 1, 2) — diverse, not at risk.
    // group (2, B): k=2 — would pass a k>=2 gate — but BOTH members share
    //   income band 0 → l=1, the homogeneity attack l-diversity exists for.
    val crafted = Seq(
      (1L, "c1", 1, 100.0, "A"),
      (2L, "c2", 1, 2500.0, "A"),
      (3L, "c3", 1, 4500.0, "A"),
      (4L, "c4", 2, 100.0, "B"),
      (5L, "c5", 2, 150.0, "B"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val dir = java.nio.file.Files.createTempDirectory("ldiv").toString
    crafted.write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = SparkEntry.queries("dq_l_diversity")(spark, dir).collect().head
    assert(out.getAs[Long]("n_groups") == 2L)
    assert(out.getAs[Long]("l_diversity") == 1L)
    assert(out.getAs[Long]("groups_below_3") == 1L)
    assert(out.getAs[Long]("rows_at_risk") == 2L)
  }

  test("benford digits come from exact integer rendering; absent digits report 0") {
    // digits: 100.5→1, 19999.99→1, 250.0→2, 900.0→9; 0.5 is excluded by
    // the >=1 guard (no first digit to take)
    val crafted = Seq(100.5, 19999.99, 250.0, 900.0, 0.5).toDF("l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("benford").toString
    crafted.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = SparkEntry.queries("dq_benford")(spark, dir).collect()
    assert(rows.length == 9) // all nine digits, observed or not
    val byDigit = rows.map(r => r.getAs[String]("digit") ->
      (r.getAs[Long]("n"), r.getAs[Double]("obs_frac"))).toMap
    assert(byDigit("1") == ((2L, 0.5)))
    assert(byDigit("2") == ((1L, 0.25)))
    assert(byDigit("9") == ((1L, 0.25)))
    assert(byDigit("5") == ((0L, 0.0)))
    // deviation is obs − the Benford literal, rounded to 6dp
    val d1 = rows.find(_.getAs[String]("digit") == "1").get
    assert(d1.getAs[Double]("dev") == math.rint((0.5 - 0.30102999566398) * 1e6) / 1e6)
  }

  test("correlation sufficient statistics are the exact integer moments per type") {
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType, TimestampType, StructField, StructType}
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // type a: (x=100, y=10), (x=250, y=12); type b: single zero row
    val rows = Seq(
      Row(1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "a", 1.0, null),
      Row(2L, java.sql.Timestamp.valueOf("2024-01-01 12:30:00"), 1L, "a", 2.5, null),
      Row(3L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 2L, "b", 0.0, null))
    val dir = java.nio.file.Files.createTempDirectory("corr").toString
    spark.createDataFrame(rows.asJava, schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("dq_corr_stats")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n") == 2L)
    assert(a.getAs[Long]("s_x") == 350L && a.getAs[Long]("s_y") == 22L)
    assert(a.getAs[Long]("s_xx") == 72500L && a.getAs[Long]("s_yy") == 244L)
    assert(a.getAs[Long]("s_xy") == 4000L)
    // the consumer's assembly: r = (nΣxy − ΣxΣy) / √((nΣxx − Σx²)(nΣyy − Σy²))
    // = (8000 − 7700) / √((145000 − 122500)(488 − 484)) = 300/300 = 1
    assert(2L * 4000L - 350L * 22L == 300L)
    assert((2L * 72500L - 350L * 350L) * (2L * 244L - 22L * 22L) == 90000L)
    val b = out("b")
    assert(b.getAs[Long]("n") == 1L && b.getAs[Long]("s_x") == 0L
      && b.getAs[Long]("s_y") == 0L && b.getAs[Long]("s_xy") == 0L)
  }

  test("chi-square drift pieces reassemble the textbook statistic") {
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType, TimestampType, StructField, StructType}
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    def ev(id: Long, sec: Int, t: String) = Row(id,
      java.sql.Timestamp.valueOf(s"2024-01-01 00:0${sec / 60}:${"%02d".format(sec % 60)}"),
      1L, t, 0.0, null)
    // span sec 0..100 → early = sec <= 50; a: 3 early + 1 late, b: 2 late
    val rows = Seq(ev(1, 0, "a"), ev(2, 10, "a"), ev(3, 40, "a"), ev(4, 80, "a"),
      ev(5, 60, "b"), ev(6, 100, "b"))
    val dir = java.nio.file.Files.createTempDirectory("chi2").toString
    spark.createDataFrame(rows.asJava, schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("dq_chi2_stats")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("o_early") == 3L && a.getAs[Long]("o_late") == 1L)
    assert(a.getAs[Long]("r") == 4L && a.getAs[Long]("n") == 6L)
    assert(a.getAs[Long]("c_early") == 3L && a.getAs[Long]("c_late") == 3L)
    assert(a.getAs[Long]("dev") == 6L)  // 3·6 − 4·3
    val b = out("b")
    assert(b.getAs[Long]("dev") == -6L) // 0·6 − 2·3
    // consumer assembly χ² = Σ dev²/(r·c_e·c_l) = 36/36 + 36/18 = 3.0 —
    // equal to the textbook Σ(O−E)²/E over the four cells (E = r·c/n)
    val chi2 = Seq(a, b).map { r =>
      r.getAs[Long]("dev").toDouble * r.getAs[Long]("dev") /
        (r.getAs[Long]("r").toDouble * r.getAs[Long]("c_early") * r.getAs[Long]("c_late"))
    }.sum
    assert(math.abs(chi2 - 3.0) < 1e-12)
  }
}
