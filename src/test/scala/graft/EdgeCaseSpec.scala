package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Graph, Quality}

/** Empty/degenerate-input behavior of the library operators a user calls
  * directly (the registered queries always see real tables; a library
  * consumer's first mistake is an empty frame — these pin "sane result,
  * no crash").
  */
class EdgeCaseSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def emptyEdges = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("src", LongType), StructField("dst", LongType))))

  test("kcorePeel on an empty edge set yields an all-zero melt curve") {
    val curve = Graph.kcorePeel(emptyEdges, k = 2, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(curve == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("trustRank with an empty seed set converges to all-zero trust") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val noSeeds = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("node", LongType))))
    val out = Graph.trustRank(edges, noSeeds).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(2) == 0L && !r.getBoolean(3)))
  }

  test("profile of an empty table reports zero rows, not nulls") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("num", LongType), StructField("str", StringType))))
    val rows = Quality.profile("t", empty,
      Seq("num" -> Quality.NumCol, "str" -> Quality.StrCol))
      .orderBy("col_name").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == 0L)
      assert(r.getAs[Long]("n_null") == 0L)
      assert(r.getAs[Long]("n_distinct") == 0L)
      assert(r.isNullAt(r.fieldIndex("min_num")) && r.isNullAt(r.fieldIndex("min_str")))
    }
  }

  test("lateness profile buckets crafted out-of-order arrivals, incl. across blocks") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // arrival order = event_id; ids straddle the 1000-id block boundary so
    // the cross-block prior-max path is exercised (event 1500 is late
    // relative to a maximum set in the PREVIOUS block)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),   // sets the running max
      (2L, ts("2024-01-01 09:59:30")),   // 30 s late
      (3L, ts("2024-01-01 12:00:00")),   // new max (block 0)
      (1500L, ts("2024-01-01 11:30:00")), // 30 min late ACROSS blocks
      (1501L, ts("2024-01-01 09:00:00")), // 3 h late across blocks
      (1502L, ts("2024-01-01 12:00:01"))) // in order again
      .toDF("event_id", "ts")
    val out = graft.ops.Events.latenessProfile(ev).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a_in_order" -> 3L, "b_under_1min" -> 1L,
      "c_under_1h" -> 1L, "e_over_2h" -> 1L), out.toString)
  }

  test("fkOrphans with an empty fact side reports zero rows and zero orphans") {
    val emptyFact = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("fk", LongType))))
    val dim = Seq(1L, 2L).toDF("pk")
    val out = Quality.fkOrphans("t", emptyFact, "fk", dim, "pk").collect().head
    assert(out.getAs[Long]("n_rows") == 0L && out.getAs[Long]("n_orphans") == 0L)
  }
}
