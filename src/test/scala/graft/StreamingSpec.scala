package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Drives the Structured Streaming twins through a MemoryStream source and
  * asserts the emitted micro-batch results — same semantics as the batch
  * events queries.
  */
class StreamingSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming hourly window aggregation (watermarked) matches batch semantics") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val source = MemoryStream[(Timestamp, Long, String, Double)]
    val events = source.toDF().toDF("ts", "user_id", "event_type", "value")

    val query = EventStreams.hourlyAgg(events).writeStream
      .format("memory").queryName("hourly_out")
      .outputMode("complete").start()
    try {
      source.addData(
        (ts("2024-01-01 10:05:00"), 1L, "click", 1.0),
        (ts("2024-01-01 10:55:00"), 2L, "click", 2.0),
        (ts("2024-01-01 11:05:00"), 1L, "view", 4.0))
      query.processAllAvailable()
      val out = spark.table("hourly_out")
        .orderBy("hour_start", "event_type").collect()
      assert(out.length == 2)
      assert(out(0).getAs[Timestamp]("hour_start") == ts("2024-01-01 10:00:00"))
      assert(out(0).getAs[String]("event_type") == "click")
      assert(out(0).getAs[Long]("n") == 2L)
      assert(out(0).getAs[Double]("sum_value") == 3.0)
      assert(out(1).getAs[Long]("n") == 1L)
    } finally query.stop()
  }

  test("transformWithState running totals persist named state across micro-batches") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    EventStreams.withRocksDb(s) {
      val source = MemoryStream[(Long, Long)]
      val query = EventStreams.runningPurchases(source.toDS()).toDF()
        .writeStream.format("memory").queryName("tws_out")
        .outputMode("update").start()
      try {
        source.addData((1L, 100L), (1L, 200L), (2L, 50L))
        query.processAllAvailable()
        source.addData((1L, 350L))
        query.processAllAvailable()
        val emissions = spark.table("tws_out")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        // batch 1 emits both users' totals; batch 2 re-emits ONLY user 1,
        // cumulative from the ValueState written in batch 1
        assert(emissions == Set((1L, 2L, 300L), (2L, 1L, 50L), (1L, 3L, 650L)))
      } finally query.stop()
    }
  }

  test("stream-stream join matches inside [view, view+1h], same user only") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val views = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    def shape(src: MemoryStream[(Long, Timestamp, Long)]) =
      src.toDF().toDF("event_id", "ts", "user_id")
    val query = EventStreams.viewPurchaseJoin(shape(views), shape(purchases))
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      views.addData(
        (1L, ts("2024-01-01 10:00:00"), 7L),
        (2L, ts("2024-01-01 09:00:00"), 8L))
      purchases.addData(
        (10L, ts("2024-01-01 11:00:00"), 7L), // exactly +1h → inclusive match
        (11L, ts("2024-01-01 11:00:01"), 7L), // 1s past the bound → no match
        (12L, ts("2024-01-01 09:59:59"), 7L), // before the view → no match
        (13L, ts("2024-01-01 10:30:00"), 8L), // wrong window for user 8's view
        (14L, ts("2024-01-01 09:30:00"), 8L)) // in-window, same user → match
      query.processAllAvailable()
      val out = spark.table("ssj_out").orderBy("user_id", "p_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(out.toSeq == Seq((7L, 1L, 10L), (8L, 2L, 14L)))
    } finally query.stop()
  }

  test("left-outer stream-stream join: null-extends only watermark-evicted unmatched views") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val views = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    def shape(src: MemoryStream[(Long, Timestamp, Long)]) =
      src.toDF().toDF("event_id", "ts", "user_id")
    val query = EventStreams
      .viewPurchaseJoin(shape(views), shape(purchases), "left_outer")
      .writeStream.format("memory").queryName("sslj_out")
      .outputMode("append").start()
    try {
      views.addData(
        (1L, ts("2024-01-01 10:00:00"), 7L), // will match
        (2L, ts("2024-01-01 10:00:00"), 8L), // no purchase → null once evicted
        (3L, ts("2024-01-02 09:00:00"), 9L)) // unmatched but NEVER evicted
      purchases.addData(
        (10L, ts("2024-01-01 10:30:00"), 7L))
      query.processAllAvailable()
      // advance both watermarks far past view 2's eviction point
      // (10:00 + 1h join window + 2h delay) but NOT past view 3's
      views.addData((4L, ts("2024-01-02 10:00:00"), 99L))
      purchases.addData((11L, ts("2024-01-02 10:00:00"), 99L))
      query.processAllAvailable()
      // one more batch so the state-eviction pass runs under the new watermark
      views.addData((5L, ts("2024-01-02 10:00:01"), 99L))
      query.processAllAvailable()
      val out = spark.table("sslj_out").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(out.contains((7L, 1L, 10L)), s"matched pair missing: $out")
      assert(out.contains((8L, 2L, -1L)), s"evicted unmatched view not null-extended: $out")
      // view 3 (and the watermark-driver views) are within the join window
      // of the final watermark — still buffered, must NOT have emitted nulls
      assert(!out.exists(t => t._2 == 3L), s"un-evicted view leaked: $out")
    } finally query.stop()
  }

  test("full-outer stream-stream join: null-extends evicted unmatched rows on BOTH sides") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val views = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    def shape(src: MemoryStream[(Long, Timestamp, Long)]) =
      src.toDF().toDF("event_id", "ts", "user_id")
    val query = EventStreams
      .viewPurchaseJoin(shape(views), shape(purchases), "full_outer")
      .writeStream.format("memory").queryName("ssfo_out")
      .outputMode("append").start()
    try {
      views.addData(
        (1L, ts("2024-01-01 10:00:00"), 7L), // will match
        (2L, ts("2024-01-01 10:00:00"), 8L), // no purchase → view-only once evicted
        (3L, ts("2024-01-02 09:00:00"), 6L)) // unmatched but NEVER evicted
      purchases.addData(
        (10L, ts("2024-01-01 10:30:00"), 7L), // matches view 1
        (12L, ts("2024-01-01 10:15:00"), 9L)) // no view → purchase-only once evicted
      query.processAllAvailable()
      // advance both watermarks past view 2's eviction point (ts + 1h
      // window + 2h delay) and purchase 12's (ts + 2h delay), not view 3's
      views.addData((4L, ts("2024-01-02 10:00:00"), 99L))
      purchases.addData((11L, ts("2024-01-02 10:00:00"), 99L))
      query.processAllAvailable()
      // one more batch so the state-eviction pass runs under the new watermark
      views.addData((5L, ts("2024-01-02 10:00:01"), 99L))
      query.processAllAvailable()
      val out = spark.table("ssfo_out").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(out.contains((7L, 1L, 10L)), s"matched pair missing: $out")
      assert(out.contains((8L, 2L, -1L)), s"evicted view not null-extended: $out")
      assert(out.contains((9L, -1L, 12L)), s"evicted purchase not null-extended: $out")
      // view 3 is inside the join window of the final watermark — still
      // buffered, must not have emitted
      assert(!out.exists(t => t._2 == 3L), s"un-evicted view leaked: $out")
    } finally query.stop()
  }

  test("file-source stream over the real events table equals the batch aggregation") {
    val s = spark
    // same ts normalization as graft.ops.Tables.events, streaming flavor
    val dir = "/root/testdata/sf0.001"
    val stream = ops.Tables.eventsStream(s, dir)
    val query = EventStreams.hourlyAgg(stream).writeStream
      .format("memory").queryName("hourly_file_out")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("hourly_file_out")
        .select(date_format(col("hour_start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("event_type"), col("n"), round(col("sum_value"), 4).as("sum_value"))
        .orderBy("hour_start", "event_type").collect().map(_.toSeq)
      val batch = SparkEntry.queries("events_hourly_agg")(s, dir)
        .select(col("hour_start"), col("event_type"), col("n"), col("sum_value"))
        .orderBy("hour_start", "event_type").collect().map(_.toSeq)
      assert(streamed.length == batch.length && streamed.length > 0)
      assert(streamed.toSeq == batch.toSeq)
    } finally query.stop()
  }

  test("streaming sessionization carries state across micro-batches") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val source = MemoryStream[(Timestamp, Long, String, Double)]
    val events = source.toDF().toDF("ts", "user_id", "event_type", "value")

    val query = EventStreams.sessionize(events).writeStream
      .format("memory").queryName("sessions_out")
      .outputMode("update").start()
    try {
      // batch 1: two events 10 min apart → 1 session
      source.addData(
        (ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
        (ts("2024-01-01 10:10:00"), 1L, "click", 1.0))
      query.processAllAvailable()
      // batch 2: 45 min after the last event → a second session opens
      source.addData((ts("2024-01-01 10:55:00"), 1L, "click", 1.0))
      query.processAllAvailable()
      val rows = spark.table("sessions_out").collect()
      val last = rows.maxBy(_.getAs[Long]("n_events"))
      assert(last.getAs[Long]("user_id") == 1L)
      assert(last.getAs[Long]("n_events") == 3L)
      assert(last.getAs[Long]("n_sessions") == 2L)
    } finally query.stop()
  }

  test("parquet-sink streaming query commits through _spark_metadata (exactly-once file sink)") {
    val s = spark
    val sf = "/root/testdata/sf0.001"
    val base = java.nio.file.Files.createTempDirectory("graft_sink_spec").toFile
    try {
      val rows = graft.streaming.EventStreams.hourlyToParquetSink(s, sf, base.toString).count()
      assert(rows > 0)
      // the file sink's transactional commit log is what distinguishes this
      // path from a plain batch write — its presence proves the query went
      // through the sink's offset/commit protocol, not DataFrameWriter
      val meta = new java.io.File(base, "data/_spark_metadata")
      assert(meta.isDirectory && meta.listFiles().nonEmpty, meta.toString)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(base)
  }

  test("first-touch funnel is batch-split-proof: later stage arriving in an earlier batch") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val source = MemoryStream[(Timestamp, Long, String)]
    val events = source.toDF().toDF("ts", "user_id", "event_type")
    val query = graft.streaming.EventStreams.firstTouch(events).writeStream
      .format("memory").queryName("ft_out")
      .outputMode("update").start()
    try {
      // batch 1: the CLICK (event-time 10:00) arrives first
      source.addData((ts("2024-01-01 10:00:00"), 7L, "click"))
      query.processAllAvailable()
      // batch 2: the earlier VIEW (09:00) and a purchase (11:00) arrive late
      source.addData(
        (ts("2024-01-01 09:00:00"), 7L, "view"),
        (ts("2024-01-01 11:00:00"), 7L, "purchase"))
      query.processAllAvailable()
      // update mode emitted user 7 twice (once per batch); the finisher's
      // re-min must reconstruct the converged triple regardless
      val out = graft.streaming.EventStreams.firstTouchFunnel(s.table("ft_out")).collect()(0)
      assert(out.getAs[Long]("n_view") == 1L)
      assert(out.getAs[Long]("n_view_click") == 1L)
      assert(out.getAs[Long]("n_view_click_purchase") == 1L)
    } finally query.stop()
  }

  test("checkpoint restart recovers state incrementally: phase B reads only the new files") {
    val sf = "/root/testdata/sf0.001"
    val (result, rowsA, rowsB) =
      graft.streaming.EventStreams.checkpointRestart(spark, sf)
    val total = graft.ops.Tables.events(spark, sf).count()
    val evens = graft.ops.Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.lit(2L)) === 0).count()
    assert(rowsA == evens, s"phase A read $rowsA, staged $evens")
    assert(rowsB == total - evens,
      s"phase B read $rowsB — recovery should read ONLY the ${total - evens} appended rows")
    // and the recovered complete-mode table still covers the full dataset
    val n = result.agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    assert(n == total, s"recovered table covers $n of $total events")
  }
}
