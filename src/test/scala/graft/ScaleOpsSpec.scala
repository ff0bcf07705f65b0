package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ScaleOps

class ScaleOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: inclusive backward match, latest right row wins, null before first") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L), // before any right row
      (1L, ts("2024-01-01 12:00:00"), 101L), // exactly at r1 -> inclusive match
      (1L, ts("2024-01-01 15:00:00"), 102L), // after r1 and r2 -> r2 (latest)
      (2L, ts("2024-01-01 09:00:00"), 200L)  // other key, no right rows
    ).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 12:00:00"), 900L, 12.5),
      (1L, ts("2024-01-01 13:00:00"), 901L, 99.0)
    ).toDF("user_id", "ts", "event_id", "value")

    val out = ScaleOps.asofJoin(left, right, key = Seq("user_id"), time = "ts",
      tieBreak = "event_id", rightVals = Seq("value"))
      .orderBy(col("event_id")).collect()

    assert(out.map(r => Option(r.getAs[Any]("asof_value"))).toSeq ==
      Seq(None, Some(12.5), Some(99.0), None))
  }

  test("native as-of join matches the composed operator row-for-row") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 101L), // at r-ts: inclusive
      (1L, ts("2024-01-01 15:00:00"), 102L),
      (2L, ts("2024-01-01 09:00:00"), 200L), // key with no right rows
      (3L, ts("2024-01-01 12:30:00"), 300L)
    ).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 12:00:00"), 900L, 12.5),
      (1L, ts("2024-01-01 12:00:00"), 901L, 13.5), // ts tie: max tieBreak wins
      (1L, ts("2024-01-01 13:00:00"), 902L, 99.0),
      (3L, ts("2024-01-01 12:00:00"), 903L, 7.0)
    ).toDF("user_id", "ts", "event_id", "value")

    def run(f: => org.apache.spark.sql.DataFrame) =
      f.orderBy(col("event_id"))
        .collect().map(r => (r.getAs[Long]("event_id"),
          Option(r.getAs[Any]("asof_event_id")), Option(r.getAs[Any]("asof_value"))))
        .toSeq
    val native = run(graft.plans.AsOfJoinNative.asofJoin(left, right,
      key = Seq("user_id"), time = "ts", tieBreak = "event_id",
      rightVals = Seq("event_id", "value")))
    val composed = run(ScaleOps.asofJoin(left, right,
      key = Seq("user_id"), time = "ts", tieBreak = "event_id",
      rightVals = Seq("event_id", "value")))
    val broadcastMode = run(graft.plans.AsOfJoinNative.asofJoin(left, right,
      key = Seq("user_id"), time = "ts", tieBreak = "event_id",
      rightVals = Seq("event_id", "value"), broadcastRight = true))
    assert(native == composed)
    assert(broadcastMode == composed)
    assert(native == Seq(
      (100L, None, None),
      (101L, Some(901L), Some(13.5)),
      (102L, Some(902L), Some(99.0)),
      (200L, None, None),
      (300L, Some(903L), Some(7.0))))
  }

  test("broadcast as-of join enforces the build-side cardinality rail") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 100L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 900L, 1.0),
      (1L, ts("2024-01-01 09:30:00"), 901L, 2.0),
      (1L, ts("2024-01-01 09:45:00"), 902L, 3.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val key = graft.plans.AsOfJoinNative.MaxBroadcastBuildRowsKey
    spark.conf.set(key, "2") // 3 build rows > rail 2 → must fail loudly
    try {
      val e = intercept[Exception] {
        graft.plans.AsOfJoinNative.asofJoin(left, right, key = Seq("user_id"),
          time = "ts", tieBreak = "event_id", rightVals = Seq("value"),
          broadcastRight = true).collect()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("not dimension-sized")), e.toString)
    } finally spark.conf.unset(key)
    // at the default rail the same query runs
    val ok = graft.plans.AsOfJoinNative.asofJoin(left, right, key = Seq("user_id"),
      time = "ts", tieBreak = "event_id", rightVals = Seq("value"),
      broadcastRight = true).collect()
    assert(ok.length == 1 && ok(0).getAs[Double]("asof_value") == 3.0)
  }

  test("bucket point lookup is re-runnable in one JVM (clone-session relation cache refreshed)") {
    // Verify's second timing pass re-executes the query fn in the same
    // JVM: the fn drops + recreates its bucketed table through the
    // PARENT session, but probes it through a cached CLONE session whose
    // relation cache survives the parent's DROP — without the in-query
    // refreshTable the second run reads the first run's deleted part
    // files (FAILED_READ_FILE at the r15 sf10 gate). Two back-to-back
    // runs must both succeed and agree.
    val fn = SparkEntry.queries("q_bucket_point_lookup")
    val first = fn(spark, "/root/testdata/sf0.001").collect()
    val second = fn(spark, "/root/testdata/sf0.001").collect()
    assert(first.nonEmpty && first.map(_.toSeq).toSeq == second.map(_.toSeq).toSeq)
  }

  test("extension-registered SQL functions match the native column API") {
    GraftExtensions.register(spark)
    Seq((1L, "hello world"), (2L, "")).toDF("id", "text")
      .createOrReplaceTempView("ext_spec_docs")
    val viaSql = spark.sql(
      "SELECT id, md5hash60(text) AS h, rolling_hash61(text) AS r FROM ext_spec_docs ORDER BY id")
      .collect()
    val viaApi = Seq((1L, "hello world"), (2L, "")).toDF("id", "text")
      .select(col("id"), graft.functions.Md5Hash60.md5hash60(col("text")).as("h"),
        graft.functions.RollingHash61.rollingHash61(col("text")).as("r"))
      .orderBy(col("id")).collect()
    assert(viaSql.map(_.toSeq).toSeq == viaApi.map(_.toSeq).toSeq)

    Seq((1L, Array(1.0f, 0.0f), Array(0.0f, 1.0f)), (2L, Array(1.0f, 1.0f), Array(1.0f, 1.0f)))
      .toDF("id", "a", "b").createOrReplaceTempView("ext_spec_vecs")
    val cos = spark.sql(
      "SELECT round(cosine_sim(a, b), 6) AS c FROM ext_spec_vecs ORDER BY id")
      .collect().map(_.getDouble(0)).toSeq
    assert(cos == Seq(0.0, 1.0))

    Seq("x", "x", "x", "y", "y", "z").toDF("v").createOrReplaceTempView("ext_spec_vals")
    val tk = spark.sql(
      """SELECT e.value, e.count FROM (
        |  SELECT explode(space_saving_topk(v, 2, 16)) AS e FROM ext_spec_vals)""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(tk == Seq(("x", 3L), ("y", 2L)))
  }

  test("GraftExtensions injects all functions at session-build time") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // must register without throwing
    assert(GraftExtensions.functions.map(_._1).sorted ==
      Seq("bpe_token_counts", "cdc_boundaries", "cosine_sim", "exact_topk",
        "kmin_distinct", "md5hash60", "ngrams", "normalize_scrub",
        "rolling_hash61", "space_saving_topk", "token_freq_stats"))
  }

  test("cdc boundaries match a brute-force BigInt window hash; insertions shift, not rewrite") {
    val W = 8
    val mask = 15L
    def brute(s: String): Seq[Int] = {
      val M = BigInt(2).pow(61) - 1
      val bytes = s.getBytes("UTF-8")
      (W to bytes.length).filter { i =>
        val h = bytes.slice(i - W, i).foldLeft(BigInt(0))((a, b) => (a * 1000003 + (b & 0xff)) mod M)
        (h & mask) == 0
      }
    }
    val base = "the quick brown fox jumps over the lazy dog again and again until dusk"
    val edited = "XY " + base // local edit at the front
    val df = Seq((1L, base), (2L, edited)).toDF("id", "text")
      .select(col("id"),
        graft.functions.CdcBoundaries.cdcBoundaries(col("text"), W, mask).as("cuts"))
      .orderBy("id").collect()
    val got = df.map(_.getAs[scala.collection.Seq[Int]]("cuts").toSeq)
    assert(got(0) == brute(base))
    assert(got(1) == brute(edited))
    // content-defined: every cut after the edit region is the old cut + 3
    val shifted = got(0).filter(_ > W + 3).map(_ + 3)
    assert(shifted.forall(got(1).contains), s"base=${got(0)} edited=${got(1)}")
  }

  test("trained IVF codebook: every centroid 64-dim, sizes cover the corpus") {
    val emb = graft.ops.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (cents, sizes) = graft.ops.Similarity.trainCentroids(emb, nlist = 16, iters = 2)
    val c = cents.collect()
    assert(c.length == 16)
    assert(c.forall(_.getAs[scala.collection.Seq[Double]]("ce").length == 64))
    val total = sizes.agg(sum(col("n_members"))).collect()(0).getLong(0)
    assert(total == emb.count())
  }

  test("mapPartitions batch extractor equals the expression-based stub features") {
    val media = graft.ops.Multimodal.asMedia(
      graft.ops.Tables.documents(spark, "/root/testdata/sf0.001"))
    val viaBatch = graft.ops.Multimodal.batchExtract(media, 16)()
      .collect().map(m => m.media_id -> m.features.toSeq).toMap
    val viaExpr = media.select(col("media_id"),
      graft.ops.Multimodal.fakeFeatures(col("payload"), 16).as("f"))
      .collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[scala.collection.Seq[Double]]("f").toSeq)
      .toMap
    assert(viaBatch == viaExpr)
  }

  test("arrow columnar batch extractor equals the row-iterator path and the expression stub") {
    val media = graft.ops.Multimodal.asMedia(
      graft.ops.Tables.documents(spark, "/root/testdata/sf0.001"))
    // small batchSize forces MULTIPLE Arrow roots per partition, so the
    // batch-boundary handling (fill, row count, close) is actually driven
    val viaArrow = graft.ops.Multimodal.arrowBatchExtract(media, 16, batchSize = 7)()
      .collect().map(m => m.media_id -> m.features.toSeq).toMap
    val viaRows = graft.ops.Multimodal.batchExtract(media, 16)()
      .collect().map(m => m.media_id -> m.features.toSeq).toMap
    assert(viaArrow == viaRows)
    // and a custom VECTORIZED extractor really sees columnar batches: it
    // reports each batch's row count through the feature vector
    val sizes = graft.ops.Multimodal.arrowBatchExtract(media, 16, batchSize = 7) { root =>
      Array.fill(root.getRowCount)(Array(root.getRowCount.toDouble))
    }.collect().map(_.features(0).toInt)
    assert(sizes.nonEmpty && sizes.forall(_ <= 7) && sizes.max == 7, sizes.toSeq.distinct.toString)
  }

  test("zone-map scan actually skips files AND returns the exact filter result") {
    val sf = "/root/testdata/sf0.001"
    val (all, sel, pruned) = ScaleOps.zonemapScan(spark, sf, "1997-01-01", "1997-07-01")
    // the sorted layout gives each of the 8 files a ~10-month shipdate
    // band; a 6-month predicate must not need them all
    assert(all.size == 8, s"expected 8 zone files, got ${all.size}")
    assert(sel.nonEmpty && sel.size < all.size,
      s"no pruning: selected ${sel.size} of ${all.size}")
    val direct = graft.ops.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'") &&
        col("l_shipdate") < expr("TIMESTAMP_NTZ '1997-07-01 00:00:00'"))
    assert(pruned.count() == direct.count())
    assert(pruned.agg(sum(col("l_orderkey"))).head().getLong(0) ==
      direct.agg(sum(col("l_orderkey"))).head().getLong(0))
  }

  test("bloom file index skips files a point lookup cannot touch, result exact") {
    // STRICT skipping on a crafted deterministic layout: 4 range files of
    // 1000 consecutive keys each — probe key 5 lives ONLY in file 0, so
    // the other three files can be selected only by bloom false positives
    // (deterministic bits on fixed data: this either always passes or
    // never does — no run-to-run layout sampling involved)
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_crafted_bloomidx").toFile.getAbsolutePath
    (0L until 4000L).toDF("k")
      .repartitionByRange(4, col("k")).sortWithinPartitions(col("k"))
      .write.mode("overwrite").parquet(dir)
    val (all, sel) = ScaleOps.bloomSelectFiles(spark, dir, "k", Seq(5L))
    assert(all.size == 4, s"expected 4 files, got ${all.size}")
    assert(sel.nonEmpty && sel.size < all.size,
      s"no pruning: selected ${sel.size} of ${all.size}")

    // the testdata path: pruning EXTENT depends on where the 5 probe
    // orders' ~20 rows landed (range-boundary sampling shifts per run on
    // tiny inputs), so assert the guaranteed properties — candidate set
    // bounded by the file set, and the pruned lookup exact
    val sf = "/root/testdata/sf0.001"
    val (all2, sel2, result) = ScaleOps.bloomIndexLookup(spark, sf)
    assert(all2.size == 8 && sel2.nonEmpty && sel2.size <= all2.size)
    val keys = graft.ops.Tables.lineitem(spark, sf)
      .filter(pmod(col("l_orderkey"), lit(997L)) === 3)
      .select(col("l_orderkey")).distinct()
      .orderBy(col("l_orderkey")).limit(5)
    val direct = graft.ops.Tables.lineitem(spark, sf)
      .join(keys, Seq("l_orderkey"), "left_semi")
    assert(result.agg(sum(col("n_rows"))).head().getLong(0) == direct.count())
  }

  test("compaction collapses the fragmented layout to one file per partition dir") {
    val sf = "/root/testdata/sf0.001"
    // the registered query writes both layouts as a side effect
    SparkEntry.queries("sink_compaction")(spark, sf).collect()
    val base = new java.io.File(graft.ops.Tables.processScratch(sf, "events_compaction"))
    def partFiles(dir: String): Map[String, Int] =
      new java.io.File(base, dir).listFiles().filter(_.isDirectory).map { p =>
        p.getName -> p.listFiles().count(_.getName.startsWith("part-"))
      }.toMap
    val small = partFiles("small")
    val compact = partFiles("compact")
    assert(small.keySet == compact.keySet, s"$small vs $compact")
    // fragmented: several files per event_type dir; compacted: exactly one
    assert(small.values.forall(_ > 1), s"fragmentation did not happen: $small")
    assert(compact.values.forall(_ == 1), s"compaction left multiple files: $compact")
  }

  test("sliding windows place every event in exactly 4 windows") {
    val sf = "/root/testdata/sf0.001"
    val total = SparkEntry.queries("events_sliding_window")(spark, sf)
      .agg(sum(col("n"))).head().getLong(0)
    assert(total == 4L * graft.ops.Tables.events(spark, sf).count())
  }

  test("gdpr delete: victims present in the full copy, absent from the rewrite") {
    val sf = "/root/testdata/sf0.001"
    SparkEntry.queries("sink_gdpr_delete")(spark, sf).collect()
    val base = graft.ops.Tables.processScratch(sf, "events_gdpr")
    def victims(dir: String) =
      spark.read.parquet(s"$base/$dir")
        .filter(pmod(col("user_id"), lit(20L)) === 0).count()
    assert(victims("full") > 0, "no deletion requests in testdata — test is vacuous")
    assert(victims("clean") == 0)
  }

  test("forward as-of matches a direct per-event subquery derivation") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.ops.Tables.events(spark, sf)
    val out = SparkEntry.queries("events_asof_forward")(spark, sf)
      .filter(col("event_id") < 50).collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    // independent derivation: min-ts purchase at/after each event, max id on ties
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"), col("event_id").as("pid"))
    val expect = ev.filter(col("event_id") < 50).as("e")
      .join(p, col("e.user_id") === col("pu") && col("pts") >= col("e.ts"), "left")
      .groupBy(col("e.event_id").as("eid"))
      .agg(max_by(col("pid"), struct(lit(0) - unix_micros(col("pts")), col("pid"))).as("want"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(out == expect)
  }

  test("salted join equals the plain join") {
    val plain = graft.ops.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .join(graft.ops.Tables.orders(spark, "/root/testdata/sf0.001"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val salted = SparkEntry.queries("q_salted_join")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[String]("o_orderpriority"), r.getAs[Long]("n_items"))).toSeq
    assert(salted == plain)
  }

  test("bucketed table point lookup prunes to one bucket, values exact") {
    val sf = "/root/testdata/sf0.001"
    // build the bucket tables via the shared helper (also returns the
    // joined frame; here only the catalog tables matter)
    ScaleOps.bucketedOrdersCustomer(spark, sf).localCheckpoint(true)
    val suf = graft.ops.Tables.viewSuffix(sf) + "_" +
      java.lang.ProcessHandle.current().pid()
    try {
      // filter-only scans get bucketing auto-disabled ("no benefit"
      // heuristic — it doesn't model pruning); force the bucketed read
      // so the point lookup can skip 7 of 8 buckets
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val probe = spark.table(s"graft_bk_ord_$suf").filter(col("o_custkey") === 37L)
      val plan = probe.queryExecution.executedPlan.toString
      // bucket pruning reaches the scan: 1 of 8 buckets selected
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"), plan)
      val expected = graft.ops.Tables.orders(spark, sf)
        .filter(col("o_custkey") === 37L).select(col("o_orderkey"))
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(probe.select(col("o_orderkey")).collect().map(_.getLong(0)).sorted.toSeq
        == expected)
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      Seq(s"graft_bk_ord_$suf", s"graft_bk_cust_$suf")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("AQE skew join: final adaptive plan splits the hot partition, result invariant") {
    val sf = "/root/testdata/sf0.001"
    // cloned session, as withSkewJoinConfs requires of its callers
    val s2 = spark.newSession()
    val underAqe = ScaleOps.withSkewJoinConfs(s2) {
      val df = ScaleOps.aqeSkewJoinPlan(s2, sf)
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val finalPlan = df.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"no skew-split marker in the final adaptive plan:\n$finalPlan")
      rows
    }
    // physical re-plan must be invisible in the answer: same rows under
    // the default confs (where the tiny input never trips the skew split)
    val plain = ScaleOps.aqeSkewJoinPlan(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(underAqe == plain)
  }
}
