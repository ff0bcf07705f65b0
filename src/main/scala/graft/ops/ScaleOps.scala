package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Scale-pattern operators: as-of (point-in-time) join and skew-salted
  * shuffle join. Both are *shapes* — the registered queries demonstrate
  * them over the testdata, and the helpers take arbitrary frames.
  */
object ScaleOps {

  /** One conf-pinned session clone per base session, cached for the JVM
    * lifetime: q_bucket_point_lookup needs
    * `bucketing.autoBucketedScan.enabled=false` (the "no benefit"
    * heuristic doesn't model pruning) without touching the shared
    * session's conf, and cloning per invocation would accumulate
    * listener/state registrations under Bench's repeated runs.
    */
  private val bucketScanSessions =
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.sql.SparkSession, org.apache.spark.sql.SparkSession]()
  private def forcedBucketScanSession(
      s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession =
    bucketScanSessions.computeIfAbsent(s, base => {
      val s2 = base.newSession()
      s2.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      s2
    })

  /** Backward as-of join: for every left row, the latest right row of the
    * same key with `right.time <= left.time` (ties on `time` see the right
    * row — inclusive semantics; right-side order at equal time is broken
    * by `tieBreak`, latest wins).
    *
    * Spark has no native as-of join, and the naive formulations both break
    * at scale: an inequality theta-join degenerates to
    * BroadcastNestedLoopJoin, and a per-left-row MAX subquery is a second
    * shuffle plus a re-join. This is the scalable shape: UNION both sides
    * (right payload carried in side-tagged columns), ONE shuffle on the
    * key, one in-partition sort by (time, side, tieBreak), and a running
    * `last(ignoreNulls)` window fills each left row with the most recent
    * right payload. Cost = one shuffle + one sort regardless of match
    * fan-out; skew handling (salting, AQE) composes on the key column
    * unchanged.
    *
    * `rightVals` are emitted as `asof_<name>`, null where no right row
    * precedes the left row.
    */
  /** Shared oracle for the composed (events_asof_purchase) and native
    * (q_asof_native) as-of joins — ONE definition, so the two
    * implementations are provably checked against identical semantics:
    * DuckDB replays the union + running last(ignoreNulls) construction.
    */
  private val AsofPurchaseOracle: String =
    """WITH r AS (
      |  SELECT user_id, ts, event_id, event_id AS r_eid, value AS r_val
      |  FROM events WHERE event_type = 'purchase'
      |), un AS (
      |  SELECT user_id, ts, event_id, event_type, 1 AS side,
      |    NULL::BIGINT AS r_eid, NULL::DOUBLE AS r_val
      |  FROM events
      |  UNION ALL
      |  SELECT user_id, ts, event_id, NULL, 0, r_eid, r_val FROM r
      |), filled AS (
      |  SELECT *,
      |    last_value(r_eid IGNORE NULLS) OVER w AS last_purchase_id,
      |    last_value(r_val IGNORE NULLS) OVER w AS last_purchase_value
      |  FROM un
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |)
      |SELECT event_id, user_id, event_type,
      |  last_purchase_id, last_purchase_value
      |FROM filled WHERE side = 1 ORDER BY event_id""".stripMargin

  /** Oracle for the broadcast-mode as-of row (q_asof_broadcast): same
    * union + running last(ignoreNulls) replay, but the right side is the
    * FIXED top-1000 purchases by (value DESC, event_id DESC) — a
    * deterministic, SF-independent "milestone" dimension (the unique
    * event_id tiebreak makes the cut total despite heavy value dups), so
    * the oracle prices exactly the bounded-build contract the broadcast
    * operator exists for.
    */
  private val AsofMilestoneOracle: String =
    """WITH r AS (
      |  SELECT user_id, ts, event_id, event_id AS r_eid, value AS r_val
      |  FROM events WHERE event_type = 'purchase'
      |  ORDER BY value DESC, event_id DESC LIMIT 1000
      |), un AS (
      |  SELECT user_id, ts, event_id, event_type, 1 AS side,
      |    NULL::BIGINT AS r_eid, NULL::DOUBLE AS r_val
      |  FROM events
      |  UNION ALL
      |  SELECT user_id, ts, event_id, NULL, 0, r_eid, r_val FROM r
      |), filled AS (
      |  SELECT *,
      |    last_value(r_eid IGNORE NULLS) OVER w AS last_milestone_id,
      |    last_value(r_val IGNORE NULLS) OVER w AS last_milestone_value
      |  FROM un
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |)
      |SELECT event_id, user_id, event_type,
      |  last_milestone_id, last_milestone_value
      |FROM filled WHERE side = 1 ORDER BY event_id""".stripMargin

  def asofJoin(left: DataFrame, right: DataFrame, key: Seq[String],
      time: String, tieBreak: String, rightVals: Seq[String]): DataFrame = {
    val rTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftCols = left.columns.toSeq
    val lSide = left.withColumn("__side", lit(1))
    val rSide = right.select(
      ((key :+ time :+ tieBreak).distinct.map(col) ++
        rightVals.map(v => col(v).as(s"__r_$v"))): _*)
      .withColumn("__side", lit(0))
    val un = lSide.unionByName(rSide, allowMissingColumns = true)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col(time), col("__side"), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightVals.foldLeft(un)((df, v) =>
      df.withColumn(s"asof_$v", last(col(s"__r_$v"), ignoreNulls = true).over(w)))
    filled.filter(col("__side") === 1)
      .select((leftCols.map(col) ++ rightVals.map(v => col(s"asof_$v"))): _*)
      .drop("__side")
  }

  /** Local filesystem root of the session's warehouse, resolved from
    * `spark.sql.warehouse.dir` (which Spark reports as a `file:` URI by
    * default) — the ONE place both the reapers and [[dropTableAndDir]]
    * agree on, so a non-default warehouse or different CWD can't make
    * `saveAsTable` write one tree while cleanup scans another.
    */
  private[graft] def warehouseRoot(s: org.apache.spark.sql.SparkSession): java.io.File = {
    val raw = s.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    if (raw.startsWith("file:"))
      java.nio.file.Paths.get(java.net.URI.create(raw)).toFile
    else new java.io.File(raw)
  }

  /** Drops a catalog table AND its warehouse directory: the in-memory
    * catalog forgets tables between JVMs but the warehouse directory
    * persists, and `saveAsTable` refuses a location it did not create.
    * Deletion is BEST-EFFORT: concurrent JVMs (Verify alongside Bench)
    * both reap dead runs' trees, so another process may delete a path
    * between our walk and our delete — that outcome IS the goal, not an
    * error, hence `deleteIfExists` plus a swallow of the races `walk`
    * itself can surface mid-iteration.
    */
  private[graft] def dropTableAndDir(s: org.apache.spark.sql.SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    val dir = new java.io.File(warehouseRoot(s), table)
    if (dir.exists()) {
      try java.nio.file.Files.walk(dir.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      catch {
        case _: java.io.IOException | _: java.io.UncheckedIOException => ()
      }
    }
  }

  /** Co-located bucketed join: both sides written `bucketBy(8, key)` +
    * `sortBy` into the catalog, re-read, and merge-joined on the bucket
    * key. Because the bucket layouts agree, the SortMergeJoin consumes
    * the buckets DIRECTLY — zero Exchange in the join subtree (locked by
    * PlanSpec) — which at 100 TB is the difference between re-shuffling
    * the fact table on every join and paying the layout cost once at
    * write time. The merge hint pins SMJ so the test proves the
    * bucket-co-location path, not a broadcast fallback.
    */
  private[graft] def bucketedOrdersCustomer(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    // PER-PROCESS unique table names: a fixed name would let two
    // concurrent sessions on the same SF (Verify alongside Bench is a
    // normal local workflow) overwrite each other's live bucket files.
    val suf = viewSuffix(d) + "_" + java.lang.ProcessHandle.current().pid()
    val (tOrd, tCust) = (s"graft_bk_ord_$suf", s"graft_bk_cust_$suf")
    dropTableAndDir(s, tOrd)
    dropTableAndDir(s, tCust)
    orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable(tOrd)
    customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
      .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable(tCust)
    s.table(tOrd).hint("merge")
      .join(s.table(tCust).hint("merge"), col("o_custkey") === col("c_custkey"))
  }

  /** Zone-map (min/max) index + pruned scan — the data-skipping pattern
    * every lake format (Iceberg/Delta/Hudi zone maps, parquet row-group
    * stats) builds on, made explicit as an engine operator:
    *
    *  1. lay the data out SORTED on the filter column
    *     (`repartitionByRange` + `sortWithinPartitions` → each output
    *     file covers a narrow `l_shipdate` band);
    *  2. build the zone map: per-file (min, max) of the sort column —
    *     a bounded artifact (one row per file, like a codebook);
    *  3. answer a range query by reading ONLY the files whose
    *     [min, max] overlaps the predicate, then applying the exact
    *     filter inside.
    *
    * At 100 TB this is the difference between scanning the lake and
    * scanning predicate-proportional bytes; correctness never depends on
    * the pruning (the exact filter still runs), which is why the sampled
    * range boundaries being nondeterministic is fine — the oracle checks
    * the ANSWER, the unit test asserts files were actually skipped.
    * Returns (all files, selected files, pruned+filtered frame).
    */
  private[graft] def zonemapScan(s: org.apache.spark.sql.SparkSession, d: String,
      lo: String, hi: String): (Seq[String], Seq[String], DataFrame) = {
    val out = Tables.processScratch(d, "lineitem_by_shipdate")
    lineitem(s, d).select(col("l_orderkey"), col("l_quantity"), col("l_shipdate"))
      .repartitionByRange(8, col("l_shipdate"))
      .sortWithinPartitions(col("l_shipdate"))
      .write.mode("overwrite").parquet(out)
    val stats = s.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("l_shipdate")).as("mn"), max(col("l_shipdate")).as("mx"))
      .collect()
    val (loT, hiT) = (java.time.LocalDateTime.parse(lo + "T00:00:00"),
      java.time.LocalDateTime.parse(hi + "T00:00:00"))
    val all = stats.map(_.getString(0)).toSeq
    val sel = stats.filter { r =>
      val (mn, mx) = (r.getAs[java.time.LocalDateTime]("mn"),
        r.getAs[java.time.LocalDateTime]("mx"))
      !mx.isBefore(loT) && mn.isBefore(hiT) // zone overlaps [lo, hi)
    }.map(_.getString(0)).toSeq
    val exact = (df: DataFrame) => df.filter(
      col("l_shipdate") >= expr(s"TIMESTAMP_NTZ '$lo 00:00:00'") &&
        col("l_shipdate") < expr(s"TIMESTAMP_NTZ '$hi 00:00:00'"))
    val pruned = if (sel.isEmpty) exact(s.read.parquet(out).limit(0))
      else exact(s.read.parquet(sel: _*))
    (all, sel, pruned)
  }

  /** The bloom-index point-lookup path behind `sink_bloom_index` (and
    * driven directly by ScaleOpsSpec, which asserts real file skipping):
    * ship-date-sorted 8-file layout, one BloomFilterAggregate per file
    * over the lookup key, probe keys chosen deterministically (smallest 5
    * order keys ≡ 3 mod 997 — oracle-expressible arithmetic), candidate
    * files = those whose bloom might contain ANY probe key. Returns
    * (allFiles, candidateFiles, result).
    */
  /** Per-file bloom build + candidate selection over an already-written
    * directory: returns (allFiles, files whose bloom might contain ANY
    * probe key). Shared by [[bloomIndexLookup]] and the spec's crafted
    * deterministic layout (the strict "files skipped" property depends on
    * where the probe keys' rows landed, which range-boundary sampling can
    * shift run to run on tiny inputs — so the guarantee is asserted on a
    * crafted layout, and the testdata query asserts exactness).
    */
  private[graft] def bloomSelectFiles(s: org.apache.spark.sql.SparkSession,
      dir: String, keyCol: String, keys: Seq[Long]): (Seq[String], Seq[String]) = {
    import org.apache.spark.sql.graftbridge.Bridge
    val written = s.read.parquet(dir)
    // honest sizing from the ACTUAL layout: one per-file count job
    // (bounded collect — #files rows, codebook discipline), and every
    // bloom sized for the largest file so no file's false-positive rate
    // degrades whatever the layout (8 files, the spec's crafted 4, or
    // any future caller's)
    val perFile = math.max(64L,
      written.groupBy(input_file_name()).agg(count(lit(1)).as("c"))
        .agg(max(col("c"))).collect()(0).getLong(0))
    val blooms = written.groupBy(input_file_name().as("f"))
      .agg(Bridge.bloomFilterAgg(col(keyCol), perFile).as("bf"))
      .collect()
    val all = blooms.map(_.getString(0)).toSeq
    val sel = blooms.filter { r =>
      val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bf")))
      keys.exists(bf.mightContainLong)
    }.map(_.getString(0)).toSeq
    (all, sel)
  }

  private[graft] def bloomIndexLookup(s: org.apache.spark.sql.SparkSession,
      d: String): (Seq[String], Seq[String], DataFrame) = {
    val out = Tables.processScratch(d, "lineitem_bloomidx")
    lineitem(s, d).select(col("l_orderkey"), col("l_quantity"), col("l_shipdate"))
      .repartitionByRange(8, col("l_shipdate"))
      .sortWithinPartitions(col("l_shipdate"))
      .write.mode("overwrite").parquet(out)
    val keys = lineitem(s, d)
      .filter(pmod(col("l_orderkey"), lit(997L)) === 3)
      .select(col("l_orderkey")).distinct()
      .orderBy(col("l_orderkey")).limit(5)
      .collect().map(_.getLong(0)).toSeq
    val (all, sel) = bloomSelectFiles(s, out, "l_orderkey", keys)
    val base = if (sel.isEmpty) s.read.parquet(out).limit(0)
      else s.read.parquet(sel: _*)
    val result = base.filter(col("l_orderkey").isin(keys: _*))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).cast("long").as("sum_qty"))
      .orderBy(col("l_orderkey"))
    (all, sel, result)
  }

  def queries: Seq[GraftQuery] = Seq(

    // Zone-map-pruned range scan under the oracle hash (see zonemapScan):
    // the oracle runs the plain filter over the source table, so the green
    // row proves the pruned file set loses and invents nothing.
    GraftQuery.of("sink_zonemap_prune",
      """SELECT count(*) AS n_rows, CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  strftime(min(l_shipdate), '%Y-%m-%d') AS first_day,
        |  strftime(max(l_shipdate), '%Y-%m-%d') AS last_day
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-07-01'""".stripMargin) { (s, d) =>
      val (_, _, pruned) = zonemapScan(s, d, "1997-01-01", "1997-07-01")
      pruned.agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("first_day"),
        date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("last_day"))
    },

    // Co-located bucketed join under the oracle hash: the full
    // write-bucketed → catalog read → shuffle-free merge join → aggregate
    // path (see bucketedOrdersCustomer). Aggregates are integer-only
    // (count + BIGINT key sum) so no float summation order can differ.
    GraftQuery.of("q_bucketed_join",
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_keys
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      // eager materialize, then drop the per-process bucket tables —
      // a lazy return frame would leak one warehouse tree per run
      val suf = viewSuffix(d) + "_" + java.lang.ProcessHandle.current().pid()
      try bucketedOrdersCustomer(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), sum(col("o_orderkey")).cast("long").as("sum_keys"))
        .orderBy(col("c_mktsegment"))
        .localCheckpoint(true)
      finally Seq(s"graft_bk_ord_$suf", s"graft_bk_cust_$suf")
        .foreach(t => dropTableAndDir(s, t))
    },

    // K16 — bucket-PRUNED point lookup under the oracle hash: the
    // read-side payoff of bucketing. An equality filter on the bucket
    // column scans 1 of 8 buckets — the registered query REQUIRES
    // `SelectedBucketsCount: 1 out of 8` in its own physical plan before
    // returning, so a regression to a full scan fails the correctness
    // gate; the oracle states the same filter over the base table, which
    // proves pruning lost no qualifying row. The forced-bucketed conf
    // lives on a CLONED session (filter-only scans get bucketing
    // auto-disabled by the "no benefit" heuristic, which doesn't model
    // pruning) so the shared session's conf is untouched.
    GraftQuery.of("q_bucket_point_lookup",
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey = 37 ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val suf = viewSuffix(d) + "_" + java.lang.ProcessHandle.current().pid()
      val t = s"graft_bk16_ord_$suf"
      dropTableAndDir(s, t)
      try {
        orders(s, d).select(col("o_orderkey"), col("o_custkey"))
          .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
          .saveAsTable(t)
        val s2 = forcedBucketScanSession(s)
        // the cloned session keeps its own relation cache: a re-run in
        // the same JVM (Verify's second timing pass) drops + recreates t
        // through the PARENT session, whose DROP doesn't invalidate the
        // clone's cached FileIndex — without the refresh the probe reads
        // the previous run's deleted part files (FAILED_READ_FILE,
        // surfaced the first time r15's canary re-time pulled this
        // sub-5s query into a second pass)
        s2.catalog.refreshTable(t)
        val probe = s2.table(t).filter(col("o_custkey") === 37L)
        val plan = probe.queryExecution.executedPlan.toString
        require(plan.contains("SelectedBucketsCount: 1 out of 8"),
          s"bucket pruning did not reach the scan:\n${plan.take(2000)}")
        probe.orderBy(col("o_orderkey")).localCheckpoint(true)
      } finally dropTableAndDir(s, t)
    },

    // Point-in-time enrichment: every event carries the id/value of the
    // user's most recent purchase at-or-before it. The oracle replays the
    // identical union+window formulation (same ordering, same tie rules).
    GraftQuery.of("events_asof_purchase", AsofPurchaseOracle) { (s, d) =>
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
      asofJoin(ev, purchases, key = Seq("user_id"), time = "ts",
        tieBreak = "event_id", rightVals = Seq("event_id", "value"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("asof_event_id").as("last_purchase_id"),
          col("asof_value").as("last_purchase_value"))
        .orderBy(col("event_id"))
    },

    // The NATIVE as-of join (custom LogicalPlan → Strategy → SparkPlan,
    // graft.plans.AsOfJoinNative) under the SAME oracle as
    // events_asof_purchase: identical results through a physically leaner
    // plan — each side shuffled once on the key, two per-side sorts
    // instead of one union-wide sort, and an O(1)-state per-partition
    // merge instead of a running last(ignoreNulls) frame. PlanSpec locks
    // the plan to the AsOfJoinExec operator with no union and no Window.
    GraftQuery.of("q_asof_native", AsofPurchaseOracle) { (s, d) =>
      // the operator emits every left column, so the left side is
      // projected to exactly what the result needs (the node itself pins
      // its children's schemas — see AsOfJoin.references)
      val ev = events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      val purchases = events(s, d).filter(col("event_type") === "purchase")
      graft.plans.AsOfJoinNative.asofJoin(ev, purchases, key = Seq("user_id"),
        time = "ts", tieBreak = "event_id", rightVals = Seq("event_id", "value"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("asof_event_id").as("last_purchase_id"),
          col("asof_value").as("last_purchase_value"))
        .orderBy(col("event_id"))
    },

    // The BROADCAST mode of the native as-of join, in the regime the mode
    // exists for: the build side is a genuinely DIMENSION-SIZED frame —
    // the fixed top-1000 purchases by (value DESC, event_id DESC), a
    // deterministic "milestone purchase" reference set whose cardinality,
    // broadcast bytes, and per-task sort are CONSTANT at any SF (the r14
    // registered row fed the FULL purchase subset, which grows linearly
    // with the fact table: top of the sf10 profile at 51.8 s with a
    // 14.8×/10× ladder, and on trajectory to trip its own 2^24 rail at
    // sf100 by construction). The fact side is never exchanged — one
    // BroadcastExchange ships the 1000-row dimension (built by
    // TakeOrderedAndProject: per-partition top-K, driver merge, no
    // shuffle) and each task binary-searches it per row, so the ladder is
    // linear in the probe side alone. PlanSpec locks the plan to
    // AsOfJoinBroadcastExec + BroadcastExchange + TakeOrderedAndProject
    // with NO hash exchange. The dimension-sized contract stays ENFORCED,
    // not assumed: the exec rails build rows at 2^24 and a spec
    // (ScaleOpsSpec "enforces the build-side cardinality rail") proves a
    // data-proportional build still fails loudly, naming q_asof_native's
    // shuffle mode as the unbounded path.
    GraftQuery.of("q_asof_broadcast", AsofMilestoneOracle) { (s, d) =>
      val ev = events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      val milestones = events(s, d).filter(col("event_type") === "purchase")
        .orderBy(col("value").desc, col("event_id").desc).limit(1000)
      graft.plans.AsOfJoinNative.asofJoin(ev, milestones, key = Seq("user_id"),
        time = "ts", tieBreak = "event_id", rightVals = Seq("event_id", "value"),
        broadcastRight = true)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("asof_event_id").as("last_milestone_id"),
          col("asof_value").as("last_milestone_value"))
        .orderBy(col("event_id"))
    },

    // FORWARD as-of join — "next purchase AT or AFTER each event" — the
    // mirror of events_asof_purchase's backward lookup (label horizons,
    // time-to-conversion features). Same union + ONE key-shuffle +
    // running last(ignoreNulls) machinery (asofJoin — one definition),
    // driven on NEGATED epoch micros so ascending frame order means
    // descending time; the oracle orders by ts DESC directly. Ties at
    // equal timestamp resolve to the max event_id on both engines.
    GraftQuery.of("events_asof_forward",
      """WITH r AS (
        |  SELECT user_id, ts, event_id, event_id AS r_eid, value AS r_val
        |  FROM events WHERE event_type = 'purchase'
        |), un AS (
        |  SELECT user_id, ts, event_id, event_type, 1 AS side,
        |    NULL::BIGINT AS r_eid, NULL::DOUBLE AS r_val
        |  FROM events
        |  UNION ALL
        |  SELECT user_id, ts, event_id, NULL, 0, r_eid, r_val FROM r
        |), filled AS (
        |  SELECT *,
        |    last_value(r_eid IGNORE NULLS) OVER w AS next_purchase_id,
        |    last_value(r_val IGNORE NULLS) OVER w AS next_purchase_value
        |  FROM un
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts DESC, side, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_id, user_id, event_type,
        |  next_purchase_id, next_purchase_value
        |FROM filled WHERE side = 1 ORDER BY event_id""".stripMargin) { (s, d) =>
      val ev = events(s, d).withColumn("__negts", -unix_micros(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
      asofJoin(ev, purchases, key = Seq("user_id"), time = "__negts",
        tieBreak = "event_id", rightVals = Seq("event_id", "value"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("asof_event_id").as("next_purchase_id"),
          col("asof_value").as("next_purchase_value"))
        .orderBy(col("event_id"))
    },

    // NEAREST as-of — completes the direction family (backward /
    // forward / nearest): each purchase matches its closest view within
    // ±1 h by |Δt|, ties to the EARLIER view then smaller id — the
    // sensor-fusion / clock-alignment matcher ("which reading belongs to
    // this event"). Shape: one user_id equi-join with the ±window as a
    // residual (the attribution-join discipline — per-user fan-out
    // bounded by activity; heavier per-user volume composes the interval
    // join's time-cell bucketing), then ONE struct-min argmin per
    // purchase (the typed-argmax idiom — no per-purchase window sort).
    // delta_us is SIGNED (negative = view preceded purchase), exact
    // integer micros.
    GraftQuery.of("events_asof_nearest",
      """WITH p AS (SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT event_id AS v_id, user_id, epoch_us(ts) AS v_us
        |  FROM events WHERE event_type = 'view'),
        |j AS (SELECT p.p_id, p.user_id, p.p_us, v.v_id, v.v_us,
        |    abs(v.v_us - p.p_us) AS ad
        |  FROM p JOIN v USING (user_id)
        |  WHERE abs(v.v_us - p.p_us) <= 3600000000),
        |r AS (SELECT *, row_number() OVER (PARTITION BY p_id
        |    ORDER BY ad, v_us, v_id) AS rn FROM j)
        |SELECT p_id, user_id, v_id AS nearest_view,
        |  CAST(v_us - p_us AS BIGINT) AS delta_us
        |FROM r WHERE rn = 1 ORDER BY p_id""".stripMargin) { (s, d) =>
      val ev = events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          unix_micros(col("ts")).as("p_us"))
      val v = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("v_id"), col("user_id"),
          unix_micros(col("ts")).as("v_us"))
      p.join(v, Seq("user_id"))
        .filter(abs(col("v_us") - col("p_us")) <= lit(3600000000L))
        .groupBy(col("p_id"), col("user_id"), col("p_us"))
        .agg(min(struct(abs(col("v_us") - col("p_us")).as("ad"),
          col("v_us"), col("v_id"))).as("best"))
        .select(col("p_id"), col("user_id"),
          col("best.v_id").as("nearest_view"),
          (col("best.v_us") - col("p_us")).as("delta_us"))
        .orderBy(col("p_id"))
    },

    // Right-to-be-forgotten REWRITE — the GDPR/CCPA deletion pass a lake
    // owes its users: materialize the table, then rewrite it MINUS a
    // deletion-request set via one broadcast LEFT ANTI join (the request
    // list is a table, not a predicate — production receives ids, not
    // rules), and re-read the rewritten copy. The emitted per-type counts
    // carry a victims_left column the oracle pins to 0 — the re-read
    // PROVES the deletion, it doesn't trust the writer. At 100 TB the
    // rewrite touches only files whose zone maps/blooms might contain a
    // victim (cf. sink_zonemap_prune / q_bloom_semi_join).
    GraftQuery.of("sink_gdpr_delete",
      """SELECT event_type, count(*) AS n,
        |  CAST(count(CASE WHEN user_id % 20 = 0 THEN 1 END) AS BIGINT)
        |    AS victims_left
        |FROM events WHERE user_id % 20 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val base = Tables.processScratch(d, "events_gdpr")
      events(s, d).write.mode("overwrite").parquet(s"$base/full")
      val full = s.read.parquet(s"$base/full")
      val victims = full.select(col("user_id")).distinct()
        .filter(pmod(col("user_id"), lit(20L)) === 0)
      full.join(broadcast(victims), Seq("user_id"), "left_anti")
        .write.mode("overwrite").parquet(s"$base/clean")
      s.read.parquet(s"$base/clean")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          count(when(pmod(col("user_id"), lit(20L)) === 0, 1)).as("victims_left"))
        .orderBy(col("event_type"))
    },

    // PSEUDONYMIZATION REWRITE — the governance pass that ships analytics
    // data outside the trust boundary: user_id → keyed 60-bit digest (the
    // salt is a literal here; production holds it in a KMS), value →
    // coarse magnitude band, and the REWRITTEN table is re-read for the
    // stats so the proof is about what landed on disk. The emitted
    // `consistent` column pins REFERENTIAL CONSISTENCY — per type,
    // distinct pseudonyms == distinct users, i.e. the mapping is
    // injective in practice and joins across pseudonymized tables keep
    // working — which is the property pseudonymization must preserve and
    // redaction destroys (cf. text_pii_redact for the destructive tier).
    // Banding uses |cents| so the floor-vs-truncate integer-division
    // divergence on negatives can never reach the oracle compare.
    GraftQuery.of("sink_pseudonymize", {
      val h = GraftQuery.h60Sql("user_id::VARCHAR || ':psalt7'")
      s"""WITH src AS (SELECT event_type, user_id,
         |    CAST($h AS BIGINT) AS pseudo_uid,
         |    abs(CAST(round(value * 100) AS BIGINT)) // 500 AS value_band
         |  FROM events)
         |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |  CAST(count(DISTINCT pseudo_uid) AS BIGINT) AS nd_pseudo,
         |  CAST(count(DISTINCT user_id) AS BIGINT) AS nd_user,
         |  count(DISTINCT pseudo_uid) = count(DISTINCT user_id) AS consistent,
         |  CAST(count(DISTINCT value_band) AS BIGINT) AS n_bands
         |FROM src GROUP BY 1 ORDER BY 1""".stripMargin
    }) { (s, d) =>
      import graft.functions.Md5Hash60.md5hash60
      // per-PROCESS scratch (shutdown-hook-cleaned): Verify alongside
      // Bench on the same SF is a normal local workflow, and a shared
      // path's mode-overwrite would race the other process's lazy re-read;
      // the hook keeps repeated runs from accumulating orphaned PID trees
      val base = processScratch(d, "events_pseudo")
      val ev = events(s, d)
      ev.select(col("event_type"),
          md5hash60(concat(col("user_id").cast("string"), lit(":psalt7")))
            .as("pseudo_uid"),
          expr("abs(CAST(round(value * 100) AS BIGINT)) div 500").as("value_band"))
        .write.mode("overwrite").parquet(base)
      val pseudoStats = s.read.parquet(base)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("pseudo_uid")).as("nd_pseudo"),
          countDistinct(col("value_band")).as("n_bands"))
      val userStats = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("nd_user"))
      pseudoStats.join(userStats, Seq("event_type"))
        .select(col("event_type"), col("n"), col("nd_pseudo"), col("nd_user"),
          (col("nd_pseudo") === col("nd_user")).as("consistent"), col("n_bands"))
        .orderBy(col("event_type"))
    },

    // PERMISSIVE corrupt-record ingestion — the bad-data tolerance every
    // production CSV pipeline needs: rows are written with a
    // deterministically-injected malformation (quantity → 'BAD' where
    // orderkey%13=0 ∧ linenumber=1), read back under PERMISSIVE mode with
    // a _corrupt_record column, and the result counts + excludes the
    // damage instead of failing the job (FAILFAST) or silently dropping
    // rows (DROPMALFORMED). The oracle derives the same counts
    // analytically from the victim predicate. Corruption is value-keyed,
    // not position-keyed, so it is stable under any write order.
    GraftQuery.of("sink_corrupt_records",
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(CASE WHEN l_orderkey % 13 = 0 AND l_linenumber = 1
        |    THEN 1 END) AS BIGINT) AS n_corrupt,
        |  CAST(sum(CASE WHEN NOT (l_orderkey % 13 = 0 AND l_linenumber = 1)
        |    THEN l_quantity END) AS BIGINT) AS sum_good_qty
        |FROM lineitem""".stripMargin) { (s, d) =>
      val base = Tables.processScratch(d, "csv_corrupt")
      val victim = pmod(col("l_orderkey"), lit(13L)) === 0 && col("l_linenumber") === 1
      lineitem(s, d)
        .select(concat_ws(",",
          col("l_orderkey"), col("l_linenumber"),
          when(victim, lit("BAD")).otherwise(col("l_quantity").cast("string")))
          .as("value"))
        .write.mode("overwrite").text(base)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("l", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("q", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("_corrupt_record",
          org.apache.spark.sql.types.StringType)))
      s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(base)
        .agg(count(lit(1)).as("n_rows"),
          count(col("_corrupt_record")).as("n_corrupt"),
          sum(when(col("_corrupt_record").isNull, col("q"))).cast("long")
            .as("sum_good_qty"))
    },

    // DYNAMIC partition pruning — the runtime twin of sink_zonemap_prune's
    // static skipping: the fact table is laid out partitioned by ship
    // month, the qualifying months are only known after FILTERING A
    // DIMENSION, and Catalyst injects the dim-side result as a runtime
    // partition filter (`dynamicpruning` subquery on the scan — asserted
    // in PlanSpec), so the fact scan opens only the matching directories.
    // At 100 TB this is THE mechanism that turns a date-dimension filter
    // into reading 12 of 10,000 partitions; the oracle states the same
    // query over the unpartitioned base tables.
    GraftQuery.of("sink_dynamic_partition_pruning",
      """SELECT strftime(l_shipdate, '%Y-%m') AS ship_month, count(*) AS n,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem
        |WHERE strftime(l_shipdate, '%Y-%m') IN (
        |  SELECT DISTINCT strftime(o_orderdate, '%Y-%m') FROM orders
        |  WHERE o_orderpriority = '1-URGENT' AND year(o_orderdate) = 1996)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val base = Tables.processScratch(d, "li_by_month")
      // cluster on the partition column BEFORE the partitioned write
      // (sink_compaction's discipline): without it every one of the 32
      // write tasks opens a file in every month dir — ~2,500 tiny files
      // and their commit rounds (measured 5.0 s); clustered, each month
      // is one file (~80 total, 5.0 → ~2 s)
      lineitem(s, d)
        .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
        .repartition(col("ship_month"))
        .write.mode("overwrite").partitionBy("ship_month").parquet(base)
      val fact = s.read.parquet(base)
      val months = orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT" &&
          year(col("o_orderdate")) === 1996)
        .select(date_format(col("o_orderdate"), "yyyy-MM").as("m")).distinct()
      fact.join(broadcast(months), col("ship_month") === col("m"))
        .groupBy(col("ship_month"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("long").as("sum_qty"))
        .orderBy(col("ship_month"))
    },

    // Lakehouse MERGE (SCD1 upsert): a materialized per-user profile table
    // absorbs a late-window changeset in ONE pass — matched rows update
    // (counts accumulate, last_type overwrites), matched rows whose source
    // ends in 'error' DELETE (account-closure tombstone), unmatched source
    // rows insert, untouched target rows survive as 'kept'. The engine
    // form is the canonical MERGE plan: full-outer join on the key, one
    // CASE deciding the action, a filter dropping tombstones — then the
    // merged table is REWRITTEN to parquet and re-read, so the emitted
    // rows prove what landed on disk, not what the writer intended. At
    // 100 TB both sides pre-aggregate to one row per key BEFORE the join
    // (map-side combine), and the join shuffles on the merge key only;
    // copy-on-write engines prune the rewrite to files containing matched
    // keys (cf. sink_zonemap_prune).
    GraftQuery.of("sink_merge_upsert",
      """WITH tgt AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    max_by(event_type, event_id) AS last_type
        |  FROM events WHERE ts < TIMESTAMP '2024-01-21' AND user_id % 4 <> 1
        |  GROUP BY 1),
        |src AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    max_by(event_type, event_id) AS last_type
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-21' AND user_id % 4 <> 2
        |  GROUP BY 1),
        |m AS (
        |  SELECT coalesce(t.user_id, s.user_id) AS user_id,
        |    CASE WHEN s.user_id IS NULL THEN 'kept'
        |         WHEN t.user_id IS NULL THEN 'inserted'
        |         WHEN s.last_type = 'error' THEN 'deleted'
        |         ELSE 'updated' END AS action,
        |    coalesce(t.n_events, 0) + coalesce(s.n_events, 0) AS n_events,
        |    coalesce(s.last_type, t.last_type) AS last_type
        |  FROM tgt t FULL OUTER JOIN src s ON t.user_id = s.user_id)
        |SELECT user_id, action, CAST(n_events AS BIGINT) AS n_events, last_type
        |FROM m WHERE action <> 'deleted' ORDER BY user_id""".stripMargin) { (s, d) =>
      def profile(f: DataFrame): DataFrame = f
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          max_by(col("event_type"), col("event_id")).as("last_type"))
      val base = Tables.processScratch(d, "events_merge")
      val ev = events(s, d)
      profile(ev.filter(col("ts") < "2024-01-21" && pmod(col("user_id"), lit(4L)) =!= 1))
        .write.mode("overwrite").parquet(s"$base/target")
      val tgt = s.read.parquet(s"$base/target")
        .select(col("user_id").as("t_uid"), col("n_events").as("t_n"),
          col("last_type").as("t_lt"))
      val src = profile(
        ev.filter(col("ts") >= "2024-01-21" && pmod(col("user_id"), lit(4L)) =!= 2))
        .select(col("user_id").as("s_uid"), col("n_events").as("s_n"),
          col("last_type").as("s_lt"))
      tgt.join(src, col("t_uid") === col("s_uid"), "full_outer")
        .select(
          coalesce(col("t_uid"), col("s_uid")).as("user_id"),
          when(col("s_uid").isNull, "kept")
            .when(col("t_uid").isNull, "inserted")
            .when(col("s_lt") === "error", "deleted")
            .otherwise("updated").as("action"),
          (coalesce(col("t_n"), lit(0L)) + coalesce(col("s_n"), lit(0L))).as("n_events"),
          coalesce(col("s_lt"), col("t_lt")).as("last_type"))
        .filter(col("action") =!= "deleted")
        .write.mode("overwrite").parquet(s"$base/merged")
      s.read.parquet(s"$base/merged").orderBy(col("user_id"))
        .select(col("user_id"), col("action"), col("n_events"), col("last_type"))
    },

    // End-to-end corpus-cleaning pipeline, composed entirely from the
    // registered operator families: quality gate (length + type-token
    // ratio) → exact-dedup keeper selection → per-language survivor
    // stats. One scan + one fingerprint shuffle + one bounded groupBy —
    // the composition adds no new shuffle beyond its parts.
    GraftQuery.of("pipeline_clean_corpus",
      """WITH scored AS (
        |  SELECT doc_id, lang, n_chars, text,
        |    len(list_distinct(string_split(text, ' ')))::DOUBLE
        |      / len(string_split(text, ' ')) AS ttr
        |  FROM documents
        |), gated AS (
        |  SELECT * FROM scored WHERE n_chars >= 100 AND ttr >= 0.3
        |), keepers AS (
        |  SELECT min(doc_id) AS doc_id
        |  FROM gated
        |  GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM gated JOIN keepers USING (doc_id)
        |GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val scored = documents(s, d).select(
        col("doc_id"), col("lang"), col("n_chars"), col("text"),
        (expr("size(array_distinct(split(text, ' ')))").cast("double") /
          expr("size(split(text, ' '))")).as("ttr"))
      val gated = scored.filter(col("n_chars") >= 100 && col("ttr") >= 0.3)
      val keepers = gated
        .groupBy(Dedup.normFingerprint(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      gated.join(keepers, Seq("doc_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).cast("long").as("total_chars"))
        .orderBy(col("lang"))
    },

    // Partitioned parquet sink round-trip: write documents partitioned by
    // lang (the layout a 100 TB corpus store uses for partition pruning),
    // read the partitioned tree back, aggregate. The oracle aggregates the
    // source directly — green iff the sink wrote every row into the right
    // partition and the partition column survived the round-trip.
    GraftQuery.of("sink_partitioned_roundtrip",
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val out = Tables.processScratch(d, "documents_by_lang")
      documents(s, d).write.mode("overwrite").partitionBy("lang").parquet(out)
      s.read.parquet(out)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).cast("long").as("total_chars"))
        .orderBy(col("lang"))
    },

    // Join-strategy CONTROL surface: the same fact⋈fact join as
    // q_salted_join's baseline, pinned to a SHUFFLED HASH join via the
    // hint — at scale the choice between sort-merge (two sorts, spills
    // gracefully) and shuffled-hash (no sorts, build side must fit a
    // partition's memory) is a real knob, and this query proves the
    // engine exposes it: the oracle is the plain join (strategy never
    // changes results), PlanSpec asserts the physical operator actually
    // switched.
    GraftQuery.of("q_shuffle_hash_join",
      """SELECT o_orderpriority, count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      lineitem(s, d)
        .join(orders(s, d).hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority"))
    },

    // Small-file COMPACTION — the maintenance pass every streaming/
    // incremental ingest owes its lake: first deliberately fragment the
    // events table (repartition(16) under a partitionBy writer ⇒ up to
    // 16 files per partition directory), then compact by clustering on
    // the partition column (repartition(col) ⇒ each directory rewritten
    // as ONE file) — the spec asserts the file count actually collapsed.
    // The oracle checks the compacted copy against the source, so the
    // rewrite provably loses and invents nothing. At 100 TB this runs
    // per-partition-predicate (compact only directories past a file-count
    // threshold), same two plans.
    GraftQuery.of("sink_compaction",
      """SELECT event_type, count(*) AS n,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val base = Tables.processScratch(d, "events_compaction")
      events(s, d).repartition(16)
        .write.mode("overwrite").partitionBy("event_type").parquet(s"$base/small")
      val frag = s.read.parquet(s"$base/small")
      frag.repartition(col("event_type"))
        .write.mode("overwrite").partitionBy("event_type").parquet(s"$base/compact")
      s.read.parquet(s"$base/compact")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    },

    // JSONL sink round-trip: the interchange format training pipelines
    // actually emit. Write documents as JSON lines, read back under the
    // ORIGINAL schema (no inference — a 100 TB re-read must not re-type
    // columns from sampled data), aggregate; the oracle aggregates the
    // parquet source, so green means every row and value survived JSON
    // escaping/round-trip byte-for-byte.
    GraftQuery.of("sink_jsonl_roundtrip",
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val src = documents(s, d)
      val out = Tables.processScratch(d, "documents_jsonl")
      src.write.mode("overwrite").json(out)
      s.read.schema(src.schema).json(out)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).cast("long").as("total_chars"))
        .orderBy(col("lang"))
    },

    // ORC sink round-trip — the second columnar format large warehouses
    // standardize on; same oracle discipline as the parquet/JSONL sinks.
    GraftQuery.of("sink_orc_roundtrip",
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val src = documents(s, d)
      val out = Tables.processScratch(d, "documents_orc")
      src.write.mode("overwrite").orc(out)
      s.read.orc(out)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).cast("long").as("total_chars"))
        .orderBy(col("lang"))
    },

    // CSV sink round-trip with explicit dialect + schema on re-read: the
    // free-text column forces real quote/escape handling (any embedded
    // separator/quote/newline must survive), and the explicit schema keeps
    // the re-read from re-typing columns by inference. Scale caveat,
    // deliberate here: multiLine=true makes each CSV file unsplittable
    // (quoted newlines can cross line boundaries), so at 100 TB the write
    // side must emit many moderate files (it does — one per task) and
    // columnar formats remain the preferred interchange.
    GraftQuery.of("sink_csv_roundtrip",
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val src = documents(s, d)
      val out = Tables.processScratch(d, "documents_csv")
      src.write.mode("overwrite")
        .option("header", true).option("quote", "\"").option("escape", "\"")
        .csv(out)
      s.read.schema(src.schema)
        .option("header", true).option("quote", "\"").option("escape", "\"")
        .option("multiLine", true)
        .csv(out)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).cast("long").as("total_chars"))
        .orderBy(col("lang"))
    },

    // Schema evolution under mergeSchema: an old producer wrote
    // (doc_id, lang), a newer one adds a quality column — the read
    // reconciles both batches into one frame where pre-evolution rows
    // carry NULL for the new column. This is how a 100 TB lake actually
    // grows columns (no rewrite of old data); mergeSchema pays a footer
    // read per file at planning time, which is why it's an explicit
    // option, not the default. The oracle derives the same NULL pattern
    // from the source table. quality is an exact 3-decimal value
    // (n_chars · 0.002), so summing exact 1e-6-unit integers and dividing
    // once is order-free on both engines (Money doctrine).
    GraftQuery.of("sink_schema_evolution",
      """SELECT lang, count(*) AS n_docs,
        |  CAST(count(quality) AS BIGINT) AS n_with_quality,
        |  CAST(sum(CAST(round(coalesce(quality, 0) * 1000000) AS BIGINT)) AS BIGINT)
        |    / 1000000.0 AS sum_quality
        |FROM (
        |  SELECT lang,
        |    CASE WHEN doc_id % 2 = 1
        |         THEN round(CAST(n_chars AS DOUBLE) / 500, 6) END AS quality
        |  FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val src = documents(s, d)
      val out = Tables.processScratch(d, "documents_evolving")
      src.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("lang"))
        .write.mode("overwrite").parquet(s"$out/v1")
      src.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang"),
          round(col("n_chars").cast("double") / 500, 6).as("quality"))
        .write.mode("overwrite").parquet(s"$out/v2")
      s.read.option("mergeSchema", "true").parquet(s"$out/v1", s"$out/v2")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          count(col("quality")).cast("long").as("n_with_quality"),
          (sum(round(coalesce(col("quality"), lit(0.0)) * 1000000, 0).cast("long"))
            / 1000000.0).as("sum_quality"))
        .orderBy(col("lang"))
    },

    // Interval (range) join without a nested loop: events within ±5 min
    // of each purchase by the same user. Naive formulations degenerate to
    // BroadcastNestedLoopJoin (inequality-only condition); the scalable
    // shape buckets time into 5-min cells, probes each purchase into its
    // cell ± 1 (any |Δt| ≤ 300 s pair shares one of those cells), joins as
    // a plain (user, cell) equi-join, and applies the exact Δt predicate
    // inside. Each event lives in ONE cell, so no pair matches twice.
    // The oracle runs the direct inequality join — independent derivation.
    GraftQuery.of("events_interval_join",
      """SELECT p.event_id, p.user_id, count(e.event_id) AS n_nearby
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN events e
        |  ON e.user_id = p.user_id AND e.event_id <> p.event_id
        |  AND abs(epoch_us(e.ts::TIMESTAMP) - epoch_us(p.ts::TIMESTAMP)) <= 300000000
        |GROUP BY p.event_id, p.user_id ORDER BY p.event_id""".stripMargin) { (s, d) =>
      val cellUs = 300000000L // 5 min in microseconds
      // Floor division, not Spark's truncating `div`: for negative
      // (pre-1970) micros truncation would widen cell 0, making the
      // |Δt| ≤ cellUs ⇒ adjacent-cell guarantee hold only by accident.
      // pmod is non-negative, so (x - pmod(x, c)) is the exact floor
      // multiple and the invariant is by construction for either sign.
      def cellOf(x: String) = s"(($x) - pmod($x, $cellUs)) div $cellUs"
      val ev = events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("cell", expr(cellOf("us")))
      val purchases = events(s, d).filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_event_id"),
          unix_micros(col("ts")).as("p_us"))
        .withColumn("cell", explode(array(
          expr(s"${cellOf("p_us")} - 1"), expr(cellOf("p_us")),
          expr(s"${cellOf("p_us")} + 1"))))
      purchases.join(ev,
          purchases("user_id") === ev("user_id") && purchases("cell") === ev("cell") &&
            purchases("p_event_id") =!= ev("event_id") &&
            abs(ev("us") - purchases("p_us")) <= cellUs,
          "left")
        .groupBy(col("p_event_id").as("event_id"), purchases("user_id"))
        .agg(count(ev("event_id")).as("n_nearby"))
        .orderBy(col("event_id"))
    },

    // Skew-salted shuffle join: the fact side gets a deterministic salt,
    // the other side is replicated once per salt value, and the join key
    // becomes (key, salt) — a hot key's rows spread over R partitions
    // instead of one straggler. The result is provably identical to the
    // unsalted join (the oracle IS the plain join), which is the point:
    // salting is a physical rewrite, not a semantic one.
    GraftQuery.of("q_salted_join",
      s"""SELECT o_orderpriority,
        |  ${Money.sqlSumRevenue("l_extendedprice", "l_discount")} AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val R = 8
      val li = lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_discount"))
        // hash-derived salt: uniform over [0, R) regardless of the source
        // column's range (l_linenumber alone spans only [1,7], which would
        // leave salt buckets uneven)
        .withColumn("__salt", pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(R)))
      val ord = orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
        .withColumn("__salt", explode(array((0 until R).map(lit(_)): _*)))
      li.join(ord,
          li("l_orderkey") === ord("o_orderkey") && li("__salt") === ord("__salt"))
        .groupBy(col("o_orderpriority"))
        .agg(Money.sumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority"))
    },

    // AQE SKEW-JOIN — the RUNTIME answer to the same straggler problem
    // q_salted_join solves by hand: a synthetic hot key (70% of lineitem
    // rows collapse onto key 0) joins a distinct-key dim under a
    // sort-merge join with AQE's skew-split thresholds lowered to fire at
    // test scale (factor 1, 16 KB advisory/threshold — production keeps
    // the 256 MB-class defaults and the SAME plan shape emerges on a real
    // hot partition). OptimizeSkewedJoin splits the oversized partition
    // into advisory-sized slices and replicates the matching dim slice —
    // no salting column, no manual R, decided from runtime map statistics.
    // The oracle is the plain join (a physical re-plan must be invisible
    // in the answer); ScaleOpsSpec asserts the final adaptive plan
    // actually carries the skew-split reader. Conf window is set+finally
    // restored around an eager localCheckpoint, the q_ext_rule_bloom
    // discipline (the conf must hold when the plan EXECUTES — AQE decides
    // at runtime, not at registration).
    GraftQuery.of("q_aqe_skew_join",
      """WITH l AS (SELECT CASE WHEN l_orderkey % 10 < 7 THEN 0
        |    ELSE l_orderkey END AS k, l_quantity FROM lineitem),
        |d AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 10 >= 7
        |  UNION ALL SELECT 0)
        |SELECT k % 8 AS kb, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM l JOIN d USING (k) GROUP BY 1 ORDER BY 1""".stripMargin) { (outer, d) =>
      // cloned session: the lowered skew thresholds + broadcast disable
      // can never leak into a concurrent plan on the shared session
      val s = outer.newSession()
      // split cap scaled to the input: ~256 scan slices at any SF — many
      // mappers for the skew split to cut along, without the fixed-16KB
      // cap's ~58k-task scheduling storm at the 100x point (one bounded
      // FS stat of the single-file table; min 16KB keeps the small-SF
      // slicing, and the spec's shape assertions, exactly as before)
      // layout guard: File.length() on a DIRECTORY-style parquet (or a
      // missing path) returns the dir inode size / 0, which would silently
      // collapse the cap back to the fixed-16KB floor — the exact
      // scheduling storm this cap exists to prevent. Sum leaf files for a
      // dir; refuse a path that stats to nothing.
      val liBytes = Tables.leafFileBytes(s"$d/lineitem.parquet")
      require(liBytes > 0, s"cannot stat lineitem table at $d for the skew-split cap")
      val cap = s"${math.max(16L * 1024, liBytes / 256)}b"
      withSkewJoinConfs(s, cap) { aqeSkewJoinPlan(s, d).localCheckpoint(true) }
    },

    // BUCKETIZED RANGE JOIN — the point-in-interval lookup every web-corpus
    // pipeline runs as "IP → geo range" or "offset → license span": probe
    // values join a dimension of IRREGULAR [lo, hi) tiers (widths grow
    // quadratically here, so no plain equi-join exists). The naive theta
    // join is probe × ranges — the oracle deliberately IS that naive
    // non-equi join, proving the bucketized plan semantically identical:
    // each tier explodes to the fixed-width buckets it covers (bounded:
    // Σ width/W + #tiers rows), probes compute ONE bucket key map-side,
    // and the join is a bucket EQUI-join (broadcast here — the tier
    // spine is dimension-sized) with the exact lo<=k<hi residual. Per
    // probe the candidate set is the tiers overlapping its bucket (~1),
    // not |tiers| — the candidate-generation discipline of the interval
    // join (J-family) applied to a static dimension.
    GraftQuery.of("q_range_lookup",
      """WITH t AS (SELECT b AS tier, b * b * 100 AS lo, (b+1) * (b+1) * 100 AS hi
        |  FROM unnest(range(0, 32)) u(b)),
        |p AS (SELECT event_id, CAST(round(value * 100) AS BIGINT) % 102400 AS k
        |  FROM events)
        |SELECT CAST(t.tier AS BIGINT) AS tier,
        |  CAST(t.lo AS BIGINT) AS lo, CAST(t.hi AS BIGINT) AS hi,
        |  CAST(count(*) AS BIGINT) AS n_hits,
        |  CAST(sum(p.k) AS BIGINT) AS sum_k
        |FROM p JOIN t ON p.k >= t.lo AND p.k < t.hi
        |GROUP BY 1, 2, 3 ORDER BY tier""".stripMargin) { (s, d) =>
      val W = 1024L
      val tiers = s.range(32).select(col("id").as("tier"),
        (col("id") * col("id") * 100L).as("lo"),
        ((col("id") + 1) * (col("id") + 1) * 100L).as("hi"))
      val tierBuckets = tiers.select(col("tier"), col("lo"), col("hi"),
        explode(expr(s"sequence(lo div $W, (hi - 1) div $W)")).as("bucket"))
      // `%` (truncated, sign of dividend), NOT pmod: a negative cents row
      // must stay negative and miss every tier on BOTH engines identically
      val probes = events(s, d).select(col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT) % 102400").as("k"))
        .withColumn("bucket", expr(s"k div $W"))
      probes.join(broadcast(tierBuckets), Seq("bucket"))
        .filter(col("k") >= col("lo") && col("k") < col("hi"))
        .groupBy(col("tier"), col("lo"), col("hi"))
        .agg(count(lit(1)).as("n_hits"), sum(col("k")).as("sum_k"))
        .orderBy(col("tier"))
    },

    // Order-independent bucketed table checksum (anti-entropy / replica
    // verification): every row folds to a 60-bit md5 fingerprint of its
    // canonical string form, rows hash into 16 buckets, and each bucket
    // reduces to (count, XOR of row hashes). XOR is commutative and
    // associative, so the fingerprint is independent of row order,
    // partitioning, and merge order — two replicas of a 100 TB table can
    // each compute this with ONE scan + map-side partial aggregation
    // (16-row result, nothing sorted, nothing moved but partials) and
    // compare bucket-by-bucket to locate divergence, Merkle-style.
    // Doubles are deliberately excluded from the row form (engines render
    // them differently); the timestamp folds in as its wall-clock string —
    // o_orderdate is TIMESTAMP_NTZ, so formatting is timezone-free on both
    // engines where an epoch conversion would depend on the session zone.
    GraftQuery.of("q_table_checksum", {
      val h = GraftQuery.h60Sql(
        "o_orderkey::VARCHAR || '|' || o_custkey::VARCHAR || '|' || o_orderstatus" +
          " || '|' || strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') || '|' || o_orderpriority")
      s"""SELECT o_orderkey % 16 AS bucket, count(*) AS n_rows,
         |  CAST(bit_xor($h) AS BIGINT) AS fp
         |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
    }) { (s, d) =>
      import graft.functions.Md5Hash60.md5hash60
      val rowStr = concat_ws("|",
        col("o_orderkey").cast("string"), col("o_custkey").cast("string"),
        col("o_orderstatus"), date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
        col("o_orderpriority"))
      orders(s, d)
        .select(pmod(col("o_orderkey"), lit(16L)).as("bucket"), md5hash60(rowStr).as("h"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("fp"))
        .orderBy(col("bucket"))
    },

    // Bloom-pruned semi join: the runtime row-level-filtering pattern made
    // explicit. The build side's keys fold into a bloom filter (Spark's
    // own BloomFilterAggregate — a bounded sketch, collected like a
    // codebook), the fact scan drops non-members BEFORE any shuffle via
    // might_contain, and the surviving rows go through the EXACT LeftSemi
    // join that eliminates the bloom's false positives. Semantically
    // invariant by construction — the oracle IS the plain semi join — so
    // what the hash verifies is that the pruning path loses and invents
    // nothing. At 100 TB this is the difference between shuffling the
    // whole fact table and shuffling the ~selectivity fraction that can
    // possibly match; Spark's AQE injects the same shape automatically
    // only under join-strategy limits, and an engine-level operator wants
    // it on demand.
    GraftQuery.of("q_bloom_semi_join",
      s"""SELECT l_returnflag, count(*) AS n_items,
        |  ${Money.sqlSumDollars("l_extendedprice")} AS revenue
        |FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_orderkey = l_orderkey AND o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.graftbridge.Bridge
      val urgent = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      // honest sizing: one scalar count job, then one 1-row bloom build —
      // both bounded artifacts crossing to the driver (codebook discipline)
      val nKeys = math.max(1L, urgent.count())
      val bloom = urgent
        .agg(Bridge.bloomFilterAgg(col("o_orderkey"), nKeys).as("bf"))
        .head().getAs[Array[Byte]]("bf")
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_returnflag"), col("l_extendedprice"))
        .filter(Bridge.mightContain(bloom, col("l_orderkey")))
        .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          Money.sumDollars(col("l_extendedprice")).as("revenue"))
        .orderBy(col("l_returnflag"))
    },

    // BLOOM-FILTER FILE INDEX — the data-skipping family's POINT-LOOKUP
    // member (zonemap = range predicates, Z-order = multi-dimension,
    // bloom = equality on a column the layout is NOT organized by): the
    // files are laid out by ship date, so a zone map on the ORDER KEY is
    // useless (every file spans most keys) — but a tiny per-file bloom
    // over l_orderkey (built with Spark's own BloomFilterAggregate, one
    // bounded sketch per file crossing to the driver exactly like a
    // codebook) lets a point lookup read ONLY the files that might
    // contain its keys; bloom false positives cost a wasted read, never
    // a wrong answer, and the exact key filter runs inside the pruned
    // scan. The oracle is the plain filter over the source table — the
    // green row proves pruning loses nothing — and the spec asserts
    // files were actually skipped. At 100 TB this is the manifest-level
    // bloom index every lake format ships (Parquet bloom pages, Delta
    // bloom indexes); per-file sketches live beside zone maps in the
    // table metadata.
    GraftQuery.of("sink_bloom_index",
      """WITH k AS (SELECT DISTINCT l_orderkey FROM lineitem
        |  WHERE l_orderkey % 997 = 3 ORDER BY 1 LIMIT 5)
        |SELECT l.l_orderkey, count(*) AS n_rows,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem l JOIN k USING (l_orderkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val (_, _, looked) = bloomIndexLookup(s, d)
      looked
    },

    // The OPTIMIZER-RULE extension point proven through the oracle gate:
    // the same semi join as q_bloom_semi_join, but the bloom prefilter is
    // injected AUTOMATICALLY by graft.rules.BloomSemiJoinPrefilter
    // (session-registered via spark.experimental.extraOptimizations, the
    // "user provided optimizers" batch) instead of hand-written. The
    // oracle is the plain semi join — the green row proves the rewrite
    // is semantically invariant — and RuleSpec asserts the rewritten
    // plan actually carries the might_contain prefilter. Thresholds of
    // (build ≤ 8 MB, probe ≥ 1 B) fire at every SF here; production
    // keeps the 32 MB probe floor so tiny scans skip the bloom cost.
    // Eager materialization inside the conf window: the rule must be
    // installed when the plan OPTIMIZES, not when the query registers.
    // The lowered-threshold rule registers on a CLONED session
    // (s.newSession(): own SQLConf + experimental, shared SparkContext
    // and catalog) so a concurrent plan on the shared session can never
    // be optimized under the 1-byte probe floor — the race the r6 advice
    // flagged is structurally gone, not just sequenced around.
    GraftQuery.of("q_ext_rule_bloom",
      s"""SELECT l_returnflag, count(*) AS n_items,
        |  ${Money.sqlSumDollars("l_extendedprice")} AS revenue
        |FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_orderkey = l_orderkey AND o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (outer, d) =>
      val s = outer.newSession()
      val rule = new graft.rules.BloomSemiJoinPrefilter(probeMinBytes = 1L)
      val prev = s.experimental.extraOptimizations
      s.experimental.extraOptimizations = prev :+ rule
      try {
        val urgent = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"))
        lineitem(s, d)
          .select(col("l_orderkey"), col("l_returnflag"), col("l_extendedprice"))
          .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_items"),
            Money.sumDollars(col("l_extendedprice")).as("revenue"))
          .orderBy(col("l_returnflag"))
          .localCheckpoint(true)
      } finally s.experimental.extraOptimizations = prev
    },

    // Z-ORDER clustering (Delta OPTIMIZE ZORDER / Iceberg sort-order
    // rewrite): interleave the bits of two filter dimensions — part key
    // and ship-day, both folded to 8 bits — into a 16-bit Morton code,
    // cluster the rewrite on the code, and prove locality by the per-tile
    // zone spans: morton >> 8 is exactly a 16×16 (x, y) tile, so every
    // written cluster's min/max on BOTH dimensions is bounded by 15 —
    // that bound is what makes min/max zone maps (sink_zonemap_prune)
    // prune on EITHER dimension after a Z-order rewrite, where a linear
    // sort only prunes its leading column. The Morton map is pure integer
    // div/mod arithmetic generated once for both engines; the sink
    // repartitions by tile + sorts within partitions by code (the file-
    // per-cluster layout), re-reads, and aggregates the zones.
    GraftQuery.of("sink_zorder_cluster", {
      val m = mortonSql("x", "y", "//")
      s"""WITH b AS (SELECT l_partkey % 256 AS x,
         |    date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) % 256 AS y
         |  FROM lineitem),
         |m AS (SELECT x, y, $m AS morton FROM b)
         |SELECT morton // 256 AS zbucket, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(min(x) AS BIGINT) AS x_min, CAST(max(x) AS BIGINT) AS x_max,
         |  CAST(min(y) AS BIGINT) AS y_min, CAST(max(y) AS BIGINT) AS y_max
         |FROM m GROUP BY 1 ORDER BY 1""".stripMargin
    }) { (s, d) =>
      val out = Tables.processScratch(d, "lineitem_zorder")
      lineitem(s, d)
        .select((col("l_partkey") % 256).as("x"),
          (datediff(to_date(col("l_shipdate")), lit("1992-01-01").cast("date"))
            % 256).as("y"))
        .withColumn("morton", expr(mortonSql("x", "y", "div")))
        .withColumn("zbucket", expr("morton div 256"))
        .repartition(col("zbucket"))
        .sortWithinPartitions(col("morton"))
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .groupBy(col("zbucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("x")).cast("long").as("x_min"), max(col("x")).cast("long").as("x_max"),
          min(col("y")).cast("long").as("y_min"), max(col("y")).cast("long").as("y_max"))
        .orderBy(col("zbucket"))
    })

  /** 16-bit Morton (Z-order) interleave of two 8-bit non-negative ints,
    * as portable integer arithmetic — bit b of x lands at 2b+1, bit b of
    * y at 2b. `divOp` is the integer-division spelling ("div" Spark,
    * "//" DuckDB); everything else is shared, so the two engines compute
    * the code from ONE generator and cannot drift.
    */
  private def mortonSql(x: String, y: String, divOp: String): String =
    (0 until 8).map { b =>
      val p = 1 << b
      s"(($x $divOp $p) % 2) * ${1 << (2 * b + 1)} + (($y $divOp $p) % 2) * ${1 << (2 * b)}"
    }.mkString(" + ")

  /** The skewed fact⋈dim plan under `q_aqe_skew_join` (hot key 0 carries
    * 70% of lineitem): exposed so the spec can execute it inside
    * [[withSkewJoinConfs]] and assert the final adaptive plan carries the
    * skew-split reader.
    */
  private[graft] def aqeSkewJoinPlan(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    // a skewed reduce partition can only split along MAP-task boundaries,
    // and a single-row-group parquet file yields ONE data-bearing mapper
    // at test scale — the round-robin repartition manufactures the
    // many-mapper layout every real 100 TB scan has natively
    val li = lineitem(s, d).select(
      when(col("l_orderkey") % 10 < 7, 0L).otherwise(col("l_orderkey")).as("k"),
      col("l_quantity"))
      .repartition(8)
    // the dim key set is built WITHOUT an aggregate: o_orderkey is unique,
    // the filter keeps the %10>=7 keys and the hot key 0 arrives as a
    // one-row union — semantically the same distinct key set, but the
    // join's build side stays Sort←ShuffleStage, the only shape
    // OptimizeSkewedJoin's pattern splits (a post-shuffle HashAggregate
    // between Sort and stage silently disqualifies the join)
    val dim = orders(s, d)
      .filter(col("o_orderkey") % 10 >= 7)
      .select(col("o_orderkey").as("k"))
      .unionAll(s.range(1).select(lit(0L).as("k")))
    li.join(dim, Seq("k"))
      .groupBy((col("k") % 8).as("kb"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity")).cast("long").as("sum_qty"))
      .orderBy(col("kb"))
  }

  /** Scoped AQE-skew conf window: thresholds lowered so the skew split
    * fires at test scale, broadcast disabled so the join stays sort-merge
    * (skew splitting applies to SMJ/SHJ), every touched key restored in
    * `finally`. Callers MUST pass a CLONED session (`outer.newSession()`,
    * as the registered q_aqe_skew_join does): confs are session-global,
    * and the clone is what makes the lowered thresholds invisible to any
    * concurrent plan on the shared session — sequencing is NOT the
    * safety argument.
    */
  private[graft] def withSkewJoinConfs[T](s: org.apache.spark.sql.SparkSession,
      maxPartitionBytes: String = "16KB")(
      body: => T): T = {
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      // the skew split feeds a downstream aggregate here, so honoring it
      // costs one extra shuffle — exactly the trade a real hot-key job
      // accepts; without force, AQE silently skips the split in this shape
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      // a skewed reduce partition splits along MAPPER boundaries — a
      // single-file scan (one map task) is unsplittable however hot the
      // key, so the scan is forced to many input slices at test scale
      // (the registered query scales this with input size — see its
      // registration — because a FIXED 16KB cap turned the sf10 scan
      // into ~58k tasks whose scheduling overhead was the query's 55–207 s
      // swing, r12's most volatile heavy entry)
      "spark.sql.files.maxPartitionBytes" -> maxPartitionBytes,
      "spark.sql.files.openCostInBytes" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> s.conf.getOption(k) }
    keys.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}
