package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** SURVEY §2 operator families (A1–A15 aggregates, P filters, E scalar
  * expressions) phrased over the driver's synthetic testdata so each gets a
  * DuckDB-oracle CORRECTNESS row, plus TPC-H-style multi-join headline
  * queries that exercise the same operators at benchmark scale.
  *
  * Scale notes (the plans these produce at 100 TB):
  *  - every full-table aggregate is a single partial/final HashAggregate —
  *    no shuffle except the `countDistinct` expand;
  *  - top-k plans as TakeOrderedAndProject (no full sort);
  *  - the join queries broadcast every dimension side (region/nation/
  *    supplier/customer are orders of magnitude smaller than lineitem) so
  *    the only shuffle is the final groupBy on the aggregation key;
  *  - float sums are rounded to the exact decimal precision of the true
  *    value (prices carry 2 decimals, discounted products 4) so the result
  *    is order-insensitive and hash-stable across engines.
  */
object Relational {

  def queries: Seq[GraftQuery] = Seq(

    // A1 — record count (reference: validate.py:74 `len(dataframe)`).
    GraftQuery.of("q_a1_record_count",
      "SELECT count(*) AS record_count FROM lineitem") { (s, d) =>
      lineitem(s, d).agg(count(lit(1)).as("record_count"))
    },

    // A2 — per-column non-null counts (reference: breakdown.py:37-51).
    GraftQuery.of("q_a2_column_counts",
      """SELECT count(o_orderkey) AS cnt_orderkey, count(o_custkey) AS cnt_custkey,
        |count(o_orderstatus) AS cnt_orderstatus, count(o_totalprice) AS cnt_totalprice,
        |count(o_orderdate) AS cnt_orderdate, count(o_orderpriority) AS cnt_orderpriority
        |FROM orders""".stripMargin) { (s, d) =>
      orders(s, d).agg(
        count(col("o_orderkey")).as("cnt_orderkey"),
        count(col("o_custkey")).as("cnt_custkey"),
        count(col("o_orderstatus")).as("cnt_orderstatus"),
        count(col("o_totalprice")).as("cnt_totalprice"),
        count(col("o_orderdate")).as("cnt_orderdate"),
        count(col("o_orderpriority")).as("cnt_orderpriority"))
    },

    // A3 — any-of-group populated count (reference: validate.py:134-159,
    // row-wise any-non-null ≅ coalesce-not-null).
    GraftQuery.of("q_a3_group_populated",
      """SELECT count(CASE WHEN COALESCE(CAST(c_name AS VARCHAR), c_mktsegment) IS NOT NULL
        |THEN 1 END) AS group_populated FROM customer""".stripMargin) { (s, d) =>
      customer(s, d).agg(
        count(when(coalesce(col("c_name").cast("string"), col("c_mktsegment")).isNotNull, 1))
          .as("group_populated"))
    },

    // A4 + A9 — single-column non-null / null counts (validate.py:181,253).
    GraftQuery.of("q_a4_a9_null_counts",
      """SELECT count("value") AS value_populated,
        |count(CASE WHEN "value" IS NULL THEN 1 END) AS value_missing,
        |count(props) AS props_populated FROM events""".stripMargin) { (s, d) =>
      events(s, d).agg(
        count(col("value")).as("value_populated"),
        count(when(col("value").isNull, 1)).as("value_missing"),
        count(col("props")).as("props_populated"))
    },

    // A5 + P6 + E1 — lenient cast, inclusive range count, invalid = total −
    // in-range (reference: validate.py:185-205 coordinate checks).
    GraftQuery.of("q_a5_range_counts",
      """SELECT count(CASE WHEN l_quantity BETWEEN 10 AND 30 THEN 1 END) AS in_range,
        |count(l_quantity) - count(CASE WHEN l_quantity BETWEEN 10 AND 30 THEN 1 END) AS out_of_range
        |FROM lineitem""".stripMargin) { (s, d) =>
      val inRange = count(when(col("l_quantity").between(10, 30), 1))
      lineitem(s, d).agg(
        inRange.as("in_range"),
        (count(col("l_quantity")) - inRange).as("out_of_range"))
    },

    // A6 + A7 + A8 — null-id count, exact distinct, duplicates = count −
    // distinct (reference: validate.py:238-253, SURVEY T6).
    GraftQuery.of("q_a6_a8_id_checks",
      """SELECT count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS null_ids,
        |count(DISTINCT o_orderkey) AS distinct_ids,
        |count(o_custkey) - count(DISTINCT o_custkey) AS dup_custkeys
        |FROM orders""".stripMargin) { (s, d) =>
      orders(s, d).agg(
        count(when(col("o_orderkey").isNull, 1)).as("null_ids"),
        countDistinct(col("o_orderkey")).as("distinct_ids"),
        (count(col("o_custkey")) - countDistinct(col("o_custkey"))).as("dup_custkeys"))
    },

    // A10 + E2 + E3 — vocabulary match count with the reference's derived
    // unrecognised arithmetic (validate.py:285-313).
    GraftQuery.of("q_a10_vocab_counts",
      """SELECT count(*) AS record_count,
        |count(CASE WHEN o_orderpriority IS NULL THEN 1 END) AS nulls,
        |count(CASE WHEN lower(o_orderpriority) IN ('1-urgent', '2-high') THEN 1 END) AS recognised,
        |count(*) - count(CASE WHEN o_orderpriority IS NULL THEN 1 END)
        |  - count(CASE WHEN lower(o_orderpriority) IN ('1-urgent', '2-high') THEN 1 END) AS unrecognised
        |FROM orders""".stripMargin) { (s, d) =>
      val nulls = count(when(col("o_orderpriority").isNull, 1))
      val recognised =
        count(when(lower(col("o_orderpriority")).isin("1-urgent", "2-high"), 1))
      orders(s, d).agg(
        count(lit(1)).as("record_count"),
        nulls.as("nulls"),
        recognised.as("recognised"),
        (count(lit(1)) - nulls - recognised).as("unrecognised"))
    },

    // A11 + E1 — numeric-parse validity under ANSI mode: try_cast coerces,
    // never throws (reference intent of validate.py:348-363; SURVEY T1/T2).
    GraftQuery.of("q_a11_numeric_validity",
      """SELECT count(CASE WHEN text IS NOT NULL AND TRY_CAST(text AS DOUBLE) IS NULL
        |THEN 1 END) AS non_numeric_text,
        |count(CASE WHEN TRY_CAST(CAST(n_chars AS VARCHAR) AS DOUBLE) IS NOT NULL
        |THEN 1 END) AS numeric_nchars
        |FROM documents""".stripMargin) { (s, d) =>
      documents(s, d).agg(
        count(when(col("text").isNotNull && expr("try_cast(text AS DOUBLE)").isNull, 1))
          .as("non_numeric_text"),
        count(when(expr("try_cast(CAST(n_chars AS STRING) AS DOUBLE)").isNotNull, 1))
          .as("numeric_nchars"))
    },

    // A12 — group-by count histogram (reference: breakdown.py:65-74).
    GraftQuery.of("q_a12_histogram",
      """SELECT o_orderstatus, count(*) AS cnt FROM orders
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      orders(s, d).groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("o_orderstatus"))
    },

    // A13 — top-k by frequency, deterministic tie-break (breakdown.py:54-62).
    GraftQuery.of("q_a13_topk",
      """SELECT p_brand, count(*) AS cnt FROM part GROUP BY p_brand
        |ORDER BY cnt DESC, p_brand LIMIT 10""".stripMargin) { (s, d) =>
      part(s, d).groupBy(col("p_brand"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("p_brand"))
        .limit(10)
    },

    // A13 at unbounded cardinality — single-pass Space-Saving top-k
    // (custom TypedImperativeAggregate, constant memory per partition; no
    // per-distinct-value shuffle row). Capacity exceeds the column's
    // distinct count here, so the sketch is exact and the oracle is the
    // plain top-k SQL.
    GraftQuery.of("q_a13_topk_sketch",
      """SELECT p_brand AS value, count(*) AS cnt FROM part GROUP BY p_brand
        |ORDER BY cnt DESC, value LIMIT 10""".stripMargin) { (s, d) =>
      part(s, d)
        .agg(graft.functions.SpaceSavingTopK.topKFreq(col("p_brand"), 10, 64).as("top"))
        .select(explode(col("top")).as("e"))
        .select(col("e.value").as("value"), col("e.count").as("cnt"))
        .orderBy(col("cnt").desc, col("value"))
    },

    // EXACT per-group top-k VALUES through the bounded-heap
    // TypedImperativeAggregate (graft.functions.ExactTopKLong) — the
    // scale-correct form of `row_number() OVER (... ORDER BY v DESC) <= k`:
    // the window sorts every group in full and a WindowExec sees every
    // row; the aggregate keeps a k-slot min-heap per partial (O(k) state,
    // map-side combined — only k values per partition×group cross the
    // shuffle). The oracle IS the window formulation, so the green row
    // proves agg == window on the value multiset; PlanSpec asserts no
    // Window/sort appears in the physical plan. NULL CONTRACT: the agg
    // skips nulls (standard aggregate semantics) while a bare window
    // rank would count NULLS-LAST rows toward k — the oracle's
    // `value IS NOT NULL` guard pins both sides to the same non-null
    // multiset (latent on this corpus, which has no null values).
    GraftQuery.of("q_exact_topk_agg",
      """WITH c AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events
        |  WHERE value IS NOT NULL),
        |r AS (SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type ORDER BY cents DESC) AS rn
        |  FROM c)
        |SELECT event_type, CAST(rn AS BIGINT) AS rnk, cents
        |FROM r WHERE rn <= 5 ORDER BY event_type, rnk""".stripMargin) { (s, d) =>
      events(s, d)
        .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .groupBy(col("event_type"))
        .agg(graft.functions.ExactTopK.exactTopKLong(col("cents"), 5).as("top"))
        .select(col("event_type"), posexplode(col("top")).as(Seq("i", "cents")))
        .select(col("event_type"), (col("i") + 1).cast("long").as("rnk"), col("cents"))
        .orderBy(col("event_type"), col("rnk"))
    },

    // A14 + E5 — date-part derived histograms (breakdown.py:77-102).
    GraftQuery.of("q_a14_date_histogram",
      """SELECT CAST(date_part('year', ts) AS BIGINT) AS y,
        |CAST(date_part('month', ts) AS BIGINT) AS m, count(*) AS cnt
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      events(s, d).groupBy(
          year(col("ts")).cast("long").as("y"),
          month(col("ts")).cast("long").as("m"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("y"), col("m"))
    },

    // A15 + P3 + P4 — distinct-sort-limit sample of non-vocabulary values
    // (validate.py:297-300; nulls dropped up front per SURVEY T5).
    GraftQuery.of("q_a15_distinct_sample",
      """SELECT DISTINCT c_mktsegment FROM customer
        |WHERE c_mktsegment IS NOT NULL
        |AND lower(c_mktsegment) NOT IN ('building', 'automobile')
        |ORDER BY c_mktsegment LIMIT 10""".stripMargin) { (s, d) =>
      customer(s, d)
        .filter(col("c_mktsegment").isNotNull &&
          !lower(col("c_mktsegment")).isin("building", "automobile"))
        .select(col("c_mktsegment")).distinct()
        .orderBy(col("c_mktsegment")).limit(10)
    },

    // P3 + P6 — filter + projection; predicate and column pruning must both
    // reach the parquet scan (PushedFilters / ReadSchema).
    // The sort covers ALL projected columns: (l_orderkey, l_linenumber) is
    // NOT unique in the driver's synthetic lineitem (118k duplicate pairs
    // at sf0.1), so a 2-key ORDER BY ... LIMIT was nondeterministic — it
    // survived sf0.01/sf1 only because in-window ties happened to carry
    // equal quantities, and the sf10 sweep caught the first unequal tie.
    // Adding the last projected column makes the cut total: any remaining
    // ties are row-identical in the output, so the frame is deterministic.
    GraftQuery.of("q_p3_filter_project",
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS linenumber, l_quantity
        |FROM lineitem WHERE date_part('year', l_shipdate) >= 1995 AND l_quantity >= 45
        |ORDER BY l_orderkey, linenumber, l_quantity LIMIT 200""".stripMargin) { (s, d) =>
      lineitem(s, d)
        .filter(year(col("l_shipdate")) >= 1995 && col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("linenumber"),
          col("l_quantity"))
        .orderBy(col("l_orderkey"), col("linenumber"), col("l_quantity")).limit(200)
    },

    // E2 + E3 — lowercase + distinct (validate.py:286).
    GraftQuery.of("q_e2_lower_distinct",
      """SELECT DISTINCT lower(o_orderpriority) AS priority FROM orders
        |ORDER BY priority""".stripMargin) { (s, d) =>
      orders(s, d).select(lower(col("o_orderpriority")).as("priority"))
        .distinct().orderBy(col("priority"))
    },

    // E5 — date-part extraction breakdown (breakdown.py:91-93).
    GraftQuery.of("q_e5_date_parts",
      """SELECT CAST(date_part('year', o_orderdate) AS BIGINT) AS y,
        |CAST(date_part('day', o_orderdate) AS BIGINT) AS dom, count(*) AS cnt
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      orders(s, d).groupBy(
          year(col("o_orderdate")).cast("long").as("y"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("y"), col("dom"))
    },

    // Grouping sets — ROLLUP totals/subtotals in one pass (the same
    // grouping-sets machinery Breakdowns fuses histograms with). Rollup
    // NULL markers are coalesced to a sentinel so both engines order rows
    // identically (Spark sorts NULLS FIRST, DuckDB NULLS LAST).
    GraftQuery.of("q_rollup",
      """SELECT coalesce(l_returnflag, '<all>') AS returnflag,
        |  coalesce(l_linestatus, '<all>') AS linestatus,
        |  count(*) AS cnt, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin) { (s, d) =>
      lineitem(s, d).rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("<all>")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("<all>")).as("linestatus"),
          col("cnt"), col("sum_qty"))
        .orderBy(col("returnflag"), col("linestatus"))
    },

    // Ordered statistics, sketch path — REDESIGNED r12 after the sf1
    // timing sweep caught the original shape super-linear (59.6 s at sf1
    // on a clean window vs 0.32 s at sf0.1): "accuracy ≥ row count" made
    // percentile_approx exact at test SF, but a GK sketch whose capacity
    // tracks n is a disguised global collect (the final merge holds every
    // sample) — the dedup_embedding_nn class of defect, found by the
    // instrument built to find it. An exact-equality oracle over a
    // GENUINELY approximate sketch is also inherently fragile here: the
    // measured target-rank-to-tie-boundary margin is 0 ranks at sf0.01
    // (f=N, p=0.9) — no accuracy in approx mode can guarantee the value.
    // The r12 shape follows the repo's estimator-precedent doctrine
    // (q_approx_quantiles, events_hourly_p95_approx):
    //   exact side — l_quantity has 50 distinct values, so nearest-rank
    //   quantiles come EXACTLY from one 150-cell map-side-combined
    //   (flag, qty) count + a 50-row-per-flag cumsum window: the
    //   low-cardinality exact-quantile plan that is O(distinct) at any
    //   corpus size. These are the hash-gated q25/q50/q90 values.
    //   sketch side — percentile_approx at PRODUCTION accuracy (1e4,
    //   bounded sketch, mergeable partials); its GK guarantee (returned
    //   value's rank range within ±n/acc of the target rank) is checked
    //   in-plan against the same count frame and hash-gated as booleans.
    // Oracle: the ceil-rank window rule (Spark's exact-mode rank,
    // PercentilePinSpec) for the values + TRUE literals for the bounds.
    GraftQuery.of("q_percentiles_approx",
      """WITH ranked AS (
        |  SELECT l_returnflag, l_quantity,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  min(l_quantity) FILTER (WHERE rn >= ceil(0.25 * n)) AS q25,
        |  min(l_quantity) FILTER (WHERE rn >= ceil(0.5 * n)) AS q50,
        |  min(l_quantity) FILTER (WHERE rn >= ceil(0.9 * n)) AS q90,
        |  TRUE AS q25_within_eps, TRUE AS q50_within_eps, TRUE AS q90_within_eps
        |FROM ranked GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val acc = 10000 // eps = 1e-4 rank error — the production setting
      val counts = lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("c"))
      // per-(flag, value) cumulative rank range [lo, hi]; 50 rows/flag so
      // the window partition is bounded by the value domain, not by n
      val cum = counts.select(col("l_returnflag"), col("l_quantity"), col("c"),
        sum(col("c")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))).as("hi"))
        .withColumn("lo", col("hi") - col("c") + 1)
        .withColumn("n", sum(col("c")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_returnflag"))))
      // ONE sketch queried at three percentiles (the array form) — three
      // separate percentile_approx calls each build their own GK sketch
      // over the full column (3x the insert cost; measured 74.8 s at sf10
      // vs ~3 s for q1's scan-agg over the same rows)
      val sketch = lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(expr(s"percentile_approx(l_quantity, array(0.25D, 0.5D, 0.9D), $acc)")
          .as("apx"))
        .select(col("l_returnflag"),
          element_at(col("apx"), 1).as("a25"),
          element_at(col("apx"), 2).as("a50"),
          element_at(col("apx"), 3).as("a90"))
      // ONE broadcast of the 3-row sketch frame onto the 150-row cum frame,
      // then exact quantiles AND the three sketch rank-ranges come out of a
      // single bounded groupBy — two lineitem scans total (counts + sketch);
      // a join-per-percentile formulation re-evaluated the whole count
      // lineage per join (5 scans, measured 23.5 s at sf1 vs ~4 s for this).
      def exactQ(p: Double, name: String) =
        min(when(col("hi") >= ceil(lit(p) * col("n")), col("l_quantity"))).as(name)
      def rr(a: String, b: String) =
        max(when(col("l_quantity") === col(a), col(b))).as(s"${b}_$a")
      val agg = cum.join(broadcast(sketch), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(exactQ(0.25, "q25"), exactQ(0.5, "q50"), exactQ(0.9, "q90"),
          max(col("n")).as("n"),
          rr("a25", "lo"), rr("a25", "hi"), rr("a50", "lo"), rr("a50", "hi"),
          rr("a90", "lo"), rr("a90", "hi"))
      // GK check: the sketch value's rank range [lo, hi] must intersect
      // [ceil(p*n) - n/acc, ceil(p*n) + n/acc]
      def within(a: String, p: Double, name: String) = {
        val t = ceil(lit(p) * col("n"))
        val eps = col("n") / acc
        (col(s"lo_$a") <= t + eps && col(s"hi_$a") >= t - eps).as(name)
      }
      agg.select(col("l_returnflag"), col("q25"), col("q50"), col("q90"),
          within("a25", 0.25, "q25_within_eps"),
          within("a50", 0.5, "q50_within_eps"),
          within("a90", 0.9, "q90_within_eps"))
        .orderBy(col("l_returnflag"))
    },

    // HyperLogLog++ distinct sketch next to the exact count — the sketch
    // family's cardinality member (SpaceSaving covers top-k). The sketch
    // is mergeable across partitions (constant memory per group at any
    // scale, vs the exact count's per-key shuffle of distinct values).
    // The approx value itself is engine-specific, so the oracle contract
    // is the EXACT count plus the assertion that HLL at rsd=0.05 landed
    // within a generous 4·rsd + 10 envelope — deterministic for fixed
    // data (HLL has no RNG), verified at all three SFs.
    GraftQuery.of("q_approx_distinct",
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_distinct,
        |  TRUE AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_distinct"),
          approx_count_distinct(col("l_partkey"), 0.05).as("__approx"))
        .select(col("l_returnflag"), col("exact_distinct"),
          (abs(col("__approx") - col("exact_distinct")) <=
            col("exact_distinct") * 0.2 + lit(10)).as("approx_ok"))
        .orderBy(col("l_returnflag"))
    },

    // KMV (k-minimum-values) distinct-count sketch — the third member of
    // the sketch family (X4 SpaceSaving top-k, X5 HLL++): keep the k
    // smallest 60-bit key hashes; the kth smallest estimates cardinality
    // as (k−1)·2⁶⁰/h_k. Distributed shape: one hash-keyed distinct, then
    // TakeOrderedAndProject (map-side per-partition min-k partials merge
    // on the driver — the sketch IS mergeable, which is the point at
    // 100 TB). Everything is deterministic (md5 hashes, integer kth
    // value); the estimate is ONE double division of identical operands,
    // and the oracle checks the error envelope held (estimates run
    // 0.9×–1.8× of exact at k=16 across the three SFs).
    GraftQuery.of("q_kmv_distinct", {
      val h = GraftQuery.h60Sql("l_partkey::VARCHAR")
      s"""WITH mink AS (
         |  SELECT DISTINCT $h AS h FROM lineitem ORDER BY 1 LIMIT 16),
         |kth AS (SELECT CAST(max(h) AS BIGINT) AS hk,
         |               CAST(count(*) AS BIGINT) AS k FROM mink),
         |ex AS (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_distinct
         |       FROM lineitem)
         |SELECT k, hk,
         |  15.0 * CAST(1152921504606846976 AS DOUBLE) / hk AS est_distinct,
         |  exact_distinct,
         |  15.0 * CAST(1152921504606846976 AS DOUBLE) / hk
         |    BETWEEN exact_distinct * 0.4 AND exact_distinct * 2.5 AS within_bounds
         |FROM kth, ex""".stripMargin
    }) { (s, d) =>
      import graft.functions.Md5Hash60.md5hash60
      val mink = lineitem(s, d)
        .select(md5hash60(col("l_partkey").cast("string")).as("h"))
        .distinct().orderBy(col("h")).limit(16)
      val kth = mink.agg(max(col("h")).as("hk"), count(lit(1)).as("k"))
      val ex = lineitem(s, d)
        .agg(countDistinct(col("l_partkey")).as("exact_distinct"))
      val est = lit(15.0) * lit(1152921504606846976.0) / col("hk")
      kth.crossJoin(broadcast(ex))
        .select(col("k"), col("hk"), est.as("est_distinct"), col("exact_distinct"),
          (est >= col("exact_distinct") * 0.4 && est <= col("exact_distinct") * 2.5)
            .as("within_bounds"))
    },

    // MODE (most frequent value) per group with a TOTAL-ORDER tie-break —
    // built-in mode() functions break frequency ties arbitrarily (and
    // differently per engine), so the deterministic form counts once and
    // argmaxes over ONE packed integer key (cnt·10⁶ − qty: highest count
    // wins, LOWEST value on ties; qty ≤ 50 and per-(group, value) counts
    // stay far under 10⁶ at these SFs — widen the pack at scale). One
    // count shuffle + one tiny per-group argmax, identical on both
    // engines (DuckDB's max_by takes no composite key).
    GraftQuery.of("q_group_mode",
      """WITH c AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag,
        |  CAST(max_by(qty, cnt * 1000000 - qty) AS BIGINT) AS mode_qty,
        |  CAST(max(cnt) AS BIGINT) AS mode_cnt
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_quantity").cast("long").as("qty"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("l_returnflag"))
        .agg(expr("max_by(qty, cnt * 1000000 - qty)").cast("long").as("mode_qty"),
          max(col("cnt")).cast("long").as("mode_cnt"))
        .orderBy(col("l_returnflag"))
    },

    // APPROX-QUANTILE rank-error envelope — the sketch family's QUANTILE
    // member (GK/t-digest class): `approx_percentile` returns an actual
    // data element whose RANK is guaranteed within ±eps·n of the target
    // (eps = 1/accuracy). The sketch's merge order isn't replayable in
    // SQL, so — exactly like q_approx_distinct — the approximate VALUE
    // stays out of the compared result; what's hash-checked is the exact
    // quantiles plus the rank-guarantee booleans, each computed in-engine
    // by counting rows ≤ / < the sketch's answer against one broadcast
    // 3-row probe frame. At 100 TB this replaces q_percentiles'
    // per-group sort with a constant-memory mergeable summary.
    GraftQuery.of("q_approx_quantiles",
      """SELECT 0.5 AS q, round(quantile_cont(l_extendedprice, 0.5), 6) AS exact_value,
        |  TRUE AS within_bounds FROM lineitem
        |UNION ALL
        |SELECT 0.9, round(quantile_cont(l_extendedprice, 0.9), 6), TRUE FROM lineitem
        |UNION ALL
        |SELECT 0.99, round(quantile_cont(l_extendedprice, 0.99), 6), TRUE FROM lineitem
        |ORDER BY q""".stripMargin) { (s, d) =>
      val qs = Seq(0.5, 0.9, 0.99)
      val acc = 100 // eps = 1% rank error
      val li = lineitem(s, d).select(col("l_extendedprice"))
      val approx = li.agg(
        expr(s"approx_percentile(l_extendedprice, array(${qs.mkString(", ")}), $acc)")
          .as("apx"),
        count(lit(1)).as("n"),
        expr(s"percentile(l_extendedprice, array(${qs.mkString(", ")}))").as("ex"))
      val probes = approx.select(
        posexplode(arrays_zip(col("apx"), col("ex"))).as(Seq("i", "z")),
        col("n"))
        .select(element_at(lit(qs.toArray), col("i") + 1).as("q"),
          col("z.apx").as("a"), col("z.ex").as("exact_raw"), col("n"))
      li.join(broadcast(probes))
        .groupBy(col("q"), col("a"), col("exact_raw"), col("n"))
        .agg(sum(when(col("l_extendedprice") <= col("a"), 1L).otherwise(0L)).as("le"),
          sum(when(col("l_extendedprice") < col("a"), 1L).otherwise(0L)).as("lt"))
        .select(col("q"), round(col("exact_raw"), 6).as("exact_value"),
          (col("le") >= (col("q") - lit(1.0 / acc)) * col("n") &&
            col("lt") <= (col("q") + lit(1.0 / acc)) * col("n")).as("within_bounds"))
        .orderBy(col("q"))
    },

    // KMV sketch SET ALGEBRA — the property that makes distinct-count
    // sketches infrastructure rather than a one-table trick: two sets'
    // k-minimum-values sketches merge by "k smallest of the union of
    // sketch elements" (exact, because the k smallest of A ∪ B can only
    // come from the k smallest of A and of B), estimating |A ∪ B| with
    // the same (k−1)·2⁶⁰/h_k rule, and |A ∩ B| via the Jaccard fraction
    // ρ = (union-sketch members in BOTH sets)/k (Beyer et al., SIGMOD'07).
    // Sets: order keys shipping 'A'-returned vs 'R'-returned lines —
    // genuinely partial overlap (ρ ≈ 0.5–0.7 across SFs) because an
    // order's handful of lines rarely covers both flags. Everything is
    // md5-deterministic, so estimates AND membership counts hash-compare
    // exactly; the oracle additionally checks both error envelopes held.
    GraftQuery.of("q_kmv_setops", {
      val h = GraftQuery.h60Sql("k::VARCHAR")
      s"""WITH a AS (SELECT DISTINCT l_orderkey AS k FROM lineitem WHERE l_returnflag = 'A'),
         |b AS (SELECT DISTINCT l_orderkey AS k FROM lineitem WHERE l_returnflag = 'R'),
         |ha AS (SELECT $h AS h FROM a),
         |hb AS (SELECT $h AS h FROM b),
         |u AS (SELECT DISTINCT h FROM (SELECT h FROM ha UNION ALL SELECT h FROM hb)
         |      ORDER BY h LIMIT 16),
         |kth AS (SELECT CAST(max(h) AS BIGINT) AS hk, CAST(count(*) AS BIGINT) AS k FROM u),
         |inter AS (SELECT CAST(count(*) AS BIGINT) AS m FROM u
         |  WHERE h IN (SELECT h FROM ha) AND h IN (SELECT h FROM hb)),
         |ex AS (SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM (SELECT * FROM a UNION SELECT * FROM b)) AS exact_union,
         |  (SELECT CAST(count(*) AS BIGINT) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS exact_inter)
         |SELECT k, m,
         |  15.0 * CAST(1152921504606846976 AS DOUBLE) / hk AS est_union,
         |  exact_union,
         |  (m / 16.0) * (15.0 * CAST(1152921504606846976 AS DOUBLE) / hk) AS est_inter,
         |  exact_inter,
         |  15.0 * CAST(1152921504606846976 AS DOUBLE) / hk
         |    BETWEEN exact_union * 0.4 AND exact_union * 2.5 AS union_within_bounds,
         |  (m / 16.0) * (15.0 * CAST(1152921504606846976 AS DOUBLE) / hk)
         |    BETWEEN exact_inter * 0.3 AND exact_inter * 3.0 AS inter_within_bounds
         |FROM kth, inter, ex""".stripMargin
    }) { (s, d) =>
      import graft.functions.Md5Hash60.md5hash60
      // ONE lineitem scan + ONE key shuffle for everything (r15: the
      // previous form paid six scans and six distinct shuffles — 30.3 s
      // at sf10, a 5.1× ladder): per order key, membership FLAGS in the
      // 'A' and 'R' sets ride one groupBy, and the checkpointed flag-pair
      // frame then answers the hash sets (filters), the exact union/
      // intersection (one bounded aggregate — union = every row, inter =
      // both flags set), and the sketch membership probe (16-row
      // broadcast back). The per-h groupBy in `m` mirrors the oracle's
      // "u rows whose h appears in both sets" exactly even under an
      // (astronomically unlikely) 60-bit hash collision.
      val keys = lineitem(s, d)
        .filter(col("l_returnflag").isin("A", "R"))
        .groupBy(col("l_orderkey"))
        .agg(max(when(col("l_returnflag") === "A", 1).otherwise(0)).as("in_a"),
          max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("in_r"))
        .select(md5hash60(col("l_orderkey").cast("string")).as("h"),
          col("in_a"), col("in_r"))
        .localCheckpoint(true)
      val u = keys.select(col("h")).distinct().orderBy(col("h")).limit(16)
      val kth = u.agg(max(col("h")).as("hk"), count(lit(1)).as("k"))
      val m = broadcast(keys.join(broadcast(u), Seq("h"))
        .groupBy(col("h"))
        .agg(max(col("in_a")).as("a"), max(col("in_r")).as("r"))
        .agg(sum(when(col("a") === 1 && col("r") === 1, 1L).otherwise(0L))
          .as("m")))
      val exact = broadcast(keys.agg(
        count(lit(1)).as("exact_union"),
        sum(when(col("in_a") === 1 && col("in_r") === 1, 1L).otherwise(0L))
          .as("exact_inter")))
      val estU = lit(15.0) * lit(1152921504606846976.0) / col("hk")
      val estI = (col("m") / lit(16.0)) * estU
      kth.crossJoin(m).crossJoin(exact)
        .select(col("k"), col("m"), estU.as("est_union"), col("exact_union"),
          estI.as("est_inter"), col("exact_inter"),
          (estU >= col("exact_union") * 0.4 && estU <= col("exact_union") * 2.5)
            .as("union_within_bounds"),
          (estI >= col("exact_inter") * 0.3 && estI <= col("exact_inter") * 3.0)
            .as("inter_within_bounds"))
    },

    // JOIN-KEY SKEW PROFILE — the diagnostic run before any large keyed
    // join ships (the number that says "salt this" / "AQE will split
    // that"): per-key row counts of the prospective join key, summarized
    // as max / p50 / p99 / top-1 share. All inputs to the percentiles are
    // integer counts (percentile ≡ quantile_cont on both engines, round 6
    // guards interpolation residue), and top1_share is emitted as exact
    // integer numerator (max count) over denominator (rows) at 6dp — the
    // same integer-derived-ratio discipline as the text family. ONE
    // count shuffle + one bounded summary aggregate.
    GraftQuery.of("q_skew_profile",
      """WITH c AS (SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(cnt) AS BIGINT) AS n_rows,
        |  CAST(max(cnt) AS BIGINT) AS max_cnt,
        |  round(quantile_cont(cnt, 0.5), 6) AS p50_cnt,
        |  round(quantile_cont(cnt, 0.99), 6) AS p99_cnt,
        |  round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 6) AS top1_share
        |FROM c""".stripMargin) { (s, d) =>
      lineitem(s, d).groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
        .agg(count(lit(1)).as("n_keys"),
          sum(col("cnt")).as("n_rows"),
          max(col("cnt")).as("max_cnt"),
          round(expr("percentile(cnt, 0.5)"), 6).as("p50_cnt"),
          round(expr("percentile(cnt, 0.99)"), 6).as("p99_cnt"),
          round(max(col("cnt")).cast("double") / sum(col("cnt")), 6).as("top1_share"))
    },

    // Count-Min sketch frequency estimation — the sketch family's POINT-
    // FREQUENCY member (X4 SpaceSaving = top-k, X5 HLL++ = cardinality,
    // KMV = cardinality): a D=4 × W=16 integer matrix where row i
    // increments bucket h_i(token) per occurrence, and the estimate for a
    // term is min_i of its D buckets — always ≥ the true count, with the
    // overcount bounded by collisions. The matrix is mergeable by plain
    // addition (constant memory per partition at any scale). Hash rows
    // are md5-derived, so both engines build the IDENTICAL sketch and the
    // estimates — not just the envelope — are hash-compared. Shape: the
    // token count is the standard one-shuffle map-side-combine groupBy;
    // the sketch is then derived from that vocabulary-sized frame by
    // additivity (bucket sum = Σ cnt over colliding tokens), which equals
    // the direct per-occurrence increments a streaming build would do.
    GraftQuery.of("q_cms_freq_est", {
      val hb = (e: String) => s"${GraftQuery.h60Sql(e)} % 16"
      s"""WITH tok AS (
         |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
         |  FROM documents),
         |tc AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY 1),
         |r AS (SELECT unnest([0, 1, 2, 3]) AS i),
         |sk AS (
         |  SELECT i, ${hb("i::VARCHAR || '|' || tok")} AS b,
         |    CAST(sum(cnt) AS BIGINT) AS bsum
         |  FROM tc CROSS JOIN r GROUP BY 1, 2),
         |probes AS (SELECT tok, cnt FROM tc ORDER BY cnt DESC, tok LIMIT 10)
         |SELECT p.tok AS term, max(p.cnt) AS true_cnt, min(s.bsum) AS cms_est,
         |  min(s.bsum) - max(p.cnt) AS overcount
         |FROM probes p CROSS JOIN r
         |JOIN sk s ON s.i = r.i AND s.b = ${hb("r.i::VARCHAR || '|' || p.tok")}
         |GROUP BY p.tok ORDER BY true_cnt DESC, term""".stripMargin
    }) { (s, d) =>
      import graft.functions.Md5Hash60.md5hash60
      def bucket(i: org.apache.spark.sql.Column, tok: org.apache.spark.sql.Column) =
        pmod(md5hash60(concat(i.cast("string"), lit("|"), tok)), lit(16L))
      val rows = explode(array((0 to 3).map(lit): _*))
      val tc = documents(s, d)
        .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val sk = tc.select(col("cnt"), rows.as("i"), col("tok"))
        .select(col("i"), bucket(col("i"), col("tok")).as("b"), col("cnt"))
        .groupBy(col("i"), col("b")).agg(sum(col("cnt")).as("bsum"))
      val probes = tc.orderBy(col("cnt").desc, col("tok")).limit(10)
      probes.select(col("tok"), col("cnt"), rows.as("i"))
        .withColumn("b", bucket(col("i"), col("tok")))
        .join(sk, Seq("i", "b"))
        .groupBy(col("tok").as("term"))
        .agg(max(col("cnt")).as("true_cnt"), min(col("bsum")).as("cms_est"))
        .select(col("term"), col("true_cnt"), col("cms_est"),
          (col("cms_est") - col("true_cnt")).as("overcount"))
        .orderBy(col("true_cnt").desc, col("term"))
    },

    // Equi-width numeric histogram — the profiling sweep run before any
    // bucketing/binning decision: 16 buckets over the column's own
    // [min, max], bucket index by explicit floor arithmetic. The bounds
    // come from a 1-row aggregate broadcast back over the scan (two
    // passes — the first is a columnar min/max that at rest would come
    // free from zone maps, cf. sink_zonemap_prune). The bucket expression
    // is the IDENTICAL IEEE tree on both engines ((x−mn)/(mx−mn)·16,
    // floored), so bucket assignment is deterministic; the max value
    // clamps into the last bucket.
    GraftQuery.of("q_numeric_histogram",
      """WITH m AS (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
        |           FROM lineitem)
        |SELECT CAST(least(15, CAST(floor((l_extendedprice - mn) / (mx - mn) * 16)
        |                           AS BIGINT)) AS BIGINT) AS bucket,
        |  count(*) AS n
        |FROM lineitem, m GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val m = lineitem(s, d).agg(min(col("l_extendedprice")).as("mn"),
        max(col("l_extendedprice")).as("mx"))
      lineitem(s, d).crossJoin(broadcast(m))
        .select(least(lit(15L),
          floor((col("l_extendedprice") - col("mn")) / (col("mx") - col("mn")) * 16))
          .as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    },

    // Rank-statistics window surface: quartile bucket (ntile), percent_rank,
    // and cume_dist per customer order history — the remaining ranked-window
    // functions q_window_top_order/q_window_running don't cover. Both
    // ratios are integer-derived ((rank−1)/(n−1), ≤-count/n), so round(…, 6)
    // is grid-exact across engines; ntile's uneven-bucket boundary rule
    // (first buckets get the extra rows) agrees between Spark and DuckDB.
    GraftQuery.of("q_window_rank_stats",
      """SELECT o_custkey, o_orderkey,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // EXACT money aggregation on the DECIMAL path — the principled
    // alternative to the round-to-the-true-grid idiom the double-typed
    // queries use: cast prices to DECIMAL(18,2) at the scan and sum
    // exactly (Spark Decimal128 partials are integer arithmetic in
    // cents — order-independent by construction, no rounding step at
    // all). At 100 TB this is how a finance-grade pipeline stores the
    // column in the first place.
    GraftQuery.of("q_decimal_exact_money",
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(30,2))
        |    AS sum_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("decimal(30,2)").as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // CUBE with grouping_id: all four grouping-set combinations in one
    // Expand pass; grouping_id disambiguates a real NULL group key from a
    // rolled-up one (the reason the sentinel trick alone is not enough in
    // general).
    GraftQuery.of("q_cube",
      """SELECT coalesce(l_returnflag, '<all>') AS returnflag,
        |  coalesce(l_linestatus, '<all>') AS linestatus,
        |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, returnflag, linestatus""".stripMargin) { (s, d) =>
      lineitem(s, d).cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("cnt"))
        .select(coalesce(col("l_returnflag"), lit("<all>")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("<all>")).as("linestatus"),
          col("gid"), col("cnt"))
        .orderBy(col("gid"), col("returnflag"), col("linestatus"))
    },

    // Explicit GROUPING SETS (the general form ROLLUP/CUBE desugar to):
    // two independent single-column margins plus the grand total in ONE
    // Expand + aggregation pass — replaces three separate groupBys and
    // three scans at 100 TB.
    GraftQuery.of("q_grouping_sets",
      """SELECT coalesce(l_returnflag, '<all>') AS returnflag,
        |  coalesce(l_linestatus, '<all>') AS linestatus,
        |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS cnt, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, returnflag, linestatus""".stripMargin) { (s, d) =>
      lineitem(s, d).groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("cnt"),
          sum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("<all>")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("<all>")).as("linestatus"),
          col("gid"), col("cnt"), col("sum_qty"))
        .orderBy(col("gid"), col("returnflag"), col("linestatus"))
    },

    // Semi join — customers who placed at least one urgent order; plans as
    // LeftSemi (broadcast or shuffled-hash, never materializing orders
    // columns).
    GraftQuery.of("q_semi_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      customer(s, d).join(
          orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // Anti join — customers with no orders at all (LeftAnti).
    GraftQuery.of("q_anti_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      customer(s, d).join(orders(s, d),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // Set operations — INTERSECT and EXCEPT over projected key sets.
    GraftQuery.of("q_set_ops",
      """SELECT 'both' AS side, CAST(k AS BIGINT) AS k FROM (
        |  SELECT o_custkey AS k FROM orders
        |  INTERSECT SELECT c_custkey FROM customer)
        |UNION ALL
        |SELECT 'customer_only' AS side, CAST(k AS BIGINT) AS k FROM (
        |  SELECT c_custkey AS k FROM customer
        |  EXCEPT SELECT o_custkey FROM orders)
        |ORDER BY side, k""".stripMargin) { (s, d) =>
      val orderKeys = orders(s, d).select(col("o_custkey").cast("long").as("k"))
      val custKeys = customer(s, d).select(col("c_custkey").cast("long").as("k"))
      orderKeys.intersect(custKeys).select(lit("both").as("side"), col("k"))
        .union(custKeys.except(orderKeys).select(lit("customer_only").as("side"), col("k")))
        .orderBy(col("side"), col("k"))
    },

    // Bag-semantics set operations — INTERSECT ALL / EXCEPT ALL keep
    // multiplicities (a customer with 3 orders appears 3 times), which
    // distinct-set ops silently collapse.
    GraftQuery.of("q_set_ops_all",
      """SELECT side, CAST(k AS BIGINT) AS k, count(*) AS n FROM (
        |  SELECT 'both' AS side, k FROM (
        |    SELECT o_custkey AS k FROM orders
        |    INTERSECT ALL SELECT c_custkey FROM customer)
        |  UNION ALL
        |  SELECT 'orders_surplus' AS side, k FROM (
        |    SELECT o_custkey AS k FROM orders
        |    EXCEPT ALL SELECT c_custkey FROM customer))
        |GROUP BY side, k ORDER BY side, k""".stripMargin) { (s, d) =>
      val orderKeys = orders(s, d).select(col("o_custkey").cast("long").as("k"))
      val custKeys = customer(s, d).select(col("c_custkey").cast("long").as("k"))
      orderKeys.intersectAll(custKeys).select(lit("both").as("side"), col("k"))
        .union(orderKeys.exceptAll(custKeys).select(lit("orders_surplus").as("side"), col("k")))
        .groupBy(col("side"), col("k")).agg(count(lit(1)).as("n"))
        .orderBy(col("side"), col("k"))
    },

    // UNPIVOT/melt: rotate lineitem's three measure columns into
    // (measure, value) rows — the wide→long reshape, via the native
    // unpivot operator (one Expand, no join). Oracle spells the same
    // rotation as UNION ALL.
    GraftQuery.of("q_unpivot",
      s"""SELECT measure, ${Money.sqlSumDollars("v")} AS total, count(*) AS n FROM (
        |  SELECT 'qty' AS measure, l_quantity AS v FROM lineitem
        |  UNION ALL SELECT 'price', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'disc', l_discount FROM lineitem)
        |GROUP BY measure ORDER BY measure""".stripMargin) { (s, d) =>
      lineitem(s, d)
        .select(col("l_quantity").as("qty"), col("l_extendedprice").as("price"),
          col("l_discount").as("disc"))
        .unpivot(Array.empty[org.apache.spark.sql.Column], Array(col("qty"), col("price"), col("disc")),
          "measure", "v")
        .groupBy(col("measure"))
        .agg(Money.sumDollars(col("v")).as("total"), count(lit(1)).as("n"))
        .orderBy(col("measure"))
    },

    // LATERAL correlated subquery: per region, the top-2 nations by
    // customer count — the "top-N per group via lateral" idiom (Spark
    // plans the correlated limit as a ranked window under the hood).
    GraftQuery.of("q_lateral_topn",
      """SELECT r_name, n_name, n_customers FROM region r,
        |  LATERAL (
        |    SELECT n_name, count(*) AS n_customers
        |    FROM nation JOIN customer ON c_nationkey = n_nationkey
        |    WHERE n_regionkey = r.r_regionkey
        |    GROUP BY n_name ORDER BY n_customers DESC, n_name LIMIT 2)
        |ORDER BY r_name, n_customers DESC, n_name""".stripMargin) { (s, d) =>
      val sfx = viewSuffix(d)
      region(s, d).createOrReplaceTempView(s"region_l_$sfx")
      nation(s, d).createOrReplaceTempView(s"nation_l_$sfx")
      customer(s, d).createOrReplaceTempView(s"customer_l_$sfx")
      s.sql(
        s"""SELECT r_name, n_name, n_customers FROM region_l_$sfx r,
           |  LATERAL (
           |    SELECT n_name, count(*) AS n_customers
           |    FROM nation_l_$sfx JOIN customer_l_$sfx ON c_nationkey = n_nationkey
           |    WHERE n_regionkey = r.r_regionkey
           |    GROUP BY n_name ORDER BY n_customers DESC, n_name LIMIT 2)
           |ORDER BY r_name, n_customers DESC, n_name""".stripMargin)
    },

    // Ordered statistics — exact interpolated percentiles per group. Exact
    // percentile sorts within each group (fine for bounded groups); at
    // 100 TB swap in approx_percentile (t-digest) for the same shape
    // without the per-group sort.
    GraftQuery.of("q_percentiles",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS qty_p50,
        |  round(quantile_cont(l_extendedprice, 0.25), 6) AS price_p25,
        |  round(quantile_cont(l_extendedprice, 0.75), 6) AS price_p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("qty_p50"),
          round(expr("percentile(l_extendedprice, 0.25)"), 6).as("price_p25"),
          round(expr("percentile(l_extendedprice, 0.75)"), 6).as("price_p75"))
        .orderBy(col("l_returnflag"))
    },

    // SQL entry path (S3): the engine's spark.sql front-end running a
    // correlated scalar subquery — Catalyst decorrelates it to an
    // aggregate + left join; the identical SQL text is the oracle.
    GraftQuery.of("q_scalar_subquery",
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val sfx = viewSuffix(d)
      customer(s, d).createOrReplaceTempView(s"customer_$sfx")
      orders(s, d).createOrReplaceTempView(s"orders_$sfx")
      s.sql(
        s"""SELECT c_custkey,
           |  (SELECT count(*) FROM orders_$sfx WHERE o_custkey = c_custkey) AS n_orders
           |FROM customer_$sfx ORDER BY c_custkey""".stripMargin)
    },

    // Date arithmetic — shipping-delay distribution (datediff + bucketed
    // group-by; exact integer arithmetic on both engines).
    GraftQuery.of("q_date_arith",
      """SELECT CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS delay_days,
        |  count(*) AS cnt
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      lineitem(s, d).join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
          .as("delay_days"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("delay_days"))
    },

    // ------------------------------------------------------------------
    // TPC-H-style headline queries (bench workload).
    // ------------------------------------------------------------------

    // Pricing summary (TPC-H Q1 shape): one partial/final HashAggregate.
    GraftQuery.of("q1_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |${Money.sqlSumDollars("l_extendedprice")} AS sum_base_price,
        |${Money.sqlSumRevenue("l_extendedprice", "l_discount")} AS sum_disc_price,
        |count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      lineitem(s, d).groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          Money.sumDollars(col("l_extendedprice")).as("sum_base_price"),
          Money.sumRevenue(col("l_extendedprice"), col("l_discount"))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Revenue top-k (TPC-H Q3 shape): broadcast the filtered customer dim,
    // shuffle only on the groupBy key; TakeOrderedAndProject for the top 10.
    GraftQuery.of("q3_top_revenue",
      s"""SELECT o_orderkey,
        |  ${Money.sqlSumRevenue("l_extendedprice", "l_discount")} AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      val cust = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"))
        .agg(Money.sumRevenue(col("l_extendedprice"), col("l_discount"))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey")).limit(10)
    },

    // Local-supplier revenue (TPC-H Q5 shape): every dimension broadcast;
    // the fact table shuffles once, on the final groupBy key.
    GraftQuery.of("q5_region_revenue",
      s"""SELECT n_name,
        |  ${Money.sqlSumRevenue("l_extendedprice", "l_discount")} AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
      lineitem(s, d)
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d)),
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(Money.sumRevenue(col("l_extendedprice"), col("l_discount"))
          .as("revenue"))
        .orderBy(col("n_name"))
    },

    // Volume shipping between two nations (TPC-H Q7 shape): the fact table
    // probes FOUR broadcast dimensions (supplier, customer via orders, and
    // nation twice under different roles) before one groupBy on the tiny
    // (supp_nation, cust_nation, year) key — the classic snowflake where
    // the only data-sized shuffle is the final 3-column aggregation.
    // Nation filters are pushed INTO the broadcast builds, so the fact-side
    // hash probes discard non-qualifying rows without materializing the
    // full join row.
    GraftQuery.of("q7_volume_shipping",
      s"""SELECT supp_nation, cust_nation, l_year,
        |  CAST(sum(volume) AS BIGINT) / 10000.0 AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    year(l_shipdate) AS l_year,
        |    ${Money.sqlRevenueUnits("l_extendedprice", "l_discount")} AS volume
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
        |          AND n2.n_name IN ('NATION_5','NATION_6','NATION_7','NATION_8'))
        |      OR (n1.n_name IN ('NATION_5','NATION_6','NATION_7','NATION_8')
        |          AND n2.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4'))))
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, d) =>
      val groupA = Seq("NATION_1", "NATION_2", "NATION_3", "NATION_4")
      val groupB = Seq("NATION_5", "NATION_6", "NATION_7", "NATION_8")
      val both = groupA ++ groupB
      val n1 = nation(s, d).filter(col("n_name").isin(both: _*))
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = nation(s, d).filter(col("n_name").isin(both: _*))
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      lineitem(s, d)
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(
          (col("supp_nation").isin(groupA: _*) && col("cust_nation").isin(groupB: _*)) ||
            (col("supp_nation").isin(groupB: _*) && col("cust_nation").isin(groupA: _*)))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(Money.sumRevenue(col("l_extendedprice"), col("l_discount"))
          .as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },

    // Large-quantity orders (TPC-H Q18 shape): the "join against your own
    // aggregate" pattern — per-order quantity totals with a HAVING cut,
    // then the qualifying key set (small after the cut) joins back to
    // orders/customer. Both the aggregate and the join key on l_orderkey/
    // o_orderkey, so AQE can reuse the same hash partitioning; quantities
    // are integral doubles, so sum() is exact and needs no rounding.
    GraftQuery.of("q18_large_orders",
      """SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
        |  sum_qty
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN (
        |  SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(l_quantity) > 180) big ON o_orderkey = l_orderkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin) { (s, d) =>
      val big = lineitem(s, d).groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 180)
      orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(20)
    },

    // Window function — top order per customer, deterministic tie-break.
    GraftQuery.of("q_window_top_order",
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"))
    },

    // FULL OUTER join: customers without orders and orders with unknown
    // customers both survive; null-side counting is where outer-join
    // semantics actually bite.
    GraftQuery.of("q_full_outer",
      """SELECT
        |  count(*) AS n_rows,
        |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS customers_without_orders,
        |  CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS orders_without_customer
        |FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey""".stripMargin) { (s, d) =>
      customer(s, d).join(orders(s, d), col("c_custkey") === col("o_custkey"), "full_outer")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("o_orderkey").isNull, 1).otherwise(0)).cast("long")
            .as("customers_without_orders"),
          sum(when(col("c_custkey").isNull, 1).otherwise(0)).cast("long")
            .as("orders_without_customer"))
    },

    // Running/frame windows: cumulative sum, 3-row moving average, lag
    // delta, and quartile bucket per customer order history — the full
    // window-frame surface in one deterministic pass (unique (custkey,
    // orderkey) ordering).
    GraftQuery.of("q_window_running",
      s"""SELECT o_custkey, o_orderkey,
        |  CAST(sum(${Money.sqlCents("o_totalprice")}) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) / 100.0 AS running_total,
        |  round(CAST(sum(${Money.sqlCents("o_totalprice")}) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    / (100.0 * count(*) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)), 6)
        |    AS moving_avg3,
        |  round(coalesce(o_totalprice - lag(o_totalprice) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderkey), 0.0), 2) AS delta_prev,
        |  CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS BIGINT)
        |    AS quartile
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val byKey = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      val cum = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mv3 = byKey.rowsBetween(-2, Window.currentRow)
      // window sums ride exact integer cents: DuckDB evaluates windowed
      // sums with a segment tree (association order differs from Spark's
      // running accumulation), so a double sum here is the same
      // order-portability hazard as a grouped sum — integers are not.
      val centsTotal = Money.cents(col("o_totalprice"))
      orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        (sum(centsTotal).over(cum) / 100.0).as("running_total"),
        round(sum(centsTotal).over(mv3) /
          (lit(100.0) * count(lit(1)).over(mv3)), 6).as("moving_avg3"),
        round(coalesce(col("o_totalprice") - lag(col("o_totalprice"), 1).over(byKey),
          lit(0.0)), 2).as("delta_prev"),
        ntile(4).over(byKey).cast("long").as("quartile"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // Typed Aggregator UDAF (functions.udaf over an Aggregator[Long,
    // Moments, Moments]) — exact integer moments per group; Spark plans
    // the typed aggregator with the same partial/final split as a native
    // agg (ObjectHashAggregate), so the shuffle carries one 3-long buffer
    // per group per partition. Mean/variance derive from the emitted
    // integer sums without order-sensitive float accumulation.
    GraftQuery.of("q_typed_udaf",
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total,
        |  CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT)
        |    AS total_sq
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val m = udaf(graft.functions.IntMomentsAgg)
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(m(col("l_quantity").cast("long")).as("m"))
        .select(col("l_returnflag"), col("m.n").as("n"),
          col("m.total").as("total"), col("m.total_sq").as("total_sq"))
        .orderBy(col("l_returnflag"))
    },

    // RANGE-framed rolling window (value-based frame, not row-count):
    // per-user 1-hour trailing sum over event time. Distinct physical
    // frame processing from the ROWS queries above — the frame boundary
    // slides by the ORDER BY VALUE (epoch micros), and equal-time peers
    // are all included on both engines by RANGE semantics.
    GraftQuery.of("q_window_range_frame",
      s"""SELECT event_id, user_id,
        |  CAST(sum(${Money.sqlCents("\"value\"")}) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0
        |    AS rolling_1h
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600000000L, Window.currentRow)
      events(s, d).select(
        col("event_id"), col("user_id"),
        (sum(Money.cents(col("value"))).over(w) / 100.0).as("rolling_1h"))
        .orderBy(col("event_id"))
    })
}
