package graft.ops

import org.apache.spark.sql.functions._

import Tables._

/** The engine's SQL text surface: every native expression is reachable
  * from `spark.sql(...)` via [[graft.GraftExtensions]] (session-build
  * injection or live-session registration — these queries use the latter,
  * since the driver hands them an already-built session).
  */
object SqlSurface {

  private val rollingFoldSql = {
    val M = graft.functions.RollingHash61.Mod
    val B = graft.functions.RollingHash61.Base
    s"""CASE WHEN len(text) = 0 THEN 0 ELSE list_reduce(
       |    list_transform(range(1, len(text) + 1), i -> ord(substr(text, i, 1))::BIGINT),
       |    (a, b) -> ((a::HUGEINT * $B % $M + b) % $M)::BIGINT) END""".stripMargin
  }

  def queries: Seq[GraftQuery] = Seq(

    // Scalar native functions through SQL text: 60-bit md5 fingerprint and
    // the Rabin rolling hash, exactly as a SQL-only user would call them.
    GraftQuery.of("q_ext_sql_scalar",
      s"""SELECT doc_id,
         |  CAST(${GraftQuery.h60Sql("text")} AS BIGINT) AS fp64,
         |  $rollingFoldSql AS rolling_fp
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.GraftExtensions.register(s)
      val v = s"documents_ext_${viewSuffix(d)}"
      documents(s, d).createOrReplaceTempView(v)
      s.sql(s"""SELECT doc_id, md5hash60(text) AS fp64, rolling_hash61(text) AS rolling_fp
               |FROM $v ORDER BY doc_id""".stripMargin)
    },

    // Native cosine through SQL text over consecutive embedding pairs.
    GraftQuery.of("q_ext_sql_cosine",
      """SELECT a.vec_id,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
        |    AS cos_next
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |ORDER BY a.vec_id""".stripMargin) { (s, d) =>
      graft.GraftExtensions.register(s)
      val v = s"embeddings_ext_${viewSuffix(d)}"
      embeddings(s, d).createOrReplaceTempView(v)
      s.sql(s"""SELECT a.vec_id, round(cosine_sim(a.embedding, b.embedding), 6) AS cos_next
               |FROM $v a JOIN $v b ON b.vec_id = a.vec_id + 1
               |ORDER BY a.vec_id""".stripMargin)
    },

    // The Space-Saving sketch as a SQL aggregate; capacity (64) exceeds the
    // distinct count so counts are exact and errors 0 — the oracle is the
    // exact groupBy top-k.
    GraftQuery.of("q_ext_sql_topk",
      """SELECT event_type AS value, count(*) AS cnt, 0::BIGINT AS max_err
        |FROM events GROUP BY event_type
        |ORDER BY cnt DESC, value LIMIT 3""".stripMargin) { (s, d) =>
      graft.GraftExtensions.register(s)
      val v = s"events_ext_${viewSuffix(d)}"
      events(s, d).createOrReplaceTempView(v)
      s.sql(s"""SELECT x.value AS value, x.count AS cnt, x.error AS max_err
               |FROM (SELECT explode(space_saving_topk(event_type, 3, 64)) AS x
               |      FROM $v)
               |ORDER BY cnt DESC, value""".stripMargin)
    },

    // The native ngrams GENERATOR through SQL text — LATERAL VIEW over a
    // table-generating Catalyst expression (the third extension kind next
    // to the scalar and aggregate natives). One Generate node streams
    // token windows straight to rows; the oracle replays the window
    // arithmetic with list slicing.
    GraftQuery.of("q_ext_sql_ngrams",
      """SELECT doc_id, CAST(i AS INTEGER) AS pos,
        |  list_aggregate(toks[i:i+7], 'string_agg', ' ') AS gram
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |      FROM documents WHERE doc_id < 20),
        |  unnest(range(1, len(toks) - 6)) t(i)
        |WHERE len(toks) >= 8
        |ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
      graft.GraftExtensions.register(s)
      val v = s"documents_ng_${viewSuffix(d)}"
      documents(s, d).createOrReplaceTempView(v)
      s.sql(s"""SELECT doc_id, pos, gram
               |FROM $v LATERAL VIEW ngrams(text, 8) t AS pos, gram
               |WHERE doc_id < 20
               |ORDER BY doc_id, pos""".stripMargin)
    },

    // NOT IN over a NULLABLE subquery — three-valued logic means one NULL
    // in the list annihilates every row, so Spark must plan a null-aware
    // anti join (single-column NAAJ broadcasts the build side and
    // short-circuits on its null bit) rather than a plain LeftAnti. The
    // CASE makes the subquery column nullable in the schema while the
    // guard keeps actual NULLs out, so the result is non-vacuous AND the
    // NAAJ path is exercised; the SQL text goes through spark.sql exactly
    // as a user would write it.
    GraftQuery.of("q_null_aware_anti",
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_custkey NOT IN (
        |  SELECT CASE WHEN o_totalprice < 0.0 THEN NULL ELSE o_custkey END
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01')
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val cv = s"cust_naaj_${viewSuffix(d)}"
      val ov = s"ord_naaj_${viewSuffix(d)}"
      customer(s, d).createOrReplaceTempView(cv)
      orders(s, d).createOrReplaceTempView(ov)
      s.sql(s"""SELECT c_custkey, c_mktsegment FROM $cv
               |WHERE c_custkey NOT IN (
               |  SELECT CASE WHEN o_totalprice < 0.0 THEN NULL ELSE o_custkey END
               |  FROM $ov WHERE o_orderdate >= TIMESTAMP '2000-01-01')
               |ORDER BY c_custkey""".stripMargin)
    },

    // NULL-SAFE equi-join (`<=>` / IS NOT DISTINCT FROM) — the missing
    // third join-null semantics next to plain equality (nulls never
    // match) and NOT IN (null poisons everything): here the NULL GROUP
    // MATCHES the null group — the dimension-conformance shape where
    // "unknown" is a real category that must line up across tables
    // (unattributed revenue joining the unattributed-bucket budget row).
    // Both sides pre-aggregate to ≤50-row keyed frames (so the join null
    // semantics, not the volume, is what's under test); NULL ordering is
    // pinned explicitly (Spark's asc = NULLS FIRST; DuckDB defaults
    // NULLS LAST — the exact portability trap the explicit clause kills).
    GraftQuery.of("q_null_safe_join",
      """WITH l AS (SELECT CASE WHEN user_id % 50 = 0 THEN NULL
        |      ELSE user_id % 50 END AS k, count(*) AS l_n
        |    FROM events GROUP BY 1),
        |r AS (SELECT CASE WHEN c_custkey % 50 = 0 THEN NULL
        |      ELSE c_custkey % 50 END AS k, count(*) AS r_n
        |    FROM customer GROUP BY 1)
        |SELECT l.k, l.l_n, r.r_n
        |FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
        |ORDER BY l.k NULLS FIRST""".stripMargin) { (s, d) =>
      val l = events(s, d)
        .groupBy(when(col("user_id") % 50 === 0, lit(null).cast("long"))
          .otherwise(col("user_id") % 50).as("k"))
        .agg(count(lit(1)).as("l_n"))
      val r = customer(s, d)
        .groupBy(when(col("c_custkey") % 50 === 0, lit(null).cast("long"))
          .otherwise(col("c_custkey") % 50).as("k"))
        .agg(count(lit(1)).as("r_n"))
      l.join(r, l("k") <=> r("k"))
        .select(l("k"), col("l_n"), col("r_n"))
        .orderBy(l("k").asc_nulls_first)
    },

    // RECURSIVE CTE (Spark 4's WITH RECURSIVE) — the hierarchical walk
    // relational engines historically punted to application code: every
    // sampled part climbs its numeric-trie ancestry (parent = key div 10 —
    // the org-chart/BOM shape with a guaranteed-acyclic parent function),
    // emitting depth-to-root and the exact integer ancestor-chain sum.
    // The IDENTICAL SQL text runs on both engines (`//` vs `div` is the
    // one spelled difference) — the recursion is bounded by key digits
    // (≤7 levels), so the iterative union Spark plans underneath is
    // fixed-depth, the same envelope as the unrolled-CTE graph oracles.
    GraftQuery.of("q_recursive_cte",
      """WITH RECURSIVE anc AS (
        |  SELECT p_partkey AS node, p_partkey AS cur, 0 AS depth
        |  FROM part WHERE p_partkey % 97 = 0
        |  UNION ALL
        |  SELECT node, cur // 10, depth + 1 FROM anc WHERE cur > 0)
        |SELECT node, CAST(max(depth) AS BIGINT) AS depth_to_root,
        |  CAST(sum(cur) AS BIGINT) AS chain_sum
        |FROM anc GROUP BY 1 ORDER BY node""".stripMargin) { (s, d) =>
      val pv = s"part_rec_${viewSuffix(d)}"
      part(s, d).createOrReplaceTempView(pv)
      s.sql(s"""WITH RECURSIVE anc AS (
               |  SELECT p_partkey AS node, p_partkey AS cur, 0 AS depth
               |  FROM $pv WHERE p_partkey % 97 = 0
               |  UNION ALL
               |  SELECT node, cur div 10, depth + 1 FROM anc WHERE cur > 0)
               |SELECT node, CAST(max(depth) AS BIGINT) AS depth_to_root,
               |  CAST(sum(cur) AS BIGINT) AS chain_sum
               |FROM anc GROUP BY 1 ORDER BY node""".stripMargin)
    },

    // VARIANT semi-structured path (Spark 4's open-ended JSON type): the
    // props payload parses ONCE into a variant and typed accessors pull
    // fields — the modern replacement for schema-on-read from_json when
    // the shape is open-ended (new keys appear without a schema change;
    // a binary-encoded variant column in parquet also skips the per-read
    // reparse this query pays). The oracle reads the same field through
    // DuckDB's JSON accessor; all compared values are exact integers.
    GraftQuery.of("q_variant_props",
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(max(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k,
        |  CAST(sum(CASE WHEN CAST(props->>'k' AS BIGINT) % 2 = 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_even_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val k = expr("variant_get(parse_json(props), '$.k', 'bigint')")
      events(s, d)
        .select(col("event_type"), k.as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"),
          sum(when(col("k") % 2 === 0, 1L).otherwise(0L)).as("n_even_k"))
        .orderBy(col("event_type"))
    },

    // SQL-DEFINED scalar UDF (Spark 4's CREATE FUNCTION ... RETURN): the
    // business-logic tier analysts own — a price-band function lives in
    // the CATALOG as SQL text, not in a JVM jar, and the optimizer
    // INLINES its body (no black-box UDF barrier: the banding CASE
    // participates in codegen like any expression — the reason this
    // beats a Scala closure registered via udf()). The oracle inlines
    // the identical CASE by hand, proving the function call is pure
    // sugar. Function name is dataset-suffixed: catalog objects are
    // session-global, the temp-view discipline applies.
    GraftQuery.of("q_sql_udf",
      """WITH b AS (SELECT
        |    CAST(CASE WHEN CAST(round(l_extendedprice * 100) AS BIGINT) < 2000000 THEN 0
        |         WHEN CAST(round(l_extendedprice * 100) AS BIGINT) < 5000000 THEN 1
        |         ELSE 2 END AS BIGINT) AS band,
        |    l_quantity
        |  FROM lineitem)
        |SELECT band, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val fn = s"graft_priceband_${viewSuffix(d)}"
      val lv = s"li_sqludf_${viewSuffix(d)}"
      lineitem(s, d).createOrReplaceTempView(lv)
      s.sql(s"""CREATE OR REPLACE TEMPORARY FUNCTION $fn(cents BIGINT)
               |RETURNS BIGINT
               |RETURN CASE WHEN cents < 2000000 THEN 0
               |            WHEN cents < 5000000 THEN 1 ELSE 2 END""".stripMargin)
      s.sql(s"""SELECT $fn(CAST(round(l_extendedprice * 100) AS BIGINT)) AS band,
               |  CAST(count(*) AS BIGINT) AS n_items,
               |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
               |FROM $lv GROUP BY 1 ORDER BY 1""".stripMargin)
    },

    // IN-FLIGHT METRICS (`observe` + `Observation`): DQ counters ride
    // the SAME job as the real work — zero extra scans, the way Deequ
    // analyzers and production freshness/null monitors actually deploy
    // (a second counting pass over 100 TB is the anti-pattern). The
    // carrier job is a genuine aggregation (per-type event counts); the
    // observation taps its scan for rows / null props / distinct-ish
    // users and THOSE METRICS are the emitted result, so the API goes
    // through the oracle gate, not a README claim. `Observation.get`
    // blocks on the action's QueryExecutionListener — the carrier result
    // is materialized (and discarded) inside the query function.
    GraftQuery.of("q_observe_metrics",
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_null_props,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events""".stripMargin) { (s, d) =>
      import s.implicits._
      val obs = org.apache.spark.sql.Observation()
      val carrier = events(s, d)
        .observe(obs,
          count(lit(1)).as("n_rows"),
          sum(when(col("props").isNull, 1L).otherwise(0L)).as("n_null_props"),
          sum(expr("CAST(round(value * 100) AS BIGINT)")).as("sum_cents"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      carrier.collect() // the real job; the observation rides its scan
      val m = obs.get
      Seq((m("n_rows").asInstanceOf[Long], m("n_null_props").asInstanceOf[Long],
        m("sum_cents").asInstanceOf[Long]))
        .toDF("n_rows", "n_null_props", "sum_cents")
    })
}
