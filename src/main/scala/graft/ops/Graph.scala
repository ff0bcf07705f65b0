package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Tables._

/** Link-graph analytics — the web-graph side of a crawl-derived training
  * corpus (PageRank-weighted sampling, harvest prioritization, spam-farm
  * detection all start from exactly this shape).
  *
  * The graph here is the part co-purchase graph (parts sharing an order),
  * built with one equi-self-join keyed on the order — the generic
  * "co-occurrence within a container" constructor (doc↔doc via shared
  * host, page↔page via shared link work identically). Per-container edge
  * count is quadratic only in the CONTAINER's size (orders hold a handful
  * of lines), never in the corpus.
  *
  * PageRank is the textbook damped power iteration, expressed as the
  * standard two-shuffle-per-round Spark shape: join ranks to edges on the
  * source (contributions), aggregate on the destination (new rank). The
  * undirected edge set is symmetrized and materialized ONCE (checkpoint)
  * so iterations never re-run the edge construction; total mass is
  * conserved because every node of the symmetric graph has out-degree ≥ 1
  * (no dangling-mass redistribution term needed). Ranks are rounded to
  * 12 dp per iteration on both engines, so cross-engine float residue
  * cannot compound across rounds.
  */
object Graph {

  /** Undirected co-occurrence edges (src < dst) between values of `item`
    * sharing a `container` value: one distinct pass, one self-equi-join
    * keyed on the container, one distinct on the edge. At scale every
    * stage shuffles on a real key; a mega-container guard (same idea as
    * the LSH mega-bucket guard in [[Dedup.lshCandidatePairs]]) belongs in
    * front when container sizes are unbounded.
    */
  def coOccurrenceEdges(df: DataFrame, container: String, item: String): DataFrame = {
    val ci = df.select(col(container).as("__c"), col(item).as("__i")).distinct()
    ci.join(ci.withColumnRenamed("__i", "__j"), "__c")
      .filter(col("__i") < col("__j"))
      .select(col("__i").as("src"), col("__j").as("dst"))
      .distinct()
  }

  /** Damped PageRank over undirected (src, dst) edges; returns
    * (node, deg, pr_norm) where pr_norm = pr × N (≈1.0 for an
    * average-importance node — a size-independent magnitude, unlike raw
    * pr ~ 1/N). pr_norm is deliberately NOT rounded: after the 12 dp
    * per-iteration rounding both engines hold bit-identical doubles
    * (k·10⁻¹² converts to the same nearest double either way), so the
    * ×N product is bit-identical too — whereas re-rounding it to 6 dp
    * would park the 12 dp grid points exactly ON half-way boundaries,
    * where the engines' tie-breaks disagree (observed: 17/20000 rows
    * off by exactly 1e-6 at sf0.1).
    */
  /** Both directions of an undirected (src, dst) edge list — THE
    * symmetrization shared by every consumer ([[pagerank]], [[degrees]]),
    * so edge-contract changes cannot drift between them.
    */
  private def symmetrize(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))

  def pagerank(edges: DataFrame, iters: Int = 3, damping: Double = 0.85): DataFrame = {
    // ONE materialization of the edge pipeline; iterations re-scan it.
    // (Measured: pre-repartitioning on src before this checkpoint buys
    // nothing — the checkpointed frame comes back as a bare RDD scan
    // with no partitioning metadata, so the iteration join re-Exchanges
    // either way; on a real cluster the same layout-reuse would be done
    // by bucketing the edge table on src at rest.)
    val sym = symmetrize(edges).localCheckpoint(true)
    val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val n = broadcast(deg.agg(count(lit(1)).as("n")))
    var pr = deg.crossJoin(n)
      .select(col("node"), col("deg"), (lit(1.0) / col("n")).as("pr"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contrib = sym.join(pr.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("pr") / col("deg")).as("__mass"))
      // inner join is total: symmetry puts every node on some dst side.
      // Per-iteration checkpoint truncates the growing lineage (same
      // discipline as Dedup.clusters) — without it, evaluating iteration
      // k re-runs every earlier round's joins.
      // teleport is computed as (1.0 - damping) IN-ENGINE on both sides
      // (the oracle replays `1.0::DOUBLE - 0.85::DOUBLE`): a Scala-side
      // `lit(1.0 - damping)` would be 1 ulp off DuckDB's parse of the
      // decimal literal 0.15, breaking the bit-identical-doubles
      // invariant the unrounded pr_norm emission depends on.
      pr = deg.join(contrib, "node").crossJoin(n)
        .select(col("node"), col("deg"),
          round((lit(1.0) - lit(damping)) / col("n") + lit(damping) * col("__mass"), 12)
            .as("pr"))
        .localCheckpoint(true)
    }
    pr.crossJoin(n)
      .select(col("node"), col("deg"), (col("pr") * col("n")).as("pr_norm"))
  }

  /** Per-node degrees of the symmetrized graph — the profiling pass run
    * before any iterative graph algorithm (skew check: a power-law hub
    * says "salt or cap before you join").
    */
  def degrees(edges: DataFrame): DataFrame =
    symmetrize(edges)
      .groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))

  def queries: Seq[GraftQuery] = Seq(

    // Degree distribution of the co-purchase graph: the skew profile that
    // decides whether the iterative algorithms above need salting. Two
    // bounded aggregations (node degree, then histogram over degree).
    GraftQuery.of("graph_degree_hist",
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e1 AS (
        |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM li a JOIN li b USING (l_orderkey)
        |  WHERE a.l_partkey < b.l_partkey),
        |e AS (SELECT src, dst FROM e1 UNION ALL SELECT dst AS src, src AS dst FROM e1),
        |deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY 1)
        |SELECT CAST(deg AS BIGINT) AS deg, count(*) AS n_nodes
        |FROM deg GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      degrees(coOccurrenceEdges(lineitem(s, d), "l_orderkey", "l_partkey"))
        .groupBy(col("deg")).agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("deg"))
    },

    // 3-round damped PageRank over the part co-purchase graph, emitted
    // per-node so the oracle verifies every rank, not a summary. The
    // oracle unrolls the same three iterations as CTEs; both engines
    // round each iteration to 12 dp (same doubles on both sides), and
    // the final ×N product stays unrounded (see pagerank's Scaladoc).
    GraftQuery.of("graph_pagerank",
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e1 AS (
        |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM li a JOIN li b USING (l_orderkey)
        |  WHERE a.l_partkey < b.l_partkey),
        |e AS (SELECT src, dst FROM e1 UNION ALL SELECT dst AS src, src AS dst FROM e1),
        |deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
        |pr0 AS (
        |  SELECT node, deg, 1.0::DOUBLE / n.n AS pr FROM deg CROSS JOIN n),
        |pr1 AS (
        |  SELECT d.node, d.deg,
        |    round((1.0::DOUBLE - 0.85::DOUBLE) / n.n + 0.85::DOUBLE * sum(p.pr / p.deg), 12) AS pr
        |  FROM e JOIN pr0 p ON p.node = e.src JOIN deg d ON d.node = e.dst
        |  CROSS JOIN n GROUP BY d.node, d.deg, n.n),
        |pr2 AS (
        |  SELECT d.node, d.deg,
        |    round((1.0::DOUBLE - 0.85::DOUBLE) / n.n + 0.85::DOUBLE * sum(p.pr / p.deg), 12) AS pr
        |  FROM e JOIN pr1 p ON p.node = e.src JOIN deg d ON d.node = e.dst
        |  CROSS JOIN n GROUP BY d.node, d.deg, n.n),
        |pr3 AS (
        |  SELECT d.node, d.deg,
        |    round((1.0::DOUBLE - 0.85::DOUBLE) / n.n + 0.85::DOUBLE * sum(p.pr / p.deg), 12) AS pr
        |  FROM e JOIN pr2 p ON p.node = e.src JOIN deg d ON d.node = e.dst
        |  CROSS JOIN n GROUP BY d.node, d.deg, n.n)
        |SELECT node, CAST(deg AS BIGINT) AS deg, pr * n.n AS pr_norm
        |FROM pr3 CROSS JOIN n ORDER BY node""".stripMargin) { (s, d) =>
      pagerank(coOccurrenceEdges(lineitem(s, d), "l_orderkey", "l_partkey"))
        .orderBy(col("node"))
    })
}
