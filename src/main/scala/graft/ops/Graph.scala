package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * conserved up to quantization because every node of the symmetric graph
  * has out-degree ≥ 1 (no dangling-mass redistribution term needed). The
  * whole iteration runs in 1e-12-resolution FIXED-POINT (BIGINT) — see
  * [[pagerank]] — so every compared value is exact integer arithmetic and
  * no floating-point rounding tie can exist on either engine.
  */
object Graph {

  /** Undirected co-occurrence edges (src < dst) between values of `item`
    * sharing a `container` value: one distinct pass, one self-equi-join
    * keyed on the container, one distinct on the edge. At scale every
    * stage shuffles on a real key; a mega-container guard (same idea as
    * the LSH mega-bucket guard in [[Dedup.lshCandidatePairs]]) belongs in
    * front when container sizes are unbounded.
    */
  def coOccurrenceEdges(df: DataFrame, container: String, item: String): DataFrame =
    coOccurrenceEdgesWithSupport(df, container, item)
      .select(col("src"), col("dst"))

  /** [[coOccurrenceEdges]] carrying each pair's SUPPORT (the number of
    * containers where the pair co-occurs) — the market-basket count the
    * same self-join yields for free when the final distinct becomes a
    * groupBy; the edge artifact persists it so frequency-threshold
    * consumers (frequent-pairs mining) share the construction with the
    * topology consumers.
    */
  def coOccurrenceEdgesWithSupport(df: DataFrame, container: String,
      item: String): DataFrame = {
    val ci = df.select(col(container).as("__c"), col(item).as("__i")).distinct()
    ci.join(ci.withColumnRenamed("__i", "__j"), "__c")
      .filter(col("__i") < col("__j"))
      .groupBy(col("__i").as("src"), col("__j").as("dst"))
      .agg(count(lit(1)).as("support"))
  }

  /** Parquet paths of built edge artifacts, keyed by dataset dir — the
    * "built exactly once per (JVM, dataset)" latch behind [[edgeRelation]].
    */
  private val edgeArtifact = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The MATERIALIZED co-purchase edge relation: built ONCE per (JVM,
    * dataset dir) and persisted as parquet, then scanned by every
    * registered graph consumer. At 100 TB the edge list is a persisted
    * table maintained by the ingest pipeline — nine analytics queries do
    * NOT each re-run the distinct + self-join construction over the fact
    * table; they scan the artifact (the same standing-artifact shape as
    * `sim_index_incremental`'s LSH index and the K-family bucket tables).
    * The h60 p=1/8 Doulion sample flag is precomputed at build time
    * (one md5 per edge at rest, not one per edge per query), so sampled
    * consumers are a pushed-down `samp` filter over the same scan.
    *
    * Registered-query oracles are unaffected: DuckDB rebuilds the edge set
    * from the base tables inline, which is exactly the proof that the
    * artifact loses and invents nothing.
    */
  private[graft] def edgeRelation(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Md5Hash60.md5hash60
    val path = edgeArtifact.computeIfAbsent(d, _ => ArtifactBuilds.timed("graph_edges", d) {
      val out = processScratch(d, "graph_edges")
      coOccurrenceEdgesWithSupport(lineitem(s, d), "l_orderkey", "l_partkey")
        .withColumn("samp",
          pmod(md5hash60(concat_ws("|",
            col("src").cast("string"), col("dst").cast("string"))),
            lit(8L)) === 0)
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }

  /** Latch for [[preDeltaEdgeArtifact]] — parquet path per dataset dir. */
  private val edgePreArtifact = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The standing edge table BEFORE a delta batch lands: co-purchase
    * edges built from the containers with `l_orderkey mod 10 != 0` only,
    * persisted once per (JVM, dataset) — "yesterday's table" in the
    * incremental-refresh proof `graph_edges_incremental` runs. Carries
    * the same precomputed Doulion `samp` flag contract as
    * [[edgeRelation]].
    */
  private[graft] def preDeltaEdgeArtifact(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Md5Hash60.md5hash60
    val path = edgePreArtifact.computeIfAbsent(d, _ => ArtifactBuilds.timed("graph_edges_pre", d) {
      val out = processScratch(d, "graph_edges_pre")
      coOccurrenceEdgesWithSupport(
        lineitem(s, d).filter(pmod(col("l_orderkey"), lit(10L)) =!= 0),
        "l_orderkey", "l_partkey")
        .withColumn("samp",
          pmod(md5hash60(concat_ws("|",
            col("src").cast("string"), col("dst").cast("string"))),
            lit(8L)) === 0)
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }

  /** Incremental refresh of a standing co-occurrence edge table: the
    * delta batch's edges are built from the DELTA containers alone and
    * merged by a full-outer key join on (src, dst) with supports ADDED —
    * sound because support counts containers and the batches partition
    * the container space, so contributions are disjoint and additive.
    * Refresh cost is O(delta) edge construction + one edge-keyed merge
    * join — the existing FACT rows are never re-scanned (the
    * `sim_index_incremental`/D10 refresh discipline applied to the graph
    * artifact). The `samp` flag is a pure function of (src, dst), so
    * existing edges keep theirs and only NEW edges pay an md5
    * (`is_new` marks them for the proof summary).
    */
  def mergeEdgeDelta(standing: DataFrame, deltaFact: DataFrame,
      container: String, item: String): DataFrame = {
    import graft.functions.Md5Hash60.md5hash60
    val delta = coOccurrenceEdgesWithSupport(deltaFact, container, item)
    standing
      .select(col("src"), col("dst"),
        col("support").as("support_a"), col("samp").as("samp_a"))
      .join(delta.select(col("src"), col("dst"),
        col("support").as("support_b")), Seq("src", "dst"), "full_outer")
      .select(col("src"), col("dst"),
        (coalesce(col("support_a"), lit(0L)) +
          coalesce(col("support_b"), lit(0L))).as("support"),
        coalesce(col("samp_a"),
          pmod(md5hash60(concat_ws("|",
            col("src").cast("string"), col("dst").cast("string"))),
            lit(8L)) === 0).as("samp"),
        col("support_a").isNull.as("is_new"))
  }

  /** The h60 p=1/8 Doulion-sampled subgraph off the standing artifact —
    * a pushed-down flag filter, not a per-query md5 pass.
    */
  private def sampledEdges(s: SparkSession, d: String): DataFrame =
    edgeRelation(s, d).filter(col("samp")).select(col("src"), col("dst"))

  /** Bucket count for [[symEdgeRelation]], scaled to the edge artifact's
    * bytes (~8 MB of edge parquet per bucket, floor 8, cap 32 = local
    * core width; a cluster scales the cap with executors). Input-scaled
    * because bucket files gate SCAN parallelism one-to-one: 32 buckets
    * at sf0.1 made every per-iteration edge scan 32 near-empty scheduler
    * tasks (+~4 s across the family at the bench point), while sf10's
    * ~0.6 GB artifact wants all 32. The layout CONTRACT (hash-clustered
    * + per-bucket sorted on src) is what consumers depend on, never the
    * number — PlanSpec's zero-Exchange locks hold at any count.
    */
  private[graft] def symEdgeBuckets(artifactBytes: Long): Int =
    math.min(32L, math.max(8L, artifactBytes / (8L << 20))).toInt

  /** Latch for [[symEdgeRelation]] — catalog table name per dataset dir. */
  private val symEdgeTable = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The SYMMETRIZED edge relation AT REST in cluster layout: both
    * directions of every [[edgeRelation]] edge written ONCE per (JVM,
    * dataset) as a `bucketBy(n, "src").sortBy("src")` catalog table with
    * `n = symEdgeBuckets(artifactBytes)` (input-scaled 8–32, cap = local
    * core width) —
    * the proven R6 zero-Exchange mechanism
    * ([[ScaleOps.bucketedOrdersCustomer]]) applied where it pays most.
    * Every src-keyed graph consumer scans the buckets directly, so the
    * 2|E|-row edge list arrives hash-distributed (and bucket-sorted) on
    * src and is NEVER re-Exchanged or re-sorted inside an iteration
    * (PlanSpec-locked):
    *
    *  - the per-round rank⨝edges join in [[pagerankSym]]/[[trustRankSym]]
    *    — past the broadcast-rank rail this was a full shuffle + sort of
    *    the edge list EVERY round (the r13 verdict's one 100×-plan
    *    softness); now only the node-sized rank vector moves;
    *  - the neighbor-min in [[minLabelRoundsSym]], the induced-degree
    *    rounds in [[kcorePeelSym]], the frontier expansion in
    *    [[bfsDepthSym]];
    *  - the wedge self-equi-join on the shared apex in [[adamicAdarSym]]/
    *    [[commonNeighborsSym]] — BOTH sides are the same bucketed table,
    *    so the join consumes the buckets with no Exchange on either side;
    *  - every degree aggregate ([[degreesSym]]).
    *
    * The precomputed Doulion `samp` flag rides along; a filter on it
    * preserves the bucket distribution, so the p=1/8 sampled-subgraph
    * consumers share the SAME at-rest layout instead of paying their own.
    * The pre-write `repartition(N, src)` uses the same murmur3-pmod-N
    * function as the bucket spec, so each write task holds exactly one
    * bucket → one file per bucket → the per-bucket `sortBy` survives as a
    * scan ordering (multi-file buckets forfeit the sorted-scan property).
    * At 100 TB this is the ingest-maintained bucketed edge table; oracles
    * are unaffected (DuckDB rebuilds the edge set inline — the proof the
    * layout loses and invents nothing).
    */
  private[graft] def symEdgeRelation(s: SparkSession, d: String): DataFrame = {
    // trust the per-bucket sortBy at scan time: since 3.0 Spark drops a
    // bucketed table's sort order unless this conf lets planning list
    // the files (one per bucket here, so the listing is ≤32 stats) — with
    // it, the past-the-rail SMJ consumes the buckets pre-SORTED too, and
    // the only Sort in an iteration is the node-sized probe's. The set is
    // SESSION-WIDE and deliberate: the driver mains and
    // GraftExtensions.register pin it at session start so plan shapes are
    // order-independent; this call is the belt-and-braces for a bare
    // consumer session touching the artifact first (idempotent, and it
    // only ever ENABLES an optimization every graft bucketed artifact is
    // written to satisfy — one file per bucket).
    s.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    val name = symEdgeTable.computeIfAbsent(d, _ => ArtifactBuilds.timed("graph_symedges", d) {
      // per-process unique name: Verify alongside Bench on one SF must
      // not overwrite each other's live bucket files (the R6 rule)
      val t = s"graft_bk_symedges_${viewSuffix(d)}_" +
        java.lang.ProcessHandle.current().pid()
      reapDeadSymEdgeTrees(s)
      ScaleOps.dropTableAndDir(s, t)
      val e = edgeRelation(s, d).select(col("src"), col("dst"), col("samp"))
      val buckets = symEdgeBuckets(leafFileBytes(edgeArtifact.get(d)))
      e.unionByName(e.select(col("dst").as("src"), col("src").as("dst"), col("samp")))
        .repartition(buckets, col("src"))
        .write.mode("overwrite")
        .bucketBy(buckets, "src").sortBy("src")
        .saveAsTable(t)
      t
    })
    s.table(name)
  }

  /** Reap DEAD processes' symmetric edge trees (both layouts share the
    * `graft_bk_symedges_` prefix): per-PID names never repeat, so
    * without this every past JVM leaves a GB-scale table in the
    * warehouse forever (only dirs whose trailing pid is not alive are
    * touched — a concurrent live session's buckets are safe). Each reap
    * is best-effort — a concurrent JVM's reaper may win the race on any
    * path, which is success, not failure.
    */
  private def reapDeadSymEdgeTrees(s: SparkSession): Unit =
    Option(ScaleOps.warehouseRoot(s).listFiles()).foreach(_
      .filter(f => f.isDirectory && f.getName.startsWith("graft_bk_symedges_"))
      .foreach { f =>
        val pid = f.getName.substring(f.getName.lastIndexOf('_') + 1)
        val dead = pid.toLongOption.exists(p =>
          !java.lang.ProcessHandle.of(p).map[Boolean](_.isAlive).orElse(false))
        // Age fallback covers PID REUSE only — the pid is alive but
        // belongs to a process that STARTED AFTER this table was built
        // (the builder can't start after its own artifact), so the
        // builder is gone and the table is orphaned. A live builder's
        // own long run must never trip it: a legitimate >6 h sweep
        // (sf100 trajectory) started BEFORE the build, so the start-
        // instant comparison keeps its table. Unknown start instants
        // conservatively keep the table; a dir whose trailing segment is
        // NOT a parseable pid can't ever be claimed by a live builder, so
        // age alone reaps it (forall).
        val stale =
          System.currentTimeMillis() - f.lastModified() > 6L * 3600 * 1000 &&
            pid.toLongOption.forall(p =>
              java.lang.ProcessHandle.of(p).map[Boolean](h =>
                h.info().startInstant().map[Boolean](si =>
                  si.toEpochMilli > f.lastModified()).orElse(false))
                .orElse(true))
        if (dead || stale)
          try ScaleOps.dropTableAndDir(s, f.getName)
          catch { case scala.util.control.NonFatal(_) => () }
      })

  /** Latch for [[symEdgeDstRelation]] — catalog table name per dataset dir. */
  private val symEdgeDstTable = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The DST-BUCKETED TWIN of [[symEdgeRelation]]: the SAME symmetric
    * relation (both directions + the Doulion `samp` flag) laid out
    * `bucketBy(n, "dst").sortBy("dst")`. Production graph stores keep the
    * edge list clustered BOTH ways because the two halves of a
    * bulk-synchronous iteration want opposite layouts: joins and degree
    * aggregates key on src (the src buckets serve them Exchange-free),
    * while the per-round CONTRIBUTION AGGREGATE keys on dst — over the
    * src layout its partial aggregates pay one Exchange EVERY round,
    * over this twin the within-broadcast-rail plan is scan →
    * broadcast-hash join → partial+final HashAggregate with ZERO
    * Exchange (PlanSpec-locked; measured 2.1× per iteration at the 100×
    * SF, tools/DstProbe). Past the rail the sort-merge join needs the
    * src-sorted buckets, so consumers fall back to [[symEdgeRelation]]
    * there ([[contribJoin]] picks per regime). Built once per (JVM,
    * dataset) from the standing edge artifact; at 100 TB both layouts
    * are ingest-maintained tables.
    */
  private[graft] def symEdgeDstRelation(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    val name = symEdgeDstTable.computeIfAbsent(d, _ => ArtifactBuilds.timed("graph_symedges_dst", d) {
      val t = s"graft_bk_symedges_dst_${viewSuffix(d)}_" +
        java.lang.ProcessHandle.current().pid()
      reapDeadSymEdgeTrees(s)
      ScaleOps.dropTableAndDir(s, t)
      val e = edgeRelation(s, d).select(col("src"), col("dst"), col("samp"))
      val buckets = symEdgeBuckets(leafFileBytes(edgeArtifact.get(d)))
      e.unionByName(e.select(col("dst").as("src"), col("src").as("dst"), col("samp")))
        .repartition(buckets, col("dst"))
        .write.mode("overwrite")
        .bucketBy(buckets, "dst").sortBy("dst")
        .saveAsTable(t)
      t
    })
    s.table(name)
  }

  /** Symmetrized FULL graph off the at-rest bucketed artifact. */
  private def symFull(s: SparkSession, d: String): DataFrame =
    symEdgeRelation(s, d).select(col("src"), col("dst"))

  /** Symmetrized h60 p=1/8 SAMPLED subgraph off the same artifact — the
    * filter preserves the bucket distribution and ordering.
    */
  private def symSampled(s: SparkSession, d: String): DataFrame =
    symEdgeRelation(s, d).filter(col("samp")).select(col("src"), col("dst"))

  /** FULL graph off the dst-bucketed twin ([[symEdgeDstRelation]]). */
  private def symDstFull(s: SparkSession, d: String): DataFrame =
    symEdgeDstRelation(s, d).select(col("src"), col("dst"))

  /** SAMPLED subgraph off the dst-bucketed twin — the flag filter
    * preserves the dst bucket distribution exactly as on the src side.
    */
  private def symDstSampled(s: SparkSession, d: String): DataFrame =
    symEdgeDstRelation(s, d).filter(col("samp")).select(col("src"), col("dst"))

  /** Both directions of an undirected (src, dst) edge list — THE
    * symmetrization shared by every consumer ([[pagerank]], [[degrees]]),
    * so edge-contract changes cannot drift between them.
    */
  private def symmetrize(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))

  /** Fixed-point scale for [[pagerank]]: ranks are BIGINTs counting units
    * of 1e-12 of total mass.
    */
  val PrScale = 1000000000000L

  /** Node-count ceiling for broadcasting the per-iteration rank vector in
    * [[pagerank]]: 4M nodes ≈ a 100 MB (src, mass) broadcast — cheap
    * against re-sorting a multi-hundred-million-row edge list every
    * iteration, and far under Spark's 8 GB broadcast cap. Billion-node
    * graphs exceed it and keep the shuffle join.
    */
  val BroadcastRankNodes = 4000000L

  /** Call-time read so tools/PrAB can A/B the two iteration join
    * strategies inside one JVM (set to -1 to force the shuffle join).
    */
  private def broadcastRankLimit: Long =
    sys.props.get("graft.pagerank.broadcastNodes").map(_.toLong)
      .getOrElse(BroadcastRankNodes)

  /** THE power-iteration contribution join — one definition shared by
    * [[pagerankSym]] and [[trustRankSym]] (and shape-locked by PlanSpec):
    * per-source mass `(src, __m)` joins the symmetrized edge list on src
    * and sums per destination. Within the broadcast-rank rail the
    * node-sized mass frame broadcasts — and when the caller supplies the
    * dst-bucketed twin (`symDst`), the scan side is THAT layout, so the
    * per-destination sum aggregates bucket-locally and the round runs
    * with ZERO Exchange (the broadcast join imposes no distribution
    * requirement on the scan side). Past the rail the join falls back to
    * sort-merge, which needs the src-sorted buckets: the src-layout
    * `sym` contributes its side pre-distributed and pre-sorted — the
    * edge list is never Exchanged in either regime.
    */
  private[graft] def contribJoin(sym: DataFrame, outMass: DataFrame,
      nNodes: Long, symDst: => Option[DataFrame] = None): DataFrame = {
    val inRail = nNodes <= broadcastRankLimit
    val probe = if (inRail) broadcast(outMass) else outMass
    // `symDst` is BY-NAME: past the rail it is never forced, so a
    // past-rail run never triggers the twin's one-time build for a
    // layout no plan will scan (repeat in-rail forcings hit the latch)
    val scan = if (inRail) symDst.getOrElse(sym) else sym
    scan.join(probe, "src")
      .groupBy(col("dst").as("node"))
      .agg(sum(col("__m")).as("__mass"))
  }

  /** Damped PageRank over undirected (src, dst) edges in 1e-12-resolution
    * fixed point: rank is a BIGINT count of [[PrScale]]ths of total mass,
    * per-edge contributions are integer division `pr_fix div deg`, and the
    * damping step is `(85 · mass) div 100` (damping is quantized to a 1/100
    * grid). Every intermediate is an integer, so the result is independent
    * of summation order — earlier DOUBLE formulations (12 dp per-iteration
    * rounding) were only probabilistically engine-portable: a partial sum
    * landing within an ulp of a decimal half-boundary rounds to different
    * grid points under Spark's vs the oracle's aggregation order.
    * Quantization cost: each contribution floors away < 1e-12, so a node's
    * per-iteration rank deficit is < in-degree × 1e-12 — far below any
    * analytical use and, unlike FP residue, deterministic.
    *
    * Returns (node, deg, pr_norm_e12, pr_norm): pr_norm_e12 = pr_fix × N
    * exactly (≈ PrScale for an average-importance node), and pr_norm =
    * that as DOUBLE / 1e12 (≈ 1.0) — one IEEE division of identical
    * integer operands, hence still bit-identical across engines.
    * BIGINT headroom: pr_fix ≤ PrScale, so pr_norm_e12 ≤ PrScale × N —
    * exact up to N ~ 9·10⁶ nodes; beyond that emit pr_fix unscaled.
    */
  /** Damping-grid validation shared by the pagerank/trustrank entries —
    * hoisted into the WRAPPERS too, so an invalid damping fails before
    * the (eager, 2|E|-row) symmetrize checkpoint is paid.
    */
  private def dampNumOf(damping: Double): Int = {
    val dampNum = math.round(damping * 100).toInt
    require(dampNum > 0 && dampNum < 100,
      s"damping must be on (0,1) in 1/100 steps, got $damping")
    dampNum
  }

  def pagerank(edges: DataFrame, iters: Int = 3, damping: Double = 0.85): DataFrame = {
    dampNumOf(damping)
    // ONE materialization of the edge pipeline; iterations re-scan it.
    // (Measured: pre-repartitioning on src before this checkpoint buys
    // nothing — the checkpointed frame comes back as a bare RDD scan
    // with no partitioning metadata, so the iteration join re-Exchanges
    // either way; the layout-reuse answer is [[pagerankSym]] over the
    // at-rest bucketed [[symEdgeRelation]], which the registered query
    // uses.)
    pagerankSym(symmetrize(edges).localCheckpoint(true), iters, damping)
  }

  /** [[pagerank]] over an ALREADY-SYMMETRIZED edge list — the entry the
    * at-rest bucketed artifact ([[symEdgeRelation]]) feeds: when `sym`
    * scans a table bucketed on src, NO plan in the loop Exchanges or
    * sorts the edge list — within the broadcast-rank rail the edge side
    * of the iteration join streams through a broadcast-hash join exactly
    * as before, and PAST the rail the sort-merge join consumes the
    * buckets directly (only the node-sized rank vector shuffles). `sym`
    * must contain BOTH directions of every undirected edge.
    */
  def pagerankSym(sym: DataFrame, iters: Int = 3, damping: Double = 0.85,
      symDst: => Option[DataFrame] = None): DataFrame = {
    val dampNum = dampNumOf(damping)
    val teleportNum = PrScale / 100 * (100 - dampNum) // exact: PrScale % 100 == 0
    val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val nNodes = deg.count()
    val n = broadcast(deg.agg(count(lit(1)).as("n")))
    var pr = deg.crossJoin(n)
      .select(col("node"), col("deg"), expr(s"${PrScale}L div n").as("pr_fix"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      // `div` (IntegralDivide) and DuckDB's `//` both truncate; all
      // operands here are non-negative, so truncation == floor on both.
      // Per-edge contribution = pr_fix div deg of the SOURCE node — the
      // same value for every edge out of that node, so it is computed
      // once per node here and the per-dst integer sum is unchanged.
      val outMass = pr.select(col("node").as("src"),
        expr("pr_fix div deg").as("__m"))
      // Rank vectors up to [[BroadcastRankNodes]] ride a broadcast-hash
      // join, so the 2|E|-row symmetric edge list is never sorted or
      // re-shuffled inside the loop (each iteration had been a full
      // sort-merge of the edge list against a node-sized frame — the
      // measured 100x-point cost was ~2-3x over linear from exactly
      // those per-iteration edge sorts + spills). Past the guard the
      // sort-merge join returns, but over the bucketed at-rest
      // [[symEdgeRelation]] its edge side consumes the src buckets
      // directly — pre-distributed AND pre-sorted — so only the
      // node-sized rank vector is Exchanged (PlanSpec-locked); the
      // billion-node regime costs one node-frame shuffle per round,
      // never an edge-list shuffle.
      val contrib = contribJoin(sym, outMass, nNodes, symDst)
      // inner join is total: symmetry puts every node on some dst side.
      // Per-iteration checkpoint truncates the growing lineage (same
      // discipline as Dedup.clusters) — without it, evaluating iteration
      // k re-runs every earlier round's joins.
      pr = deg.join(contrib, "node").crossJoin(n)
        .select(col("node"), col("deg"),
          (expr(s"${teleportNum}L div n") + expr(s"($dampNum * __mass) div 100"))
            .as("pr_fix"))
        .localCheckpoint(true)
    }
    pr.crossJoin(n)
      .select(col("node"), col("deg"),
        (col("pr_fix") * col("n")).as("pr_norm_e12"),
        ((col("pr_fix") * col("n")).cast("double") / lit(1.0e12)).as("pr_norm"))
  }

  /** Doulion-sparsified, degree-oriented triangle count — the two classic
    * scale techniques composed (Tsourakakis et al., KDD'09 edge sparsification;
    * Schank–Wagner degree orientation):
    *
    *  1. keep each undirected edge iff h60(src|dst) ≡ 0 (mod invProb) —
    *     deterministic hash sampling, so both engines see the SAME
    *     subgraph and the count is exactly reproducible (no RNG); each
    *     triangle survives with probability p³, so count · invProb³ is
    *     the unbiased Doulion estimate of the full-graph count;
    *  2. orient every surviving edge from the endpoint with the lower
    *     (degree, node) key to the higher — out-degrees are then bounded
    *     by O(√m), so the wedge join (the quadratic step) is
    *     sum-of-outdeg² instead of sum-of-deg², the difference between
    *     feasible and explosive on power-law graphs.
    *
    * Shapes: degree attach is a broadcast join (deg is |nodes| rows);
    * wedge generation is ONE equi-join on the shared apex u; closure is
    * ONE equi-join on the wedge's (v, w) against the oriented edge set.
    * The orientation key packs as deg·2⁴⁰ + node (lexicographic order ==
    * numeric order while node < 2⁴⁰ — true for any key space this engine
    * addresses; beyond that, compare structs).
    *
    * Returns one row: (n_edges_sampled, n_tri_sampled, est_total).
    */
  def triangles(edges: DataFrame, invProb: Int): DataFrame = {
    import graft.functions.Md5Hash60.md5hash60
    trianglesSampled(edges.filter(
      pmod(md5hash60(concat_ws("|", col("src").cast("string"), col("dst").cast("string"))),
        lit(invProb.toLong)) === 0), invProb)
  }

  /** [[triangles]] over an ALREADY-sampled edge set (the standing-artifact
    * path: [[edgeRelation]] precomputes the h60 sample flag at build time,
    * so the registered query never re-hashes edges). `invProb` is only the
    * estimate's bias correction here — the caller owns the sampling.
    */
  def trianglesSampled(sampledEdges: DataFrame, invProb: Int): DataFrame = {
    val sampled = sampledEdges
      .localCheckpoint(true) // pinned: consumed by deg, wedge, and closure
    val deg = sampled.select(col("src").as("n"))
      .union(sampled.select(col("dst").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    val Pack = 1L << 40
    val keyed = sampled
      .join(broadcast(deg.select(col("n").as("src"), col("deg").as("sdeg"))), "src")
      .join(broadcast(deg.select(col("n").as("dst"), col("deg").as("ddeg"))), "dst")
      .select(col("src"), col("dst"),
        (col("sdeg") * Pack + col("src")).as("skey"),
        (col("ddeg") * Pack + col("dst")).as("dkey"))
    val oriented = keyed.select(
      when(col("skey") < col("dkey"), col("src")).otherwise(col("dst")).as("u"),
      when(col("skey") < col("dkey"), col("dst")).otherwise(col("src")).as("v"),
      greatest(col("skey"), col("dkey")).as("vkey"))
      .localCheckpoint(true)
    val wedges = oriented.as("a")
      .join(oriented.as("b"), col("a.u") === col("b.u"))
      .filter(col("a.vkey") < col("b.vkey"))
      .select(col("a.v").as("x"), col("b.v").as("y"))
    val tri = wedges
      .join(oriented, col("x") === col("u") && col("y") === col("v"), "left_semi")
      .agg(count(lit(1)).as("n_tri_sampled"))
    val nEdges = broadcast(sampled.agg(count(lit(1)).as("n_edges_sampled")))
    tri.crossJoin(nEdges)
      .select(col("n_edges_sampled"), col("n_tri_sampled"),
        (col("n_tri_sampled") * lit(invProb.toLong * invProb * invProb)).as("est_total"))
  }

  /** Per-node degrees of the symmetrized graph — the profiling pass run
    * before any iterative graph algorithm (skew check: a power-law hub
    * says "salt or cap before you join").
    */
  def degrees(edges: DataFrame): DataFrame =
    degreesSym(symmetrize(edges))

  /** [[degrees]] over an already-symmetrized edge list — off the bucketed
    * artifact the aggregate consumes the src buckets with zero Exchange.
    */
  def degreesSym(sym: DataFrame): DataFrame =
    sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))

  /** TrustRank (Gyöngyi et al., VLDB'04): PageRank with the teleport mass
    * restricted to a trusted SEED set — rank becomes "random-walk
    * proximity to trust", the classic crawl-corpus spam/quality signal (a
    * page unreachable from any trusted page converges to rank 0). Same
    * two-shuffle-per-round shape and the same 1e-12 FIXED-POINT integer
    * discipline as [[pagerank]] (all compared values are
    * summation-order-independent BIGINTs): init mass/|seeds| on seeds and
    * 0 elsewhere, per round each node gets damped in-neighbor
    * contributions plus — seeds only — teleport/|seeds|. Non-seed sinks
    * leak teleport mass by design (trust decays away from seeds; total
    * mass is NOT conserved, unlike pagerank).
    */
  def trustRank(edges: DataFrame, seeds: DataFrame, iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    dampNumOf(damping) // fail before the eager symmetrize checkpoint
    trustRankSym(symmetrize(edges).localCheckpoint(true), seeds, iters, damping)
  }

  /** [[trustRank]] over an already-symmetrized edge list — the at-rest
    * bucketed entry ([[pagerankSym]]'s contract: `sym` carries both
    * directions; bucketed on src ⇒ the edge list never re-Exchanges
    * inside the loop).
    */
  def trustRankSym(sym: DataFrame, seeds: DataFrame, iters: Int = 3,
      damping: Double = 0.85, symDst: => Option[DataFrame] = None): DataFrame = {
    val dampNum = dampNumOf(damping)
    val teleportNum = PrScale / 100 * (100 - dampNum)
    // |seeds| crosses to the driver as one bounded scalar (codebook
    // discipline) so the per-round plan carries it as a LITERAL — the
    // first cut crossJoined a 1-row count frame and left-joined the seed
    // set EVERY round, doubling each round's stage count (measured
    // 7.8 s → ~3 s at sf0.1). The per-node teleport is loop-INVARIANT,
    // so it is folded into the degree frame once.
    val seedSet = broadcast(seeds.select(col("node")).distinct()
      .withColumn("__seed", lit(1)))
    val nSeeds = math.max(1L,
      seeds.select(col("node")).distinct().count())
    val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .join(seedSet, Seq("node"), "left")
      .select(col("node"), col("deg"), col("__seed").isNotNull.as("is_seed"),
        when(col("__seed").isNotNull, lit(teleportNum / nSeeds))
          .otherwise(lit(0L)).as("teleport_fix"))
      .localCheckpoint(true)
    var tr = deg.select(col("node"), col("deg"),
      when(col("is_seed"), lit(PrScale / nSeeds)).otherwise(lit(0L)).as("tr_fix"))
      .localCheckpoint(true)
    val nNodes = deg.count()
    for (_ <- 1 to iters) {
      // same broadcast-rank iteration as [[pagerank]]: the per-source
      // mass is one value per node, so broadcasting the node-sized
      // (src, __m) frame keeps the 2|E| edge list un-sorted in the loop
      val outMass = tr.select(col("node").as("src"),
        expr("tr_fix div deg").as("__m"))
      val contrib = contribJoin(sym, outMass, nNodes, symDst)
      tr = deg.join(contrib, "node")
        .select(col("node"), col("deg"),
          (col("teleport_fix") + expr(s"($dampNum * __mass) div 100")).as("tr_fix"))
        .localCheckpoint(true)
    }
    tr.join(deg.select(col("node"), col("is_seed")), "node")
      .select(col("node"), col("deg"), col("tr_fix"), col("is_seed"))
  }

  /** `rounds` rounds of k-core peeling over undirected (src, dst) edges:
    * each round SIMULTANEOUSLY drops every node whose degree in the
    * current induced subgraph is < k, the standard bulk-synchronous
    * k-core schedule (Montresor et al.'s distributed formulation — one
    * degree-count shuffle per round, exactly [[pagerank]]'s iteration
    * discipline with per-round lineage checkpoints). Returns the
    * per-round survivor counts (round, n_nodes), round 0 = all nodes —
    * the "how fast does the periphery melt" curve, which is the signal a
    * corpus-graph curator reads (a deep slow melt = broad fringe; an
    * instant fixpoint = hard core).
    *
    * FIXED round count, not run-to-fixpoint: the oracle must unroll the
    * same computation, so convergence is a property the caller reads off
    * the curve (equal consecutive counts), not a stopping rule inside
    * the operator. Peeling is monotone (node sets only shrink), so extra
    * rounds past the fixpoint are exact no-ops.
    */
  def kcorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame =
    kcorePeelSym(symmetrize(edges).localCheckpoint(true), k, rounds)

  /** [[kcorePeel]] over an already-symmetrized edge list (bucketed-at-rest
    * entry). Join order is src-first on purpose: the bucketed scan feeds
    * the src join Exchange-free, and the closing groupBy(src) rides the
    * same bucket distribution. The two node-set probes are node-sized, so
    * WITHIN the broadcast rail they broadcast explicitly and each round
    * plans with ZERO Exchange (a 2M-node survivor set is past the default
    * auto-broadcast threshold, so without the explicit hint each round
    * paid TWO edge-frame Exchanges: out to the dst join's distribution
    * and back for the src aggregate). Past the rail the equi-join path
    * returns — the src side still consumes the buckets directly.
    */
  def kcorePeelSym(sym: DataFrame, k: Int, rounds: Int): DataFrame = {
    var nodes = sym.select(col("src").as("node")).distinct().localCheckpoint(true)
    val inRail = nodes.count() <= broadcastRankLimit
    def probe(c: String) = {
      val p = nodes.withColumnRenamed("node", c)
      if (inRail) broadcast(p) else p
    }
    val perRound = scala.collection.mutable.ArrayBuffer(
      nodes.agg(count(lit(1)).as("n_nodes"))
        .select(lit(0L).as("round"), col("n_nodes")))
    for (r <- 1 to rounds) {
      nodes = sym
        .join(probe("src"), "src")
        .join(probe("dst"), "dst")
        .groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("node"))
        .localCheckpoint(true)
      perRound += nodes.agg(count(lit(1)).as("n_nodes"))
        .select(lit(r.toLong).as("round"), col("n_nodes"))
    }
    // 7 one-row aggregates over checkpointed frames — the curve stays
    // in-plan (no driver collect)
    perRound.reduce(_ unionByName _).orderBy(col("round"))
  }

  /** Common-neighbor / Jaccard link prediction over undirected (src, dst)
    * edges: for every node pair sharing ≥ 1 neighbor, the count of common
    * neighbors, the neighborhood-union size (|N(x)| + |N(y)| − common),
    * and whether the pair is already an edge — the classic "predict the
    * missing link" primitive (collaborative filtering, related-document
    * suggestion). Emitted as exact INTEGER numerator/denominator, never
    * the float ratio, so the comparison is order-independent.
    *
    * Shapes: ONE wedge self-equi-join on the shared apex — cost is
    * sum-of-deg², so profile with [[degrees]] first: on a power-law
    * graph cap/salt the hub apexes; on a uniformly DENSE graph (the
    * co-purchase graph: mean degree ~120 at sf0.1, no hub/non-hub
    * split to cut) sample edges deterministically first, which divides
    * the wedge count by 1/p² (the registered query does, at p = 1/8 —
    * measured 298M → 4.6M wedges). TakeOrderedAndProject top-k cut on
    * the total order (common DESC, x, y) directly over the pair
    * aggregate; degree attach (broadcast, |nodes| rows) and the
    * existing-edge flag (broadcast semi-join reduction of the edge set,
    * then a LEFT equi-join) run on the ≤k cut rows only.
    */
  def commonNeighbors(edges: DataFrame, k: Int): DataFrame =
    commonNeighborsSym(symmetrize(edges).localCheckpoint(true), edges, k)

  /** [[commonNeighbors]] split into the symmetrized wedge input and the
    * oriented (src < dst) edge set for the is_edge flag — the bucketed-
    * at-rest entry: the wedge self-equi-join on the shared apex consumes
    * the SAME bucketed table on both sides, zero Exchange either side.
    */
  def commonNeighborsSym(sym: DataFrame, edges: DataFrame, k: Int): DataFrame = {
    val wedges = sym.as("a")
      .join(sym.as("b"), col("a.src") === col("b.src"))
      .filter(col("a.dst") < col("b.dst"))
    // Top-k cut FIRST: the cut's total order (common_cnt DESC, x, y) is a
    // function of the aggregate alone, so the deg + is_edge attach runs on
    // the k survivors, never the ~Σdeg² pair frame. Attaching first cost a
    // full extra pass over ~10⁸ aggregated pairs at the 100× SF — the
    // is_edge LEFT join re-shuffled the whole pair frame against the edge
    // set (the one non-noise constant in graph_common_neighbors's four
    // recorded r15 passes, 36-42 s, vs 20.7 for the attach-free
    // adamic-adar twin over the same wedges). Eager-checkpoint the ≤k-row
    // cut so the two consumers below reuse it instead of re-running the
    // wedge aggregation per branch.
    val top = wedges
      .groupBy(col("a.dst").as("x"), col("b.dst").as("y"))
      .agg(count(lit(1)).as("common_cnt"))
      .orderBy(col("common_cnt").desc, col("x"), col("y")).limit(k)
      .localCheckpoint(true)
    val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    // The edge set is DATA-PROPORTIONAL — never broadcast it. Reduce it to
    // the ≤k hit rows with a broadcast semi-join on the cut, then attach
    // the flag with a tiny left join.
    val hits = edges.select(col("src"), col("dst"))
      .join(broadcast(top.select(col("x"), col("y"))),
        col("src") === col("x") && col("dst") === col("y"), "left_semi")
      .select(col("src"), col("dst"), lit(true).as("__e"))
    top
      .join(broadcast(deg.select(col("node").as("x"), col("deg").as("deg_x"))), "x")
      .join(broadcast(deg.select(col("node").as("y"), col("deg").as("deg_y"))), "y")
      .join(hits, col("x") === col("src") && col("y") === col("dst"), "left")
      .select(col("x"), col("y"), col("common_cnt"),
        (col("deg_x") + col("deg_y") - col("common_cnt")).as("union_cnt"),
        coalesce(col("__e"), lit(false)).as("is_edge"))
      .orderBy(col("common_cnt").desc, col("x"), col("y"))
  }

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
      degreesSym(symFull(s, d))
        .groupBy(col("deg")).agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("deg"))
    },

    // Doulion-sparsified degree-oriented triangle count on the co-purchase
    // graph (see triangles): deterministic h60 edge sampling at p = 1/8,
    // so the oracle reconstructs the identical subgraph and the exact
    // sampled count + the ·8³ unbiased estimate are both hash-compared.
    GraftQuery.of("graph_triangles", {
      val h = GraftQuery.h60Sql("src::VARCHAR || '|' || dst::VARCHAR")
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |e1 AS (
         |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
         |  FROM li a JOIN li b USING (l_orderkey)
         |  WHERE a.l_partkey < b.l_partkey),
         |samp AS (SELECT src, dst FROM e1 WHERE $h % 8 = 0),
         |deg AS (SELECT n, count(*) AS deg FROM (
         |    SELECT src AS n FROM samp UNION ALL SELECT dst AS n FROM samp)
         |  GROUP BY 1),
         |o AS (
         |  SELECT CASE WHEN skey < dkey THEN src ELSE dst END AS u,
         |    CASE WHEN skey < dkey THEN dst ELSE src END AS v,
         |    greatest(skey, dkey) AS vkey
         |  FROM (
         |    SELECT s.src, s.dst,
         |      ds.deg * 1099511627776 + s.src AS skey,
         |      dd.deg * 1099511627776 + s.dst AS dkey
         |    FROM samp s JOIN deg ds ON ds.n = s.src JOIN deg dd ON dd.n = s.dst)),
         |w AS (
         |  SELECT a.v AS x, b.v AS y FROM o a JOIN o b ON a.u = b.u
         |  WHERE a.vkey < b.vkey),
         |t AS (
         |  SELECT count(*) AS n_tri FROM w
         |  WHERE EXISTS (SELECT 1 FROM o WHERE o.u = w.x AND o.v = w.y))
         |SELECT (SELECT CAST(count(*) AS BIGINT) FROM samp) AS n_edges_sampled,
         |  CAST(t.n_tri AS BIGINT) AS n_tri_sampled,
         |  CAST(t.n_tri * 512 AS BIGINT) AS est_total
         |FROM t""".stripMargin
    }) { (s, d) =>
      trianglesSampled(sampledEdges(s, d), invProb = 8)
    },

    // Common-neighbor / Jaccard link prediction on the DETERMINISTICALLY
    // SAMPLED co-purchase graph (see commonNeighbors): the co-purchase
    // graph is uniformly dense (sf0.1: 20k nodes, mean degree ~120, max
    // 222 — no hub/non-hub split for a degree cap to exploit), so the
    // wedge join over the full graph is Σdeg² ≈ 3·10⁸ rows. The scale
    // tool for a dense graph is Doulion-style edge sampling — the SAME
    // h60 p=1/8 idiom as graph_triangles, so both engines see the
    // identical subgraph and wedges drop by p² = 64×. Sampled common
    // counts are unbiased up to ·1/p² (each shared neighbor survives
    // with p²); counts, union sizes, and the edge flag all refer to the
    // sampled subgraph and are exact integers under the total-order
    // top-20 cut.
    GraftQuery.of("graph_common_neighbors", {
      val h = GraftQuery.h60Sql("src::VARCHAR || '|' || dst::VARCHAR")
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |e0 AS (
         |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
         |  FROM li a JOIN li b USING (l_orderkey)
         |  WHERE a.l_partkey < b.l_partkey),
         |e1 AS (SELECT src, dst FROM e0 WHERE $h % 8 = 0),
         |e AS (SELECT src, dst FROM e1 UNION ALL SELECT dst AS src, src AS dst FROM e1),
         |w AS (
         |  SELECT a.dst AS x, b.dst AS y, count(*) AS common_cnt
         |  FROM e a JOIN e b ON a.src = b.src
         |  WHERE a.dst < b.dst GROUP BY 1, 2),
         |deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY 1)
         |SELECT w.x, w.y, common_cnt,
         |  dx.deg + dy.deg - common_cnt AS union_cnt,
         |  EXISTS (SELECT 1 FROM e1 WHERE e1.src = w.x AND e1.dst = w.y) AS is_edge
         |FROM w JOIN deg dx ON dx.node = w.x JOIN deg dy ON dy.node = w.y
         |ORDER BY common_cnt DESC, w.x, w.y LIMIT 20""".stripMargin
    }) { (s, d) =>
      commonNeighborsSym(symSampled(s, d), sampledEdges(s, d), 20)
    },

    // 3-round damped PageRank over the part co-purchase graph, emitted
    // per-node so the oracle verifies every rank, not a summary. The
    // oracle unrolls the same three FIXED-POINT iterations as CTEs —
    // every compared value is integer arithmetic (BIGINT // BIGINT on
    // non-negative operands == Spark's `div`), so there is no
    // summation-order or rounding-tie hazard; pr_norm is one IEEE
    // division of identical integer operands (see pagerank's Scaladoc).
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
        |  SELECT node, deg, 1000000000000 // n.n AS pr_fix FROM deg CROSS JOIN n),
        |pr1 AS (
        |  SELECT d.node, d.deg,
        |    150000000000 // n.n + (85 * CAST(sum(p.pr_fix // p.deg) AS BIGINT)) // 100 AS pr_fix
        |  FROM e JOIN pr0 p ON p.node = e.src JOIN deg d ON d.node = e.dst
        |  CROSS JOIN n GROUP BY d.node, d.deg, n.n),
        |pr2 AS (
        |  SELECT d.node, d.deg,
        |    150000000000 // n.n + (85 * CAST(sum(p.pr_fix // p.deg) AS BIGINT)) // 100 AS pr_fix
        |  FROM e JOIN pr1 p ON p.node = e.src JOIN deg d ON d.node = e.dst
        |  CROSS JOIN n GROUP BY d.node, d.deg, n.n),
        |pr3 AS (
        |  SELECT d.node, d.deg,
        |    150000000000 // n.n + (85 * CAST(sum(p.pr_fix // p.deg) AS BIGINT)) // 100 AS pr_fix
        |  FROM e JOIN pr2 p ON p.node = e.src JOIN deg d ON d.node = e.dst
        |  CROSS JOIN n GROUP BY d.node, d.deg, n.n)
        |SELECT node, CAST(deg AS BIGINT) AS deg,
        |  CAST(pr_fix * n.n AS BIGINT) AS pr_norm_e12,
        |  CAST(pr_fix * n.n AS DOUBLE) / 1e12 AS pr_norm
        |FROM pr3 CROSS JOIN n ORDER BY node""".stripMargin) { (s, d) =>
      pagerankSym(symFull(s, d), symDst = Some(symDstFull(s, d)))
        .orderBy(col("node"))
    },

    // 6 rounds of 8-core peeling on the DETERMINISTICALLY SAMPLED
    // co-purchase graph (the same h60 p=1/8 subgraph as graph_triangles /
    // graph_common_neighbors, so the oracle reconstructs it exactly).
    // The oracle unrolls the same 6 induced-degree rounds as CTEs; all
    // compared values are integer node counts. On this graph the curve
    // reaches its fixpoint by round ~4 at sf0.01/0.1 and is still
    // melting at sf0.001 — both regimes are the point of the curve.
    GraftQuery.of("graph_kcore", {
      val h = GraftQuery.h60Sql("src::VARCHAR || '|' || dst::VARCHAR")
      // AS MATERIALIZED is load-bearing: each round references the
      // previous round TWICE, and DuckDB inlines plain CTEs — without
      // materialization the edge build replays 2^rounds times (observed:
      // >10 min at sf0.1 vs 0.8 s materialized).
      val roundCtes = (1 to 6).map { r =>
        s"""n$r AS MATERIALIZED (
           |  SELECT e.src AS node FROM e
           |  JOIN n${r - 1} a ON e.src = a.node
           |  JOIN n${r - 1} b ON e.dst = b.node
           |  GROUP BY 1 HAVING count(*) >= 8)""".stripMargin
      }.mkString(",\n")
      val selects = (0 to 6).map(r =>
        s"SELECT $r AS round, CAST(count(*) AS BIGINT) AS n_nodes FROM n$r")
        .mkString("\nUNION ALL ")
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |e1 AS (
         |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
         |  FROM li a JOIN li b USING (l_orderkey)
         |  WHERE a.l_partkey < b.l_partkey),
         |samp AS MATERIALIZED (SELECT src, dst FROM e1 WHERE $h % 8 = 0),
         |e AS MATERIALIZED (SELECT src, dst FROM samp UNION ALL SELECT dst, src FROM samp),
         |n0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
         |$roundCtes
         |SELECT CAST(round AS BIGINT) AS round, n_nodes FROM (
         |$selects
         |) ORDER BY round""".stripMargin
    }) { (s, d) =>
      kcorePeelSym(symSampled(s, d), k = 8, rounds = 6)
    },

    // 3-round TrustRank on the sampled co-purchase graph, seeds = the
    // deterministic ~5% of nodes with h60(node) ≡ 0 (mod 20) — both
    // engines derive the identical seed set, so every rank is
    // hash-compared (the same per-node discipline as graph_pagerank, and
    // the same integer fixed point: no float exists anywhere in the
    // iteration). Oracle unrolls the three seed-conditional rounds as
    // MATERIALIZED CTEs.
    GraftQuery.of("graph_trustrank", {
      val h = GraftQuery.h60Sql("src::VARCHAR || '|' || dst::VARCHAR")
      val hs = GraftQuery.h60Sql("node::VARCHAR")
      val roundCtes = (1 to 3).map { r =>
        s"""tr$r AS MATERIALIZED (
           |  SELECT d.node, d.deg,
           |    CASE WHEN s.node IS NOT NULL THEN 150000000000 // ns.ns ELSE 0 END
           |      + (85 * CAST(sum(p.tr_fix // p.deg) AS BIGINT)) // 100 AS tr_fix
           |  FROM e JOIN tr${r - 1} p ON p.node = e.src JOIN deg d ON d.node = e.dst
           |  LEFT JOIN seeds s ON s.node = d.node CROSS JOIN ns
           |  GROUP BY d.node, d.deg, s.node, ns.ns)""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |e1 AS (
         |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
         |  FROM li a JOIN li b USING (l_orderkey)
         |  WHERE a.l_partkey < b.l_partkey),
         |samp AS MATERIALIZED (SELECT src, dst FROM e1 WHERE $h % 8 = 0),
         |e AS MATERIALIZED (SELECT src, dst FROM samp UNION ALL SELECT dst, src FROM samp),
         |deg AS MATERIALIZED (SELECT src AS node, count(*) AS deg FROM e GROUP BY 1),
         |seeds AS MATERIALIZED (SELECT node FROM deg WHERE $hs % 20 = 0),
         |ns AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM seeds),
         |tr0 AS MATERIALIZED (
         |  SELECT d.node, d.deg,
         |    CASE WHEN s.node IS NOT NULL THEN 1000000000000 // ns.ns ELSE 0 END AS tr_fix
         |  FROM deg d LEFT JOIN seeds s USING (node) CROSS JOIN ns),
         |$roundCtes
         |SELECT t.node, CAST(t.deg AS BIGINT) AS deg,
         |  CAST(t.tr_fix AS BIGINT) AS tr_fix,
         |  s.node IS NOT NULL AS is_seed
         |FROM tr3 t LEFT JOIN seeds s USING (node)
         |ORDER BY t.node""".stripMargin
    }) { (s, d) =>
      import graft.functions.Md5Hash60.md5hash60
      val sym = symSampled(s, d)
      val seeds = degreesSym(sym)
        .filter(pmod(md5hash60(col("node").cast("string")), lit(20L)) === 0)
        .select(col("node"))
      trustRankSym(sym, seeds, symDst = Some(symDstSampled(s, d)))
        .orderBy(col("node"))
    },

    // Multi-source BFS depth (bounded reachability) from the trustrank
    // seed set on the sampled co-purchase graph — the crawl-frontier /
    // taint-propagation primitive ("everything within 3 hops of a spam
    // seed"): per round, the frontier joins the edge list once and a
    // LEFT ANTI against the settled set keeps first-visit (= minimum)
    // depth. 3 rounds = 3 bounded (join + anti-join) passes with
    // per-round lineage truncation (the pagerank discipline); at 100 TB
    // each pass shuffles on the node key and the settled frame grows
    // monotonically — the standard iterative-BFS shape (Pregel's
    // message round as two equi-joins). The oracle unrolls the same
    // three frontier expansions as MATERIALIZED CTEs.
    GraftQuery.of("graph_bfs_depth", {
      val h = GraftQuery.h60Sql("src::VARCHAR || '|' || dst::VARCHAR")
      val hs = GraftQuery.h60Sql("node::VARCHAR")
      val roundCtes = (1 to 3).map { r =>
        s"""d$r AS MATERIALIZED (
           |  SELECT node, depth FROM d${r - 1}
           |  UNION ALL
           |  SELECT f.node, $r AS depth FROM (
           |    SELECT DISTINCT e.dst AS node
           |    FROM e JOIN d${r - 1} p ON p.node = e.src AND p.depth = ${r - 1}) f
           |  ANTI JOIN d${r - 1} s ON f.node = s.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |e1 AS (
         |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
         |  FROM li a JOIN li b USING (l_orderkey)
         |  WHERE a.l_partkey < b.l_partkey),
         |samp AS MATERIALIZED (SELECT src, dst FROM e1 WHERE $h % 8 = 0),
         |e AS MATERIALIZED (SELECT src, dst FROM samp UNION ALL SELECT dst, src FROM samp),
         |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
         |d0 AS MATERIALIZED (
         |  SELECT node, 0 AS depth FROM nodes WHERE $hs % 20 = 0),
         |$roundCtes
         |SELECT node, CAST(depth AS BIGINT) AS depth
         |FROM d3 ORDER BY node""".stripMargin
    }) { (s, d) =>
      import graft.functions.Md5Hash60.md5hash60
      val sym = symSampled(s, d)
      val deg = degreesSym(sym).localCheckpoint(true)
      val seeds = deg
        .filter(pmod(md5hash60(col("node").cast("string")), lit(20L)) === 0)
        .select(col("node"))
      bfsDepthSym(sym, seeds, rounds = 3,
        symDst = Some(symDstSampled(s, d)), nNodes = deg.count())
    },

    // DEGREE ASSORTATIVITY components — "do hubs link to hubs?" (crawl
    // graphs are typically disassortative; a sudden shift flags link
    // farms): the Pearson degree-degree correlation over edges, emitted
    // as its EXACT INTEGER sufficient statistics (m, Σ du·dv, Σ(du+dv),
    // Σ(du²+dv²)) — the consumer assembles r = (m·Σdudv − (Σ(du+dv)/2)²·…)
    // from four integers, the estimator-precedent split that keeps every
    // compared value hash-exact. One degree aggregate + two node-keyed
    // equi-joins of the edge list against it — never all-pairs; same
    // sampled subgraph as the other G-family entries so the oracle
    // reconstructs it verbatim.
    GraftQuery.of("graph_assortativity", {
      val h = GraftQuery.h60Sql("src::VARCHAR || '|' || dst::VARCHAR")
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |e1 AS (
         |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
         |  FROM li a JOIN li b USING (l_orderkey)
         |  WHERE a.l_partkey < b.l_partkey),
         |samp AS MATERIALIZED (SELECT src, dst FROM e1 WHERE $h % 8 = 0),
         |e AS (SELECT src, dst FROM samp UNION ALL SELECT dst, src FROM samp),
         |deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY 1)
         |SELECT CAST(count(*) AS BIGINT) AS m,
         |  CAST(sum(da.deg * db.deg) AS BIGINT) AS s_prod,
         |  CAST(sum(da.deg + db.deg) AS BIGINT) AS s_sum,
         |  CAST(sum(da.deg * da.deg + db.deg * db.deg) AS BIGINT) AS s_sq
         |FROM samp s
         |JOIN deg da ON da.node = s.src
         |JOIN deg db ON db.node = s.dst""".stripMargin
    }) { (s, d) =>
      // the standing artifact IS the materialization: the degree aggregate
      // and both final joins each re-scan cheap pushed-down parquet, not
      // the distinct self-join construction
      val sampled = sampledEdges(s, d)
      val deg = degrees(sampled).select(col("node"), col("deg"))
      sampled
        .join(deg.select(col("node").as("src"), col("deg").as("da")), "src")
        .join(deg.select(col("node").as("dst"), col("deg").as("db")), "dst")
        .agg(count(lit(1)).as("m"),
          sum(col("da") * col("db")).as("s_prod"),
          sum(col("da") + col("db")).as("s_sum"),
          sum(col("da") * col("da") + col("db") * col("db")).as("s_sq"))
    },

    // Adamic–Adar link prediction — the degree-weighted upgrade of
    // graph_common_neighbors: a shared neighbor predicts a link in
    // inverse proportion to how promiscuous it is, so each wedge center
    // w contributes weight 1/log(deg w) instead of 1. The weight is the
    // repo's INTEGER floor-log2 surrogate (text_lm_bigram_score's
    // `length(bin(deg))-1` — no float log on either engine):
    // w_milli = 1e6 div flog2(deg), summed per candidate pair as exact
    // BIGINT milli-units. A wedge center has ≥2 distinct neighbors by
    // construction (a.dst < b.dst), so flog2 ≥ 1 — no zero divisor.
    // Same h60 p=1/8 sampled subgraph and wedge equi-join as the G6
    // family (candidates = wedges, never all-pairs); the per-center
    // weight joins the symmetrized edge list BEFORE the wedge join so
    // the aggregation stays one map-side-combinable shuffle. Top-20
    // under the (aa_milli DESC, x, y) total order — tie-deterministic.
    GraftQuery.of("graph_adamic_adar", {
      val h = GraftQuery.h60Sql("src::VARCHAR || '|' || dst::VARCHAR")
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |e1 AS (
         |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
         |  FROM li a JOIN li b USING (l_orderkey)
         |  WHERE a.l_partkey < b.l_partkey),
         |samp AS MATERIALIZED (SELECT src, dst FROM e1 WHERE $h % 8 = 0),
         |e AS MATERIALIZED (
         |  SELECT src, dst FROM samp UNION ALL SELECT dst, src FROM samp),
         |wdeg AS (SELECT src AS node,
         |    CAST(1000000 // (length(bin(count(*))) - 1) AS BIGINT) AS w_milli
         |  FROM e GROUP BY 1 HAVING count(*) >= 2),
         |w AS (
         |  SELECT a.dst AS x, b.dst AS y, CAST(count(*) AS BIGINT) AS common_cnt,
         |    CAST(sum(wd.w_milli) AS BIGINT) AS aa_milli
         |  FROM e a JOIN e b ON a.src = b.src JOIN wdeg wd ON wd.node = a.src
         |  WHERE a.dst < b.dst GROUP BY 1, 2)
         |SELECT x, y, common_cnt, aa_milli FROM w
         |ORDER BY aa_milli DESC, x, y LIMIT 20""".stripMargin
    }) { (s, d) =>
      adamicAdarSym(symSampled(s, d), 20)
    },

    // 4 rounds of Pregel-schedule connected-components min-label
    // propagation on the sampled co-purchase graph (see minLabelRounds):
    // every per-node label after round 4 is hash-compared — the oracle
    // unrolls the same four neighbor-min + self-least rounds as
    // MATERIALIZED CTEs (the kcore discipline: fixed rounds, identical
    // trace; convergence is a property read off the result, not a
    // stopping rule). Consumes the standing edge artifact like the rest
    // of the G family.
    GraftQuery.of("graph_cc_labels", {
      val h = GraftQuery.h60Sql("src::VARCHAR || '|' || dst::VARCHAR")
      val roundCtes = (1 to 4).map { r =>
        s"""l$r AS MATERIALIZED (
           |  SELECT a.node, least(a.label, coalesce(m.nl, a.label)) AS label
           |  FROM l${r - 1} a LEFT JOIN (
           |    SELECT e.dst AS node, min(p.label) AS nl
           |    FROM e JOIN l${r - 1} p ON p.node = e.src GROUP BY 1) m
           |  USING (node))""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |e1 AS (
         |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
         |  FROM li a JOIN li b USING (l_orderkey)
         |  WHERE a.l_partkey < b.l_partkey),
         |samp AS MATERIALIZED (SELECT src, dst FROM e1 WHERE $h % 8 = 0),
         |e AS MATERIALIZED (SELECT src, dst FROM samp UNION ALL SELECT dst, src FROM samp),
         |l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM e),
         |$roundCtes
         |SELECT node, CAST(label AS BIGINT) AS label
         |FROM l4 ORDER BY node""".stripMargin
    }) { (s, d) =>
      minLabelRoundsSym(symSampled(s, d), rounds = 4,
        symDst = Some(symDstSampled(s, d))).orderBy(col("node"))
    },

    // FREQUENT-PAIRS market-basket mining (the A-Priori 2-itemset pass):
    // top-20 co-purchased part pairs by SUPPORT (number of shared
    // orders — persisted on the edge artifact, so the candidate pass is
    // the same one build every graph consumer shares), with lift emitted
    // as its EXACT INTEGER numerator/denominator (support·n_orders vs
    // cnt_a·cnt_b — the estimator-precedent split: the consumer divides,
    // the hash gate never sees a float). Per-item frequencies attach as
    // broadcast dimension joins; the cut is the (support DESC, src, dst)
    // total order via TakeOrderedAndProject. At 100 TB: support counting
    // is container-quadratic only (the co-occurrence guarantee), item
    // counts one map-side-combined aggregate.
    GraftQuery.of("graph_frequent_pairs",
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*) AS support
        |  FROM li a JOIN li b USING (l_orderkey)
        |  WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2),
        |ic AS (SELECT l_partkey, count(*) AS cnt FROM li GROUP BY 1),
        |n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM li)
        |SELECT src, dst, CAST(support AS BIGINT) AS support,
        |  CAST(ca.cnt AS BIGINT) AS cnt_a, CAST(cb.cnt AS BIGINT) AS cnt_b,
        |  CAST(support * n.n_orders AS BIGINT) AS lift_num,
        |  CAST(ca.cnt * cb.cnt AS BIGINT) AS lift_den
        |FROM e
        |JOIN ic ca ON ca.l_partkey = e.src
        |JOIN ic cb ON cb.l_partkey = e.dst
        |CROSS JOIN n
        |ORDER BY support DESC, src, dst LIMIT 20""".stripMargin) { (s, d) =>
      val li = lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val itemCnt = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
      val nOrders = broadcast(
        li.select(col("l_orderkey")).distinct().agg(count(lit(1)).as("n_orders")))
      edgeRelation(s, d).select(col("src"), col("dst"), col("support"))
        .join(broadcast(itemCnt
          .select(col("l_partkey").as("src"), col("cnt").as("cnt_a"))), "src")
        .join(broadcast(itemCnt
          .select(col("l_partkey").as("dst"), col("cnt").as("cnt_b"))), "dst")
        .crossJoin(nOrders)
        .select(col("src"), col("dst"), col("support"),
          col("cnt_a"), col("cnt_b"),
          (col("support") * col("n_orders")).as("lift_num"),
          (col("cnt_a") * col("cnt_b")).as("lift_den"))
        .orderBy(col("support").desc, col("src"), col("dst")).limit(20)
    },

    // INCREMENTAL maintenance of the standing edge artifact (r9 — the
    // G11 artifact's refresh shape, executed and proven): the standing
    // table holds edges from containers with orderkey % 10 != 0
    // (persisted parquet, [[preDeltaEdgeArtifact]]); the delta batch is
    // the remaining 10% of containers; [[mergeEdgeDelta]] builds the
    // delta's edges ALONE and merges by one (src, dst)-keyed full-outer
    // join with supports added — additive because the batches partition
    // the container space. The emitted row is the lossless-refresh
    // proof in O(1) output: edge count, total support and an
    // order-independent bit_xor checksum over (src, dst, support) of the
    // MERGED relation, which the oracle computes over a REBUILD FROM
    // SCRATCH of the full fact table — equality says the O(delta)
    // refresh produced row-for-row what the full rebuild would (the K6
    // table-checksum idiom as a refresh gate). n_new_edges counts edges
    // born in the delta; n_sampled pins the samp-flag contract across
    // the merge.
    GraftQuery.of("graph_edges_incremental", {
      val exor = GraftQuery.h60Sql(
        "e.src::VARCHAR || '|' || e.dst::VARCHAR || '|' || e.support::VARCHAR")
      val samp = GraftQuery.h60Sql("e.src::VARCHAR || '|' || e.dst::VARCHAR")
      s"""WITH ci AS (SELECT DISTINCT l_orderkey AS c, l_partkey AS i FROM lineitem),
         |e AS (SELECT a.i AS src, b.i AS dst, count(*) AS support
         |  FROM ci a JOIN ci b ON a.c = b.c WHERE a.i < b.i GROUP BY 1, 2),
         |eo AS (SELECT a.i AS src, b.i AS dst
         |  FROM ci a JOIN ci b ON a.c = b.c
         |  WHERE a.i < b.i AND a.c % 10 != 0 GROUP BY 1, 2)
         |SELECT CAST(count(*) AS BIGINT) AS n_edges,
         |  CAST(sum(e.support) AS BIGINT) AS total_support,
         |  CAST(sum(CASE WHEN eo.src IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_new_edges,
         |  CAST(sum(CASE WHEN ($samp) % 8 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_sampled,
         |  CAST(bit_xor($exor) AS BIGINT) AS edge_xor
         |FROM e LEFT JOIN eo ON e.src = eo.src AND e.dst = eo.dst""".stripMargin
    }) { (s, d) =>
      import graft.functions.Md5Hash60.md5hash60
      val merged = mergeEdgeDelta(
        preDeltaEdgeArtifact(s, d),
        lineitem(s, d).filter(pmod(col("l_orderkey"), lit(10L)) === 0),
        "l_orderkey", "l_partkey")
      merged.agg(
        count(lit(1)).as("n_edges"),
        sum(col("support")).cast("long").as("total_support"),
        count(when(col("is_new"), 1)).as("n_new_edges"),
        count(when(col("samp"), 1)).as("n_sampled"),
        bit_xor(md5hash60(concat_ws("|",
          col("src"), col("dst"), col("support")))).as("edge_xor"))
    })

  /** Adamic–Adar-weighted common-neighbor scores over undirected (src,
    * dst) edges, top `k` under the (aa_milli DESC, x, y) total order.
    * Weight of a wedge center = 1e6 div floor-log2(degree) in exact
    * integer milli-units — see the registered `graph_adamic_adar`
    * Scaladoc for the surrogate rationale and scale shape.
    */
  def adamicAdar(edges: DataFrame, k: Int): DataFrame =
    adamicAdarSym(symmetrize(edges).localCheckpoint(true), k)

  /** [[adamicAdar]] over an already-symmetrized edge list — bucketed-at-
    * rest entry (same zero-Exchange wedge self-join as
    * [[commonNeighborsSym]]).
    */
  def adamicAdarSym(sym: DataFrame, k: Int): DataFrame = {
    // deg-1 nodes can never center a wedge, and ANSI mode evaluates the
    // weight for every aggregated row — filter BEFORE the flog2 divide
    // (flog2(1) = 0) rather than guard it; also shrinks the broadcast
    val wdeg = sym.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg")).filter(col("deg") >= 2)
      .select(col("node"),
        expr("CAST(1000000 div (length(bin(deg)) - 1) AS BIGINT)").as("w_milli"))
    sym.as("a")
      .join(sym.as("b"), col("a.src") === col("b.src"))
      .filter(col("a.dst") < col("b.dst"))
      .join(broadcast(wdeg), col("a.src") === col("node"))
      .groupBy(col("a.dst").as("x"), col("b.dst").as("y"))
      .agg(count(lit(1)).as("common_cnt"), sum(col("w_milli")).as("aa_milli"))
      .orderBy(col("aa_milli").desc, col("x"), col("y")).limit(k)
  }

  /** `rounds` rounds of bulk-synchronous min-label propagation over
    * undirected (src, dst) edges — the Pregel connected-components
    * schedule (each node adopts the minimum label among itself and its
    * neighbors) with a FIXED round count so the oracle unrolls the
    * IDENTICAL computation ([[kcorePeel]]'s discipline). After R rounds
    * label(v) = min node id within R hops — monotonically convergent
    * toward the component minimum, and a meaningful locality summary at
    * any R (dedup's [[Dedup.clusters]] runs the same recursion TO
    * FIXPOINT with pointer jumping; the fixed-round form is the one
    * whose trace both engines can replay row-exactly). One
    * neighbor-min shuffle + one node-keyed left join per round, lineage
    * truncated per round.
    */
  def minLabelRounds(edges: DataFrame, rounds: Int): DataFrame =
    minLabelRoundsSym(symmetrize(edges).localCheckpoint(true), rounds)

  /** [[minLabelRounds]] over an already-symmetrized edge list (bucketed-
    * at-rest entry: the per-round label⨝edges join consumes the src
    * buckets Exchange-free; only node-sized label frames move). The
    * neighbor-min is [[contribJoin]]'s shape (join on src, aggregate on
    * dst), so it takes the same dst-bucketed twin under the same
    * broadcast rail: within the rail the label frame broadcasts and the
    * per-dst min aggregates bucket-locally with zero Exchange.
    */
  def minLabelRoundsSym(sym: DataFrame, rounds: Int,
      symDst: => Option[DataFrame] = None): DataFrame = {
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint(true)
    // rail check BEFORE forcing the by-name twin: past the rail its
    // one-time build must never run (no plan would scan it)
    lazy val dstTwin = symDst
    val inRail = labels.count() <= broadcastRankLimit && dstTwin.isDefined
    for (_ <- 1 to rounds) {
      val probe = labels.withColumnRenamed("node", "src")
        .withColumnRenamed("label", "plabel")
      val nmin = (if (inRail) dstTwin.get.join(broadcast(probe), "src")
                  else sym.join(probe, "src"))
        .groupBy(col("dst").as("node")).agg(min(col("plabel")).as("nl"))
      labels = labels.join(nmin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
        .localCheckpoint(true)
    }
    labels
  }

  /** Minimum-depth multi-source BFS, capped at `rounds` hops: settled =
    * (node, first-visit depth); each round expands the previous frontier
    * through the symmetrized edge list and anti-joins the settled set so
    * only unvisited nodes enter at depth r. Lineage is truncated per
    * round ([[pagerank]]'s discipline) — the settled frame is the only
    * state, and it grows monotonically toward the reachable set.
    */
  def bfsDepth(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame =
    bfsDepthSym(symmetrize(edges).localCheckpoint(true), seeds, rounds)

  /** [[bfsDepth]] over an already-symmetrized edge list (bucketed-at-rest
    * entry: each frontier expansion consumes the src buckets
    * Exchange-free; only the node-sized frontier/settled frames move).
    * With the dst-bucketed twin (`symDst`) and a rail-bounded node count,
    * the whole round is Exchange-free: the frontier broadcasts into the
    * dst-layout scan, the `distinct` on the reached dsts aggregates
    * bucket-locally, and the settled anti-join broadcasts its node-sized
    * right side.
    */
  def bfsDepthSym(sym: DataFrame, seeds: DataFrame, rounds: Int,
      symDst: => Option[DataFrame] = None, nNodes: Long = -1L): DataFrame = {
    var settled = seeds.select(col("node"), lit(0L).as("depth"))
      .localCheckpoint(true)
    // the reachable set is bounded by the node count — the frontier and
    // settled frames can only broadcast if the GRAPH's node count is
    // rail-bounded, not just the seed set. Callers that already hold a
    // node-sized degree frame pass its count as `nNodes` so the rail
    // check costs nothing extra; otherwise it is one bucket-local
    // distinct over the src buckets. The by-name twin is forced only
    // within the rail (see [[contribJoin]]).
    lazy val dstTwin = symDst
    val n = if (nNodes >= 0L) nNodes
            else sym.select(col("src")).distinct().count()
    val inRail = n <= broadcastRankLimit && dstTwin.isDefined
    val e = if (inRail) dstTwin.get else sym
    for (r <- 1 to rounds) {
      val frontier = settled.filter(col("depth") === (r - 1).toLong)
        .select(col("node").as("src"))
      val next = (if (inRail) e.join(broadcast(frontier), "src")
                  else frontier.join(e, "src"))
        .select(col("dst").as("node")).distinct()
        .join(if (inRail) broadcast(settled) else settled,
          Seq("node"), "left_anti")
        .select(col("node"), lit(r.toLong).as("depth"))
      settled = settled.unionByName(next).localCheckpoint(true)
    }
    settled.orderBy(col("node"))
  }
}
