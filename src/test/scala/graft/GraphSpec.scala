package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

/** Unit tests for the round-5 operators: co-occurrence graph + PageRank,
  * deterministic training-order shuffle, radius search, and CDC snapshot
  * compaction. Everything drives the PRODUCTION operators/queries (never a
  * reimplementation).
  */
class GraphSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("trustRank: mass radiates from seeds, unreachable components stay at zero") {
    import spark.implicits._
    // component A: star 1-{2,3,4}, seed = center 1 (all back-flow returns
    // to it, so the seed dominates); component B: 5-6, unreachable
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val out = Graph.trustRank(edges, seeds).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L)._2 && !out(2L)._2 && !out(5L)._2)
    // star center holds the most trust; leaves all equal by symmetry;
    // the unreachable component gets exactly 0
    assert(out(1L)._1 > out(2L)._1, s"seed center not dominant: $out")
    assert(out(2L)._1 == out(3L)._1 && out(3L)._1 == out(4L)._1, s"leaf asymmetry: $out")
    assert(out(2L)._1 > 0L)
    assert(out(5L)._1 == 0L && out(6L)._1 == 0L, s"unreachable leaked trust: $out")
    // damping leaks non-seed teleport mass: total stays <= one unit
    assert(out.values.map(_._1).sum <= Graph.PrScale)
  }

  test("kcorePeel melts the chain round-by-round and keeps the clique") {
    import spark.implicits._
    // K4 clique {1,2,3,4} (every degree 3) + a chain 4-5-6-7 hanging off.
    // 2-core: chain END 7 (deg 1) peels in round 1, exposing 6; 6 peels
    // in round 2, exposing 5; 5 in round 3; the clique (all degrees ≥ 3
    // > 2) survives every round — the per-round counts ARE the melt curve.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 7L)).toDF("src", "dst")
    val curve = Graph.kcorePeel(edges, k = 2, rounds = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(curve == Map(0L -> 7L, 1L -> 6L, 2L -> 5L, 3L -> 4L, 4L -> 4L, 5L -> 4L))
  }

  test("adamicAdar discounts promiscuous wedge centers by floor-log2 degree") {
    import spark.implicits._
    // hubs 100 (deg 2 → weight 1e6) and 200 (deg 4 → flog2 = 2 → 5e5);
    // leaves 3, 4 have deg 1 and must never center a wedge
    val edges = Seq((100L, 1L), (100L, 2L), (200L, 1L), (200L, 2L),
      (200L, 3L), (200L, 4L)).toDF("src", "dst")
    val rows = Graph.adamicAdar(edges, 20).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
    val out = rows.toMap
    // (100,200) via centers 1 AND 2, both deg-2: 2 × 1e6
    assert(out((100L, 200L)) == ((2L, 2000000L)))
    // (1,2) via center 100 (1e6) + center 200 (5e5)
    assert(out((1L, 2L)) == ((2L, 1500000L)))
    // pairs seen only through hub 200 carry its discounted weight
    assert(out((3L, 4L)) == ((1L, 500000L)))
    assert(out((1L, 3L)) == ((1L, 500000L)))
    // ordering: aa_milli DESC, then (x, y)
    assert(rows.map(_._1).take(3).toSeq == Seq((100L, 200L), (1L, 2L), (1L, 3L)))
  }

  test("coOccurrenceEdges builds distinct undirected src<dst pairs per container") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L), (1L, 20L), (1L, 20L), // dup line collapses
      (2L, 20L), (2L, 10L),            // same pair again via another order
      (3L, 30L)                        // singleton container → no edge
    ).toDF("l_orderkey", "l_partkey")
    val e = Graph.coOccurrenceEdges(df, "l_orderkey", "l_partkey")
      .orderBy("src", "dst").collect()
    assert(e.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((10L, 20L)))
    // support = number of containers sharing the pair (2 here: orders 1, 2)
    val ws = Graph.coOccurrenceEdgesWithSupport(df, "l_orderkey", "l_partkey")
      .orderBy("src", "dst").collect()
    assert(ws.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((10L, 20L, 2L)))
  }

  test("mergeEdgeDelta refresh is row-identical to a rebuild from scratch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.Md5Hash60.md5hash60
    // containers 1, 2, 11 are "existing"; 10, 20 are the delta batch —
    // the delta both reinforces an existing edge (10-20 via order 20)
    // and creates brand-new ones (20-30, 30-40 via order 10)
    val full = Seq(
      (1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L), (11L, 40L), (11L, 50L),
      (10L, 20L), (10L, 30L), (10L, 40L), (20L, 10L), (20L, 20L)
    ).toDF("l_orderkey", "l_partkey")
    val existing = full.filter(pmod(col("l_orderkey"), lit(10L)) =!= 0)
    val delta = full.filter(pmod(col("l_orderkey"), lit(10L)) === 0)
    val standing = Graph.coOccurrenceEdgesWithSupport(existing, "l_orderkey", "l_partkey")
      .withColumn("samp", pmod(md5hash60(concat_ws("|",
        col("src").cast("string"), col("dst").cast("string"))), lit(8L)) === 0)
    val merged = Graph.mergeEdgeDelta(standing, delta, "l_orderkey", "l_partkey")
    val rebuilt = Graph.coOccurrenceEdgesWithSupport(full, "l_orderkey", "l_partkey")
      .withColumn("samp", pmod(md5hash60(concat_ws("|",
        col("src").cast("string"), col("dst").cast("string"))), lit(8L)) === 0)
    val m = merged.select("src", "dst", "support", "samp").orderBy("src", "dst")
      .collect().map(_.toSeq).toSeq
    val r = rebuilt.select("src", "dst", "support", "samp").orderBy("src", "dst")
      .collect().map(_.toSeq).toSeq
    assert(m == r, s"merged=$m rebuilt=$r")
    // the delta reinforced 10-20 (support 2+1) and created edges off order 10
    val byEdge = merged.collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> (x.getLong(2), x.getBoolean(4))).toMap
    assert(byEdge((10L, 20L)) == (3L, false), s"got $byEdge")
    assert(byEdge((20L, 30L))._2 && byEdge((30L, 40L))._2, s"got $byEdge")
  }

  test("minLabelRounds: label = min node id within R hops; path converges at its diameter") {
    import spark.implicits._
    // path 1—2—3—4—5 plus a separate pair {10, 11}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("src", "dst")
    def labelsAt(r: Int) = Graph.minLabelRounds(edges, r).orderBy("node")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // round 1: each node adopts its 1-hop min
    assert(labelsAt(1) == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L,
      10L -> 10L, 11L -> 10L))
    // round 4 = the path's diameter: both components fully labeled
    assert(labelsAt(4) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("pagerank matches the hand-computed damped iteration on a path graph") {
    import spark.implicits._
    // path 1—2—3: deg(1)=deg(3)=1, deg(2)=2, N=3, pr0=1/3 each.
    // After one round: pr(1)=pr(3)=0.05+0.85/6, pr(2)=0.05+0.85*2/3.
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val pr1 = Graph.pagerank(edges, iters = 1).orderBy("node").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // fixed-point floors lose < in-degree × 1e-12 per node, so 1e-9 holds
    assert(math.abs(pr1(1L) - 0.575) < 1e-9) // (0.05 + 0.85/6) * 3
    assert(math.abs(pr1(3L) - 0.575) < 1e-9)
    assert(math.abs(pr1(2L) - 1.85) < 1e-9)  // (0.05 + 0.85*2/3) * 3
  }

  test("triangles counts exactly at invProb=1: K4 has 4, a path has 0") {
    import spark.implicits._
    // K4 on {1,2,3,4}: 6 edges, C(4,3)=4 triangles
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val r = Graph.triangles(k4, invProb = 1).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((6L, 4L, 4L)))
    // path 1—2—3—4: wedges exist but none close
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(Graph.triangles(path, invProb = 1).collect()(0).getLong(1) == 0L)
    // triangle + pendant edge: exactly 1, regardless of orientation ties
    val tp = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(Graph.triangles(tp, invProb = 1).collect()(0).getLong(1) == 1L)
  }

  test("pagerank/trustRank shuffle fallback (broadcastNodes=-1) is frame-identical to the broadcast path") {
    import spark.implicits._
    // The >BroadcastRankNodes branch is otherwise only exercised by
    // tools/PrAB at sf10 — pin it here so the fallback can't rot. A
    // deterministic multi-component graph with hubs, chains and a cycle;
    // integer fixed point means the two join strategies must agree
    // BIT-identically, not approximately.
    val edges = ((0L until 60L).map(i => (i, (i * 7 + 3) % 60)) ++
      (0L until 30L).map(i => (i, i + 30L)) ++ Seq((100L, 101L)))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    val seeds = Seq(1L, 7L, 100L).toDF("node")
    def runBoth(f: => Array[org.apache.spark.sql.Row]) = {
      val prop = "graft.pagerank.broadcastNodes"
      val saved = sys.props.get(prop)
      try {
        System.clearProperty(prop) // default: broadcast path (60 << 4M)
        val bcast = f
        System.setProperty(prop, "-1") // force the shuffle join
        val smj = f
        (bcast, smj)
      } finally saved match {
        case Some(v) => System.setProperty(prop, v)
        case None => System.clearProperty(prop)
      }
    }
    val (prB, prS) = runBoth(Graph.pagerank(edges).orderBy("node").collect())
    assert(prB.sameElements(prS), "pagerank broadcast vs shuffle diverged")
    val (trB, trS) = runBoth(
      Graph.trustRank(edges, seeds).orderBy("node").collect())
    assert(trB.sameElements(trS), "trustRank broadcast vs shuffle diverged")
  }

  test("pagerank conserves total mass across iterations") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val out = Graph.pagerank(edges, iters = 3).collect()
    val total = out.map(_.getDouble(3)).sum / out.length // mean of pr*N = 1
    assert(math.abs(total - 1.0) < 1e-6)
  }

  test("shuffleOrder emits a stable permutation with contiguous per-shard positions") {
    val docs = ops.Tables.documents(spark, sf)
    val a = Pipeline.shuffleOrder(docs, 8).select("doc_id", "shard", "pos")
    val n = docs.count()
    assert(a.count() == n)
    assert(a.select("doc_id").distinct().count() == n) // a permutation
    // positions are 1..count(shard) within every shard
    val bad = a.groupBy("shard")
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"), min(col("pos")).as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
    assert(bad.isEmpty)
    // pure function of doc_id: a second run reproduces the exact layout
    val b = Pipeline.shuffleOrder(docs, 8).select("doc_id", "shard", "pos")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("rangeSearch returns exactly the thresholded slice of the LSH candidates") {
    val emb = ops.Tables.embeddings(spark, sf)
    val probes = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val rs = Similarity.rangeSearch(emb, probes, tau = 0.25, excludeSelf = true)
      .select("probe_id", "neighbor_id", "sim")
    assert(rs.filter(col("sim") < 0.25).isEmpty)
    assert(rs.count() > 0) // threshold chosen to match at the smallest SF
    // same candidates as the top-k path with an effectively-unbounded k
    val viaKnn = Similarity.knnLsh(emb, probes, k = Int.MaxValue, excludeSelf = true)
      .filter(col("sim") >= 0.25).select("probe_id", "neighbor_id", "sim")
    assert(rs.exceptAll(viaKnn).isEmpty && viaKnn.exceptAll(rs).isEmpty)
  }

  test("events_compact_latest keeps exactly the max-(ts, event_id) row per key") {
    val out = SparkEntry.queries("events_compact_latest")(spark, sf)
    val ev = ops.Tables.events(spark, sf)
    assert(out.groupBy("user_id", "event_type").count().filter(col("count") > 1).isEmpty)
    // replay via the independent window formulation and compare
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val expect = ev.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        col("event_id").cast("long").as("last_event_id"),
        unix_micros(col("ts")).as("last_us"), col("value").as("last_value"))
    assert(out.exceptAll(expect).isEmpty && expect.exceptAll(out).isEmpty)
  }

  test("incrementalDedup flags exact dups of the existing corpus, keeps the rest") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false)))
    def df(rows: (Long, String)*) =
      spark.createDataFrame(rows.map { case (i, t) => Row(i, t) }.asJava, schema)
    val existing = df(0L -> "alpha beta", 1L -> "ALPHA  beta", 2L -> "gamma")
    val fresh = df(10L -> " alpha beta ", 11L -> "delta")
    val out = Dedup.incrementalDedup(existing, fresh).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    assert(out(10L) == (true, 0L)) // dup of the existing group's min id
    assert(out(11L) == (false, -1L))
  }

  test("edit-distance verifier rejects word-reorders that Jaccard accepts") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false)))
    // docs 1 and 2 both have doc 0's exact token SET (so the MinHash
    // signatures collide in every band — candidacy is guaranteed, not
    // probabilistic): 1 is a full reorder, 2 appends one repeated token
    val docs = spark.createDataFrame(Seq(
      Row(0L, "alpha beta gamma delta epsilon zeta eta theta"),
      Row(1L, "theta eta zeta epsilon delta gamma beta alpha"),
      Row(2L, "alpha beta gamma delta epsilon zeta eta theta alpha")).asJava, schema)
    val jac = Dedup.lshCandidatePairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val edit = Dedup.editVerifiedPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jac.contains((0L, 1L)))  // set-identical reorder passes Jaccard
    assert(!edit.contains((0L, 1L))) // ...but fails the order-sensitive verifier
    assert(edit.contains((0L, 2L))) // one-word substitution passes both
    // empty corpus: the band-bound scalar agg must degrade, not crash
    val empty = spark.createDataFrame(Seq.empty[org.apache.spark.sql.Row].asJava, schema)
    assert(Dedup.editVerifiedPairs(empty).isEmpty)
  }

  test("q_approx_distinct stays inside its published HLL envelope") {
    val out = SparkEntry.queries("q_approx_distinct")(spark, sf).collect()
    assert(out.nonEmpty && out.forall(_.getAs[Boolean]("approx_ok")))
  }

  test("schema-evolution read reconciles both producer versions with NULLs on v1 rows") {
    val out = SparkEntry.queries("sink_schema_evolution")(spark, sf).collect()
    assert(out.nonEmpty)
    // every group has both pre- and post-evolution rows (parity split),
    // so the merged column must be partially — never fully — populated
    out.foreach { r =>
      val (n, withQ) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_with_quality"))
      assert(withQ > 0 && withQ < n, s"lang=${r.getString(0)} n=$n withQ=$withQ")
    }
  }
}
