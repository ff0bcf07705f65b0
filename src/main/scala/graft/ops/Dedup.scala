package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Deduplication operators over the `documents` table — the operators a
  * training-data pipeline runs before anything else.
  *
  * Design for 100 TB:
  *  - exact dedup is a hash-groupBy: one shuffle keyed on the fingerprint,
  *    map-side partial aggregation, no driver materialization;
  *  - MinHash signatures are one groupBy(doc_id) pass (K min-aggregates over
  *    exploded shingles — partial aggregation collapses the explode before
  *    the shuffle);
  *  - LSH candidate generation joins ONLY within (band, band-hash) buckets —
  *    never all-pairs; the join is shuffle-keyed on the band hash. A
  *    pathological mega-bucket would square — production caps bucket size
  *    (count + filter before the self-join) which composes with this plan;
  *  - SimHash is two chained aggregations, both keyed on doc_id.
  *
  * All hashes derive from md5 (first 15 hex chars → 60-bit integer), which
  * is bit-identical in Spark (`conv(substr(md5(x),1,15),16,10)`) and DuckDB
  * (`('0x'||substr(md5(x),1,15))::UBIGINT`) — so even the MinHash signature
  * matrix gets a DuckDB oracle.
  */
object Dedup {

  val NumPerms = 16 // MinHash permutations
  val NumBands = 4  // LSH bands → 4 rows per band

  /** Normalized-text fingerprint of exact dedup: lowercase, trim, collapse
    * whitespace, md5. THE definition — the registered query, the cleaning
    * pipeline, the streaming dedup, and the unit tests all call this, so
    * the normalization cannot drift between them.
    */
  def normFingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** 60-bit integer hash of a string column, reproducible in DuckDB.
    * Native Catalyst expression — no hex-string round-trip per row.
    */
  def h60(c: Column, seed: Int): Column =
    graft.functions.Md5Hash60.md5hash60(concat(c, lit("#" + seed)))

  /** Same hash as [[h60]] in DuckDB SQL, over SQL expression `e`. */
  def h60Sql(e: String, seed: Int): String =
    s"CAST(${GraftQuery.h60Sql(s"$e || '#$seed'")} AS BIGINT)"

  /** Same hash as [[h60]] in Spark SQL text form (for expr-built lambdas). */
  def h60Expr(e: String, seed: Int): String =
    s"CAST(conv(substr(md5(concat($e, '#$seed')), 1, 15), 16, 10) AS BIGINT)"

  // -------------------------------------------------------------------
  // MinHash permutation family: ONE md5 per shingle, then K affine maps
  // h_p = (a_p·h + b_p) mod M. 45M md5+hex+conv string chains collapse to
  // 2.8M (the rest is integer arithmetic) — the md5 chain dominated the
  // signature cost. M = 2³¹−1 and a,b < 2³¹ keep every product below 2⁶³,
  // so DuckDB's overflow-checked BIGINT arithmetic reproduces Spark's
  // bit-for-bit.
  // -------------------------------------------------------------------

  val MinhashMod = 2147483647L // 2^31 − 1 (prime)

  /** Deterministic affine coefficients (odd multipliers, all < 2³¹). */
  def permA(p: Int): Long = ((2L * p + 1) * 2654435761L) % MinhashMod
  def permB(p: Int): Long = (p * 2246822519L + 3266489917L) % MinhashMod

  /** Base hash of a shingle: 60-bit md5 integer reduced mod M. */
  def baseHash(c: Column): Column =
    (graft.functions.Md5Hash60.md5hash60(c) % MinhashMod).as("hb")

  def baseHashSql(e: String): String =
    s"(CAST(${GraftQuery.h60Sql(e)} AS BIGINT) % $MinhashMod)"

  /** Word 3-shingles of `text` (single-space tokenized); docs shorter than
    * 3 tokens fall back to one truncated shingle (both engines slice
    * past-the-end leniently, so semantics agree). The token array is bound
    * to a column BEFORE the lambda — split() referenced inside the
    * higher-order function would re-tokenize the document once per shingle
    * (observed 8× on the signature query).
    */
  private val shinglesExpr =
    "transform(sequence(1, greatest(size(toks) - 2, 1)), " +
      "i -> concat_ws(' ', slice(toks, i, 3)))"

  private[ops] val shinglesSqlCte =
    """sh AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(t) - 2, 1)),
      |    i -> array_to_string(t[i : i + 2], ' '))) AS shingle
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      |)""".stripMargin

  /** MinHash signature over a shingle relation (doc_id, shingle): wide form,
    * one min-aggregate per affine permutation of a single md5 base hash,
    * single shuffle keyed on doc_id.
    */
  def minhashSignature(shingled: DataFrame): DataFrame = {
    val hashed = shingled.select(col("doc_id"), baseHash(col("shingle")))
    val mins = (0 until NumPerms).map(p =>
      min((col("hb") * permA(p) + permB(p)) % MinhashMod).as(f"mh$p%02d"))
    hashed.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** 3-shingle relation of the documents table. */
  def shingles3(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), expr("split(text, ' ')").as("toks"))
      .select(col("doc_id"), explode(expr(shinglesExpr)).as("shingle"))

  /** Unigram (token) shingle relation — token-reordered copies collide. */
  def shingles1(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(expr("split(text, ' ')")).as("shingle"))

  /** LSH banding of a wide signature: (doc_id, band, band_hash). */
  def lshBands(sig: DataFrame): DataFrame = {
    val bandStructs = (0 until NumBands).map { b =>
      val rowCols = (b * NumPerms / NumBands until (b + 1) * NumPerms / NumBands)
        .map(p => col(f"mh$p%02d").cast("string"))
      struct(lit(b).as("band"), md5(concat_ws(",", rowCols: _*)).as("band_hash"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.band_hash").as("band_hash"))
  }

  /** Near-duplicate edges from LSH buckets over unigram MinHash, verified
    * with exact token-set Jaccard.
    *
    * Candidate generation is STAR-SHAPED: each bucket proposes an edge from
    * its minimum doc_id (the keeper) to every other member — O(bucket size)
    * edges, never the O(bucket size²) all-pairs enumeration. On a
    * self-similar corpus a single mega-bucket makes pair enumeration
    * quadratic (observed: a 2638-doc bucket → 3.5M pairs at sf0.1, 12M
    * candidates overall); star edges are exactly what keeper-assignment
    * dedup consumes, and transitive closure (union-find rounds) composes on
    * top when full clusters are needed.
    */
  def lshCandidatePairs(docs: DataFrame, maxBucket: Long = Long.MaxValue): DataFrame =
    verifyJaccardPairs(docs, lshCandidateEdges(docs, maxBucket))

  /** The exact token-set Jaccard verify stage alone, over an
    * already-derived candidate edge set (the standing-artifact path:
    * [[candidateEdgeRelation]] feeds this once to build
    * [[verifiedEdgeRelation]]).
    */
  def verifyJaccardPairs(docs: DataFrame, candidates: DataFrame): DataFrame = {
    // The edge table dwarfs the document dimension, so resolve token sets
    // with broadcast joins; at corpus sizes beyond broadcast, bucket both
    // sides on doc id instead — the star-edge plan above is unchanged.
    val toksets = docs.select(col("doc_id"),
      expr("array_sort(array_distinct(split(text, ' ')))").as("tokset"))
    candidates
      .join(broadcast(toksets.select(col("doc_id").as("doc_a"), col("tokset").as("ta"))), "doc_a")
      .join(broadcast(toksets.select(col("doc_id").as("doc_b"), col("tokset").as("tb"))), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(size(array_intersect(col("ta"), col("tb"))).cast("double") /
          size(array_union(col("ta"), col("tb"))).cast("double"), 6).as("jaccard"))
      .filter(col("jaccard") >= 0.9) // emit verified near-dups, not the candidate cloud
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Parquet paths of built near-dup edge artifacts, keyed by dataset
    * dir — the once-per-(JVM, dataset) latch behind [[verifiedEdgeRelation]]
    * (the [[Graph.edgeRelation]] pattern).
    */
  private val nearDupArtifact = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The MATERIALIZED verified near-dup edge relation (doc_a, doc_b,
    * jaccard >= 0.9) over `documents` — the DEDUP INDEX a production
    * ingest maintains between runs rather than re-deriving per analysis:
    * built once per (JVM, dataset dir) through the full MinHash →
    * LSH-band → star-edge → exact-Jaccard-verify chain and persisted as
    * parquet; `dedup_lsh_pairs` and the three cluster-consuming entries
    * (`dedup_clusters`, `dedup_corpus_keep`, `dedup_keep_best`) all scan
    * it instead of re-running the chain. Oracles rebuild the chain inline
    * from the base table — the proof the artifact loses and invents
    * nothing.
    */
  private[graft] def verifiedEdgeRelation(s: SparkSession, d: String): DataFrame = {
    val path = nearDupArtifact.computeIfAbsent(d, _ => ArtifactBuilds.timed("dedup_verified_edges", d) {
      val out = processScratch(d, "neardup_edges")
      // chained off the RAW candidate artifact: the MinHash → band →
      // star-edge stage runs once per dataset TOTAL, shared with the
      // verifier-comparison entries that need pre-verify candidates
      verifyJaccardPairs(documents(s, d), candidateEdgeRelation(s, d))
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }

  /** Latch for [[candidateEdgeRelation]]. */
  private val candidateArtifact = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The MATERIALIZED RAW candidate edge relation (doc_a, doc_b) — the
    * star-shaped LSH candidate cloud BEFORE any verification, shared by
    * every verifier tier: the Jaccard verify that builds
    * [[verifiedEdgeRelation]], both edit-distance verifiers, and the
    * MinHash-estimator-quality entry. One MinHash + banding pass per
    * (JVM, dataset); production keeps exactly this relation so candidate
    * generation is priced once however many verifiers run.
    */
  private[graft] def candidateEdgeRelation(s: SparkSession, d: String): DataFrame = {
    val path = candidateArtifact.computeIfAbsent(d, _ => ArtifactBuilds.timed("dedup_lsh_candidates", d) {
      val out = processScratch(d, "lsh_candidates")
      lshCandidateEdges(documents(s, d)).write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }

  /** Latch for [[preDeltaBucketStats]] — parquet path per dataset dir. */
  private val nearDupPreBuckets = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The standing LSH BUCKET INDEX before a delta batch lands: one
    * (band, band_hash) → min member id row per bucket over the standing
    * corpus (`doc_id < kThr`), persisted once per (JVM, dataset) — the
    * state a production near-dup index actually keeps between ingests so
    * a fresh document can probe for collisions without touching the
    * corpus. Singleton buckets are KEPT (no `count > 1` filter): a
    * standing singleton that gains a delta member becomes an emitting
    * bucket, and its keeper is the standing doc — dropping singletons
    * here is exactly the bug that would make the refresh diverge from a
    * full rebuild.
    */
  private[graft] def preDeltaBucketStats(s: SparkSession, d: String, kThr: Long): DataFrame = {
    // latch key includes kThr: a second caller with a different threshold
    // in the same JVM must not silently receive the first one's artifact
    val path = nearDupPreBuckets.computeIfAbsent(s"$d|$kThr", _ => ArtifactBuilds.timed(s"dedup_pre_buckets_$kThr", d) {
      val out = processScratch(d, s"neardup_pre_buckets_$kThr")
      val standing = documents(s, d).filter(col("doc_id") < kThr)
      lshBands(minhashSignature(shingles1(standing)))
        .groupBy(col("band"), col("band_hash"))
        .agg(min(col("doc_id")).as("min_id"))
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }

  /** Latch for [[preDeltaVerifiedEdges]] — parquet path per dataset dir. */
  private val nearDupPreEdges = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The standing VERIFIED near-dup edge set before a delta batch lands
    * (the pre-delta twin of [[verifiedEdgeRelation]]): the full MinHash →
    * band → star-edge → Jaccard-verify chain over the standing corpus
    * only, persisted once per (JVM, dataset) — "yesterday's dedup index"
    * in the incremental-refresh proof `dedup_index_incremental` runs.
    */
  private[graft] def preDeltaVerifiedEdges(s: SparkSession, d: String, kThr: Long): DataFrame = {
    val path = nearDupPreEdges.computeIfAbsent(s"$d|$kThr", _ => ArtifactBuilds.timed(s"dedup_pre_edges_$kThr", d) {
      val out = processScratch(d, s"neardup_pre_edges_$kThr")
      val standing = documents(s, d).filter(col("doc_id") < kThr)
      verifyJaccardPairs(standing, lshCandidateEdges(standing))
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }

  /** Incremental refresh of the standing verified near-dup index for an
    * APPEND-ONLY delta batch (every delta id exceeds every standing id —
    * the ingest invariant that makes LSH index maintenance exact):
    *
    *  1. signatures + bands are computed for the DELTA docs only — O(delta);
    *  2. each delta band row probes the standing bucket index by
    *     (band, band_hash) equi-join; the bucket's keeper is the standing
    *     min if the bucket exists, else the delta min — identical to the
    *     full rebuild's `min(doc_id)` because appended ids are all larger,
    *     so existing keepers and existing star edges are UNCHANGED;
    *  3. only the new candidates (doc_b always a delta doc — a standing
    *     doc_b would need a smaller bucket member, which the append cannot
    *     create) pay the exact-Jaccard verify; token sets resolve from the
    *     corpus by id lookup (the broadcast dimension role);
    *  4. merged = standing verified edges ∪ newly verified edges — disjoint
    *     by construction (standing doc_b < kThr ≤ delta doc_b), no dedup
    *     join needed.
    *
    * The standing corpus is never re-scanned by the candidate generator;
    * refresh cost is O(delta · bands) probe + O(new candidates) verify —
    * the D10/G14 refresh discipline applied to the near-dup index itself.
    *
    * Contract: refresh == rebuild holds for the UNGUARDED chain only
    * (maxBucket = ∞, which is how both the registered query and the
    * oracle run). Under a finite mega-bucket guard a standing bucket that
    * crosses the threshold after the delta would keep its standing edges
    * here while a rebuild drops the whole bucket — thread maxBucket
    * through and drop oversized merged buckets before relying on parity
    * with a guarded rebuild.
    */
  def mergeNearDupDelta(docs: DataFrame, standingBuckets: DataFrame,
      standingEdges: DataFrame, kThr: Long): DataFrame = {
    val deltaBands = lshBands(minhashSignature(shingles1(
      docs.filter(col("doc_id") >= kThr))))
    val keepers = deltaBands.groupBy(col("band"), col("band_hash"))
      .agg(min(col("doc_id")).as("delta_min"))
      .join(standingBuckets.withColumnRenamed("min_id", "standing_min"),
        Seq("band", "band_hash"), "left")
      .select(col("band"), col("band_hash"),
        coalesce(col("standing_min"), col("delta_min")).as("keeper"))
    val newCandidates = deltaBands.join(keepers, Seq("band", "band_hash"))
      .filter(col("doc_id") > col("keeper"))
      .select(col("keeper").as("doc_a"), col("doc_id").as("doc_b")).distinct()
    standingEdges.select(col("doc_a"), col("doc_b"), col("jaccard"))
      .unionByName(verifyJaccardPairs(docs, newCandidates)
        .select(col("doc_a"), col("doc_b"), col("jaccard")))
  }

  /** The raw star-shaped LSH candidate edges (doc_a = bucket keeper,
    * doc_b = other member), BEFORE any verification — the shared
    * candidate generator behind both verifiers ([[lshCandidatePairs]]'s
    * exact token-set Jaccard and [[editVerifiedPairs]]'s normalized
    * edit distance).
    */
  def lshCandidateEdges(docs: DataFrame, maxBucket: Long = Long.MaxValue): DataFrame = {
    val bands = lshBands(minhashSignature(shingles1(docs)))
    val keepers = bands.groupBy(col("band"), col("band_hash"))
      .agg(min(col("doc_id")).as("doc_a"), count(lit(1)).as("bucket_size"))
      // production mega-bucket guard: a degenerate bucket (boilerplate,
      // spam clusters, empty-text collisions) still costs O(bucket) star
      // edges; past `maxBucket` members the bucket is dropped entirely —
      // a band that collides half the corpus carries no near-dup signal
      .filter(col("bucket_size") > 1 && col("bucket_size") <= maxBucket)
    bands.join(keepers, Seq("band", "band_hash"))
      .filter(col("doc_id") > col("doc_a"))
      .select(col("doc_a"), col("doc_id").as("doc_b")).distinct()
  }

  /** LSH candidates verified by NORMALIZED EDIT DISTANCE instead of
    * token-set Jaccard: edit_sim = 1 − levenshtein/max(len) — the
    * order-sensitive verifier (catches word-reorder "near-dups" Jaccard
    * wrongly accepts, tolerates small in-place edits). Same broadcast
    * text-resolve shape as the Jaccard verifier; per-pair cost is
    * O(len_a·len_b), so the mega-bucket guard upstream matters more
    * here. Two empty texts are identical by convention (the 0/0 case is
    * pinned, not engine-dependent).
    *
    * ASCII-guarded like the CDC queries: DuckDB's `levenshtein` counts
    * BYTES while Spark's (and both engines' `length`) count CHARACTERS,
    * so multi-byte text would silently diverge from the oracle — the
    * guard raises instead (byte == char offsets is a precondition, not
    * an assumption). For multilingual corpora use
    * [[editVerifiedPairsUtf8]], which drops the guard and keeps Spark's
    * char-counting semantics.
    *
    * The banded-DP threshold is PER PAIR — each pair's own
    * ceil((1−τ)·max(len)) cap, see [[verifyEditPairs]] — so no eager
    * corpus-wide job runs at construction and an outlier doc cannot
    * weaken the band for unrelated short pairs.
    */
  def editVerifiedPairs(docs: DataFrame, tau: Double = 0.8,
      maxBucket: Long = Long.MaxValue,
      candidates: Option[DataFrame] = None): DataFrame = {
    val texts = docs.select(col("doc_id"),
      graft.functions.CdcBoundaries.asciiOnly(col("text"), col("doc_id"),
        "edit-distance verify").as("text"))
    verifyEditPairs(texts,
      candidates.getOrElse(lshCandidateEdges(docs, maxBucket)), tau)
  }

  /** [[editVerifiedPairs]] without the ASCII precondition, for
    * multilingual corpora: Spark's `levenshtein` and `length` both count
    * CODE POINTS (not bytes, not grapheme clusters — "e" + combining
    * accent is two units, precomposed "é" is one), so the similarity is
    * char-correct on any UTF-8 text with no guard needed. The DuckDB
    * byte-counting mismatch is an ORACLE limitation, not an engine one —
    * cross-engine checks for this path go through an alphabet relabeling
    * (see the `dedup_edit_pairs_utf8` registration), and the code-point
    * semantics are locked by unit tests (CJK + combining marks).
    *
    * `candidates` defaults to this corpus's own LSH candidate edges;
    * pass them explicitly to verify an externally-derived pair set (the
    * registered query generates candidates on the pre-relabeling corpus).
    * Same per-pair banded-DP threshold as [[editVerifiedPairs]].
    */
  def editVerifiedPairsUtf8(docs: DataFrame, tau: Double = 0.8,
      maxBucket: Long = Long.MaxValue,
      candidates: Option[DataFrame] = None): DataFrame =
    verifyEditPairs(docs.select(col("doc_id"), col("text")),
      candidates.getOrElse(lshCandidateEdges(docs, maxBucket)), tau)

  /** The session's configured shuffle parallelism — the explicit width
    * for compute-dense repartitions that must not be byte-coalesced.
    */
  private def numShufflePartitions(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  private def verifyEditPairs(texts: DataFrame, candidates: DataFrame,
      tau: Double): DataFrame = {
    // Banded DP with a PER-PAIR bound: any pair with edit_sim ≥ tau has
    // lev ≤ (1−tau)·maxlen(pair), so the 3-arg levenshtein runs the
    // O(len·bound) band (with early exit) instead of the full O(len²)
    // table and returns −1 beyond it. The bound is each pair's own
    // ceil((1−τ)·greatest(len)) — a column threshold through
    // call_function (the Catalyst Levenshtein evaluates its threshold
    // per row; only functions.levenshtein's signature pins it to a
    // literal) — so one giant outlier doc no longer weakens the band for
    // every short pair, and the corpus-wide max-length scalar job this
    // used to run eagerly at construction is gone entirely.
    // The keep test compares the 6dp-ROUNDED sim, which can pull a true
    // sim up by 5e-7, i.e. 5e-7·maxlen in lev terms — the bound carries
    // that slack explicitly (a flat +1 stops covering it past maxlen
    // ≈ 2e6 chars) plus 1 for the FP floor; a −1 would otherwise read
    // as edit_sim > 1 and wrongly pass.
    val maxLenPair = greatest(length(col("ta")), length(col("tb")))
    val boundPair = (lit(1.0 - tau + 5e-7) * maxLenPair).cast("int") + 1
    candidates
      // The DP below is COMPUTE-bound, but `candidates` arrives
      // partitioned by its BYTES (the materialized artifact is a few MB
      // of id pairs → one parquet split → one core does all the DP while
      // the rest idle; measured 18 s single-task vs ~1.5 s spread at the
      // 10× SF). A pair row is two BIGINTs, so hash-spreading it over
      // the shuffle-partition count costs ~nothing relative to the DP it
      // parallelizes — the standing rule: a CPU-dense stage sizes its
      // partitioning by WORK, not by input bytes. The partition count is
      // EXPLICIT: AQE's coalescing is also byte-based, so a bare
      // repartition(cols) gets merged right back to one task; a
      // user-specified count is exempt from coalescing.
      .repartition(numShufflePartitions(candidates), col("doc_a"), col("doc_b"))
      .join(broadcast(texts.select(col("doc_id").as("doc_a"), col("text").as("ta"))), "doc_a")
      .join(broadcast(texts.select(col("doc_id").as("doc_b"), col("text").as("tb"))), "doc_b")
      // lev ≥ |Δlen|, so pairs over the bound skip the DP entirely —
      // pure codegen arithmetic drops 2/3 of candidates at sf0.1
      .filter(abs(length(col("ta")) - length(col("tb"))) <= boundPair)
      .withColumn("__lev",
        call_function("levenshtein", col("ta"), col("tb"), boundPair))
      .filter(col("__lev") >= 0)
      .select(col("doc_a"), col("doc_b"),
        when(greatest(length(col("ta")), length(col("tb"))) === 0, lit(1.0))
          .otherwise(round(lit(1.0) - col("__lev").cast("double") /
            greatest(length(col("ta")), length(col("tb"))).cast("double"), 6))
          .as("edit_sim"))
      .filter(col("edit_sim") >= tau)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Transitive closure of near-dup edges into clusters: iterative min-id
    * label propagation (each node adopts the smallest label among itself
    * and its neighbors) until fixpoint. Star edges from one LSH round
    * converge in 2-3 iterations; every iteration is two shuffles keyed on
    * node/label — the standard large-graph connected-components shape (no
    * driver materialization).
    *
    * The edge relation is materialized ONCE up front (localCheckpoint on
    * the DIRECTED edges, before the symmetrizing union — a checkpoint
    * after the union would run the upstream pipeline twice, once per
    * branch; observed 9s vs 1.5s for the LSH pipeline at sf0.1). Without
    * any checkpoint, every iteration AND the convergence probe would
    * re-run shingle → MinHash → band → bucket-join. Labels are
    * checkpointed per iteration to truncate the iterative lineage.
    *
    * Each round combines neighbor-min propagation with POINTER JUMPING
    * (label ← min(label, label-of-label)): rounds needed drop from
    * O(component diameter) to O(log diameter), which is what makes long
    * chained-LSH paths safe at scale — a 1000-hop chain converges in ~10
    * rounds, not 1000 full-shuffle rounds.
    *
    * Runs to FIXPOINT. `maxIter` is a safety rail only — hitting it
    * throws instead of silently returning partially-propagated (wrong)
    * labels.
    *
    * Input: (doc_a, doc_b) edges. Output: (doc_id, cluster_id) for every
    * doc appearing in an edge, cluster_id = min doc_id of its component.
    */
  /** Rounds the most recent [[clusters]] run took to reach fixpoint —
    * read by specs and by the scale-gate ledger (stderr carries the same
    * number per run).
    */
  private[graft] val lastRounds = new java.util.concurrent.atomic.AtomicInteger(0)

  def clusters(edges: DataFrame, maxIter: Int = 64): DataFrame = {
    val e = edges.localCheckpoint(true) // ONE run of the edge pipeline
    val sym = e.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(e.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    var labels = sym.select(col("src").as("doc_id")).distinct()
      .withColumn("label", col("doc_id"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("doc_id", "dst"), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("label")).as("nlabel"))
      val updated = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"), col("label").as("old"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
      // Pointer jump: adopt the label OF the current label (labels is
      // keyed by doc_id, and every label is some doc_id). Labels only
      // ever decrease toward the component minimum, so compressing
      // through a stale parent is always sound.
      val next = updated.join(
          labels.select(col("doc_id").as("label"), col("label").as("plabel")),
          Seq("label"), "left")
        .select(col("doc_id"), col("old"),
          least(col("label"), coalesce(col("plabel"), col("label"))).as("label"))
        .localCheckpoint(true) // truncate the growing iterative lineage
      // Carry old + new label in ONE checkpointed frame: the convergence
      // probe is a scan of already-materialized partitions, not a second
      // labels-join job.
      converged = next.filter(col("label") =!= col("old")).isEmpty
      labels = next.select(col("doc_id"), col("label"))
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"clusters(): label propagation not at fixpoint after $maxIter iterations " +
          "(component diameter exceeds the rail); raise maxIter — results would be wrong")
    // visible rounds-per-run ledger (r14 verdict item 7): the SF→rounds
    // ladder is what distinguishes "paying an extra O(log D) round at
    // 100×" from a per-round cost increase when reading the sweep
    lastRounds.set(iter)
    System.err.println(s"[clusters] fixpoint in $iter rounds")
    labels.select(col("doc_id"), col("label").as("cluster_id"))
  }

  /** The corpus AFTER near-dup removal: every document not in any LSH
    * cluster, plus the min-id representative of each cluster. Powers the
    * `dedup_corpus_keep` query AND is callable on any (doc_id, text, …)
    * frame (the unit tests drive THIS function). The removal is ONE LEFT
    * ANTI equi-join on doc_id against the (small) non-representative set,
    * so the corpus is scanned exactly once more regardless of scale; all
    * input columns pass through.
    */
  def corpusKeep(docs: DataFrame): DataFrame =
    corpusKeepEdges(docs, lshCandidatePairs(docs))

  /** [[corpusKeep]] over an already-derived verified edge relation (the
    * standing-artifact path of the registered query).
    */
  def corpusKeepEdges(docs: DataFrame, edges: DataFrame): DataFrame = {
    val drops = clusters(edges)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"))
    docs.join(drops, Seq("doc_id"), "left_anti")
  }

  /** Per-cluster quality-argmax keeper (see the `dedup_keep_best`
    * Scaladoc): cluster assignment from [[clusters]], quality = the
    * integer fasttext-shape classifier sum, keeper = max by
    * (score, -doc_id) struct ordering — deterministic ties, no window.
    */
  def keepBest(docs: DataFrame): DataFrame =
    keepBestEdges(docs, lshCandidatePairs(docs))

  /** Packing radix for [[keepBestEdges]]'s argmax: (score, doc_id) pack
    * into ONE BIGINT as `w·2^32 − doc_id`, strictly order-isomorphic to
    * (w DESC… as max; doc_id ASC as tiebreak). Premises — |w| < 2^30
    * (≥ a million ±1000-weighted tokens per doc) and doc_id ∈ [0, 2^32)
    * — are asserted IN-PLAN on every row (`assert_true` folded into the
    * packed expression), so construction stays lazy: no eager
    * premise-scan jobs at DataFrame-build time, and a violating corpus
    * fails loudly instead of mis-ranking.
    */
  private val KeepBestRadix = 1L << 32

  /** [[keepBest]] over an already-derived verified edge relation (the
    * standing-artifact path of the registered query).
    *
    * The per-cluster keeper argmax is the packed-BIGINT max (r12's
    * `Similarity.nnDedupLshAt` template): `max(struct(w, -doc_id))` could
    * only plan as a SortAggregate — the struct buffer disqualifies
    * `HashAggregateExec`, so the FULL cluster-member stream (data-
    * proportional: every doc in every near-dup cluster) was partition-
    * sorted per aggregation pass. One BIGINT max is a HashAggregate with
    * map-side combine. Decode: w = floorDiv(pk + 2^32 − 1, 2^32)
    * (arithmetic shiftright 32 — exact for negative scores too),
    * keeper = w·2^32 − pk.
    */
  def keepBestEdges(docs: DataFrame, edges: DataFrame): DataFrame = {
    val labels = clusters(edges)
    val w = docs.select(col("doc_id"), expr(
      """coalesce(aggregate(split(text, ' '), 0L, (acc, t) ->
        |  acc + CAST(conv(substr(md5(t), 1, 15), 16, 10) AS BIGINT) % 2001 - 1000),
        |  0L)""".stripMargin).as("w"))
    val premise = assert_true(
      abs(col("w")) < lit(1L << 30) && col("doc_id") >= 0 && col("doc_id") < lit(KeepBestRadix),
      lit("keep_best packed argmax premise: |w| < 2^30 and doc_id in [0, 2^32)"))
    val packed = col("w") * lit(KeepBestRadix) - col("doc_id") +
      coalesce(premise.cast("long"), lit(0L))
    labels.join(w, Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"), max(packed).as("pk"))
      .select(col("cluster_id"), col("n_members"),
        shiftright(col("pk") + lit(KeepBestRadix - 1), 32).as("kw"), col("pk"))
      .select(col("cluster_id"), col("n_members"),
        (col("kw") * lit(KeepBestRadix) - col("pk")).as("keeper_id"),
        col("kw").as("keeper_w"))
      .orderBy(col("cluster_id"))
  }

  /** 32-bit SimHash over the token bag (order-insensitive near-dup hash).
    *
    * All 32 bit-plane sums are FUSED into one groupBy(doc_id) aggregation
    * (32 sum columns) instead of crossJoining a 32-row bit index — that
    * shape multiplied every (doc, token) row by 32 through a shuffle and
    * needed a second shuffle to reassemble the hash. Here the token hash
    * is computed once per (doc, token) row, the 32 signed contributions
    * are map-side partial-aggregated, and the final hash assembly is a
    * scalar projection — one shuffle total after the token-count pass.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(expr("split(text, ' ')")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
      .withColumn("h", h60(col("tok"), 0))
    val bitSums = (0 until 32).map(j =>
      sum(col("cnt") * (shiftright(col("h"), j) % 2 * 2 - 1)).as(s"s$j"))
    val hash = (0 until 32)
      .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    toks.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), hash.cast("long").as("simhash"))
      .orderBy(col("doc_id"))
  }

  /** Shared DuckDB CTE chain ending in `verified(doc_a, doc_b, jaccard)` —
    * the jaccard-verified LSH star edges (used by the pair and cluster
    * oracles).
    */
  private lazy val lshEdgesSqlCtes: String = {
    val aggCols = (0 until NumPerms)
      .map(p => f"min((hb * ${permA(p)} + ${permB(p)}) %% $MinhashMod) AS mh$p%02d")
      .mkString(",\n  ")
    val bandCols = (0 until NumBands).map { b =>
      val rows = (b * NumPerms / NumBands until (b + 1) * NumPerms / NumBands)
        .map(p => f"mh$p%02d::VARCHAR").mkString(" || ',' || ")
      s"md5($rows) AS bh$b"
    }.mkString(",\n  ")
    val bandUnion = (0 until NumBands)
      .map(b => s"SELECT doc_id, $b AS band, bh$b AS band_hash FROM banded")
      .mkString("\n  UNION ALL ")
    s"""toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
       |), hashed AS (
       |  SELECT doc_id, ${baseHashSql("tok")} AS hb FROM toks
       |), sig AS (
       |  SELECT doc_id,
       |  $aggCols
       |  FROM hashed GROUP BY doc_id
       |), banded AS (
       |  SELECT doc_id, $bandCols FROM sig
       |), bands AS (
       |  $bandUnion
       |), keepers AS (
       |  SELECT band, band_hash, min(doc_id) AS doc_a
       |  FROM bands GROUP BY 1, 2 HAVING count(*) > 1
       |), pairs AS (
       |  SELECT DISTINCT k.doc_a, b.doc_id AS doc_b
       |  FROM bands b JOIN keepers k
       |    ON b.band = k.band AND b.band_hash = k.band_hash
       |  WHERE b.doc_id > k.doc_a
       |), tsets AS (
       |  SELECT doc_id, list_sort(list_distinct(string_split(text, ' '))) AS tokset
       |  FROM documents
       |), verified AS (
       |  SELECT * FROM (
       |    SELECT doc_a, doc_b,
       |      round(len(list_intersect(ta.tokset, tb.tokset))::DOUBLE /
       |            (len(ta.tokset) + len(tb.tokset)
       |             - len(list_intersect(ta.tokset, tb.tokset)))::DOUBLE, 6) AS jaccard
       |    FROM pairs
       |    JOIN tsets ta ON ta.doc_id = doc_a
       |    JOIN tsets tb ON tb.doc_id = doc_b)
       |  WHERE jaccard >= 0.9
       |)""".stripMargin
  }

  def queries: Seq[GraftQuery] = Seq(

    // Exact dedup on whitespace-normalized lowercase text.
    GraftQuery.of("dedup_exact",
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |min(doc_id) AS keeper_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keeper_doc_id""".stripMargin) { (s, d) =>
      documents(s, d)
        .groupBy(normFingerprint(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("keeper_doc_id"))
    },

    // Exact dedup on the sorted token multiset — catches token-reordered
    // copies that byte-level normalization misses.
    GraftQuery.of("dedup_exact_canonical",
      """SELECT md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS fp,
        |min(doc_id) AS keeper_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keeper_doc_id""".stripMargin) { (s, d) =>
      documents(s, d)
        .groupBy(md5(concat_ws(" ", expr("array_sort(split(text, ' '))"))).as("fp"))
        .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("keeper_doc_id"))
    },

    // PREFIX-CONTAINMENT dedup — the TRUNCATION-duplicate detector: a
    // scraped corpus is full of cut-off copies (pagination, excerpting,
    // crawler timeouts), and a 20-token truncation of a 200-token doc has
    // Jaccard ≈ 0.1 — far below any LSH/MinHash near-dup threshold, yet
    // it is pure duplication. Candidates bucket on the 16-token PREFIX
    // fingerprint (one fp-keyed shuffle — a truncation shares its
    // original's prefix by construction); verification is the exact
    // substring test `substr(longer, 1, len(shorter)) = shorter` plus a
    // token-boundary guard (the next char of the longer doc must be a
    // space or nothing — 'the cat s' must not "contain" 'the cat'),
    // spelled identically on both engines. Equal-length members of a
    // bucket are exact duplicates and verify trivially.
    GraftQuery.of("dedup_prefix_containment", {
      val h = GraftQuery.h60Sql("array_to_string((string_split(text, ' '))[1:16], ' ')")
      s"""WITH p AS (
         |  SELECT doc_id, text, length(text) AS ln, $h AS pfp
         |  FROM documents WHERE len(string_split(text, ' ')) >= 16),
         |cand AS (
         |  SELECT a.doc_id AS doc_short, b.doc_id AS doc_long,
         |    a.text AS ta, b.text AS tb,
         |    a.ln AS len_short, b.ln AS len_long
         |  FROM p a JOIN p b
         |    ON a.pfp = b.pfp
         |    AND (a.ln < b.ln OR (a.ln = b.ln AND a.doc_id < b.doc_id)))
         |SELECT doc_short, doc_long,
         |  CAST(len_short AS BIGINT) AS len_short,
         |  CAST(len_long AS BIGINT) AS len_long
         |FROM cand
         |WHERE substr(tb, 1, len_short) = ta
         |  AND substr(tb, len_short + 1, 1) IN ('', ' ')
         |ORDER BY doc_short, doc_long""".stripMargin
    }) { (s, d) =>
      import graft.functions.Md5Hash60.md5hash60
      val p = documents(s, d)
        .filter(size(split(col("text"), " ")) >= 16)
        .select(col("doc_id"), col("text"), length(col("text")).as("len"),
          md5hash60(expr("array_join(slice(split(text, ' '), 1, 16), ' ')")).as("pfp"))
      val a = p.select(col("doc_id").as("doc_short"), col("text").as("ta"),
        col("len").as("len_short"), col("pfp"))
      val b = p.select(col("doc_id").as("doc_long"), col("text").as("tb"),
        col("len").as("len_long"), col("pfp"))
      // pair ordered by LENGTH (id breaks ties), not by id: a truncation
      // with a larger id than its original must still pair up
      a.join(b, Seq("pfp"))
        .filter(col("len_short") < col("len_long") ||
          (col("len_short") === col("len_long") && col("doc_short") < col("doc_long")))
        .filter(expr("substr(tb, 1, CAST(len_short AS INT)) = ta") &&
          expr("substr(tb, CAST(len_short AS INT) + 1, 1) IN ('', ' ')"))
        .select(col("doc_short"), col("doc_long"),
          col("len_short").cast("long").as("len_short"),
          col("len_long").cast("long").as("len_long"))
        .orderBy(col("doc_short"), col("doc_long"))
    },

    // Exact 3-gram (shingle-set) Jaccard over a deterministic pair sample
    // (each doc vs its successor) — the ground-truth measure the MinHash
    // signatures estimate; a fixed linear-size sample, never all-pairs.
    GraftQuery.of("dedup_ngram_jaccard",
      s"""WITH $shinglesSqlCte, ssets AS (
         |  SELECT doc_id, list_sort(list_distinct(list(shingle))) AS sset
         |  FROM sh GROUP BY doc_id
         |)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  round(len(list_intersect(a.sset, b.sset))::DOUBLE /
         |        (len(a.sset) + len(b.sset) - len(list_intersect(a.sset, b.sset)))::DOUBLE,
         |        6) AS jaccard
         |FROM ssets a JOIN ssets b ON b.doc_id = a.doc_id + 1
         |ORDER BY doc_a""".stripMargin) { (s, d) =>
      // The successor self-join is reshaped as a pair-keyed rollup so the
      // shingle-set aggregate is planned ONCE: doc k's set serves as the
      // 'a' side of pair k and the 'b' side of pair k−1, so each sset row
      // explodes into those two (pair, role) rows and one groupBy(pair)
      // reassembles both sides. The a.join(b) formulation planned the
      // whole explode+collect subtree twice (once per join input) and
      // exchanged the same array payloads anyway.
      val ssets = shingles3(documents(s, d))
        .groupBy(col("doc_id"))
        .agg(expr("array_sort(array_distinct(collect_list(shingle)))").as("sset"))
      val paired = ssets.select(explode(array(
          struct(col("doc_id").as("pair"), lit(true).as("is_a"), col("sset")),
          struct((col("doc_id") - 1).as("pair"), lit(false).as("is_a"), col("sset"))))
          .as("e"))
        .select(col("e.pair").as("pair"), col("e.is_a").as("is_a"),
          col("e.sset").as("sset"))
        .groupBy(col("pair"))
        .agg(first(when(col("is_a"), col("sset")), ignoreNulls = true).as("sa"),
          first(when(!col("is_a"), col("sset")), ignoreNulls = true).as("sb"))
        .filter(col("sa").isNotNull && col("sb").isNotNull)
      paired
        .select(col("pair").as("doc_a"), (col("pair") + 1).as("doc_b"),
          round(size(array_intersect(col("sa"), col("sb"))).cast("double") /
            (size(col("sa")) + size(col("sb")) -
              size(array_intersect(col("sa"), col("sb")))).cast("double"), 6)
            .as("jaccard"))
        .orderBy(col("doc_a"))
    },

    // MinHash signature matrix over 3-shingles.
    GraftQuery.of("dedup_minhash_sig", {
      val aggCols = (0 until NumPerms)
        .map(p => f"min((hb * ${permA(p)} + ${permB(p)}) %% $MinhashMod) AS mh$p%02d")
        .mkString(",\n  ")
      s"""WITH $shinglesSqlCte, hashed AS (
         |  SELECT doc_id, ${baseHashSql("shingle")} AS hb FROM sh
         |)
         |SELECT doc_id,
         |  $aggCols
         |FROM hashed GROUP BY doc_id ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      minhashSignature(shingles3(documents(s, d))).orderBy(col("doc_id"))
    },

    // LSH candidate pairs + exact Jaccard verification.
    GraftQuery.of("dedup_lsh_pairs",
      s"""WITH $lshEdgesSqlCtes
         |SELECT doc_a, doc_b, jaccard FROM verified
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      verifiedEdgeRelation(s, d).orderBy(col("doc_a"), col("doc_b"))
    },

    // MinHash estimator quality, measured IN the engine (the dedup twin of
    // sim_recall_lsh_multi): per LSH candidate pair, the number of
    // agreeing signature components (matches/16 IS the MinHash estimate
    // of Jaccard — E[matches] = 16·J) next to the exact token-set
    // intersection/union sizes. All three emitted values are INTEGERS, so
    // the sketch-quality number is hash-checked, not a README claim; the
    // consumer divides. Shape: the candidate edges key-join the signature
    // frame (both derived from the same one-shuffle sig build), token
    // sets resolve via the same broadcast the verifier uses.
    GraftQuery.of("dedup_minhash_jaccard_est", {
      val matchSum = (0 until NumPerms)
        .map(p => f"CASE WHEN sa.mh$p%02d = sb.mh$p%02d THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH $lshEdgesSqlCtes
         |SELECT p.doc_a, p.doc_b,
         |  CAST($matchSum AS BIGINT) AS sig_matches,
         |  CAST(len(list_intersect(ta.tokset, tb.tokset)) AS BIGINT) AS inter_cnt,
         |  CAST(len(ta.tokset) + len(tb.tokset)
         |       - len(list_intersect(ta.tokset, tb.tokset)) AS BIGINT) AS union_cnt
         |FROM pairs p
         |JOIN sig sa ON sa.doc_id = p.doc_a
         |JOIN sig sb ON sb.doc_id = p.doc_b
         |JOIN tsets ta ON ta.doc_id = p.doc_a
         |JOIN tsets tb ON tb.doc_id = p.doc_b
         |ORDER BY p.doc_a, p.doc_b""".stripMargin
    }) { (s, d) =>
      val docs = documents(s, d)
      val sig = minhashSignature(shingles1(docs))
      val sa = sig.toDF(sig.columns.map(c => if (c == "doc_id") "doc_a" else s"a_$c"): _*)
      val sb = sig.toDF(sig.columns.map(c => if (c == "doc_id") "doc_b" else s"b_$c"): _*)
      val toksets = docs.select(col("doc_id"),
        expr("array_sort(array_distinct(split(text, ' ')))").as("tokset"))
      val matches = (0 until NumPerms)
        .map(p => when(col(f"a_mh$p%02d") === col(f"b_mh$p%02d"), 1).otherwise(0))
        .reduce(_ + _)
      val inter = size(array_intersect(col("ta"), col("tb")))
      candidateEdgeRelation(s, d)
        .join(sa, "doc_a").join(sb, "doc_b")
        .join(broadcast(toksets.select(col("doc_id").as("doc_a"), col("tokset").as("ta"))),
          "doc_a")
        .join(broadcast(toksets.select(col("doc_id").as("doc_b"), col("tokset").as("tb"))),
          "doc_b")
        .select(col("doc_a"), col("doc_b"),
          matches.cast("long").as("sig_matches"),
          inter.cast("long").as("inter_cnt"),
          (size(col("ta")) + size(col("tb")) - inter).cast("long").as("union_cnt"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // LSH candidates under the ORDER-SENSITIVE verifier: normalized edit
    // distance instead of token-set Jaccard. The oracle reuses the shared
    // candidate CTE chain up through `pairs` (the unused `verified` CTE
    // is pruned by the planner) and replays the same CASE-pinned 0/0
    // convention.
    GraftQuery.of("dedup_edit_pairs",
      s"""WITH $lshEdgesSqlCtes,
         |txt AS (SELECT doc_id, text FROM documents),
         |edit AS (
         |  SELECT doc_a, doc_b,
         |    CASE WHEN greatest(len(ta.text), len(tb.text)) = 0 THEN 1.0::DOUBLE
         |         ELSE round(1.0::DOUBLE - levenshtein(ta.text, tb.text)::DOUBLE /
         |                greatest(len(ta.text), len(tb.text))::DOUBLE, 6)
         |    END AS edit_sim
         |  FROM pairs
         |  JOIN txt ta ON ta.doc_id = doc_a
         |  JOIN txt tb ON tb.doc_id = doc_b)
         |SELECT doc_a, doc_b, edit_sim FROM edit
         |WHERE edit_sim >= 0.8 ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      editVerifiedPairs(documents(s, d),
        candidates = Some(candidateEdgeRelation(s, d)))
    },

    // The UTF-8 (guard-free, code-point) verifier, cross-checked through
    // an alphabet relabeling: the Spark side rewrites four frequent
    // letters to non-ASCII lookalikes (e→é t→θ a→α o→ø — injective, and
    // absent from the ASCII corpus) and verifies THAT genuinely
    // multi-byte text; the oracle is the unchanged ASCII formulation.
    // Levenshtein and length are invariant under injective per-character
    // relabeling, so the results must match EXACTLY — unless the engine
    // path counted bytes anywhere (a 2-byte é would then change both lev
    // and max(len)), which is precisely the regression this pins.
    // Candidates come from the pre-relabeling corpus (MinHash is a hash
    // of the token bytes, so the oracle's candidate CTE must see the
    // same bytes); the verify stage is what runs multilingual.
    GraftQuery.of("dedup_edit_pairs_utf8",
      s"""WITH $lshEdgesSqlCtes,
         |txt AS (SELECT doc_id, text FROM documents),
         |edit AS (
         |  SELECT doc_a, doc_b,
         |    CASE WHEN greatest(len(ta.text), len(tb.text)) = 0 THEN 1.0::DOUBLE
         |         ELSE round(1.0::DOUBLE - levenshtein(ta.text, tb.text)::DOUBLE /
         |                greatest(len(ta.text), len(tb.text))::DOUBLE, 6)
         |    END AS edit_sim
         |  FROM pairs
         |  JOIN txt ta ON ta.doc_id = doc_a
         |  JOIN txt tb ON tb.doc_id = doc_b)
         |SELECT doc_a, doc_b, edit_sim FROM edit
         |WHERE edit_sim >= 0.8 ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      val docs = documents(s, d)
      editVerifiedPairsUtf8(
        docs.withColumn("text", translate(col("text"), "etao", "éθαø")),
        candidates = Some(candidateEdgeRelation(s, d)))
    },

    // Near-dup cluster assembly: transitive closure of the verified LSH
    // edges via min-id label propagation; the DuckDB oracle computes the
    // same components with a recursive reachability CTE.
    GraftQuery.of("dedup_clusters",
      s"""WITH RECURSIVE $lshEdgesSqlCtes, sym AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM verified
         |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM verified
         |), reach AS (
         |  SELECT src AS node, src AS m FROM (SELECT DISTINCT src FROM sym)
         |  UNION
         |  SELECT s.src, r.m FROM sym s JOIN reach r ON r.node = s.dst
         |)
         |SELECT node AS doc_id, min(m) AS cluster_id
         |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin) { (s, d) =>
      clusters(verifiedEdgeRelation(s, d)).orderBy(col("doc_id"))
    },

    // End-to-end dedup deliverable: the corpus AFTER near-dup removal —
    // every document not in any cluster, plus one representative (the
    // min-id member) per cluster. This is the query a training pipeline
    // actually ships: upstream it is the same LSH → verify → closure
    // chain; the removal itself is one LEFT ANTI equi-join on doc_id
    // against the (small) non-representative set, so the corpus is
    // scanned exactly once more regardless of scale.
    GraftQuery.of("dedup_corpus_keep",
      s"""WITH RECURSIVE $lshEdgesSqlCtes, sym AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM verified
         |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM verified
         |), reach AS (
         |  SELECT src AS node, src AS m FROM (SELECT DISTINCT src FROM sym)
         |  UNION
         |  SELECT s.src, r.m FROM sym s JOIN reach r ON r.node = s.dst
         |), labels AS (
         |  SELECT node AS doc_id, min(m) AS cluster_id FROM reach GROUP BY node)
         |SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars
         |FROM documents d
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM labels WHERE doc_id <> cluster_id)
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      corpusKeepEdges(documents(s, d), verifiedEdgeRelation(s, d))
        .select(col("doc_id"), col("lang"), col("n_chars").cast("long").as("n_chars"))
        .orderBy(col("doc_id"))
    },

    // QUALITY-ARGMAX keeper selection — corpus_keep's policy upgrade:
    // production dedup keeps the BEST member of each near-dup cluster
    // (highest classifier score), not the first-seen (min-id) one
    // (RefinedWeb/FineWeb keep-best-of-dups). Per cluster: one count +
    // one argmax over (score, -doc_id) — the typed-argmax struct-max
    // idiom (J-family precedent), so the tie-break is deterministic and
    // engine-portable. The score is the registered fasttext-shape
    // classifier (text_classifier_score's integer weight sum) resolved
    // by ONE doc_id equi-join; at 100 TB the cluster frame is the small
    // side and the argmax is a map-side-combinable aggregate.
    GraftQuery.of("dedup_keep_best", {
      val w = "(('0x' || substr(md5(t), 1, 15))::UBIGINT % 2001)::BIGINT - 1000"
      s"""WITH RECURSIVE $lshEdgesSqlCtes, sym AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM verified
         |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM verified
         |), reach AS (
         |  SELECT src AS node, src AS m FROM (SELECT DISTINCT src FROM sym)
         |  UNION
         |  SELECT s.src, r.m FROM sym s JOIN reach r ON r.node = s.dst
         |), labels AS (
         |  SELECT node AS doc_id, min(m) AS cluster_id FROM reach GROUP BY node),
         |w AS (
         |  SELECT doc_id, CAST(coalesce(list_sum(list_transform(
         |    string_split(text, ' '), t -> $w)), 0) AS BIGINT) AS w
         |  FROM documents),
         |ranked AS (
         |  SELECT l.cluster_id, l.doc_id, w.w,
         |    row_number() OVER (PARTITION BY l.cluster_id
         |                       ORDER BY w.w DESC, l.doc_id) AS rn,
         |    count(*) OVER (PARTITION BY l.cluster_id) AS n_members
         |  FROM labels l JOIN w USING (doc_id))
         |SELECT cluster_id, CAST(n_members AS BIGINT) AS n_members,
         |  doc_id AS keeper_id, w AS keeper_w
         |FROM ranked WHERE rn = 1 ORDER BY cluster_id""".stripMargin
    }) { (s, d) =>
      keepBestEdges(documents(s, d), verifiedEdgeRelation(s, d))
    },

    // CDC shared-chunk near-dup detection: split every document at its
    // content-defined cut points (16-byte windowed Rabin hash, mask 63),
    // hash each chunk, and emit star edges between documents sharing at
    // least one chunk hash — the storage-dedup primitive that catches
    // partial containment (a copied paragraph) that whole-doc
    // fingerprints miss. Same star-edge discipline as LSH banding:
    // O(bucket) edges per shared chunk, never O(bucket²).
    // Oracle shape (r12): the original replay computed every window hash
    // from scratch — O(len·16) interpreted list lambdas per document —
    // which made THIS oracle the second-heaviest whole-table replay of the
    // sf10 gate (592 s; the engine side is linear). Replay is now linear:
    //   H_i = Σ_{j=i-15..i} c_j·B^(i-j)  =  B^i · Σ c_j·B^(-j)   (mod M)
    // so one per-char term c_j·IB^j (IB = B⁻¹ mod M, M prime), a 16-row
    // windowed SUM per doc, and one final modular product reconstruct every
    // window hash in one pass. Each term is a residue < 2^61, so a
    // 16-term window sum reaches 16·(2^61−1) ≈ 2^65 — past BIGINT, which
    // is why the accumulator must be HUGEINT; & 63 becomes % 64
    // (identical for the non-negative residue).
    // The chunk/keeper/pair logic below is byte-identical to before — the
    // cut POSITIONS are provably the same set, only their cost changed.
    GraftQuery.of("dedup_cdc_chunks", {
      val M = graft.functions.RollingHash61.Mod
      val B = graft.functions.RollingHash61.Base
      val IB = graft.functions.RollingHash61.BaseInv
      s"""WITH RECURSIVE pw(j, pb, pib) AS (
         |  SELECT 0::BIGINT, 1::HUGEINT, 1::HUGEINT
         |  UNION ALL
         |  SELECT j + 1, (pb * $B) % $M, (pib * $IB) % $M
         |  FROM pw WHERE j < (SELECT max(len(text)) FROM documents)
         |), chars AS (
         |  SELECT doc_id, i, ord(substr(text, i, 1))::HUGEINT AS c
         |  FROM (SELECT doc_id, text, unnest(range(1, len(text) + 1)) AS i
         |        FROM documents)
         |), hashes AS (
         |  SELECT doc_id, i,
         |    ((SUM((c * pib) % $M) OVER (PARTITION BY doc_id ORDER BY i
         |        ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) % $M) * pb) % $M AS h
         |  FROM chars JOIN pw ON pw.j = chars.i
         |), cuts AS (
         |  SELECT d.doc_id, d.text, coalesce(cl.cut, []::BIGINT[]) AS cut
         |  FROM documents d LEFT JOIN (
         |    SELECT doc_id, list(i ORDER BY i) AS cut
         |    FROM hashes WHERE i >= 16 AND (h % 64) = 0
         |    GROUP BY doc_id) cl USING (doc_id)
         |), bounds AS (
         |  SELECT doc_id, text,
         |    list_concat(list_concat([0], cut), [len(text)]) AS b
         |  FROM cuts
         |), chunks AS (
         |  SELECT DISTINCT doc_id,
         |    ${h60Sql("chunk", 0)} AS ch
         |  FROM (
         |    SELECT doc_id, unnest(list_transform(range(2, len(b) + 1),
         |      i -> substring(text, b[i-1] + 1, b[i] - b[i-1]))) AS chunk
         |    FROM bounds)
         |  WHERE len(chunk) > 0
         |), keepers AS (
         |  SELECT ch, min(doc_id) AS doc_a FROM chunks
         |  GROUP BY ch HAVING count(*) > 1
         |)
         |SELECT k.doc_a, c.doc_id AS doc_b,
         |  count(DISTINCT c.ch) AS n_shared_chunks
         |FROM chunks c JOIN keepers k ON c.ch = k.ch AND c.doc_id > k.doc_a
         |GROUP BY 1, 2 ORDER BY doc_a, doc_b""".stripMargin
    }) { (s, d) =>
      val withBounds = documents(s, d)
        .withColumn("text",
          graft.functions.CdcBoundaries.asciiOnly(col("text"), col("doc_id")))
        .select(col("doc_id"), col("text"),
        concat(array(lit(0)),
          graft.functions.CdcBoundaries.cdcBoundaries(col("text"), 16, 63),
          array(length(col("text")))).as("b"))
      val chunks = withBounds
        .select(col("doc_id"), explode(expr(
          """filter(transform(sequence(1, size(b) - 1),
            |  i -> substring(text, element_at(b, i) + 1,
            |                 element_at(b, i + 1) - element_at(b, i))),
            |  c -> length(c) > 0)""".stripMargin)).as("chunk"))
        .select(col("doc_id"), h60(col("chunk"), 0).as("ch"))
        .distinct()
      val keepers = chunks.groupBy(col("ch"))
        .agg(min(col("doc_id")).as("doc_a"), count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .select(col("ch"), col("doc_a"))
      chunks.join(keepers, Seq("ch"))
        .filter(col("doc_id") > col("doc_a"))
        .groupBy(col("doc_a"), col("doc_id").as("doc_b"))
        .agg(countDistinct(col("ch")).as("n_shared_chunks"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // 32-bit SimHash.
    GraftQuery.of("dedup_simhash", {
      val hTok = h60Sql("tok", 0)
      s"""WITH toks AS (
         |  SELECT doc_id, tok, count(*) AS cnt FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
         |  GROUP BY doc_id, tok
         |), bits AS (
         |  SELECT doc_id, j,
         |    CASE WHEN sum(cnt * ((($hTok >> j) & 1) * 2 - 1)) > 0
         |         THEN (1::BIGINT << j) ELSE 0 END AS bitval
         |  FROM toks, generate_series(0, 31) AS g(j)
         |  GROUP BY doc_id, j
         |)
         |SELECT doc_id, CAST(sum(bitval) AS BIGINT) AS simhash
         |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      simhash(documents(s, d))
    },

    // Incremental-ingest dedup: which docs of a NEW batch are exact
    // duplicates of the EXISTING corpus — the shape every continuously-fed
    // pipeline runs per ingest (dedup against what's already in, not
    // within the batch). The existing side collapses to one
    // (fingerprint → keeper) row per distinct text BEFORE the join, so
    // the join's build side is the deduped corpus dimension, and both
    // wide ops are keyed on the fingerprint. The 80/20 existing/new split
    // is hash-derived from doc_id (deterministic, data-independent).
    GraftQuery.of("dedup_incremental", {
      val h = h60Sql("doc_id::VARCHAR", 11)
      s"""WITH fp AS (
         |  SELECT doc_id,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
         |    $h % 10 AS bucket
         |  FROM documents),
         |ex AS (
         |  SELECT fp, min(doc_id) AS keeper FROM fp WHERE bucket < 8 GROUP BY 1)
         |SELECT f.doc_id, e.keeper IS NOT NULL AS is_dup_of_existing,
         |  coalesce(e.keeper, -1) AS dup_of
         |FROM fp f LEFT JOIN ex e USING (fp)
         |WHERE f.bucket >= 8 ORDER BY f.doc_id""".stripMargin
    }) { (s, d) =>
      val withBucket = documents(s, d)
        .withColumn("__bucket", pmod(h60(col("doc_id").cast("string"), 11), lit(10L)))
      incrementalDedup(
        withBucket.filter(col("__bucket") < 8),
        withBucket.filter(col("__bucket") >= 8))
    },

    // Bloom-prefiltered incremental ingest — same CONTRACT as
    // dedup_incremental (identical oracle: the sketch must be invisible
    // in the answer), different 100 TB shape: the standing index is
    // summarized into a broadcast bloom, fresh rows test map-side, and
    // only bloom-positive survivors pay the index equi-join — the
    // definite-new majority of a typical crawl batch never shuffles at
    // all. See [[incrementalDedupBloom]].
    GraftQuery.of("dedup_incremental_bloom", {
      val h = h60Sql("doc_id::VARCHAR", 11)
      s"""WITH fp AS (
         |  SELECT doc_id,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
         |    $h % 10 AS bucket
         |  FROM documents),
         |ex AS (
         |  SELECT fp, min(doc_id) AS keeper FROM fp WHERE bucket < 8 GROUP BY 1)
         |SELECT f.doc_id, e.keeper IS NOT NULL AS is_dup_of_existing,
         |  coalesce(e.keeper, -1) AS dup_of
         |FROM fp f LEFT JOIN ex e USING (fp)
         |WHERE f.bucket >= 8 ORDER BY f.doc_id""".stripMargin
    }) { (s, d) =>
      val withBucket = documents(s, d)
        .withColumn("__bucket", pmod(h60(col("doc_id").cast("string"), 11), lit(10L)))
      incrementalDedupBloom(
        withBucket.filter(col("__bucket") < 8),
        withBucket.filter(col("__bucket") >= 8))
    },

    // INCREMENTAL maintenance of the standing NEAR-DUP INDEX (r9 — the
    // D21 verified-edge artifact's refresh shape, executed and proven,
    // the dedup twin of graph_edges_incremental): the standing state is
    // what a production LSH index keeps between ingests — the per-bucket
    // (band, band_hash) → min-id index plus the verified edge set, both
    // persisted parquet artifacts built over the pre-delta corpus
    // (doc_id < kThr, kThr = the 90% point of the id range — an
    // APPEND-ONLY split: every delta id exceeds every standing id, the
    // invariant that makes keeper assignment incrementally exact).
    // [[mergeNearDupDelta]] signatures ONLY the delta docs, probes the
    // bucket index, verifies only the new candidates, and unions with the
    // standing edges. The emitted row is the lossless-refresh proof in
    // O(1) output: edge count, new-edge count, exact-integer Jaccard
    // micro-sum, and an order-independent bit_xor checksum over
    // (doc_a, doc_b) — which the oracle computes over a REBUILD FROM
    // SCRATCH of the whole chain on the full corpus. Equality says the
    // O(delta) refresh produced row-for-row what the rebuild would.
    GraftQuery.of("dedup_index_incremental", {
      val exor = GraftQuery.h60Sql("doc_a::VARCHAR || '|' || doc_b::VARCHAR")
      s"""WITH $lshEdgesSqlCtes,
         |k AS (SELECT (max(doc_id) * 9) // 10 AS kthr FROM documents)
         |SELECT CAST(count(*) AS BIGINT) AS n_edges,
         |  CAST(sum(CASE WHEN doc_b >= k.kthr THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_new_edges,
         |  CAST(sum(CAST(round(jaccard * 1000000) AS BIGINT)) AS BIGINT)
         |    AS j_micros,
         |  CAST(bit_xor($exor) AS BIGINT) AS edge_xor
         |FROM verified CROSS JOIN k""".stripMargin
    }) { (s, d) =>
      import graft.functions.Md5Hash60.md5hash60
      val docs = documents(s, d)
      // bounded driver scalar (1 row): the split point both the artifact
      // build and the delta filter key on — the editVerifiedPairs
      // eager-scalar precedent
      val kThr = docs.agg(expr("(max(doc_id) * 9) div 10").as("k"))
        .first().getLong(0)
      val merged = mergeNearDupDelta(docs,
        preDeltaBucketStats(s, d, kThr), preDeltaVerifiedEdges(s, d, kThr), kThr)
      merged.agg(
        count(lit(1)).as("n_edges"),
        count(when(col("doc_b") >= kThr, 1)).as("n_new_edges"),
        sum(round(col("jaccard") * 1000000).cast("long")).cast("long")
          .as("j_micros"),
        bit_xor(md5hash60(concat_ws("|", col("doc_a"), col("doc_b"))))
          .as("edge_xor"))
    },

    // URL CANONICALIZATION DEDUP — the crawl-frontier staple (CCNet/
    // RefinedWeb dedupe by canonical URL before ever fetching content):
    // scheme+host lowercase, tracking-only query strings stripped,
    // trailing slash normalized — then exact dedup on the canonical form.
    // The corpus has no URL column, so the three variant classes every
    // canonicalizer faces are SYNTHESIZED deterministically from doc_id:
    // cased, trailing-slashed, and utm-tracking-tagged
    // spellings of the same logical URL (doc_id div 7 ⇒ ~7-member dup
    // groups). Both engines run the IDENTICAL regex chain — the
    // canonicalizer IS the operator; the dedup downstream is D1's
    // one-shuffle groupBy keyed on the canonical string.
    GraftQuery.of("dedup_url_canonical",
      """WITH u AS (SELECT doc_id,
        |    CASE doc_id % 3
        |      WHEN 0 THEN 'https://' || 'cdn.example/page/' || (doc_id // 7)::VARCHAR
        |      WHEN 1 THEN 'HTTPS://' || 'CDN.EXAMPLE/page/' || (doc_id // 7)::VARCHAR || '/'
        |      ELSE 'https://' || 'cdn.example/page/' || (doc_id // 7)::VARCHAR || '?utm_source=feed&utm_medium=rss'
        |    END AS url
        |  FROM documents),
        |c AS (SELECT doc_id, url,
        |    regexp_replace(regexp_replace(lower(url), '\?utm_[^#]*$', ''),
        |                   '/$', '') AS canon
        |  FROM u)
        |SELECT canon, CAST(count(*) AS BIGINT) AS n_variants,
        |  CAST(min(doc_id) AS BIGINT) AS keeper,
        |  CAST(count(DISTINCT url) AS BIGINT) AS n_spellings
        |FROM c GROUP BY 1 ORDER BY canon""".stripMargin) { (s, d) =>
      val url = expr(
        """CASE CAST(doc_id % 3 AS INT)
          |  WHEN 0 THEN concat('https://cdn.example/page/', CAST(doc_id div 7 AS STRING))
          |  WHEN 1 THEN concat('HTTPS://CDN.EXAMPLE/page/', CAST(doc_id div 7 AS STRING), '/')
          |  ELSE concat('https://cdn.example/page/', CAST(doc_id div 7 AS STRING), '?utm_source=feed&utm_medium=rss')
          |END""".stripMargin)
      documents(s, d)
        .select(col("doc_id"), url.as("url"))
        .withColumn("canon",
          regexp_replace(regexp_replace(lower(col("url")), "\\?utm_[^#]*$", ""),
            "/$", ""))
        .groupBy(col("canon"))
        .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("keeper"),
          countDistinct(col("url")).as("n_spellings"))
        .orderBy(col("canon"))
    },

    // Substring-level dedup with REWRITE (Lee et al. '22 "Deduplicating
    // Training Data Makes Language Models Better", §4.1 ExactSubstr): any
    // 8-gram that also occurs in another document marks its 8 word
    // positions, and every marked position is scrubbed from the text —
    // not flagged (text_boilerplate_flags) or scored (text_ngram_novelty)
    // but REMOVED, the way production pipelines strip licenses/headers.
    // Shape at 100 TB: the gram stream crosses the wire EXACTLY ONCE —
    // a gram-partitioned window marks cross-document grams in the same
    // exchange that groups them (`occurs in >1 doc` ≡ `min(doc_id) ≠
    // max(doc_id)` over the gram's occurrence rows, so no countDistinct
    // aggregate and no join of the gram stream back to its own
    // aggregate); the rewrite is a doc_id-keyed anti join + per-doc
    // bounded reassembly, with the removed-position count derived as
    // n_words − n_kept instead of a separate aggregation of the covered
    // set. Three narrowing shuffles, state bounded by O(occurrences of
    // the hottest gram) in the spillable window buffer.
    GraftQuery.of("dedup_span_scrub",
      s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |g AS (SELECT doc_id, i AS start,
         |    list_aggregate(toks[i:i+7], 'string_agg', ' ') AS gram
         |  FROM docs, unnest(range(1, len(toks) - 6)) t(i) WHERE len(toks) >= 8),
         |cg AS (SELECT gram FROM (
         |  SELECT gram, count(DISTINCT doc_id) AS dw FROM g GROUP BY 1) WHERE dw > 1),
         |cov AS (SELECT DISTINCT g.doc_id, g.start + j AS pos
         |  FROM g JOIN cg USING (gram), unnest(range(0, 8)) u(j)),
         |w AS (SELECT doc_id, i AS pos, toks[i] AS word
         |  FROM docs, unnest(range(1, len(toks) + 1)) t(i)),
         |kept AS (SELECT w.doc_id, string_agg(w.word, ' ' ORDER BY w.pos) AS scrub
         |  FROM w ANTI JOIN cov ON w.doc_id = cov.doc_id AND w.pos = cov.pos
         |  GROUP BY 1),
         |rem AS (SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY 1)
         |SELECT d.doc_id, CAST(len(d.toks) AS BIGINT) AS n_words,
         |  CAST(coalesce(r.n_removed, 0) AS BIGINT) AS n_removed,
         |  CAST(len(coalesce(k.scrub, '')) AS BIGINT) AS scrub_len,
         |  CAST(${GraftQuery.h60Sql("coalesce(k.scrub, '')")} AS BIGINT) AS scrub_fp64
         |FROM docs d LEFT JOIN rem r USING (doc_id) LEFT JOIN kept k USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      spanScrub(documents(s, d))
    })

  /** Remove every word position covered by an n-gram that also occurs in
    * another document (cross-document exact-substring scrub). Returns one
    * row per document: original word count, removed-position count, and
    * the length + 60-bit fingerprint of the rewritten text (empty string
    * when every position is covered). See the registered
    * `dedup_span_scrub` Scaladoc for the scale analysis.
    */
  def spanScrub(docs: DataFrame, n: Int = 8): DataFrame = {
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val grams = toks.filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(toks) - ${n - 1}),
           |  i -> struct(i AS start, array_join(slice(toks, i, $n), ' ') AS gram))"""
          .stripMargin)).as("g"))
      .select(col("doc_id"), col("g.start").as("start"), col("g.gram").as("gram"))
    // A gram occurs in more than one document ⟺ min(doc_id) ≠
    // max(doc_id) over its occurrence rows — computable in a
    // gram-partitioned window, so the (gram, doc_id, start) stream is
    // exchanged ONCE and the gram-explode subtree is planned ONCE. The
    // prior formulation (countDistinct ≥ 2 aggregate, then join the
    // stream back on the gram string) shuffled the full gram strings
    // twice AND re-ran the explode on both join inputs — measured 4
    // Generate subtrees in the sf0.001 plan, 40.5 s at the 100× SF.
    val byGram = org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))
    val covered = grams
      .withColumn("__lo", min(col("doc_id")).over(byGram))
      .withColumn("__hi", max(col("doc_id")).over(byGram))
      .filter(col("__lo") =!= col("__hi"))
      .select(col("doc_id"),
        explode(sequence(col("start"), col("start") + (n - 1))).as("pos"))
      .distinct()
    val words = toks
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("p0", "word")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("word"))
    // Covered positions all lie in [1, n_words], so the removed count is
    // n_words − kept count — no separate aggregation of the covered set.
    val kept = words.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(pos, word))), x -> x.word), ' ')")
        .as("scrub"),
        count(lit(1)).as("n_kept"))
    toks.select(col("doc_id"), size(col("toks")).cast("long").as("n_words"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        (coalesce(col("n_words"), lit(0L)) - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"),
        length(coalesce(col("scrub"), lit(""))).cast("long").as("scrub_len"),
        graft.functions.Md5Hash60.md5hash60(coalesce(col("scrub"), lit("")))
          .as("scrub_fp64"))
      .orderBy(col("doc_id"))
  }

  /** Exact-dup check of a fresh batch AGAINST an existing corpus: the
    * existing side reduces to one (fingerprint, keeper=min doc_id) row
    * per distinct normalized text, then the batch LEFT-joins it on the
    * fingerprint. Both shuffles are fingerprint-keyed; at steady state
    * the (fp, keeper) dimension is exactly the dedup index a production
    * ingest keeps materialized between runs.
    */
  def incrementalDedup(existing: DataFrame, fresh: DataFrame): DataFrame = {
    val index = existing
      .groupBy(normFingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keeper"))
    fresh.select(col("doc_id"), normFingerprint(col("text")).as("fp"))
      .join(index, Seq("fp"), "left")
      .select(col("doc_id"),
        col("keeper").isNotNull.as("is_dup_of_existing"),
        coalesce(col("keeper"), lit(-1L)).as("dup_of"))
      .orderBy(col("doc_id"))
  }

  /** Bloom-prefiltered incremental dedup — [[incrementalDedup]]'s 100 TB
    * refresh shape: the standing corpus's fingerprint set is summarized
    * ONCE into a bloom sketch (bounded bytes, the broadcast-codebook
    * class of artifact), every fresh document tests against the broadcast
    * sketch map-side, and only the bloom-positive survivors pay the
    * equi-join against the standing index — bloom-negative rows are
    * DEFINITELY new (no false negatives) and short-circuit to the output
    * without ever shuffling. False positives cost one extra probe each
    * and are eliminated by the exact verify join, so the result is
    * row-identical to [[incrementalDedup]] (the oracle replays the exact
    * semantics; the sketch is invisible in the answer). At a daily-batch
    * cadence the sketch is built once per index version and reused across
    * batches; the verify join degrades gracefully as FP rate rises — the
    * sketch is sized here for ~1M items at ~3% FP.
    */
  def incrementalDedupBloom(existing: DataFrame, fresh: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val fpL = graft.functions.Md5Hash60.md5hash60(
      regexp_replace(lower(trim(col("text"))), "\\s+", " "))
    val index = existing
      .groupBy(normFingerprint(col("text")).as("fp"), fpL.as("fpl"))
      .agg(min(col("doc_id")).as("keeper"))
    // bounded sketch collect (~1.2 MB) — the same discipline as the
    // IVF codebooks and zone maps: driver holds the summary, never rows
    val bloomBytes = index
      .agg(Bridge.bloomFilterAgg(col("fpl"), 1L << 20).as("bf"))
      .collect()(0).getAs[Array[Byte]]("bf")
    // EMPTY standing corpus → bloom_filter_agg yields NULL, and a null
    // sketch would fail at execution; semantically every fresh row is
    // then definitely new, which is exactly `maybe = false`
    val maybeCol =
      if (bloomBytes == null) lit(false)
      else Bridge.mightContain(bloomBytes, col("fpl"))
    val tagged = fresh
      .select(col("doc_id"), normFingerprint(col("text")).as("fp"), fpL.as("fpl"))
      .withColumn("maybe", maybeCol)
    val definiteNew = tagged.filter(!col("maybe"))
      .select(col("doc_id"), lit(false).as("is_dup_of_existing"),
        lit(-1L).as("dup_of"))
    val verified = tagged.filter(col("maybe"))
      .join(index.select(col("fp"), col("keeper")), Seq("fp"), "left")
      .select(col("doc_id"),
        col("keeper").isNotNull.as("is_dup_of_existing"),
        coalesce(col("keeper"), lit(-1L)).as("dup_of"))
    definiteNew.unionByName(verified).orderBy(col("doc_id"))
  }
}
