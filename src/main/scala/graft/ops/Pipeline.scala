package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Corpus-preparation operators a large-scale training-data pipeline runs
  * after cleaning/dedup: deterministic splitting, stratified subsampling,
  * token-budget shard packing, and benchmark decontamination. Every one
  * is a single-shuffle shape keyed on a bounded column, and every one is
  * hash-derived (md5) rather than RNG-seeded, so results replay
  * identically across engines, sessions, and cluster sizes.
  */
object Pipeline {

  import graft.functions.Md5Hash60.md5hash60

  import GraftQuery.h60Sql

  /** Deterministic train/val/test assignment: hash-bucket the stable doc
    * id into [0, 100) and band it 80/10/10. Hash-derived splits are the
    * production pattern (a row's split never depends on partitioning,
    * ordering, or corpus growth — only on its own id), and they need no
    * shuffle at all until the verifying aggregation.
    */
  def hashSplit(docs: DataFrame): DataFrame =
    docs.withColumn("__bucket", pmod(md5hash60(col("doc_id").cast("string")), lit(100)))
      .withColumn("split",
        when(col("__bucket") < 80, "train")
          .when(col("__bucket") < 90, "val")
          .otherwise("test"))

  /** Deterministic global training-order shuffle: each doc's position is
    * a pure function of its id — shard = hash mod `shards`, offset = rank
    * of the (salted) hash WITHIN the shard. A data loader reading shards
    * round-robin sees a reproducible pseudo-random permutation of the
    * corpus with no global sort: the only wide ops are the hash-keyed
    * shard partitioning and a per-shard rank window (each shard is
    * corpus/`shards`, so the sort is bounded and embarrassingly parallel
    * across shards — never a single-partition global row_number).
    */
  def shuffleOrder(docs: DataFrame, shards: Int, seed: Int = 7): DataFrame = {
    val key = Dedup.h60(col("doc_id").cast("string"), seed)
    val w = Window.partitionBy(col("shard")).orderBy(col("__key"), col("doc_id"))
    docs.withColumn("__key", key)
      .withColumn("shard", pmod(col("__key"), lit(shards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Deterministic weighted subsample to a uniform `stratum` mixture:
    * every stratum Bernoulli-downsampled to ≈ the rarest stratum's
    * volume. Membership is a pure function of the doc id (salted-hash
    * threshold), so the corpus side is shuffle-free — the only wide op
    * is the tiny per-stratum count, broadcast back. The keep test
    * compares INTEGERS (hash mod 1e6 < (min·1e6) div n); no float rate
    * exists to round differently across engines or runs.
    */
  def weightedUniformSample(docs: DataFrame, stratum: String = "lang",
      seed: Int = 13): DataFrame = {
    val c = docs.groupBy(col(stratum)).agg(count(lit(1)).as("n"))
    val m = broadcast(c.agg(min(col("n")).as("mn")))
    docs.join(broadcast(c), stratum).crossJoin(m)
      .filter(pmod(Dedup.h60(col("doc_id").cast("string"), seed), lit(1000000L)) <
        expr("(mn * 1000000) div n"))
      .drop("n", "mn")
  }

  /** Per-stratum deterministic sample: the `perStratum` docs with the
    * smallest md5-order rank within each stratum. One shuffle keyed on
    * the stratum; the rank window sorts only within strata (bounded by
    * stratum size, and a TopK-per-key aggregation at extreme skew).
    */
  def stratifiedSample(docs: DataFrame, stratum: String, perStratum: Int): DataFrame = {
    val w = Window.partitionBy(col(stratum))
      .orderBy(md5hash60(col("doc_id").cast("string")), col("doc_id"))
    docs.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= perStratum)
  }

  /** Token-budget shard packing: within each language, docs are laid out
    * in stable doc_id order and cut into contiguous shards of ~`budget`
    * tokens (a shard holds the docs whose running token count falls in
    * the same budget window — the deterministic approximation of
    * sequence packing). The running sum is a lang-partitioned window:
    * one shuffle on lang; at extreme per-key volume the same shape runs
    * as a range-partitioned parallel prefix sum.
    */
  def packByTokenBudget(docs: DataFrame, budget: Long): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("__run", sum(col("n_tokens")).over(w))
      .withColumn("shard", floor((col("__run") - col("n_tokens")) / budget))
  }

  /** The 100 TB shape of [[packByTokenBudget]]: a two-phase parallel
    * prefix sum instead of a per-lang sequential window. Phase 1
    * range-partitions on (lang, doc_id), sorts within partitions, and
    * computes per-partition per-lang LOCAL running sums in one pass.
    * The per-(partition, lang) subtotals — at most P × |langs| rows —
    * come to the driver, prefix-combine into start offsets, and broadcast
    * back; phase 2 adds each row's offset. No partition ever waits on
    * another; the sequential dependency collapses to the driver-side
    * combine of P subtotals. Output is row-identical to the window form
    * (same order, same sums), proven by the shared oracle and a direct
    * equivalence test.
    */
  def packByTokenBudgetDist(docs: DataFrame, budget: Long, partitions: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // localCheckpoint pins ONE range partitioning: the subtotal scan and
    // the phase-2 scan must see identical partition boundaries (range
    // partitioning samples, so two evaluations could split differently)
    val local = docs
      .select(col("lang"), col("doc_id").cast("long").as("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .repartitionByRange(p, col("lang"), col("doc_id"))
      .sortWithinPartitions(col("lang"), col("doc_id"))
      .select(col("lang"), col("doc_id"), col("n_tokens"), spark_partition_id().as("pid"))
      .as[(String, Long, Long, Int)]
      .mapPartitions { it =>
        var curLang: String = null
        var run = 0L
        it.map { case (lang, id, n, pid) =>
          if (lang != curLang) { curLang = lang; run = 0L }
          run += n
          (lang, id, n, pid, run)
        }
      }
      .toDF("lang", "doc_id", "n_tokens", "pid", "local_run")
      .localCheckpoint(true)
    val subtotals = local.groupBy(col("pid"), col("lang"))
      .agg(max(col("local_run")).as("t"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val offsets: Map[(Int, String), Long] = subtotals
      .groupBy(_._2)
      .flatMap { case (lang, rows) =>
        val sorted = rows.sortBy(_._1)
        val starts = sorted.scanLeft(0L)(_ + _._3)
        sorted.map(_._1).zip(starts).map { case (pid, off) => (pid, lang) -> off }
      }
    val bOff = spark.sparkContext.broadcast(offsets)
    local.as[(String, Long, Long, Int, Long)]
      .map { case (lang, id, n, pid, lr) =>
        (lang, id, n, lr + bOff.value.getOrElse((pid, lang), 0L))
      }
      .toDF("lang", "doc_id", "n_tokens", "__run")
      .withColumn("shard", floor((col("__run") - col("n_tokens")) / budget))
  }

  /** Snapshot diff: classify every key across two (key, fingerprint)
    * snapshot projections as added / removed / changed / unchanged via one
    * FULL OUTER equi-join on the key. Only (key, 60-bit hash) pairs move —
    * the caller projects content down to a fingerprint before calling, so
    * at 100 TB the join shuffles ~16 bytes/row per side. Powers the
    * registered `pipeline_snapshot_diff` query AND is callable on any
    * keyed pair of frames (the unit tests drive THIS function).
    */
  def snapshotDiff(old: DataFrame, neu: DataFrame, key: String = "doc_id"): DataFrame =
    old.as("o").join(neu.as("n"), col(s"o.$key") === col(s"n.$key"), "full_outer")
      .select(coalesce(col(s"o.$key"), col(s"n.$key")).as(key),
        when(col(s"o.$key").isNull, "added")
          .when(col(s"n.$key").isNull, "removed")
          .when(col("o.h") =!= col("n.h"), "changed")
          .otherwise("unchanged").as("status"))

  /** Benchmark decontamination: a document is contaminated if it shares
    * ANY `n`-token shingle with the benchmark set. Shingles are hashed to
    * 60-bit ints; the benchmark shingle set is tiny by construction
    * (benchmarks are small), so the probe is a broadcast LEFT SEMI join —
    * one corpus scan, no shuffle of the corpus. Documents shorter than
    * `n` tokens carry no shingles and cannot be contaminated.
    */
  def contaminatedDocIds(docs: DataFrame, benchmark: DataFrame, n: Int = 8): DataFrame =
    shingleHashes(docs, n)
      .join(broadcast(shingleHashes(benchmark, n).select(col("shash")).distinct()),
        Seq("shash"), "left_semi")
      .select(col("doc_id")).distinct()

  /** (keep..., shash) stream of hashed `n`-token shingles — the shared
    * primitive under [[contaminatedDocIds]] and the split-leakage audit.
    * Only the `keep` columns ride through the explode (the exploded
    * stream is tokens-per-doc × wide, so dragging `text` itself through
    * it would multiply the corpus).
    *
    * Tokenize ONCE into a bound column before the lambda: Spark does not
    * hoist loop-invariant subexpressions out of higher-order-function
    * lambdas, so an inline split(text) would re-tokenize per shingle —
    * O(tokens²) per document. sequence(1, 0) would DESCEND in Spark, so
    * short docs need the explicit empty-array branch (explode then drops
    * the row).
    */
  private[graft] def shingleHashes(df: DataFrame, n: Int,
      keep: Seq[String] = Seq("doc_id")): DataFrame =
    df.withColumn("__t", split(col("text"), " "))
      .select(keep.map(col) :+ explode(expr(
        s"""CASE WHEN size(__t) < $n THEN array()
           |ELSE transform(sequence(1, size(__t) - ${n - 1}),
           |  i -> concat_ws(' ', slice(__t, i, $n))) END""".stripMargin)).as("sh"): _*)
      .select((keep.map(col) :+ md5hash60(col("sh")).as("shash")): _*)

  /** Sliding-window (context, target) training examples from each user's
    * time-ordered event-type sequence (see the `pipeline_seq_examples`
    * registration for the pipeline role). Sequence order is (ts,
    * event_id) — the struct sort's field order — so ties are pinned.
    * Positions are 1-based; a user emits examples for positions
    * ctxLen+1 … len, i.e. users with ≤ ctxLen events emit nothing.
    * Callable on any events-schema frame (unit tests drive THIS).
    */
  def seqExamples(ev: DataFrame, ctxLen: Int): DataFrame = {
    ev.select(col("user_id"),
        struct(col("ts"), col("event_id"), col("event_type")).as("e"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("e"))).as("evs"))
      .select(col("user_id"), expr("transform(evs, x -> x.event_type)").as("types"))
      .filter(size(col("types")) > ctxLen)
      .select(col("user_id"), explode(expr(
        s"""transform(sequence(${ctxLen + 1}, size(types)), p -> struct(
           |  CAST(p AS BIGINT) AS pos,
           |  array_join(slice(types, p - $ctxLen, $ctxLen), ' ') AS context,
           |  element_at(types, p) AS target))""".stripMargin)).as("ex"))
      .select(col("user_id"), col("ex.pos").as("pos"),
        col("ex.context").as("context"), col("ex.target").as("target"))
      .orderBy(col("user_id"), col("pos"))
  }

  /** Leave-last-k-per-user temporal split (see the
    * `pipeline_temporal_split` registration): each user's last `k` events
    * by (ts, event_id) are 'eval', the rest 'train'. Emits
    * per-(split, event_type) counts + an event_id XOR checksum — the
    * row-level assignment, aggregate-verified. Callable on any
    * events-schema frame (unit tests drive THIS).
    */
  def temporalSplit(ev: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    ev.withColumn("__rk", row_number().over(w))
      .withColumn("split", when(col("__rk") <= k, "eval").otherwise("train"))
      .groupBy(col("split"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        expr("CAST(bit_xor(event_id) AS BIGINT)").as("xor_ids"))
      .orderBy(col("split"), col("event_type"))
  }

  def queries: Seq[GraftQuery] = Seq(

    // WINSORIZATION — the outlier-robust ML-prep clip: per event type,
    // values clamp to the exact rank-based [p1, p99] (value at rank
    // ceil(n/100) / ceil(99n/100) — THE RankStats.valueAtCeilRanks
    // idiom, same discipline as dq_outlier_fences: integer cents, no
    // interpolated float quantile on either engine; at 100 TB the ranks
    // swap for approx_percentile with the identical report shape). One
    // type-keyed rank window + a broadcast #types-row cut frame joined
    // back for the clip counts and the winsorized sum the downstream
    // mean consumes.
    GraftQuery.of("pipeline_winsorize",
      """WITH c AS (SELECT event_id, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |r AS (SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n FROM c),
        |q AS (SELECT event_type,
        |    max(CASE WHEN rn <= (1 * n + 99) // 100 THEN cents END) AS p01,
        |    max(CASE WHEN rn <= (99 * n + 99) // 100 THEN cents END) AS p99
        |  FROM r GROUP BY 1)
        |SELECT c.event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(max(p01) AS BIGINT) AS p01_cents,
        |  CAST(max(p99) AS BIGINT) AS p99_cents,
        |  CAST(sum(CASE WHEN cents < p01 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
        |  CAST(sum(CASE WHEN cents > p99 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
        |  CAST(sum(greatest(least(cents, p99), p01)) AS BIGINT) AS sum_winsor_cents
        |FROM c JOIN q USING (event_type)
        |GROUP BY 1 ORDER BY event_type""".stripMargin) { (s, d) =>
      val c = events(s, d).select(col("event_id"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val cuts = RankStats.valueAtCeilRanks(c, part = "event_type",
          value = "cents", tie = "event_id",
          fracs = Seq(("p01_cents", 1, 100), ("p99_cents", 99, 100)))
        .select(col("event_type"), col("p01_cents"), col("p99_cents"))
      c.join(broadcast(cuts), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"),
          max(col("p01_cents")).as("p01_cents"),
          max(col("p99_cents")).as("p99_cents"),
          sum(when(col("cents") < col("p01_cents"), 1L).otherwise(0L)).as("n_clip_lo"),
          sum(when(col("cents") > col("p99_cents"), 1L).otherwise(0L)).as("n_clip_hi"),
          sum(greatest(least(col("cents"), col("p99_cents")), col("p01_cents")))
            .as("sum_winsor_cents"))
        .orderBy(col("event_type"))
    },

    // FEATURE HASHING (the "hashing trick") — the fixed-width
    // featurization that makes bag-of-words viable at 100 TB: every
    // token maps to dim = h60(token) % 1024, so the feature space is
    // 1024 wide REGARDLESS of vocabulary size — no vocab dictionary to
    // build, broadcast, or keep consistent across batches (the entire
    // point of the trick; a vocab-indexed encoding needs a second pass +
    // a dictionary join). Per dim: total token mass and the number of
    // DISTINCT terms sharing it — the collision audit that tells you
    // whether 1024 is wide enough. Two narrowing map-side-combinable
    // aggregates ((dim,term) → dim), top-30 cut is a bounded
    // TakeOrderedAndProject; the md5-60 hash is the engine-shared parity
    // idiom, so the oracle replays the identical dimension assignment.
    GraftQuery.of("pipeline_feature_hash",
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         |t AS (SELECT tok, ${h60Sql("tok")} % 1024 AS dim FROM tok WHERE tok <> ''),
         |g AS (SELECT dim, tok, count(*) AS c FROM t GROUP BY 1, 2)
         |SELECT CAST(dim AS BIGINT) AS dim,
         |  CAST(sum(c) AS BIGINT) AS n_tokens,
         |  CAST(count(*) AS BIGINT) AS n_terms
         |FROM g GROUP BY 1 ORDER BY n_tokens DESC, dim LIMIT 30""".stripMargin) { (s, d) =>
      documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .withColumn("dim", (md5hash60(col("tok")) % 1024).cast("long"))
        .groupBy(col("dim"), col("tok")).agg(count(lit(1)).as("c"))
        .groupBy(col("dim"))
        .agg(sum(col("c")).cast("long").as("n_tokens"),
          count(lit(1)).cast("long").as("n_terms"))
        .orderBy(col("n_tokens").desc, col("dim"))
        .limit(30)
    },

    // EQUAL-FREQUENCY QUANTILE BINNING (quantile discretizer) — the
    // ML-prep pass that turns a numeric feature into 10 equal-population
    // bins, run scale-safe: exact global ntile(10) via the BLOCKED
    // two-phase primitive (RankStats.blockedNtile — per-block
    // key-partitioned row_numbers + an in-plan prefix over the bounded
    // cents-div-1000 block dimension; NO global sort window, NO driver
    // state), then a 10-row summary (count + exact cent cut points per
    // bin). The oracle states the same ntile(10) as the textbook global
    // window — which is exactly the formulation this primitive replaces
    // at 100 TB. Integer cents end to end.
    GraftQuery.of("pipeline_quantile_bins",
      """WITH c AS (SELECT event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |q AS (SELECT cents,
        |    ntile(10) OVER (ORDER BY cents, event_id) AS bin FROM c)
        |SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n,
        |  CAST(min(cents) AS BIGINT) AS lo_cents,
        |  CAST(max(cents) AS BIGINT) AS hi_cents
        |FROM q GROUP BY 1 ORDER BY bin""".stripMargin) { (s, d) =>
      val c = events(s, d).select(col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      RankStats.blockedNtile(c, "bin", k = 10, m = "cents", tie = "event_id",
          desc = false, blk = expr("cents div 1000"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          min(col("cents")).as("lo_cents"), max(col("cents")).as("hi_cents"))
        .orderBy(col("bin"))
    },

    // DATASET CARD — the one-row summary block every published training
    // set ships (docs, languages, sources, token/char volume, exact-dup
    // rate): all integer-exact, composed from the families above in one
    // scan + one fingerprint-keyed distinct (the only shuffle beyond the
    // scalar aggregates; normFingerprint is THE dedup definition, not a
    // copy). dup_rows = docs − distinct fingerprints is the headline
    // contamination number a data consumer checks first.
    GraftQuery.of("pipeline_dataset_card",
      """SELECT count(*) AS n_docs,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')))
        |    AS BIGINT) AS n_distinct_fp,
        |  count(*) - CAST(count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')))
        |    AS BIGINT) AS dup_rows
        |FROM documents""".stripMargin) { (s, d) =>
      val fp = graft.ops.Dedup.normFingerprint(col("text"))
      documents(s, d).agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        sum(expr("size(split(text, ' '))")).cast("long").as("total_tokens"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        countDistinct(fp).as("n_distinct_fp"),
        (count(lit(1)) - countDistinct(fp)).as("dup_rows"))
    },

    // 80/10/10 hash split with per-split stats — green iff every row
    // lands in the same band on both engines.
    GraftQuery.of("pipeline_hash_split", {
      val h = h60Sql("doc_id::VARCHAR")
      s"""SELECT split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM (
         |  SELECT n_chars,
         |    CASE WHEN $h % 100 < 80 THEN 'train'
         |         WHEN $h % 100 < 90 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents)
         |GROUP BY split ORDER BY split""".stripMargin
    }) { (s, d) =>
      hashSplit(documents(s, d))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).cast("long").as("total_chars"))
        .orderBy(col("split"))
    },

    // Stratified 20-per-language sample, emitted row-by-row so the oracle
    // verifies the exact sample membership and order, not just counts.
    GraftQuery.of("pipeline_stratified_sample", {
      val h = h60Sql("doc_id::VARCHAR")
      s"""SELECT lang, rnk, doc_id FROM (
         |  SELECT lang, doc_id,
         |    CAST(row_number() OVER (PARTITION BY lang ORDER BY $h, doc_id) AS BIGINT) AS rnk
         |  FROM documents)
         |WHERE rnk <= 20 ORDER BY lang, rnk""".stripMargin
    }) { (s, d) =>
      stratifiedSample(documents(s, d), "lang", 20)
        .select(col("lang"), col("rnk"), col("doc_id"))
        .orderBy(col("lang"), col("rnk"))
    },

    // 2000-token contiguous shards per language with shard-level stats —
    // the packing layout a pretraining data loader consumes.
    GraftQuery.of("pipeline_pack_shards",
      """SELECT lang, shard, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
        |FROM (
        |  SELECT lang, n_tokens,
        |    CAST(floor((run - n_tokens) / 2000.0) AS BIGINT) AS shard
        |  FROM (
        |    SELECT lang, len(string_split(text, ' '))::BIGINT AS n_tokens,
        |      CAST(sum(len(string_split(text, ' '))) OVER (PARTITION BY lang ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run
        |    FROM documents))
        |GROUP BY lang, shard ORDER BY lang, shard""".stripMargin) { (s, d) =>
      packByTokenBudget(documents(s, d), budget = 2000L)
        .groupBy(col("lang"), col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).cast("long").as("shard_tokens"))
        .orderBy(col("lang"), col("shard"))
    },

    // Same packing, distributed-prefix-sum physical plan, SAME oracle —
    // the green row proves the parallel formulation is row-identical to
    // the sequential-window semantics.
    GraftQuery.of("pipeline_pack_shards_dist",
      """SELECT lang, shard, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
        |FROM (
        |  SELECT lang, n_tokens,
        |    CAST(floor((run - n_tokens) / 2000.0) AS BIGINT) AS shard
        |  FROM (
        |    SELECT lang, len(string_split(text, ' '))::BIGINT AS n_tokens,
        |      CAST(sum(len(string_split(text, ' '))) OVER (PARTITION BY lang ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run
        |    FROM documents))
        |GROUP BY lang, shard ORDER BY lang, shard""".stripMargin) { (s, d) =>
      packByTokenBudgetDist(documents(s, d), budget = 2000L)
        .groupBy(col("lang"), col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).cast("long").as("shard_tokens"))
        .orderBy(col("lang"), col("shard"))
    },

    // LENGTH-GROUPED BATCHING — the dataloader's padding-efficiency op
    // (pack_shards' fixed-COUNT sibling): batches of 32 docs pad every
    // member to the batch max, so waste = Σ(max_len·n − Σlen); grouping
    // by length before chunking is how every training loader (bucketed
    // batching) cuts that waste. Deterministic + distributed: shard =
    // h60(doc_id) % 8 models independent loader workers (each sorts ONLY
    // its shard — per-shard windows, never a global sort; at 100 TB the
    // shard count scales with workers and each sort is the pass the
    // loader runs anyway), batch = consecutive 32-chunks of the
    // (len, doc_id) order. The salted-hash "arrival" order — the
    // unbucketed baseline — rides along; grouped_no_worse pins the whole
    // point of the op (sorted-consecutive chunking never pads more than
    // arrival-order chunking). All-integer wastes through the hash gate.
    GraftQuery.of("pipeline_length_batches", {
      val hs = h60Sql("doc_id::VARCHAR")
      val ha = h60Sql("doc_id::VARCHAR || ':arrival'")
      s"""WITH base AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS len,
         |    CAST($hs % 8 AS BIGINT) AS shard, $ha AS arr FROM documents),
         |sortb AS (SELECT shard, batch,
         |    CAST(count(*) AS BIGINT) AS nd,
         |    CAST(max(len) * count(*) - CAST(sum(len) AS BIGINT) AS BIGINT) AS waste
         |  FROM (SELECT shard, len,
         |      (row_number() OVER (PARTITION BY shard ORDER BY len, doc_id) - 1) // 32 AS batch
         |    FROM base) GROUP BY 1, 2),
         |arrb AS (SELECT shard, batch,
         |    CAST(max(len) * count(*) - CAST(sum(len) AS BIGINT) AS BIGINT) AS waste
         |  FROM (SELECT shard, len,
         |      (row_number() OVER (PARTITION BY shard ORDER BY arr, doc_id) - 1) // 32 AS batch
         |    FROM base) GROUP BY 1, 2),
         |ws AS (SELECT shard, CAST(sum(nd) AS BIGINT) AS n_docs,
         |    CAST(count(*) AS BIGINT) AS n_batches,
         |    CAST(sum(waste) AS BIGINT) AS waste_sorted FROM sortb GROUP BY 1),
         |wa AS (SELECT shard, CAST(sum(waste) AS BIGINT) AS waste_arrival
         |  FROM arrb GROUP BY 1)
         |SELECT ws.shard AS shard, n_docs, n_batches, waste_sorted, waste_arrival,
         |  waste_sorted <= waste_arrival AS grouped_no_worse
         |FROM ws JOIN wa ON ws.shard = wa.shard ORDER BY shard""".stripMargin
    }) { (s, d) =>
      val base = documents(s, d)
        .select(col("doc_id"), col("n_chars").cast("long").as("len"))
        .withColumn("shard", pmod(md5hash60(col("doc_id").cast("string")), lit(8L)))
        .withColumn("arr",
          md5hash60(concat(col("doc_id").cast("string"), lit(":arrival"))))
      def batchWaste(ord: Seq[org.apache.spark.sql.Column]) = base
        .withColumn("rn", row_number().over(Window.partitionBy(col("shard")).orderBy(ord: _*)))
        .withColumn("batch", expr("CAST((rn - 1) div 32 AS BIGINT)"))
        .groupBy(col("shard"), col("batch"))
        .agg(count(lit(1)).cast("long").as("nd"),
          (max(col("len")) * count(lit(1)) - sum(col("len"))).cast("long").as("waste"))
      val ws = batchWaste(Seq(col("len"), col("doc_id")))
        .groupBy(col("shard"))
        .agg(sum(col("nd")).cast("long").as("n_docs"),
          count(lit(1)).cast("long").as("n_batches"),
          sum(col("waste")).cast("long").as("waste_sorted"))
      val wa = batchWaste(Seq(col("arr"), col("doc_id")))
        .groupBy(col("shard"))
        .agg(sum(col("waste")).cast("long").as("waste_arrival"))
      ws.join(wa, "shard")
        .select(col("shard"), col("n_docs"), col("n_batches"),
          col("waste_sorted"), col("waste_arrival"),
          (col("waste_sorted") <= col("waste_arrival")).as("grouped_no_worse"))
        .orderBy(col("shard"))
    },

    // Decontamination against a stand-in benchmark (docs 0..9): per-lang
    // survivor counts after dropping any document sharing an 8-token
    // shingle with it. The benchmark members themselves are excluded from
    // the corpus side first (they trivially self-overlap).
    GraftQuery.of("pipeline_decontaminate", {
      val h = h60Sql("sh")
      s"""WITH toks AS (
         |  SELECT doc_id, lang, n_chars, string_split(text, ' ') AS t FROM documents
         |), sh AS (
         |  SELECT doc_id, $h AS shash FROM (
         |    SELECT doc_id, unnest(list_transform(
         |      range(1, greatest(len(t) - 6, 1)),
         |      i -> array_to_string(t[i:i+7], ' '))) AS sh
         |    FROM toks)
         |), bench AS (
         |  SELECT DISTINCT shash FROM sh WHERE doc_id < 10
         |), contaminated AS (
         |  SELECT DISTINCT s.doc_id FROM sh s JOIN bench b USING (shash)
         |  WHERE s.doc_id >= 10
         |)
         |SELECT t.lang, count(*) AS n_docs, count(c.doc_id) AS n_contaminated
         |FROM toks t LEFT JOIN contaminated c USING (doc_id)
         |WHERE t.doc_id >= 10
         |GROUP BY t.lang ORDER BY t.lang""".stripMargin
    }) { (s, d) =>
      val docs = documents(s, d)
      val bench = docs.filter(col("doc_id") < 10)
      val corpus = docs.filter(col("doc_id") >= 10)
      val bad = contaminatedDocIds(corpus, bench, n = 8)
        .withColumn("__bad", lit(1))
      corpus.join(broadcast(bad), Seq("doc_id"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          count(col("__bad")).as("n_contaminated"))
        .orderBy(col("lang"))
    },

    // SPLIT-LEAKAGE audit — decontamination's inward-facing twin: after
    // the deterministic train/val/test hash split, count holdout documents
    // that share ANY 8-token shingle with a TRAIN document (train→holdout
    // leakage is what silently inflates eval numbers). Unlike the
    // benchmark probe, NEITHER side is small — train shingles are 80% of
    // the corpus — so the semi join is a plain shash-keyed shuffle (the
    // honest 100 TB shape; no broadcast pretence), and everything upstream
    // of it is the shared [[shingleHashes]] explode with map-side DISTINCT
    // collapse. Same-split sharing is deliberately NOT leakage.
    GraftQuery.of("pipeline_split_leakage", {
      val h = h60Sql("doc_id::VARCHAR")
      val hs = h60Sql("sh")
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t,
         |    CASE WHEN $h % 100 < 80 THEN 'train'
         |         WHEN $h % 100 < 90 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents
         |), sh AS (
         |  SELECT doc_id, split, $hs AS shash FROM (
         |    SELECT doc_id, split, unnest(list_transform(
         |      range(1, greatest(len(t) - 6, 1)),
         |      i -> array_to_string(t[i:i+7], ' '))) AS sh
         |    FROM toks)
         |), tr AS (
         |  SELECT DISTINCT shash FROM sh WHERE split = 'train'
         |), leaked AS (
         |  SELECT DISTINCT s.doc_id FROM sh s JOIN tr USING (shash)
         |  WHERE s.split <> 'train'
         |)
         |SELECT t.split, count(*) AS n_docs, count(l.doc_id) AS n_leaked
         |FROM toks t LEFT JOIN leaked l USING (doc_id)
         |WHERE t.split <> 'train'
         |GROUP BY 1 ORDER BY 1""".stripMargin
    }) { (s, d) =>
      val sp = hashSplit(documents(s, d))
      val holdout = sp.filter(col("split") =!= "train")
      val leaked = shingleHashes(holdout, 8)
        .join(shingleHashes(sp.filter(col("split") === "train"), 8)
          .select(col("shash")).distinct(), Seq("shash"), "left_semi")
        .select(col("doc_id")).distinct()
        .withColumn("__l", lit(1))
      holdout.join(leaked, Seq("doc_id"), "left")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), count(col("__l")).as("n_leaked"))
        .orderBy(col("split"))
    },

    // Data-mixture re-weighting: per-language sampling weight that turns
    // the observed language distribution into a UNIFORM target mixture —
    // weight(lang) = target_frac / observed_frac = total / (n_langs · n).
    // The shape every mixture scheduler needs: one tiny groupBy, totals
    // broadcast back as a single-row frame; integers divide exactly, so
    // the 6dp-rounded doubles are bit-identical across engines.
    GraftQuery.of("pipeline_mix_weights",
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total,
        |             CAST(count(*) AS BIGINT) AS n_langs FROM c)
        |SELECT lang, CAST(n AS BIGINT) AS n_docs,
        |  round(CAST(total AS DOUBLE) / (n_langs * n), 6) AS weight
        |FROM c, t ORDER BY lang""".stripMargin) { (s, d) =>
      val c = documents(s, d).groupBy(col("lang")).agg(count(lit(1)).as("n"))
      // totals via an unpartitioned window over the lang-bounded frame —
      // a second c.agg would re-execute the documents scan + lang
      // shuffle to sum a handful of rows (r15 two-scan sweep)
      val tw = Window.partitionBy()
      c.withColumn("total", sum(col("n")).over(tw).cast("long"))
        .withColumn("n_langs", count(lit(1)).over(tw).cast("long"))
        .select(col("lang"), col("n").as("n_docs"),
          round(col("total").cast("double") / (col("n_langs") * col("n")), 6)
            .as("weight"))
        .orderBy(col("lang"))
    },

    // Deterministic training-order shuffle into 8 shards, emitted
    // row-by-row so the oracle verifies the exact permutation (every
    // doc's shard AND offset), not just shard sizes.
    GraftQuery.of("pipeline_shuffle_order", {
      val h = Dedup.h60Sql("doc_id::VARCHAR", 7)
      s"""SELECT shard, pos, doc_id FROM (
         |  SELECT doc_id, $h % 8 AS shard,
         |    CAST(row_number() OVER (PARTITION BY $h % 8 ORDER BY $h, doc_id)
         |      AS BIGINT) AS pos
         |  FROM documents)
         |ORDER BY shard, pos""".stripMargin
    }) { (s, d) =>
      shuffleOrder(documents(s, d), 8)
        .select(col("shard"), col("pos"), col("doc_id"))
        .orderBy(col("shard"), col("pos"))
    },

    // SHUFFLE-QUALITY AUDIT — "is my shuffle actually mixing": over
    // pipeline_shuffle_order's deterministic permutation, count adjacent
    // pairs that share a language per shard (the serial-correlation
    // statistic a training pipeline checks before trusting an order —
    // clumped languages = correlated gradients) next to the collision
    // numerator Σ c_l·(c_l−1), so the consumer compares the observed
    // adjacent-same fraction n_adjacent_same/n_pairs against the
    // random-order expectation coll_num/(n·(n−1)) — the estimator-
    // precedent split: exact integers in the gate, the ratio assembled
    // downstream. One per-shard lag window (the permutation's own sort,
    // never global) + two narrowing aggregates.
    GraftQuery.of("pipeline_shuffle_audit", {
      val h = Dedup.h60Sql("doc_id::VARCHAR", 7)
      s"""WITH base AS (SELECT doc_id, lang, $h % 8 AS shard, $h AS hv FROM documents),
         |ord AS (SELECT shard, lang,
         |    lag(lang) OVER (PARTITION BY shard ORDER BY hv, doc_id) AS prev
         |  FROM base),
         |adj AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(count(CASE WHEN prev = lang THEN 1 END) AS BIGINT) AS n_adjacent_same
         |  FROM ord GROUP BY 1),
         |cl AS (SELECT shard, CAST(sum(c * (c - 1)) AS BIGINT) AS coll_num FROM (
         |    SELECT shard, lang, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1, 2)
         |  GROUP BY 1)
         |SELECT adj.shard AS shard, n_docs, n_docs - 1 AS n_pairs,
         |  n_adjacent_same, coll_num
         |FROM adj JOIN cl ON adj.shard = cl.shard ORDER BY shard""".stripMargin
    }) { (s, d) =>
      val ordered = shuffleOrder(documents(s, d), 8)
      val w = Window.partitionBy(col("shard")).orderBy(col("__key"), col("doc_id"))
      val adj = ordered
        .withColumn("prev", lag(col("lang"), 1).over(w))
        .groupBy(col("shard"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          count(when(col("prev") === col("lang"), 1)).cast("long").as("n_adjacent_same"))
      val cl = ordered.groupBy(col("shard"), col("lang"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("shard"))
        .agg(sum(col("c") * (col("c") - 1)).cast("long").as("coll_num"))
      adj.join(broadcast(cl), "shard")
        .select(col("shard"), col("n_docs"), (col("n_docs") - 1).as("n_pairs"),
          col("n_adjacent_same"), col("coll_num"))
        .orderBy(col("shard"))
    },

    // PER-EPOCH reshuffle — the dataloader contract multi-epoch training
    // actually needs: a DIFFERENT deterministic permutation each epoch
    // (same-order epochs overfit to batch composition), each epoch's
    // order a pure function of (doc_id, epoch) so any worker can replay
    // any epoch without coordination or stored state. Same salted-hash
    // permutation as pipeline_shuffle_order with the epoch folded into
    // the hash input; position numbering stays per (epoch, shard) — 24
    // bounded sorts, never a global window — and the 3× row expansion is
    // an explode, not a shuffle.
    GraftQuery.of("pipeline_epoch_shuffle", {
      val h = Dedup.h60Sql("doc_id::VARCHAR || '@' || epoch::VARCHAR", 7)
      s"""SELECT CAST(epoch AS BIGINT) AS epoch, shard, pos, doc_id FROM (
         |  SELECT doc_id, epoch, $h % 8 AS shard,
         |    CAST(row_number() OVER (PARTITION BY epoch, $h % 8
         |                            ORDER BY $h, doc_id) AS BIGINT) AS pos
         |  FROM documents, unnest([0, 1, 2]) t(epoch))
         |ORDER BY epoch, shard, pos""".stripMargin
    }) { (s, d) =>
      val key = Dedup.h60(
        concat_ws("@", col("doc_id").cast("string"), col("epoch").cast("string")), 7)
      val w = Window.partitionBy(col("epoch"), col("shard"))
        .orderBy(col("__key"), col("doc_id"))
      documents(s, d)
        .select(col("doc_id"), explode(expr("sequence(0, 2)")).as("epoch"))
        .withColumn("__key", key)
        .withColumn("shard", pmod(col("__key"), lit(8L)))
        .withColumn("pos", row_number().over(w).cast("long"))
        .select(col("epoch").cast("long").as("epoch"), col("shard"),
          col("pos"), col("doc_id"))
        .orderBy(col("epoch"), col("shard"), col("pos"))
    },

    // Deterministic weighted subsample to a uniform language mixture:
    // every language Bernoulli-downsampled to ≈ the rarest language's
    // volume — the ACTION pipeline_mix_weights computes weights for.
    // Membership is a pure function of doc_id (hash threshold), so the
    // sample is reproducible and shuffle-free on the corpus side: the
    // only wide op is the tiny per-language count, broadcast back. The
    // threshold compares INTEGERS (hash mod 1e6 < (min·1e6) div n) —
    // no float rate that could round differently across engines.
    GraftQuery.of("pipeline_weighted_sample", {
      val h = Dedup.h60Sql("doc_id::VARCHAR", 13)
      s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
         |m AS (SELECT min(n) AS mn FROM c)
         |SELECT d.lang, d.doc_id
         |FROM documents d JOIN c USING (lang) CROSS JOIN m
         |WHERE $h % 1000000 < (m.mn * 1000000) // c.n
         |ORDER BY lang, doc_id""".stripMargin
    }) { (s, d) =>
      weightedUniformSample(documents(s, d))
        .select(col("lang"), col("doc_id"))
        .orderBy(col("lang"), col("doc_id"))
    },

    // Snapshot diff (table versioning / CDC derivation): classify every
    // key across two corpus snapshots as added / removed / changed /
    // unchanged by FULL OUTER joining the snapshots on the key and
    // comparing 60-bit content fingerprints — never the content itself.
    // At 100 TB the join moves only (key, hash) pairs (~16 bytes/row),
    // one key-shuffle per side; the text column is dropped at the scan.
    // Both snapshots derive deterministically from the documents table
    // (old: doc_id % 10 ≠ 3; new: doc_id % 7 ≠ 2, with docs ≡ 0 mod 5
    // rewritten), so the oracle reconstructs them exactly; per-status
    // bit_xor of the key set verifies the exact membership of each
    // class, not just its size.
    GraftQuery.of("pipeline_snapshot_diff", {
      val ho = h60Sql("text")
      val hn = h60Sql("CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END")
      s"""WITH old AS (
         |  SELECT doc_id, $ho AS h FROM documents WHERE doc_id % 10 <> 3),
         |new AS (
         |  SELECT doc_id, $hn AS h FROM documents WHERE doc_id % 7 <> 2),
         |d AS (
         |  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
         |    CASE WHEN o.doc_id IS NULL THEN 'added'
         |         WHEN n.doc_id IS NULL THEN 'removed'
         |         WHEN o.h <> n.h THEN 'changed'
         |         ELSE 'unchanged' END AS status
         |  FROM old o FULL JOIN new n ON o.doc_id = n.doc_id)
         |SELECT status, count(*) AS n_docs, CAST(bit_xor(doc_id) AS BIGINT) AS xor_ids
         |FROM d GROUP BY status ORDER BY status""".stripMargin
    }) { (s, d) =>
      val docs = documents(s, d)
      val old = docs.filter(pmod(col("doc_id"), lit(10L)) =!= 3)
        .select(col("doc_id"), md5hash60(col("text")).as("h"))
      val neu = docs.filter(pmod(col("doc_id"), lit(7L)) =!= 2)
        .select(col("doc_id"), md5hash60(
          when(pmod(col("doc_id"), lit(5L)) === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text"))).as("h"))
      snapshotDiff(old, neu)
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_docs"), expr("bit_xor(doc_id)").as("xor_ids"))
        .orderBy(col("status"))
    },

    // Incremental aggregate maintenance (materialized-view refresh): the
    // standing per-(lang, source) corpus stats are NOT recomputed from
    // scratch when a new batch lands — the existing snapshot's PARTIAL
    // aggregates (count, sum, min, max — all mergeable) are written once,
    // re-read, and merged with the delta batch's partials in one tiny
    // groupBy. At 100 TB this is the difference between re-scanning the
    // lake per refresh and scanning only the delta; avg is derived from
    // merged (sum, count) — never averaged across partials. The
    // snapshot/delta split is hash-deterministic (doc_id md5 < 80%), and
    // the oracle computes the SAME stats over the full table in one pass:
    // equality proves the merge is lossless.
    // avg is exact integer MICRO-chars ((total·1e6) div n — the
    // ops/Money.scala doctrine): the original round(DOUBLE, 6) form hit a
    // genuine half-boundary at sf10 — six (lang, source) groups have
    // n_docs = 3200, which divides 2·10⁶, putting their true ratios
    // EXACTLY on 6dp half-points (es/src18 = 528.4334375), where Spark's
    // HALF_UP-on-BigDecimal round and DuckDB's double-space round can
    // disagree by one grid point. The precise r10 float-parity class,
    // reachable only once group counts grew 100x.
    GraftQuery.of("pipeline_incremental_agg",
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(min(n_chars) AS BIGINT) AS min_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars,
        |  CAST(sum(n_chars) AS BIGINT) * 1000000 // count(*) AS avg_chars_micro
        |FROM documents GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin) { (s, d) =>
      val docs = documents(s, d)
      val isExisting = pmod(md5hash60(col("doc_id").cast("string")), lit(100L)) < 80
      def partials(df: DataFrame) = df
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          min(col("n_chars")).cast("long").as("min_chars"),
          max(col("n_chars")).cast("long").as("max_chars"))
      // the standing snapshot: partial aggs persisted once, re-read —
      // the artifact a production refresh keeps between runs
      val snapDir = Tables.processScratch(d, "incr_agg_snapshot")
      partials(docs.filter(isExisting)).write.mode("overwrite").parquet(snapDir)
      s.read.parquet(snapDir)
        .unionByName(partials(docs.filter(!isExisting)))
        .groupBy(col("lang"), col("source"))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("total_chars")).as("total_chars"),
          min(col("min_chars")).as("min_chars"),
          max(col("max_chars")).as("max_chars"))
        .select(col("lang"), col("source"), col("n_docs"), col("total_chars"),
          col("min_chars"), col("max_chars"),
          expr("(total_chars * 1000000) div n_docs").as("avg_chars_micro"))
        .orderBy(col("lang"), col("source"))
    },

    // INCREMENTAL DISTINCT-COUNT MAINTENANCE — pipeline_incremental_agg's
    // hard sibling: count(DISTINCT) is NOT sum-mergeable, so the standing
    // snapshot persists per-lang HLL SKETCHES (Datasketches binary state,
    // the mergeable partial for distinct) and the refresh is
    // sketch-union with the delta batch's sketches — O(batch) + O(langs)
    // per refresh, never a full-corpus re-scan: THE way a 100 TB corpus
    // keeps "unique contents per language" current. Two in-engine proof
    // booleans ride the hash gate: snapshot_lossless (the refresh built
    // from the PARQUET-PERSISTED snapshot sketch estimates identically
    // to the same refresh over in-memory partials — sketch state
    // survives persistence bit-faithfully, so a standing snapshot table
    // loses nothing across restarts) and approx_ok (the merged estimate
    // lands within 5%+10 of the exact distinct — the actual HLL
    // guarantee). Deliberately NOT asserted: bit-equality between the
    // merged sketch and a single-pass whole-corpus sketch — measured on
    // the bundled Datasketches, union-of-partials estimates drift a few
    // counts from the stream sketch (and across different batch splits),
    // so the only contract HLL refresh offers is the error envelope,
    // which is exactly what the oracle pins.
    GraftQuery.of("pipeline_incremental_distinct",
      """SELECT lang, CAST(count(DISTINCT text) AS BIGINT) AS exact_distinct,
        |  TRUE AS snapshot_lossless, TRUE AS approx_ok
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val docs = documents(s, d).select(col("lang"), col("doc_id"), col("text"))
      val isExisting = pmod(md5hash60(col("doc_id").cast("string")), lit(100L)) < 80
      def sketches(df: DataFrame) = df.groupBy(col("lang"))
        .agg(hll_sketch_agg(col("text")).as("sk"))
      def refresh(snap: DataFrame, est: String) = snap
        .unionByName(sketches(docs.filter(!isExisting)))
        .groupBy(col("lang")).agg(hll_union_agg(col("sk")).as("sk"))
        .select(col("lang"), hll_sketch_estimate(col("sk")).as(est))
      val snapDir = Tables.processScratch(d, "incr_hll_snapshot")
      sketches(docs.filter(isExisting)).write.mode("overwrite").parquet(snapDir)
      val merged = refresh(s.read.parquet(snapDir), "est_merged")
      val mergedMem = refresh(sketches(docs.filter(isExisting)), "est_mem")
      val direct = docs.groupBy(col("lang"))
        .agg(count_distinct(col("text")).as("exact_distinct"))
      direct.join(broadcast(merged), "lang").join(broadcast(mergedMem), "lang")
        .select(col("lang"), col("exact_distinct"),
          (col("est_merged") === col("est_mem")).as("snapshot_lossless"),
          (abs(col("est_merged") - col("exact_distinct")) <=
            col("exact_distinct") * 0.05 + lit(10)).as("approx_ok"))
        .orderBy(col("lang"))
    },

    // MIXTURE-PRESERVING INTERLEAVE — the third deterministic training
    // order next to shuffle_order (global permutation) and curriculum
    // (staged): sources interleave so every PREFIX of the stream holds
    // each language at its corpus proportion (the data-loader contract
    // for mixture-stable training — no language ever "bunches"). The
    // order key is integer progress: a doc at within-language position p
    // of n_l sorts at (p−1)·10¹² div n_l — each source consumed at equal
    // fractional rate, ties broken (lang, doc) — all BIGINT arithmetic,
    // replayed exactly by the oracle's window formulation. Within-lang
    // position comes from the md5-order rank (the shuffle_order idiom),
    // so the interleave composes with the deterministic shuffle. The
    // emitted head (first 100 global positions) is the verifiable
    // artifact; per-lang rank windows are lang-bounded, never global.
    GraftQuery.of("pipeline_interleave_mixture", {
      val h = h60Sql("doc_id::VARCHAR || '#mix'")
      s"""WITH r AS (
         |  SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang ORDER BY $h, doc_id) AS p,
         |    count(*) OVER (PARTITION BY lang) AS n_l
         |  FROM documents),
         |k AS (
         |  SELECT doc_id, lang, (p - 1) * 1000000000000 // n_l AS key FROM r)
         |SELECT row_number() OVER (ORDER BY key, lang, doc_id) AS global_pos,
         |  lang, doc_id
         |FROM k ORDER BY global_pos LIMIT 100""".stripMargin
    }) { (s, d) =>
      import graft.functions.Md5Hash60.md5hash60
      val byLang = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      val rank = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
        .orderBy(md5hash60(concat(col("doc_id").cast("string"), lit("#mix"))),
          col("doc_id"))
      val keyed = documents(s, d)
        .select(col("doc_id"), col("lang"))
        .withColumn("p", row_number().over(rank))
        .withColumn("n_l", count(lit(1)).over(byLang))
        .select(col("doc_id"), col("lang"),
          expr("(p - 1) * 1000000000000L div n_l").as("key"))
      // the LIMIT-bounded global ordering: TakeOrderedAndProject, not a
      // single-partition full-sort window
      keyed.orderBy(col("key"), col("lang"), col("doc_id")).limit(100)
        .withColumn("global_pos",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("key"), col("lang"), col("doc_id"))).cast("long"))
        .select(col("global_pos"), col("lang"), col("doc_id"))
        .orderBy(col("global_pos"))
    },

    // Curriculum schedule — the easy→hard training order (short documents
    // first, Bengio et al. '09) composed with the deterministic
    // within-stage shuffle of pipeline_shuffle_order: stage from integer
    // n_chars thresholds, then a salted-hash permutation into 4 shards
    // per stage. The emitted (stage, shard, pos) triple is the exact read
    // order a dataloader replays. Position numbering is per (stage,
    // shard) — never a global window — so the only wide op is the
    // (stage, shard)-keyed sort, the same bounded-partition shape as the
    // shard writer at 100 TB.
    // Autoregressive training-example construction: each user's
    // time-ordered event-type sequence unrolled into sliding
    // (context, target) pairs — THE "make next-token samples from logs"
    // step of a sequence-model pipeline (context length 4). One key
    // shuffle (user_id) and per-user array work, the funnel/SCD2
    // partition discipline: per-user histories are bounded, so the
    // collect_list is a bounded group, never a corpus-wide sort. Position
    // is 1-based over the user's own sequence; order inside a tie is
    // pinned by event_id, so the emitted rows are a pure function of the
    // data on both engines.
    GraftQuery.of("pipeline_seq_examples",
      """WITH seqs AS (
        |  SELECT user_id, list(event_type ORDER BY ts, event_id) AS types
        |  FROM events GROUP BY user_id
        |), pos AS (
        |  SELECT user_id, types, unnest(range(5, len(types) + 1)) AS p
        |  FROM seqs)
        |SELECT user_id, CAST(p AS BIGINT) AS pos,
        |  array_to_string(types[p-4:p-1], ' ') AS context,
        |  types[p] AS target
        |FROM pos ORDER BY user_id, pos""".stripMargin) { (s, d) =>
      seqExamples(events(s, d), 4)
    },

    // Temporal (leave-last-k-per-user) train/eval split — the standard
    // eval protocol for sequential models, where random splits leak the
    // future: each user's LAST 2 events (ts DESC, event_id tie-break)
    // form the eval set. Verified as per-(split, event_type) cells with
    // an event_id XOR checksum, so the oracle pins the exact row-level
    // assignment without dumping it. One key shuffle + one agg.
    GraftQuery.of("pipeline_temporal_split",
      """WITH r AS (
        |  SELECT event_id, user_id, event_type, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
        |  FROM events)
        |SELECT CASE WHEN rk <= 2 THEN 'eval' ELSE 'train' END AS split,
        |  event_type, count(*) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(bit_xor(event_id) AS BIGINT) AS xor_ids
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      temporalSplit(events(s, d), 2)
    },

    GraftQuery.of("pipeline_curriculum", {
      val h = Dedup.h60Sql("doc_id::VARCHAR", 17)
      s"""WITH st AS (
         |  SELECT doc_id,
         |    CASE WHEN n_chars < 200 THEN 0 WHEN n_chars < 400 THEN 1
         |         WHEN n_chars < 600 THEN 2 ELSE 3 END AS stage,
         |    $h AS k
         |  FROM documents)
         |SELECT CAST(stage AS BIGINT) AS stage, k % 4 AS shard,
         |  CAST(row_number() OVER (PARTITION BY stage, k % 4 ORDER BY k, doc_id)
         |    AS BIGINT) AS pos,
         |  doc_id
         |FROM st ORDER BY stage, shard, pos""".stripMargin
    }) { (s, d) =>
      val w = Window.partitionBy(col("stage"), col("shard"))
        .orderBy(col("__key"), col("doc_id"))
      documents(s, d)
        .withColumn("stage",
          when(col("n_chars") < 200, 0L).when(col("n_chars") < 400, 1L)
            .when(col("n_chars") < 600, 2L).otherwise(3L))
        .withColumn("__key", Dedup.h60(col("doc_id").cast("string"), 17))
        .withColumn("shard", pmod(col("__key"), lit(4L)))
        .withColumn("pos", row_number().over(w).cast("long"))
        .select(col("stage"), col("shard"), col("pos"), col("doc_id"))
        .orderBy(col("stage"), col("shard"), col("pos"))
    })
}
