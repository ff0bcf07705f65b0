package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Two paths:
  *  - brute-force cosine top-k: broadcast the (small) probe set against the
  *    full table — one scan of the big side, no shuffle until the tiny
  *    top-k window. The scale path for "few probes × huge corpus".
  *  - LSH-bucketed ANN: random-hyperplane signatures put every vector in a
  *    small bucket; probes search only their own bucket plus Hamming-1
  *    neighbors (multiprobe), then re-rank exactly within candidates. The
  *    join is keyed on the bucket id — candidate count per probe is
  *    ~corpus/2^bits × (bits+1), independent of an all-pairs blowup. The
  *    scale path for "huge probe set × huge corpus".
  *
  * Hyperplanes are ±1-component vectors derived deterministically from md5
  * (no RNG — plans are reproducible across sessions and engines).
  * All arithmetic is double (floats cast up front) and similarities are
  * rounded to 6 decimals so cross-engine comparison is FP-stable.
  */
object Similarity {

  import graft.functions.CosineSim.cosineSim

  /** Brute-force cosine top-k for a probe set (vec_id < nProbes). */
  def knnBrute(emb: DataFrame, nProbes: Int, k: Int): DataFrame = {
    val probes = emb.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val cands = emb
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val scored = cands.crossJoin(broadcast(probes))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosineSim(col("pe"), col("ne")), 6))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("rnk"), col("sim"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** Deterministic ±1 hyperplane component: plane j, dimension i. */
  private def planeSign(j: Int, i: Int): Double = {
    val digest = MessageDigest.getInstance("MD5")
      .digest(s"plane:$j:$i".getBytes(StandardCharsets.UTF_8))
    if ((digest(0) & 1) == 1) 1.0 else -1.0
  }

  /** Bucket id column: `bits` sign-bits of hyperplane projections. */
  def lshBucket(arr: String, bits: Int, dim: Int): Column = {
    val bitCols = (0 until bits).map { j =>
      val proj = expr(
        s"aggregate(zip_with($arr, ${planeColSql(j, dim)}, (x, p) -> CAST(x AS DOUBLE) * p), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _).as("bucket")
  }

  /** SQL literal array for plane j (used inside expr-built lambdas). */
  private def planeColSql(j: Int, dim: Int): String =
    (0 until dim).map(i => planeSign(j, i).toString).mkString("array(", ", ", ")")

  /** LSH ANN: bucket everything, multiprobe each probe into its bucket and
    * all Hamming-1 neighbors, exact cosine re-rank within candidates.
    */
  def knnLsh(emb: DataFrame, nProbes: Int, k: Int, bits: Int = 4): DataFrame = {
    val dim = 64
    val withBucket = emb.withColumn("bucket", lshBucket("embedding", bits, dim))

    val probeBuckets = (0 until bits).map(m => col("bucket").bitwiseXOR(lit(1L << m))) :+ col("bucket")
    val probes = withBucket.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        explode(array(probeBuckets: _*)).as("bucket"))

    val cands = withBucket
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"), col("bucket"))

    val scored = cands.join(broadcast(probes), Seq("bucket"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosineSim(col("pe"), col("ne")), 6))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("rnk"), col("sim"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** IVF ANN: a deterministic coarse quantizer — `nlist` centroids are
    * md5-order-sampled from the corpus itself (no RNG, no k-means
    * iterations; a trained codebook drops in by swapping the centroid
    * frame). Every vector joins its nearest centroid's inverted list once
    * (broadcast centroids — they are tiny by construction); probes search
    * the `nprobe` nearest lists and re-rank exactly. All shuffles are keyed
    * on the centroid id, candidates ≈ corpus × nprobe / nlist per probe.
    */
  def knnIvf(emb: DataFrame, nProbes: Int, k: Int,
      nlist: Int = 16, nprobe: Int = 4,
      codebook: Option[DataFrame] = None): DataFrame = {
    import graft.functions.Md5Hash60.md5hash60
    // default quantizer: deterministic md5-order sample; a trained
    // codebook ((cid, ce) frame, e.g. from trainCentroids) drops in
    val centroids = broadcast(codebook.getOrElse(
      emb.orderBy(md5hash60(col("vec_id").cast("string")), col("vec_id"))
        .limit(nlist)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"))))

    def assign(df: DataFrame, idCol: String, keep: Int): DataFrame = {
      val w = Window.partitionBy(col(idCol)).orderBy(col("csim").desc, col("cid"))
      df.crossJoin(centroids)
        // round to 6dp before ranking: the assignment is then reproducible
        // across engines (ties broken by cid on both sides)
        .withColumn("csim", round(cosineSim(col("embedding"), col("ce")), 6))
        .withColumn("crn", row_number().over(w))
        .filter(col("crn") <= keep)
        .drop("ce", "csim", "crn")
    }

    val lists = assign(emb, "vec_id", 1)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"), col("cid"))
    val probes = assign(emb.filter(col("vec_id") < nProbes), "vec_id", nprobe)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"), col("cid"))

    val scored = lists.join(broadcast(probes), Seq("cid"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosineSim(col("pe"), col("ne")), 6))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("rnk"), col("sim"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** Lloyd-trained IVF codebook: start from the deterministic md5-order
    * sample (same init as [[knnIvf]]), then `iters` rounds of
    * assign-to-nearest (broadcast centroids — one scan of the corpus, no
    * shuffle for assignment) + elementwise mean (posexplode → ONE shuffle
    * keyed on (cid, dim), partial aggregation collapses each partition to
    * ≤ nlist·dim rows before it). Empty clusters carry their previous
    * centroid forward. Centroid components are rounded to 6dp each round
    * so the trajectory is reproducible across engines.
    *
    * Returns (centroids (cid, ce: array<double>), sizes of the final
    * assignment (cid, n_members)). The centroid frame drops into
    * [[knnIvf]]'s inverted-list build unchanged.
    */
  def trainCentroids(emb: DataFrame, nlist: Int = 16, iters: Int = 2): (DataFrame, DataFrame) = {
    import graft.functions.Md5Hash60.md5hash60
    var cents = emb.orderBy(md5hash60(col("vec_id").cast("string")), col("vec_id"))
      .limit(nlist)
      .select(col("vec_id").as("cid"),
        expr("transform(embedding, x -> cast(x as double))").as("ce"))
    var lastSizes: DataFrame = null
    for (_ <- 1 to iters) {
      val w = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cid"))
      val asg = emb.crossJoin(broadcast(cents))
        .withColumn("csim", round(cosineSim(col("embedding"), col("ce")), 6))
        .withColumn("crn", row_number().over(w))
        .filter(col("crn") === 1)
        .select(col("cid"), col("vec_id"), col("embedding"))
      lastSizes = asg.groupBy(col("cid")).agg(count(lit(1)).as("n_members"))
      val newC = asg
        .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(round(avg(col("x")), 6).as("m"))
        .groupBy(col("cid"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)").as("ce_new"))
      cents = cents.join(newC, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("ce_new"), col("ce")).as("ce"))
    }
    (cents, lastSizes)
  }

  /** DuckDB replay of [[trainCentroids]]: one CTE pair per unrolled Lloyd
    * iteration (6dp-rounded assignment, elementwise mean via zipped
    * unnest, empty-cluster carry-forward).
    */
  private def kmeansSql(nlist: Int, iters: Int): String = {
    val h60 = "('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::UBIGINT"
    val init =
      s"cents0 AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings ORDER BY $h60, vec_id LIMIT $nlist)"
    val iterCtes = (1 to iters).map { it =>
      s"""asg$it AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT e.vec_id, e.embedding, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.ce), 6) DESC,
         |                 c.cid) AS crn
         |    FROM embeddings e, cents${it - 1} c)
         |  WHERE crn = 1
         |), newc$it AS (
         |  SELECT cid, pos, round(avg(x), 6) AS m FROM (
         |    SELECT cid, unnest(embedding::DOUBLE[]) AS x,
         |           unnest(range(0, len(embedding))) AS pos
         |    FROM asg$it)
         |  GROUP BY cid, pos
         |), cents$it AS (
         |  SELECT c.cid, coalesce(n.ce, c.ce) AS ce
         |  FROM cents${it - 1} c LEFT JOIN (
         |    SELECT cid, list(m ORDER BY pos) AS ce FROM newc$it GROUP BY cid) n USING (cid)
         |)""".stripMargin
    }
    s"""WITH $init,
       |${iterCtes.mkString(",\n")},
       |sizes AS (SELECT cid, count(*) AS n_members FROM asg$iters GROUP BY cid)
       |SELECT c.cid, pos AS dim, m AS c_val, coalesce(s.n_members, 0) AS n_members
       |FROM (SELECT cid, unnest(range(0, len(ce))) AS pos, unnest(ce) AS m FROM cents$iters) c
       |LEFT JOIN sizes s USING (cid)
       |ORDER BY cid, dim""".stripMargin
  }

  def queries: Seq[GraftQuery] = Seq(

    // Trained IVF codebook: 2 Lloyd iterations from the deterministic
    // seed; output is the full (cid, dim, component) centroid matrix plus
    // final cluster sizes, oracle-replayed iteration by iteration.
    GraftQuery.of("sim_ivf_kmeans", kmeansSql(nlist = 16, iters = 2)) { (s, d) =>
      val (cents, sizes) = trainCentroids(embeddings(s, d), nlist = 16, iters = 2)
      cents.select(col("cid"), posexplode(col("ce")).as(Seq("dim", "c_val")))
        .join(sizes, Seq("cid"), "left")
        .select(col("cid"), col("dim").cast("long").as("dim"), col("c_val"),
          coalesce(col("n_members"), lit(0L)).as("n_members"))
        .orderBy(col("cid"), col("dim"))
    },

    // Brute-force cosine top-10 for probes vec_id ∈ [0, 5).
    GraftQuery.of("sim_knn_brute",
      """WITH p AS (
        |  SELECT vec_id AS probe_id, embedding::DOUBLE[] AS pe
        |  FROM embeddings WHERE vec_id < 5
        |), scored AS (
        |  SELECT probe_id, e.vec_id AS neighbor_id,
        |    round(list_cosine_similarity(pe, e.embedding::DOUBLE[]), 6) AS sim
        |  FROM p, embeddings e WHERE e.vec_id <> probe_id
        |), ranked AS (
        |  SELECT probe_id, neighbor_id, sim,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM scored)
        |SELECT probe_id, neighbor_id, CAST(rn AS BIGINT) AS rnk, sim
        |FROM ranked WHERE rn <= 10 ORDER BY probe_id, rnk""".stripMargin) { (s, d) =>
      knnBrute(embeddings(s, d), nProbes = 5, k = 10)
    },

    // LSH-bucketed ANN, same probes. The hyperplane signs are deterministic
    // md5 derivations, so the oracle embeds the SAME ±1 plane vectors as
    // SQL array literals and replays bucket assignment + Hamming-1
    // multiprobe + exact re-rank in DuckDB. (Recall vs brute force is
    // additionally verified in the test suite.)
    GraftQuery.of("sim_knn_lsh", {
      val bits = 4
      val planes = (0 until bits).map(j => planeColSql(j, 64).replace("array(", "[").replace(")", "]"))
      val bucketExpr = (0 until bits).map { j =>
        s"(CASE WHEN list_dot_product(embedding::DOUBLE[], ${planes(j)}) > 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      val probeBuckets = (0 until bits).map(m => s"xor(bucket, ${1L << m})") :+ "bucket"
      s"""WITH wb AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS e,
         |    CAST($bucketExpr AS BIGINT) AS bucket
         |  FROM embeddings
         |), probes AS (
         |  SELECT vec_id AS probe_id, e AS pe,
         |    unnest([${probeBuckets.mkString(", ")}]) AS bucket
         |  FROM wb WHERE vec_id < 5
         |), scored AS (
         |  SELECT probe_id, w.vec_id AS neighbor_id,
         |    round(list_cosine_similarity(pe, w.e), 6) AS sim
         |  FROM probes p JOIN wb w USING (bucket) WHERE w.vec_id <> p.probe_id
         |), ranked AS (
         |  SELECT probe_id, neighbor_id, sim,
         |    row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rn
         |  FROM scored)
         |SELECT probe_id, neighbor_id, CAST(rn AS BIGINT) AS rnk, sim
         |FROM ranked WHERE rn <= 10 ORDER BY probe_id, rnk""".stripMargin
    }) { (s, d) =>
      knnLsh(embeddings(s, d), nProbes = 5, k = 10)
    },

    // IVF-bucketed ANN, same probes. Centroids are the md5-order sample —
    // fully reproducible in SQL — so the oracle replays coarse assignment
    // (6dp-rounded cosine, cid tiebreak), nprobe list selection, and the
    // exact within-list re-rank.
    GraftQuery.of("sim_knn_ivf", {
      val h60 = "('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::UBIGINT"
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
         |  FROM embeddings ORDER BY $h60, vec_id LIMIT 16
         |), asg AS (
         |  SELECT e.vec_id, e.embedding::DOUBLE[] AS ne, c.cid,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.ce), 6) DESC,
         |               c.cid) AS crn
         |  FROM embeddings e, cents c
         |), lists AS (
         |  SELECT vec_id AS neighbor_id, ne, cid FROM asg WHERE crn = 1
         |), probes AS (
         |  SELECT vec_id AS probe_id, ne AS pe, cid FROM asg WHERE crn <= 4 AND vec_id < 5
         |), scored AS (
         |  SELECT probe_id, neighbor_id,
         |    round(list_cosine_similarity(pe, l.ne), 6) AS sim
         |  FROM probes p JOIN lists l USING (cid) WHERE l.neighbor_id <> p.probe_id
         |), ranked AS (
         |  SELECT probe_id, neighbor_id, sim,
         |    row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rn
         |  FROM scored)
         |SELECT probe_id, neighbor_id, CAST(rn AS BIGINT) AS rnk, sim
         |FROM ranked WHERE rn <= 10 ORDER BY probe_id, rnk""".stripMargin
    }) { (s, d) =>
      knnIvf(embeddings(s, d), nProbes = 5, k = 10)
    },

    // Embedding-cosine near-dup detection: each vector's nearest neighbor
    // with a duplicate flag at cosine ≥ 0.95. Exact (all-pairs) at test SF;
    // the LSH bucketing above is the drop-in candidate generator at corpus
    // scale (same cosine column, bucket-join instead of crossJoin).
    GraftQuery.of("dedup_embedding_nn",
      """WITH pairs AS (
        |  SELECT a.vec_id, b.vec_id AS nn_id,
        |    round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
        |  FROM embeddings a, embeddings b WHERE a.vec_id <> b.vec_id
        |), ranked AS (
        |  SELECT vec_id, nn_id, cosine,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, nn_id) AS rn
        |  FROM pairs)
        |SELECT vec_id, nn_id, cosine, cosine >= 0.95 AS is_dup
        |FROM ranked WHERE rn = 1 ORDER BY vec_id""".stripMargin) { (s, d) =>
      // argmax as max_by instead of a ranked window: the window shape
      // shuffles and sorts every scored pair (|corpus|² rows); max_by is a
      // partial-aggregating groupBy — each partition collapses to one row
      // per vec_id BEFORE the shuffle. Ordering (cosine desc, nn_id asc)
      // is encoded as max of struct(cosine, -nn_id).
      val e = embeddings(s, d)
      val a = e.select(col("vec_id"), col("embedding").as("pe"))
      val b = e.select(col("vec_id").as("nn_id"), col("embedding").as("ne"))
      a.crossJoin(b).filter(col("vec_id") =!= col("nn_id"))
        .withColumn("cosine", round(cosineSim(col("pe"), col("ne")), 6))
        .groupBy(col("vec_id"))
        .agg(max_by(struct(col("nn_id"), col("cosine")),
          struct(col("cosine"), -col("nn_id"))).as("nn"))
        .select(col("vec_id"), col("nn.nn_id").as("nn_id"), col("nn.cosine").as("cosine"),
          (col("nn.cosine") >= 0.95).as("is_dup"))
        .orderBy(col("vec_id"))
    })
}
