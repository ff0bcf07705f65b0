package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator: builds an sf1-class dataset as R
  * structurally-independent replicas of a source SF dir (the driver's
  * generator is not available in this sandbox, so a 10× replica scheme is
  * the honest way to measure how every registered plan behaves at 10× the
  * certified volume).
  *
  * Replica r offsets every key by r × a per-DOMAIN constant, so
  * referential structure is preserved exactly within a replica and key
  * domains never collide across replicas:
  *   - orderkey ↔ {orders, lineitem}; custkey ↔ {customer, orders,
  *     events.user_id (verified ⊆ custkey at source)}; partkey, suppkey,
  *     event_id; doc_id ↔ {documents, embeddings.vec_id}.
  *   - nation/region are FIXED dimensions (25/5 rows) and are copied
  *     unchanged — exactly how a real 10× corpus grows.
  *   - documents: replica 0 is verbatim; replicas r > 0 suffix every
  *     token with `_r<r>` (vocabulary and fingerprints are genuinely new
  *     per replica — cross-replica Jaccard is 0, so the dedup families
  *     scale like a real 10× corpus of independent shards, not like 10
  *     literal copies), n_chars recomputed to keep the n_chars =
  *     length(text) source invariant.
  *   - embeddings: replica r rotates the 64-dim vector by (r mod 64)
  *     positions, negating it once the rotation wraps (r >= 64) —
  *     norm-preserving, deterministic, and avoids the degenerate
  *     all-exact-duplicate geometry verbatim copies would create at any
  *     replica count.
  *   - events keep their timestamps: 10× the traffic over the same
  *     month, which is what a higher-volume stream looks like.
  *
  * Output layout matches TESTDATA.md: one `<table>.parquet` FILE per
  * table (written single-part, then renamed), so both `Tables.table` and
  * the DuckDB oracle read it exactly like the driver's dirs.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/graft_testdata/sf1"
    val replicas = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-genscale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scale(spark, src, dst, replicas)
    spark.stop()
  }

  // per-domain replica offsets — each larger than any source key
  val OrdOff = 1000000L
  val CustOff = 100000L
  val PartOff = 100000L
  val SuppOff = 10000L
  val EvtOff = 1000000L
  val DocOff = 100000L

  def scale(spark: SparkSession, src: String, dst: String, replicas: Int): Unit = {
    // The embedding rotate+negate scheme below has period 128: replica
    // 128+k would be byte-identical to replica 64+k, silently breaking the
    // "no exact-duplicate replica pair" property the dedup/ANN scale
    // stories rely on. Refuse rather than degrade (the committed sf1/sf10
    // corpora use 10/100 replicas, well inside the bound).
    require(replicas <= 128,
      s"replicas=$replicas > 128: the embedding rotation+negation scheme " +
        "repeats with period 128, so replica pairs (r, r-128) would be " +
        "exact duplicates; extend the sign scheme before scaling further")
    def read(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    /** Cross-join with the replica dimension and apply per-replica
      * transforms; `r` is available as column "r".
      */
    def replicate(df: DataFrame)(f: DataFrame => DataFrame): DataFrame =
      f(df.crossJoin(
        spark.range(replicas.toLong).select(col("id").as("r"))))
        .drop("r")

    def off(c: String, step: Long) = (col(c) + col("r") * step).as(c)

    write(dst, "region", read("region"))
    write(dst, "nation", read("nation"))

    write(dst, "customer", replicate(read("customer")) { d =>
      d.select(off("c_custkey", CustOff), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"), col("r"))
    })
    write(dst, "supplier", replicate(read("supplier")) { d =>
      d.select(off("s_suppkey", SuppOff), col("s_name"), col("s_nationkey"),
        col("s_acctbal"), col("r"))
    })
    write(dst, "part", replicate(read("part")) { d =>
      d.select(off("p_partkey", PartOff), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size"), col("p_retailprice"), col("r"))
    })
    write(dst, "orders", replicate(read("orders")) { d =>
      d.select(off("o_orderkey", OrdOff), off("o_custkey", CustOff),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"), col("r"))
    })
    write(dst, "lineitem", replicate(read("lineitem")) { d =>
      d.select(off("l_orderkey", OrdOff), off("l_partkey", PartOff),
        off("l_suppkey", SuppOff), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"), col("r"))
    })
    write(dst, "events", replicate(read("events")) { d =>
      d.select(off("event_id", EvtOff), col("ts"), off("user_id", CustOff),
        col("event_type"), col("value"), col("props"), col("r"))
    })
    write(dst, "documents", replicate(read("documents")) { d =>
      val remapped = when(col("r") === 0, col("text")).otherwise(
        array_join(transform(split(col("text"), " "),
          t => concat(t, lit("_r"), col("r"))), " "))
      d.select(off("doc_id", DocOff), remapped.as("text"), col("lang"),
          col("source"), col("r"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .select("doc_id", "text", "lang", "source", "n_chars", "r")
    })
    write(dst, "embeddings", replicate(read("embeddings")) { d =>
      val dim = 64
      // rotate by r mod dim (the raw r overflows slice() past 64 replicas);
      // when the rotation wraps (r >= dim) negate the vector as well —
      // still norm-preserving and deterministic, and within the required
      // replicas <= 128 bound no replica pair is an exact duplicate
      // (negation flips cosine to -1, not +1). The scheme has period 128
      // — replica 128+k would equal replica 64+k — which is why scale()
      // rejects replicas > 128 up front.
      val rotated = when(col("r") % dim === 0, col("embedding")).otherwise(
        concat(
          expr(s"slice(embedding, CAST(r % $dim + 1 AS INT), CAST($dim - r % $dim AS INT))"),
          expr(s"slice(embedding, 1, CAST(r % $dim AS INT))")))
      val signed = when(col("r") < dim, rotated)
        .otherwise(transform(rotated, x => -x))
      d.select(off("vec_id", DocOff), signed.as("embedding"), col("label"), col("r"))
    })
    println(s"[genscale] wrote $replicas replicas of $src to $dst")
  }

  /** Single-file parquet write matching the driver's `<name>.parquet`
    * file layout: write single-part to a staging dir, move the part file.
    */
  private def write(dst: String, name: String, df: DataFrame): Unit = {
    val stage = s"$dst/_stage_$name"
    // 2 MB row groups: a single-FILE table stays a drop-in for the
    // driver layout and DuckDB, but remains SPLITTABLE for Spark — one
    // giant row group would serialize every scan onto one task no matter
    // how many cores the session has (a real 10x dataset is never one
    // split, so one row group would mis-measure every scan-bound plan).
    // 2 MB (compressed — that is what the writer's flush check measures)
    // keeps even the 7 MB text/events tables multi-group; production
    // data gets its splits from file COUNT instead, a luxury the
    // single-file driver/DuckDB layout contract rules out here.
    df.coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", (2 * 1024 * 1024).toString)
      .parquet(stage)
    val stageDir = new java.io.File(stage)
    val part = stageDir.listFiles().find(_.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file in $stage"))
    val target = new java.io.File(s"$dst/$name.parquet")
    if (target.exists()) target.delete()
    java.nio.file.Files.move(part.toPath, target.toPath)
    stageDir.listFiles().foreach(_.delete())
    stageDir.delete()
    println(s"[genscale] $name: ${target.length()} bytes")
  }
}
