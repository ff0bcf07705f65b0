package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table access for the driver's synthetic testdata
  * (`/root/testdata/sf*`, see TESTDATA.md). All registered queries read
  * through here so the scan always carries an explicit schema-pruning
  * projection from Catalyst (column pruning reaches the parquet reader).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** `events.ts` has shipped in two parquet encodings across driver drops:
    * TIMESTAMP(NANOS) — which Spark's reader rejects outright, so it is
    * read as a BIGINT via the legacy conf (safe to set unconditionally:
    * it only affects NANOS-typed columns) and rebuilt with integer `div`
    * (a double division would lose precision at 2^53 < ns-epoch) — and
    * plain TIMESTAMP(MICROS), which decodes directly. [[fixEventsTs]]
    * dispatches on the READ schema, so both encodings land on the same
    * session-zoned TimestampType column downstream.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    fixEventsTs(table(s, d, "events"))
  }

  /** Normalizes the `ts` column to session-zoned TimestampType whichever
    * way the parquet encoded it (see [[events]]). NTZ → LTZ cast is an
    * identity under the UTC session zone; it keeps every downstream
    * consumer (window(), unix_micros, sink round-trips) on the exact type
    * the engine has always produced.
    */
  def fixEventsTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType =>
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case _ => df.withColumn("ts", col("ts").cast("timestamp"))
  }

  /** File-stream twin of [[events]]: schema from a batch read (the stream
    * source requires an explicit schema), ts normalized identically. The
    * glob narrows the SF dir to the events file (a bare file path fails
    * the stream source's basePath validation).
    */
  def eventsStream(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$d/events.parquet").schema
    fixEventsTs(s.readStream.schema(schema).parquet(s"$d/events*.parquet"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Dataset-dir token for temp-view names: view-registering queries stay
    * pure functions of (spark, sfDir) even when several run concurrently
    * on one session against different dirs.
    */
  def viewSuffix(d: String): String = d.replaceAll("[^A-Za-z0-9]", "_")

  /** Per-PROCESS scratch root under /tmp/graft_sink, deleted by a JVM
    * shutdown hook: the PID suffix only has to span concurrently-running
    * processes (Verify alongside Bench on the same SF is a normal local
    * workflow), so tying the directory's lifetime to the process keeps
    * repeated runs from accumulating orphaned sink trees.
    */
  private lazy val processScratchRoot: String = {
    val p = s"/tmp/graft_sink/pid_${java.lang.ProcessHandle.current().pid()}"
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      val f = new java.io.File(p)
      if (f.exists()) {
        java.nio.file.Files.walk(f.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(q => java.nio.file.Files.delete(q))
      }
    }))
    p
  }

  /** Scratch directory for a per-dataset materialized artifact, cleaned up
    * on JVM exit (see [[processScratchRoot]]). Keyed by [[viewSuffix]] of
    * the FULL dataset path — the same key the build latches use — so two
    * dataset dirs sharing a basename (`/a/sf0.1` vs `/b/sf0.1`) in one JVM
    * get distinct artifact trees instead of silently overwriting each
    * other's parquet.
    *
    * Staleness contract: artifact latches (and the paths handed out here)
    * are once-per-(JVM, dataset-path). Regenerating a dataset dir's
    * CONTENTS mid-session does not invalidate an already-built artifact —
    * a long-lived session that rewrites its inputs must restart (or use a
    * fresh dir) to re-derive standing artifacts. The driver's testdata is
    * immutable, so this is the documented single-generation contract, not
    * a latent bug.
    */
  def processScratch(d: String, name: String): String =
    s"$processScratchRoot/${viewSuffix(d)}/$name"

  /** Total bytes of a parquet table that may be a single FILE or a
    * DIRECTORY of part files — the one stat every input-scaled sizing
    * decision (skew-split cap, bucket count, state shards) reads.
    * Returns 0 for a missing path; the caller owns the failure policy
    * (the skew cap `require`s > 0, the scaling heuristics floor).
    */
  def leafFileBytes(path: String): Long = {
    val f = new java.io.File(path)
    if (f.isFile) f.length()
    else Option(f.listFiles()).map(_.filter(_.isFile).map(_.length()).sum)
      .getOrElse(0L)
  }
}

/** One registered engine query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * over the same parquet tables. Column names and row ordering must match
  * between the two — the driver hash-compares values after sorting columns
  * by name, so every computed column is explicitly aliased and cast to the
  * same type on both sides, and every query ends in a deterministic
  * ORDER BY over a unique key.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GraftQuery {
  def of(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, run, Some(oracle))
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, run, None)

  /** DuckDB replay of [[graft.functions.Md5Hash60]] (bit-identical to
    * Spark's `conv(substr(md5(x),1,15),16,10)`). The ONE definition of
    * the idiom — every oracle uses this helper so copies cannot drift
    * from the engine-side expression's parity contract.
    */
  def h60Sql(e: String): String = s"('0x' || substr(md5($e), 1, 15))::UBIGINT"
}
