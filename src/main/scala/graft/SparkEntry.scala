package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every registered query pairs a Spark implementation with (where the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle over the same
  * parquet tables; the driver hash-compares the two at sf0.01.
  */
object SparkEntry {

  /** Full registry: SURVEY §2 parity operators + the LLM-pipeline families
    * (dedup, similarity search, text analysis, events, multimodal).
    */
  val registry: Seq[GraftQuery] =
    Relational.queries ++ TpcH.queries ++ DwcQueries.queries ++ ArchiveQueries.queries ++
      Dedup.queries ++ Similarity.queries ++ TextAnalysis.queries ++
      Events.queries ++ Multimodal.queries ++ ScaleOps.queries ++ Graph.queries ++
      SqlSurface.queries ++ Pipeline.queries ++ Quality.queries ++
      graft.streaming.EventStreams.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (LSH ANN
    * with Scala-side hyperplanes, stub feature extraction) → driver records
    * a weaker rows-only check; those are covered by unit tests instead.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
