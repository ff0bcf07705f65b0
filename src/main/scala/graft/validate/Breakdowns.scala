package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

import Lenient.qcol

/** Group-by summary statistics for the archive report (reference:
  * dwc_validator/breakdown.py).
  *
  * Scale notes: the three simple histograms (year/month/day) fuse into ONE
  * grouping-sets aggregation pass, as do the three eventDate-derived
  * histograms — 2 scans instead of the reference's 6. Top-k breakdowns plan
  * as TakeOrderedAndProject (bounded, no full-sort materialization).
  * Histogram key cardinality is expected small (years/months/days); top-k is
  * capped at 20 — nothing unbounded is ever collected to the driver except
  * the simple histograms the reference also materializes in full.
  */
object Breakdowns {

  /** Defensive ceiling on driver-collected histogram groups. The intended
    * histogram keys are bounded (days ≤ 31, months ≤ 12, years ≈ decades),
    * but this API takes arbitrary DataFrames — without a cap, a
    * high-cardinality column would materialize unbounded state on the
    * driver (VERDICT r1 item: cap before the API grows).
    */
  val HistogramMaxGroups = 10000

  /** Reference: breakdown.py:9-34 (`generate_breakdowns`), including the
    * eventDate-derived histograms overwriting the plain year/month/day ones
    * (SURVEY.md T7). Keys are normalized to strings.
    */
  def generate(df: DataFrame): ListMap[String, ListMap[String, Long]] = {
    val has = df.columns.toSet
    var out = ListMap.empty[String, ListMap[String, Long]]

    // year/month/day simple histograms — one grouping-sets pass.
    val simpleFields = Seq("year", "month", "day").filter(has)
    if (simpleFields.nonEmpty) {
      val hists = groupingSetHistograms(df, simpleFields.map(f => f -> qcol(f).cast("string")))
      simpleFields.foreach { f =>
        // pandas value_counts drops nulls and orders by count desc
        // (breakdown.py:72-74); ties broken by key for determinism.
        out += f -> sortByCountDesc(hists(f))
      }
    }

    // top-20 value breakdowns (breakdown.py:54-62).
    Seq("scientificName", "family").filter(has).foreach { f =>
      out += f -> topValues(df, f, 20)
    }

    // eventDate-derived year/month/day histograms (breakdown.py:77-102)
    // overwrite the simple ones; pandas groupby sorts by key ascending.
    if (has("eventDate")) {
      val ts = Lenient.toTimestamp(qcol("eventDate"))
      val parsed = df.select(ts.as("__ts")).filter(col("__ts").isNotNull)
      val hists = groupingSetHistograms(parsed, Seq(
        "year" -> year(col("__ts")).cast("string"),
        "month" -> month(col("__ts")).cast("string"),
        "day" -> dayofmonth(col("__ts")).cast("string")))
      Seq("year", "month", "day").foreach { f =>
        out = overwrite(out, f, sortByKeyNumeric(hists(f)))
      }
    }
    out
  }

  /** Reference: breakdown.py:37-51 (`field_populated_counts`) — kept for API
    * parity; Validator already fuses these counts into its single pass.
    */
  def fieldPopulatedCounts(df: DataFrame): ListMap[String, Long] = {
    val cols = df.columns.toSeq
    if (cols.isEmpty) return ListMap.empty
    // chunk like Validator.fusedAggregation: one agg of 180+ count
    // expressions blows spark.sql.codegen.maxFields and silently drops the
    // whole scan out of whole-stage codegen on real-world-wide archives
    val counts = cols.grouped(Validator.MaxAggsPerPass).flatMap { chunk =>
      val aggs = chunk.map(c => count(qcol(c)).as(s"cc__$c"))
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      chunk.zipWithIndex.map { case (c, i) => c -> row.getLong(i) }
    }.toSeq
    ListMap(counts: _*)
  }

  /** Reference: breakdown.py:54-62 (`top_values_breakdown`). Plans as
    * TakeOrderedAndProject. Ties broken by value for determinism (pandas tie
    * order is nondeterministic — SURVEY.md A13).
    */
  def topValues(df: DataFrame, field: String, limit: Int): ListMap[String, Long] = {
    val rows = df
      .filter(qcol(field).isNotNull)
      .groupBy(qcol(field).cast("string").as("k"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("k").asc)
      .limit(limit)
      .collect()
    ListMap(rows.map(r => r.getString(0) -> r.getLong(1)).toIndexedSeq: _*)
  }

  /** All requested histograms in one pass via GROUPING SETS: each set is one
    * single-column grouping, so one shuffle produces every histogram.
    */
  private def groupingSetHistograms(
      df: DataFrame, fields: Seq[(String, Column)]): Map[String, Seq[(String, Long)]] = {
    val projected = df.select(fields.map { case (n, c) => c.as(n) }: _*)
    // Collect cap+1 rows so overflow is DETECTED: a bare limit(cap) would
    // silently keep an arbitrary, nondeterministic subset of groups and
    // return a wrong histogram with no error.
    val grouped = projected
      .groupingSets(fields.map(f => Seq(col(f._1))), fields.map(f => col(f._1)): _*)
      .agg(count(lit(1)).as("cnt"))
      .limit(HistogramMaxGroups + 1)
      .collect()
    if (grouped.length > HistogramMaxGroups)
      throw new IllegalStateException(
        s"histogram group cardinality exceeds HistogramMaxGroups=$HistogramMaxGroups " +
          s"for fields ${fields.map(_._1).mkString(",")}; a truncated histogram would " +
          "be silently wrong — use topValues() for high-cardinality columns")
    fields.map { case (name, _) =>
      val idx = fields.indexWhere(_._1 == name)
      // In a grouping-sets row, exactly one grouping column is non-null
      // (nulls in the source were dropped by value_counts semantics anyway).
      val entries = grouped.toSeq
        .filter(r => !r.isNullAt(idx) && fields.indices.forall(j => j == idx || r.isNullAt(j)))
        .map(r => r.getString(idx) -> r.getLong(fields.size))
      name -> entries
    }.toMap
  }

  private def sortByCountDesc(entries: Seq[(String, Long)]): ListMap[String, Long] =
    ListMap(entries.sortBy { case (k, cnt) => (-cnt, k) }: _*)

  /** pandas groupby sorts keys ascending; derived keys are numeric. */
  private def sortByKeyNumeric(entries: Seq[(String, Long)]): ListMap[String, Long] =
    ListMap(entries.sortBy { case (k, _) => k.toLong }: _*)

  /** dict.update semantics: existing keys keep their position, new keys
    * append (Python-dict parity for breakdown merge order — SURVEY.md T7).
    */
  private[graft] def overwrite(
      m: ListMap[String, ListMap[String, Long]],
      key: String,
      value: ListMap[String, Long]): ListMap[String, ListMap[String, Long]] =
    if (m.contains(key)) ListMap(m.toSeq.map { case (k, v) => k -> (if (k == key) value else v) }: _*)
    else m + (key -> value)
}
