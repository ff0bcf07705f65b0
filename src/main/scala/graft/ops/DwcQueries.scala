package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.validate.Validator
import Tables._

/** The flagship DwC validation path (O1: validate_occurrence_dataframe,
  * reference validate.py:15-84) registered against the driver's oracle:
  * lineitem is mapped onto Darwin Core occurrence columns and the
  * validator's fused single-pass aggregation — the exact plan behind every
  * report — is emitted as a one-row DataFrame whose every cell the DuckDB
  * oracle recomputes independently.
  *
  * The mapping deliberately produces a mixed population: out-of-range
  * coordinates on both sides, a non-unique id field, and both recognised
  * and unrecognised vocabulary values, so each aggregate has a non-trivial
  * value to get wrong.
  */
object DwcQueries {

  /** lineitem rows wearing DwC occurrence columns. */
  def dwcMapped(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select(
      col("l_orderkey").cast("string").as("occurrenceID"),
      (col("l_quantity") * 4 - 100).as("decimalLatitude"),
      (col("l_extendedprice") / 100 - 200).as("decimalLongitude"),
      when(col("l_returnflag") === "A", "HumanObservation")
        .when(col("l_returnflag") === "N", "JUNK")
        .otherwise("PreservedSpecimen").as("basisOfRecord"),
      when(col("l_linenumber") % 3 === 0, "WGS84")
        .when(col("l_linenumber") % 3 === 1, "EPSG:32601")
        .otherwise("BADDATUM").as("geodeticDatum"),
      col("l_linestatus").as("scientificName"),
      date_format(col("l_shipdate"), "yyyy-MM-dd").as("eventDate"))

  private val oracle =
    """SELECT count(*) AS "__n",
      |  count(l_orderkey) AS "cc__occurrenceID",
      |  count(l_quantity) AS "cc__decimalLatitude",
      |  count(l_extendedprice) AS "cc__decimalLongitude",
      |  count(l_returnflag) AS "cc__basisOfRecord",
      |  count(l_linenumber) AS "cc__geodeticDatum",
      |  count(l_linestatus) AS "cc__scientificName",
      |  count(l_shipdate) AS "cc__eventDate",
      |  count(CASE WHEN l_linestatus IS NOT NULL THEN 1 END) AS "grp__taxonomy",
      |  count(CASE WHEN l_shipdate IS NOT NULL THEN 1 END) AS "grp__temporal",
      |  count(CASE WHEN l_quantity * 4 - 100 BETWEEN -90 AND 90 THEN 1 END)
      |    AS "lat__valid",
      |  count(CASE WHEN l_extendedprice / 100 - 200 BETWEEN -180 AND 180 THEN 1 END)
      |    AS "lon__valid",
      |  count(CASE WHEN l_orderkey IS NULL THEN 1 END) AS "idnull__occurrenceID",
      |  count(DISTINCT l_orderkey) AS "iddist__occurrenceID",
      |  count(CASE WHEN l_returnflag IN ('A', 'R') THEN 1 END)
      |    AS "vocab__basisOfRecord",
      |  count(CASE WHEN l_linenumber % 3 IN (0, 1) THEN 1 END)
      |    AS "vocab__geodeticDatum",
      |  count(CASE WHEN TRY_CAST(CAST(l_quantity * 4 - 100 AS VARCHAR) AS DOUBLE)
      |    IS NULL THEN 1 END) AS "numbad__decimalLatitude",
      |  count(CASE WHEN TRY_CAST(CAST(l_extendedprice / 100 - 200 AS VARCHAR) AS DOUBLE)
      |    IS NULL THEN 1 END) AS "numbad__decimalLongitude"
      |FROM lineitem""".stripMargin

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery.of("q_o1_fused_report", oracle) { (s, d) =>
      Validator.fusedAggregation(dwcMapped(s, d), idFields = Seq("occurrenceID"))
    })
}
