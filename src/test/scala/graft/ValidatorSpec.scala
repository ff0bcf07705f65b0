package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

import graft.validate.Validator

/** Unit tests per operator family (SURVEY.md §2.4), including the verified
  * edge cases of SURVEY.md §7.4.
  */
class ValidatorSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def stringDf(cols: Seq[String], rows: Seq[Seq[String]]) = {
    val schema = StructType(cols.map(c => StructField(c, StringType, nullable = true)))
    spark.createDataFrame(rows.map(r => Row(r: _*)).asJava, schema)
  }

  test("README in-memory example: 3 rows, native double coords (golden)") {
    val schema = StructType(Seq(
      StructField("scientificName", StringType),
      StructField("decimalLatitude", DoubleType),
      StructField("decimalLongitude", DoubleType),
      StructField("eventDate", StringType),
      StructField("recordedBy", StringType)))
    val rows = Seq(
      Row("SpeciesA", 40.7128, -74.0060, "2023-01-01", "John Doe"),
      Row("SpeciesB", 34.0522, -118.2437, "2023-02-15", "Jane Smith"),
      Row("SpeciesC", 51.5074, -0.1278, "2023-03-30", "Bob Johnson"))
    val r = Validator.validateOccurrence(spark.createDataFrame(rows.asJava, schema))
    assert(r.record_count == 3)
    assert(r.errors.isEmpty && r.warnings.isEmpty)
    assert(r.coordinates_report.get == graft.model.CoordinatesReport(true, 0, 0))
    assert(r.column_counts == Map(
      "scientificName" -> 3, "decimalLatitude" -> 3, "decimalLongitude" -> 3,
      "eventDate" -> 3, "recordedBy" -> 3))
    assert(r.record_error_count == 0)
    assert(r.records_with_taxonomy_count == 3)
    assert(r.records_with_temporal_count == 3)
    assert(r.records_with_recorded_by_count == 3)
    assert(r.vocabReports.map(v => (v.field, v.has_field)) ==
      Seq(("basisOfRecord", false), ("geodeticDatum", false)))
  }

  test("id checks: missing field (A6/O3)") {
    val df = stringDf(Seq("a"), Seq(Seq("1")))
    val r = Validator.validateOccurrence(df, Seq("occurrenceID"))
    assert(r.errors == Seq("MISSING_OCCURRENCEID_FIELD"))
    assert(r.record_error_count == 1)
  }

  test("id checks: missing values (A9/O3)") {
    val df = stringDf(Seq("occurrenceID"), Seq(Seq("1"), Seq(null), Seq(null)))
    val r = Validator.validateOccurrence(df, Seq("occurrenceID"))
    assert(r.errors == Seq("MISSING_OCCURRENCEID_FIELD_VALUES"))
    assert(r.record_error_count == 2)
  }

  test("id checks: duplicates counted as count - distinct (A7/A8/T6)") {
    val df = stringDf(Seq("occurrenceID"), Seq(Seq("a"), Seq("a"), Seq("a"), Seq("b")))
    val r = Validator.validateOccurrence(df, Seq("occurrenceID"))
    assert(r.errors == Seq("DUPLICATE_OCCURRENCEID_VALUES"))
    assert(r.record_error_count == 2) // ['a','a','a','b'] → 2, verified vs pandas
  }

  test("id checks: multi-field ids check population only, never uniqueness (T6)") {
    val df = stringDf(Seq("catalogNumber", "otherCatalogNumbers"),
      Seq(Seq("a", "x"), Seq("a", "x"), Seq("b", "y")))
    val r = Validator.validateOccurrence(df, Seq("catalogNumber", "otherCatalogNumbers"))
    assert(r.errors.isEmpty)
    assert(r.record_error_count == 0)
  }

  test("id checks: id_term resolves to the positional 'id' column (T4)") {
    val df = stringDf(Seq("id", "other"), Seq(Seq("1", "x"), Seq("1", "y")))
    val r = Validator.validateOccurrence(df, Seq("occurrenceID"), idTerm = "occurrenceID")
    assert(r.errors == Seq("DUPLICATE_OCCURRENCEID_VALUES"))
    assert(r.record_error_count == 1)
  }

  test("required-field groups: row-wise any-populated (A3)") {
    val df = stringDf(Seq("scientificName", "kingdom", "eventDate"),
      Seq(Seq(null, "Animalia", null), Seq(null, null, "2023-01-01"), Seq(null, null, null)))
    val r = Validator.validateOccurrence(df)
    assert(r.records_with_taxonomy_count == 1)
    assert(r.records_with_temporal_count == 1)
  }

  test("coordinates: non-numeric and out-of-range both invalid (E1/P6/A5)") {
    val df = stringDf(Seq("decimalLatitude", "decimalLongitude"),
      Seq(Seq("12.34", "-56.78"), Seq("bad", "181"), Seq("-91", "0"), Seq(null, null),
        Seq("90", "-180"))) // boundary values are valid (inclusive between)
    val r = Validator.validateOccurrence(df)
    val c = r.coordinates_report.get
    assert(c.has_coordinates_fields)
    assert(c.invalid_decimal_latitude_count == 2) // "bad", "-91"; null not counted
    assert(c.invalid_decimal_longitude_count == 1) // "181"
    assert(r.warnings.contains("INVALID_OR_OUT_OF_RANGE_COORDINATES"))
  }

  test("vocabulary: case-insensitive match, arithmetic unrecognised (A10)") {
    val df = stringDf(Seq("basisOfRecord"),
      Seq(Seq("preservedspecimen"), Seq("HUMANOBSERVATION"), Seq("NONSENSE"), Seq(null)))
    val r = Validator.validateOccurrence(df)
    val v = r.vocabReports.find(_.field == "basisOfRecord").get
    assert(v.recognised_count == 2)
    assert(v.unrecognised_count == 1) // 4 - (1 null + 2 recognised)
    assert(v.non_matching_values == Seq("NONSENSE"))
  }

  test("vocabulary sample: sorted distinct, first 10, nulls→'nan' quirk (A15/T5)") {
    val values = Seq("Zz", "aa", "MM", "bb", "CC", "dd", "EE", "ff", "GG", "hh", "II", null)
    val df = stringDf(Seq("geodeticDatum"), values.map(Seq(_)))
    val r = Validator.validateOccurrence(df)
    val v = r.vocabReports.find(_.field == "geodeticDatum").get
    // numpy.unique sorts lexicographically (ASCII: uppercase first), takes 10;
    // the stringified NaN ("nan") sorts after "ff" and is then removed.
    val expected = Seq("CC", "EE", "GG", "II", "MM", "Zz", "aa", "bb", "dd", "ff")
    assert(v.non_matching_values == expected)
  }

  test("vocabulary on numeric column degrades gracefully (T5 deviation)") {
    val schema = StructType(Seq(StructField("geodeticDatum", DoubleType)))
    val df = spark.createDataFrame(Seq(Row(1.0), Row(2.0)).asJava, schema)
    val r = Validator.validateOccurrence(df) // reference raises AttributeError here
    val v = r.vocabReports.find(_.field == "geodeticDatum").get
    assert(v.recognised_count == 0 && v.unrecognised_count == 2)
    assert(v.non_matching_values == Seq("1.0", "2.0"))
  }

  test("numeric fields: intended semantics warn on unparseable values (A11/T1)") {
    val df = stringDf(Seq("individualCount"), Seq(Seq("2001"), Seq("banana"), Seq(null)))
    val r = Validator.validateOccurrence(df)
    assert(r.warnings.contains("NON_NUMERIC_VALUES_IN_INDIVIDUALCOUNT"))
    // reference-compatible mode reproduces the dead-code behavior (no warning)
    val r2 = Validator.validateOccurrence(df, referenceCompatibleNumericWarnings = true)
    assert(!r2.warnings.exists(_.startsWith("NON_NUMERIC_VALUES")))
  }

  test("event validation: taxonomy hard-coded 0, eventID id check (O2)") {
    val df = stringDf(Seq("eventID", "scientificName", "eventDate"),
      Seq(Seq("e1", "SpeciesA", "2023-01-01"), Seq("e2", "SpeciesB", "2023-01-02")))
    val r = Validator.validateEvent(df)
    assert(r.record_type == "Event")
    assert(r.records_with_taxonomy_count == 0) // hard-coded (validate.py:126)
    assert(r.records_with_temporal_count == 2)
    assert(r.errors.isEmpty)
    assert(r.vocabReports.map(_.field) == Seq("geodeticDatum"))
  }

  test("empty dataframe validates without error") {
    val df = stringDf(Seq("occurrenceID"), Nil)
    val r = Validator.validateOccurrence(df, Seq("occurrenceID"))
    assert(r.record_count == 0)
    assert(r.errors.isEmpty)
  }
}
