package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

import graft.json.ReportJson
import graft.validate.Validator

/** Golden test: the reference README's worked example
  * (/root/reference/README.md:46-99) serialized through ReportJson must
  * match the published JSON key-for-key and value-for-value.
  *
  * One documented deviation: the published example predates the reference's
  * `record_type` field (model.py:52 assigns it, but the README capture lacks
  * it), so the comparison drops `record_type` from our output.
  */
class ReportGoldenSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private val golden =
    """{
      |  "record_count": 3,
      |  "errors": [],
      |  "warnings": [],
      |  "coordinates_report": {
      |    "has_coordinates_fields": true,
      |    "invalid_decimal_latitude_count": 0,
      |    "invalid_decimal_longitude_count": 0
      |  },
      |  "column_counts": {
      |    "scientificName": 3,
      |    "decimalLatitude": 3,
      |    "decimalLongitude": 3,
      |    "eventDate": 3,
      |    "recordedBy": 3
      |  },
      |  "record_error_count": 0,
      |  "records_with_taxonomy_count": 3,
      |  "records_with_temporal_count": 3,
      |  "records_with_recorded_by_count": 3,
      |  "vocab_reports": [
      |    {
      |      "field": "basisOfRecord",
      |      "has_field": false,
      |      "recognised_count": 0,
      |      "unrecognised_count": 0,
      |      "non_matching_values": []
      |    },
      |    {
      |      "field": "geodeticDatum",
      |      "has_field": false,
      |      "recognised_count": 0,
      |      "unrecognised_count": 0,
      |      "non_matching_values": []
      |    }
      |  ]
      |}""".stripMargin

  test("README worked example serializes to the published JSON (key-order-normalized)") {
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
    val report = Validator.validateOccurrence(spark.createDataFrame(rows.asJava, schema))

    val mapper = new ObjectMapper()
    val ours = mapper.readValue(ReportJson.toJson(report), classOf[java.util.Map[String, Object]])
    val want = mapper.readValue(golden, classOf[java.util.Map[String, Object]])
    ours.remove("record_type") // README capture predates the field
    assert(ours == want)
  }

  test("column_counts key order follows column order in serialized JSON") {
    val schema = StructType(Seq(
      StructField("b", StringType), StructField("a", StringType)))
    val df = spark.createDataFrame(Seq(Row("1", "2")).asJava, schema)
    val json = ReportJson.toJson(Validator.validateOccurrence(df))
    assert(json.indexOf("\"b\"") < json.indexOf("\"a\""))
  }
}
