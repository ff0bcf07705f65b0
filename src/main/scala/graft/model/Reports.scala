package graft.model

import scala.collection.immutable.ListMap

import com.fasterxml.jackson.annotation.JsonIgnore

/** Validation report model.
  *
  * Mirrors the reference's report shape field-for-field
  * (reference: dwc_validator/model.py:8-98) so that serialized JSON is
  * comparable. Field declaration order matches the reference's `__init__`
  * assignment order (which fixes jsonpickle's key order).
  */

/** reference: model.py:8-20 */
case class CoordinatesReport(
    has_coordinates_fields: Boolean,
    invalid_decimal_latitude_count: Long,
    invalid_decimal_longitude_count: Long)

/** reference: model.py:24-41 */
case class VocabularyReport(
    field: String,
    has_field: Boolean,
    recognised_count: Long,
    unrecognised_count: Long,
    non_matching_values: Seq[String])

/** reference: model.py:45-74 */
case class DFValidationReport(
    record_type: String,
    record_count: Long,
    errors: Seq[String],
    warnings: Seq[String],
    coordinates_report: Option[CoordinatesReport],
    column_counts: ListMap[String, Long],
    record_error_count: Long,
    records_with_taxonomy_count: Long,
    records_with_temporal_count: Long,
    records_with_recorded_by_count: Long,
    // None on the UNSUPPORTED_CORE_TYPE branch: the reference never assigns
    // the attribute there, so jsonpickle emits null. Option keeps the JSON
    // parity (Jackson serializes None as null) without handing Scala callers
    // a null Seq.
    vocab_reports: Option[Seq[VocabularyReport]]) {
  /** Null-safe accessor for Scala consumers (empty on the unsupported-core branch). */
  @JsonIgnore def vocabReports: Seq[VocabularyReport] = vocab_reports.getOrElse(Nil)
}

/** reference: model.py:78-98.
  *
  * Breakdown values are `ListMap[String, Long]`; the reference emits int keys
  * for eventDate-derived histograms and string keys for plain column
  * histograms (breakdown.py:72-74 vs :95-102) — we normalize every key to a
  * string (documented deviation, SURVEY.md T7).
  */
case class DwCAValidationReport(
    valid: Boolean,
    core_type: String,
    dataset_type: String,
    core: DFValidationReport,
    extensions: Seq[DFValidationReport],
    breakdowns: ListMap[String, ListMap[String, Long]])
