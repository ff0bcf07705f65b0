package graft.vocab

/** Controlled vocabularies for Darwin Core terms.
  *
  * Value sets taken from the reference (dwc_validator/vocab.py:6-15 for
  * basisOfRecord, vocab.py:19-181 for geodeticDatum) — these are data, the
  * observable contract of the vocabulary checks. Matching is always
  * case-insensitive (reference: validate.py:285-292), so we pre-lower once.
  */
object Vocabularies {

  /** DwC term "basisOfRecord" (reference: vocab.py:6-15). */
  val basisOfRecord: Set[String] = Set(
    "PreservedSpecimen",
    "FossilSpecimen",
    "LivingSpecimen",
    "HumanObservation",
    "MachineObservation",
    "Observation",
    "MaterialSample",
    "Occurrence"
  )

  /** DwC term "geodeticDatum" (reference: vocab.py:19-181): named datums
    * plus the EPSG:xxxxx UTM zone codes enumerated by the reference.
    */
  val geodeticDatum: Set[String] = {
    val named = Set(
      "WGS84", "NAD83", "ETRS89", "ITRF", "GDA94", "ED50", "NAD27",
      "AGD66", "AGD84")
    // EPSG ranges as enumerated in the reference vocabulary:
    // 20248-20258, 20348-20358, 28348-28357, 32601-32660, 32701-32760.
    val epsg = ((20248 to 20258) ++ (20348 to 20358) ++ (28348 to 28357) ++
      (32601 to 32660) ++ (32701 to 32760)).map(n => s"EPSG:$n").toSet
    named ++ epsg
  }

  /** Lower-cased copies used by the case-insensitive membership checks. */
  val basisOfRecordLower: Seq[String] = basisOfRecord.map(_.toLowerCase).toSeq.sorted
  val geodeticDatumLower: Seq[String] = geodeticDatum.map(_.toLowerCase).toSeq.sorted
}
