package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.validate.ArchiveValidator

/** 1:1 port of the reference's archive tests
  * (dwc_validator/test/test_occurrence_archive.py and
  * test_event_archive.py) against the same fixture archives.
  */
class ArchiveParitySpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def occ(name: String) =
    ArchiveValidator.validateArchive(spark, TestSpark.resourcePath(s"/occurrence_archives/$name"), Seq("occurrenceID"))

  test("validate ok (dwca-simple)") { // test_occurrence_archive.py:23-39
    val r = occ("dwca-simple")
    assert(r.core.record_count == 5)
    assert(r.core.coordinates_report.get.invalid_decimal_latitude_count == 0)
    assert(r.core.coordinates_report.get.invalid_decimal_longitude_count == 0)
    assert(r.core.records_with_temporal_count == 5)
    assert(r.core.records_with_recorded_by_count == 5)
    assert(r.core.records_with_taxonomy_count == 5)
    assert(r.valid)
    assert(r.dataset_type == "Occurrence")
  }

  test("validate bad coordinates (dwca-bad-coordinates, \\r\\n dialect)") { // :41-52
    val r = occ("dwca-bad-coordinates")
    assert(r.core.record_count == 5)
    assert(r.core.coordinates_report.get.invalid_decimal_latitude_count == 1)
    assert(r.core.coordinates_report.get.invalid_decimal_longitude_count == 1)
    assert(r.core.warnings.contains("INVALID_OR_OUT_OF_RANGE_COORDINATES"))
  }

  test("validate out of range coordinates") { // :54-65
    val r = occ("dwca-out-of-range-coordinates")
    assert(r.core.record_count == 5)
    assert(r.core.coordinates_report.get.invalid_decimal_latitude_count == 1)
    assert(r.core.coordinates_report.get.invalid_decimal_longitude_count == 1)
  }

  test("validate geodetic datum (GIRAFFE unrecognised)") { // :67-85
    val r = occ("dwca-bad-geodetic-datum")
    assert(r.core.record_count == 5)
    assert(r.core.coordinates_report.get.invalid_decimal_latitude_count == 0)
    assert(r.core.coordinates_report.get.invalid_decimal_longitude_count == 0)
    val gd = r.core.vocabReports.find(_.field == "geodeticDatum").get
    assert(gd.has_field)
    assert(gd.recognised_count == 4)
    assert(gd.unrecognised_count == 1)
    assert(gd.non_matching_values == Seq("GIRAFFE"))
  }

  test("validate unrecognised basis of record") { // :87-107
    val r = occ("dwca-unrecognised-basis-of-record")
    assert(r.core.record_count == 5)
    assert(r.core.coordinates_report.get.invalid_decimal_latitude_count == 0)
    assert(r.core.coordinates_report.get.invalid_decimal_longitude_count == 0)
    val bor = r.core.vocabReports.find(_.field == "basisOfRecord").get
    assert(bor.has_field)
    assert(bor.recognised_count == 3)
    assert(bor.unrecognised_count == 2)
    assert(bor.non_matching_values.head == "NONSENSE")
  }

  test("validate event archive (core + occurrence extension)") { // test_event_archive.py:20-29
    val r = ArchiveValidator.validateArchive(spark, TestSpark.resourcePath("/event_archives/dwca-simple"))
    assert(r.core.record_count == 5)
    assert(r.core.coordinates_report.get.invalid_decimal_latitude_count == 0)
    assert(r.core.coordinates_report.get.invalid_decimal_longitude_count == 0)
    assert(r.core.record_type == "Event")
    assert(r.dataset_type == "Event")
    // Occurrence extension validated; MeasurementOrFact extension is not
    // (reference: validate_dwca.py:79).
    assert(r.extensions.size == 1)
    assert(r.extensions.head.record_count == 5)
    // lowercase "observation" matches the vocab case-insensitively.
    val bor = r.extensions.head.vocabReports.find(_.field == "basisOfRecord").get
    assert(bor.recognised_count == 5)
    assert(bor.unrecognised_count == 0)
    // eventDate-derived breakdowns present from the Event core.
    assert(r.breakdowns.contains("year"))
    assert(r.breakdowns("year") == Map("2023" -> 5L))
    assert(r.breakdowns("day").size == 5)
  }

  test("multi-file zip archive extracts and reads like the directory form") {
    // zip the 4-file event fixture (meta.xml + core + 2 extensions) and
    // open the zip — must behave exactly like opening the directory
    val srcDir = new java.io.File(TestSpark.resourcePath("/event_archives/dwca-simple"))
    val zipFile = java.io.File.createTempFile("dwca-multi", ".zip")
    zipFile.deleteOnExit()
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(zipFile))
    try srcDir.listFiles().sortBy(_.getName).foreach { f =>
      zos.putNextEntry(new java.util.zip.ZipEntry(f.getName))
      java.nio.file.Files.copy(f.toPath, zos)
      zos.closeEntry()
    } finally zos.close()
    val archive = graft.dwca.DwcaArchive.open(spark, zipFile.getAbsolutePath)
    assert(archive.descriptor.extensions.size == 2)
    assert(archive.coreDataFrame.count() == 5)
    val occExt = archive.descriptor.extensions
      .find(_.rowTypeLocalName == "Occurrence").get
    assert(archive.joined(occExt).count() == 5)
  }

  test("pandas NA tokens null out; ignoreHeaderLines=2 skips both preamble lines") {
    val dir = java.nio.file.Files.createTempDirectory("dwca-na").toFile
    dir.deleteOnExit()
    java.nio.file.Files.writeString(new java.io.File(dir, "meta.xml").toPath,
      """<?xml version="1.0" encoding="UTF-8"?>
        |<archive xmlns="http://rs.tdwg.org/dwc/text/">
        |  <core rowType="http://rs.tdwg.org/dwc/terms/Occurrence" encoding="utf-8" fieldsTerminatedBy="," linesTerminatedBy="\n" fieldsEnclosedBy="" ignoreHeaderLines="2">
        |    <files><location>occ.txt</location></files>
        |    <id index="0" />
        |    <field index="1" term="http://rs.tdwg.org/dwc/terms/occurrenceID"/>
        |    <field index="2" term="http://rs.tdwg.org/dwc/terms/basisOfRecord"/>
        |  </core>
        |</archive>""".stripMargin)
    java.nio.file.Files.writeString(new java.io.File(dir, "occ.txt").toPath,
      """# generator preamble the reference's skiprows=2 would drop
        |id,occurrenceID,basisOfRecord
        |1,o1,HumanObservation
        |2,NA,HumanObservation
        |3,o3,NaN
        |""".stripMargin)
    val df = graft.dwca.DwcaArchive.open(spark, dir.getAbsolutePath).coreDataFrame
    // skiprows=2 parity: 3 data records, not 4 (the header line is data
    // if only one line were skipped)
    assert(df.count() == 3, df.collect().mkString("; "))
    // pandas default NA tokens are nulls, exactly like the reference
    assert(df.filter(df("occurrenceID").isNull).count() == 1)
    assert(df.filter(df("basisOfRecord").isNull).count() == 1)
    assert(df.filter(df("occurrenceID") === "o1").count() == 1)
  }

  test("quoted fields with embedded delimiters: classic and DSv2 parse identically") {
    val dir = java.nio.file.Files.createTempDirectory("dwca-quoted").toFile
    dir.deleteOnExit()
    java.nio.file.Files.writeString(new java.io.File(dir, "meta.xml").toPath,
      """<?xml version="1.0" encoding="UTF-8"?>
        |<archive xmlns="http://rs.tdwg.org/dwc/text/">
        |  <core rowType="http://rs.tdwg.org/dwc/terms/Occurrence" encoding="utf-8" fieldsTerminatedBy="," linesTerminatedBy="\n" fieldsEnclosedBy="&quot;" ignoreHeaderLines="1">
        |    <files><location>occ.txt</location></files>
        |    <id index="0" />
        |    <field index="1" term="http://rs.tdwg.org/dwc/terms/occurrenceID"/>
        |    <field index="2" term="http://rs.tdwg.org/dwc/terms/basisOfRecord"/>
        |  </core>
        |</archive>""".stripMargin)
    java.nio.file.Files.writeString(new java.io.File(dir, "occ.txt").toPath,
      "id,occurrenceID,basisOfRecord\n" +
        "1,\"o,1\",HumanObservation\n" + // embedded delimiter inside quotes
        "2,\"plain\",\"Machine,Observation\"\n" +
        "3,unquoted,HumanObservation\n")
    val classic = graft.dwca.DwcaArchive.open(spark, dir.getAbsolutePath).coreDataFrame
      .select("id", "occurrenceID", "basisOfRecord")
    val v2 = spark.read.format("dwca").option("path", dir.getAbsolutePath).load()
      .select("id", "occurrenceID", "basisOfRecord")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq
    val (cRows, vRows) = (rows(classic), rows(v2)) // collect once each
    assert(cRows == vRows, s"classic=$cRows v2=$vRows")
    assert(cRows.map(_(1)).toSet == Set("o,1", "plain", "unquoted"))
    // a pushed EqualTo on a value containing the delimiter still decides
    // correctly inside the DSv2 reader (the quote parse happens first)
    import org.apache.spark.sql.functions.col
    val hit = spark.read.format("dwca").option("path", dir.getAbsolutePath).load()
      .filter(col("occurrenceID") === "o,1")
    assert(hit.count() == 1)
  }

  test("ignoreHeaderLines>1 + custom terminator/encoding fails loudly, not silently") {
    def archiveWith(coreAttrs: String): java.io.File = {
      val dir = java.nio.file.Files.createTempDirectory("dwca-guard").toFile
      dir.deleteOnExit()
      java.nio.file.Files.writeString(new java.io.File(dir, "meta.xml").toPath,
        s"""<?xml version="1.0" encoding="UTF-8"?>
           |<archive xmlns="http://rs.tdwg.org/dwc/text/">
           |  <core rowType="http://rs.tdwg.org/dwc/terms/Occurrence" $coreAttrs>
           |    <files><location>occ.txt</location></files>
           |    <id index="0" />
           |    <field index="1" term="http://rs.tdwg.org/dwc/terms/occurrenceID"/>
           |  </core>
           |</archive>""".stripMargin)
      java.nio.file.Files.writeString(new java.io.File(dir, "occ.txt").toPath,
        "# preamble\nid,occurrenceID\n1,o1\n")
      dir
    }
    // a declared single-char custom terminator is honored on the CSV parse
    // but NOT by the textFile pre-skip — the combination must throw
    val semi = archiveWith("encoding=\"utf-8\" fieldsTerminatedBy=\",\" " +
      "linesTerminatedBy=\";\" fieldsEnclosedBy=\"\" ignoreHeaderLines=\"2\"")
    val e1 = intercept[IllegalArgumentException](
      graft.dwca.DwcaArchive.open(spark, semi.getAbsolutePath).coreDataFrame.count())
    assert(e1.getMessage.contains("ignoreHeaderLines"), e1.getMessage)
    // same for a non-UTF-8 encoding (the pre-skip decodes UTF-8 only)
    val latin = archiveWith("encoding=\"ISO-8859-1\" fieldsTerminatedBy=\",\" " +
      "linesTerminatedBy=\"\\n\" fieldsEnclosedBy=\"\" ignoreHeaderLines=\"2\"")
    val e2 = intercept[IllegalArgumentException](
      graft.dwca.DwcaArchive.open(spark, latin.getAbsolutePath).coreDataFrame.count())
    assert(e2.getMessage.contains("encoding"), e2.getMessage)
    // and N<=1 with the same custom dialect still goes through the normal
    // path (no pre-skip involved) — guard must not over-trigger
    val ok = archiveWith("encoding=\"ISO-8859-1\" fieldsTerminatedBy=\",\" " +
      "linesTerminatedBy=\"\\n\" fieldsEnclosedBy=\"\" ignoreHeaderLines=\"1\"")
    // first line is the preamble here; with header=true it is consumed as
    // the header row, so parsing succeeds (2 data rows read as strings)
    assert(graft.dwca.DwcaArchive.open(spark, ok.getAbsolutePath).coreDataFrame.count() == 2)
  }

  test("zip extraction dies AT the byte cap, mid-entry, not after the copy") {
    val zipFile = java.io.File.createTempFile("dwca-big", ".zip")
    zipFile.deleteOnExit()
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(zipFile))
    try {
      zos.putNextEntry(new java.util.zip.ZipEntry("meta.xml"))
      zos.write(Array.fill(1 << 20)('x'.toByte)) // one 1 MiB entry
      zos.closeEntry()
    } finally zos.close()
    val e = intercept[IllegalArgumentException](
      graft.dwca.DwcaArchive.extractZip(zipFile, maxBytes = 100L))
    assert(e.getMessage.contains("expands past"), e.getMessage)
  }

  test("core ⋈ extension join on id = coreid (event fixture, 5×5)") {
    val archive = graft.dwca.DwcaArchive.open(
      spark, TestSpark.resourcePath("/event_archives/dwca-simple"))
    val occExt = archive.descriptor.extensions
      .find(_.rowTypeLocalName == "Occurrence").get
    val joined = archive.joined(occExt)
    assert(joined.count() == 5) // 1:1 link in the fixture
    // every core row found its extension row (left join, no orphans)
    assert(joined.filter(joined("coreid").isNull).count() == 0)
    // extension columns arrive prefixed; core columns unprefixed
    assert(joined.columns.contains("occurrence_basisOfRecord"))
    assert(joined.columns.contains("eventDate"))
    val row = joined.filter(joined("id") === "1").head()
    assert(row.getAs[String]("occurrence_basisOfRecord") == "observation")
  }

  test("DSv2 provider equals the classic reader on every fixture archive") {
    val fixtures = Seq(
      "/occurrence_archives/dwca-simple",
      "/occurrence_archives/dwca-bad-coordinates", // \r\n dialect
      "/occurrence_archives/dwca-bad-geodetic-datum",
      "/occurrence_archives/dwca-out-of-range-coordinates",
      "/occurrence_archives/dwca-unrecognised-basis-of-record",
      "/event_archives/dwca-simple") // core + extension
    fixtures.foreach { fx =>
      val path = TestSpark.resourcePath(fx)
      val archive = graft.dwca.DwcaArchive.open(spark, path)
      def rowsOf(df: org.apache.spark.sql.DataFrame, cols: Seq[String]) =
        df.select(cols.map(df(_)): _*).collect()
          .map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("")).toSeq
      val v2Core = spark.read.format("dwca").option("path", path).load()
      val classicCore = archive.coreDataFrame
      // v2's schema is the declared columns (+ default-only constants);
      // the classic reader may additionally keep undeclared physical
      // columns as _cN — compare on the declared set
      assert(v2Core.columns.toSeq.forall(classicCore.columns.contains), fx)
      assert(rowsOf(v2Core, v2Core.columns.toSeq) ==
        rowsOf(classicCore, v2Core.columns.toSeq), fx)
      archive.descriptor.extensions.foreach { e =>
        val v2Ext = spark.read.format("dwca").option("path", path)
          .option("table", e.rowTypeLocalName).load()
        val classicExt = archive.read(e)
        assert(rowsOf(v2Ext, v2Ext.columns.toSeq) ==
          rowsOf(classicExt, v2Ext.columns.toSeq), s"$fx ext ${e.rowTypeLocalName}")
      }
    }
  }

  test("DSv2 scan prunes columns: only the selected terms reach the parser") {
    val path = TestSpark.resourcePath("/occurrence_archives/dwca-simple")
    val df = spark.read.format("dwca").option("path", path).load()
      .select("id", "scientificName")
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.size == 1, df.queryExecution.executedPlan.toString)
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("id", "scientificName"),
      scans.head.scan.description())
    // and the pruned read returns exactly the classic values
    val classic = graft.dwca.DwcaArchive.open(spark, path).coreDataFrame
      .select("id", "scientificName")
    assert(df.collect().map(_.toSeq).sortBy(_.toString).toSeq ==
      classic.collect().map(_.toSeq).sortBy(_.toString).toSeq)
  }

  test("DSv2 scan pushes string filters: rows drop at the parser, values match classic") {
    import org.apache.spark.sql.functions.col
    val path = TestSpark.resourcePath("/occurrence_archives/dwca-bad-geodetic-datum")
    def scanOf(df: org.apache.spark.sql.DataFrame) = {
      val scans = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      assert(scans.size == 1, df.queryExecution.executedPlan.toString)
      scans.head.scan
    }
    val classic = graft.dwca.DwcaArchive.open(spark, path).coreDataFrame
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq

    // EqualTo reaches the scan (description advertises it) and the
    // filter column stays readable even when pruned from the output
    val eq = spark.read.format("dwca").option("path", path).load()
      .filter(col("geodeticDatum") === "GIRAFFE").select("id", "scientificName")
    assert(scanOf(eq).description().contains("EqualTo(geodeticDatum,GIRAFFE)"),
      scanOf(eq).description())
    assert(sorted(eq) == sorted(classic.filter(col("geodeticDatum") === "GIRAFFE")
      .select("id", "scientificName")))

    // In + StartsWith compose; non-pushable predicates stay residual
    val mixed = spark.read.format("dwca").option("path", path).load()
      .filter(col("geodeticDatum").isin("WGS84", "EPSG:4326") &&
        col("scientificName").startsWith("A") &&
        org.apache.spark.sql.functions.length(col("id")) > 0)
    val d = scanOf(mixed).description()
    assert(d.contains("In(geodeticDatum"), d)
    assert(d.contains("StringStartsWith(scientificName,A)"), d)
    assert(!d.contains("length"), d) // length(...) is the residual, not pushed
    assert(sorted(mixed) == sorted(classic
      .filter(col("geodeticDatum").isin("WGS84", "EPSG:4326") &&
        col("scientificName").startsWith("A") &&
        org.apache.spark.sql.functions.length(col("id")) > 0)))

    // IsNull decides on the NA-normalized value, matching the classic frame
    val nn = spark.read.format("dwca").option("path", path).load()
      .filter(col("geodeticDatum").isNotNull)
    assert(scanOf(nn).description().contains("IsNotNull(geodeticDatum)"),
      scanOf(nn).description())
    assert(nn.count() == classic.filter(col("geodeticDatum").isNotNull).count())

    // an always-false pushed filter returns zero rows (the row loop skips all)
    val none = spark.read.format("dwca").option("path", path).load()
      .filter(col("geodeticDatum") === "NO_SUCH_DATUM")
    assert(none.count() == 0)
  }

  test("DSv2 COUNT(*) pushes to the scan: one emitted long, values match classic") {
    import org.apache.spark.sql.functions.col
    val path = TestSpark.resourcePath("/occurrence_archives/dwca-bad-geodetic-datum")
    def countScanOf(df: org.apache.spark.sql.DataFrame) = {
      val scans = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      assert(scans.size == 1, df.queryExecution.executedPlan.toString)
      scans.head.scan
    }
    val classic = graft.dwca.DwcaArchive.open(spark, path).coreDataFrame

    // bare count: the scan becomes the count scan, no column materializes
    val bare = spark.read.format("dwca").option("path", path).load()
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
    assert(countScanOf(bare).description().contains("PushedAggregates: [COUNT(*)]"),
      countScanOf(bare).description())
    assert(bare.collect()(0).getLong(0) == classic.count())

    // count composes with a pushed row filter: count of SURVIVORS
    val filtered = spark.read.format("dwca").option("path", path).load()
      .filter(col("geodeticDatum") === "WGS84")
    val fCount = filtered.agg(
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
    val fd = countScanOf(fCount).description()
    assert(fd.contains("PushedAggregates: [COUNT(*)]") &&
      fd.contains("EqualTo(geodeticDatum,WGS84)"), fd)
    assert(fCount.collect()(0).getLong(0) ==
      classic.filter(col("geodeticDatum") === "WGS84").count())

    // a GROUPED count declines pushdown: the normal scan carries it
    // (AQE wraps this plan, so the scan is asserted via the plan string)
    val grouped = spark.read.format("dwca").option("path", path).load()
      .groupBy(col("geodeticDatum")).count()
    val gPlan = grouped.queryExecution.executedPlan.toString
    assert(!gPlan.contains("PushedAggregates") && gPlan.contains("DwcaScan"), gPlan)
    assert(grouped.count() == classic.groupBy(col("geodeticDatum")).count().count())
  }
}
