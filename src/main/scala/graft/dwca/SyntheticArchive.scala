package graft.dwca

/** A ~100 MB deterministic synthetic DwC-Archive for the at-scale
  * ingestion probe (r14 verdict item 8): the DwCA tier's scale story —
  * COUNT(*) pushdown answering "how many rows is this zip?" without
  * materializing a single row — was previously proven on KB-size fixture
  * archives only, where the plan shape can't matter. This archive is
  * big enough that it does (1.2M rows ≈ 110 MB of core CSV), and its
  * size is SF-INDEPENDENT by construction: the registered count row
  * reproduces across gates like the fixture queries do.
  *
  * Built ONCE PER BOX into a shared tmp directory (content is pure
  * arithmetic of the row index — no RNG, no clock — so any two builds
  * are byte-identical) with an atomic directory rename, so concurrent
  * JVMs (Verify alongside Bench) race safely: the loser deletes its
  * scratch and uses the winner's tree. The layout keeps BOTH the zip
  * (what the engine's DSv2 reader mounts, paying real extraction) and
  * the uncompressed occurrence.txt (what the DuckDB oracle re-counts via
  * read_csv — a real cross-engine count, not a pinned constant).
  *
  * Same meta.xml dialect as the reference's dwca-simple fixture
  * (comma-delimited, \n lines, one header row; see
  * occurrence_archives/dwca-simple/meta.xml).
  */
object SyntheticArchive {

  /** Exact row count of the core file — the value the probe must return. */
  val Rows: Long = 1200000L

  /** Bump to invalidate cached trees when the generator's content
    * contract changes.
    */
  private val Version = "v1"

  private val names = Array("Puma concolor", "Quercus robur",
    "Apis mellifera", "Falco peregrinus", "Salmo trutta",
    "Betula pendula", "Canis lupus")
  private val basis = Array("PreservedSpecimen", "HumanObservation",
    "MachineObservation", "FossilSpecimen")

  /** Shared per-box cache directory (stable path: the oracle SQL embeds
    * [[coreFile]] at registration time).
    */
  def dir: java.io.File = new java.io.File(
    sys.props.getOrElse("java.io.tmpdir", "/tmp"),
    s"graft_synth_archive_$Version")

  def zipFile: java.io.File = new java.io.File(dir, "archive.zip")
  def coreFile: java.io.File = new java.io.File(dir, "occurrence.txt")

  private val metaXml =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<archive xmlns="http://rs.tdwg.org/dwc/text/">
      |  <core rowType="http://rs.tdwg.org/dwc/terms/Occurrence" encoding="utf-8" fieldsTerminatedBy="," linesTerminatedBy="\n" fieldsEnclosedBy="" ignoreHeaderLines="1">
      |    <files>
      |      <location>occurrence.txt</location>
      |    </files>
      |    <id index="0" />
      |    <field index="1" term="http://rs.tdwg.org/dwc/terms/occurrenceID"/>
      |    <field index="2" term="http://rs.tdwg.org/dwc/terms/scientificName"/>
      |    <field index="3" term="http://rs.tdwg.org/dwc/terms/decimalLatitude"/>
      |    <field index="4" term="http://rs.tdwg.org/dwc/terms/decimalLongitude"/>
      |    <field index="5" term="http://rs.tdwg.org/dwc/terms/eventDate"/>
      |    <field index="6" term="http://rs.tdwg.org/dwc/terms/recordedBy"/>
      |    <field index="7" term="http://rs.tdwg.org/dwc/terms/geodeticDatum"/>
      |    <field index="8" term="http://rs.tdwg.org/dwc/terms/basisOfRecord"/>
      |  </core>
      |</archive>
      |""".stripMargin

  /** Centi-unit fixed-point rendering (no locale, no float formatting):
    * 1234 → "12.34", -5 → "-0.05".
    */
  private def centi(v: Long): String = {
    val sign = if (v < 0) "-" else ""
    val a = math.abs(v)
    f"$sign${a / 100}%d.${a % 100}%02d"
  }

  private[dwca] def line(i: Long): String = {
    val lat = (i * 37) % 18001 - 9000
    val lon = (i * 73) % 36001 - 18000
    f"$i%d,occ:$i%d,${names((i % names.length).toInt)}%s,${centi(lat)}%s,${centi(lon)}%s,2020-${1 + i % 12}%02d-${1 + i % 28}%02d,collector_${i % 997}%d,WGS84,${basis((i % basis.length).toInt)}%s"
  }

  /** Ensures the archive exists and returns the zip. Thread-safe within
    * a JVM (synchronized) and across JVMs (atomic rename).
    */
  def ensure(): java.io.File = synchronized {
    if (zipFile.isFile && coreFile.isFile) return zipFile
    graft.ops.ArtifactBuilds.timed("dwca_synth_archive", dir.getName) {
      val parent = dir.getAbsoluteFile.getParentFile.toPath
      val tmp = java.nio.file.Files
        .createTempDirectory(parent, "graft_synth_archive_build").toFile
      val core = new java.io.File(tmp, "occurrence.txt")
      val w = new java.io.BufferedWriter(new java.io.FileWriter(core), 1 << 20)
      try {
        w.write("id,occurrenceID,scientificName,decimalLatitude," +
          "decimalLongitude,eventDate,recordedBy,geodeticDatum,basisOfRecord\n")
        var i = 1L
        while (i <= Rows) { w.write(line(i)); w.write("\n"); i += 1 }
      } finally w.close()
      val meta = new java.io.File(tmp, "meta.xml")
      java.nio.file.Files.writeString(meta.toPath, metaXml)
      val zos = new java.util.zip.ZipOutputStream(
        new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(new java.io.File(tmp, "archive.zip")), 1 << 20))
      try {
        zos.setLevel(1) // speed over ratio: this runs once per box
        Seq(meta, core).foreach { f =>
          zos.putNextEntry(new java.util.zip.ZipEntry(f.getName))
          java.nio.file.Files.copy(f.toPath, zos)
          zos.closeEntry()
        }
      } finally zos.close()
      try java.nio.file.Files.move(tmp.toPath, dir.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.FileSystemException =>
          // a tree already exists: either another JVM won the build race
          // (complete — use it) or a PARTIAL tree survived an external
          // delete (tmp cleaners age-purge individual files under /tmp),
          // which would otherwise wedge every future run on the require
          // below. Complete ⇒ drop our duplicate; partial ⇒ replace it
          // with the fresh scratch (losing THAT race to a concurrent
          // repairer is again success).
          if (zipFile.isFile && coreFile.isFile)
            org.apache.commons.io.FileUtils.deleteQuietly(tmp)
          else {
            org.apache.commons.io.FileUtils.deleteQuietly(dir)
            try java.nio.file.Files.move(tmp.toPath, dir.toPath,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            catch {
              case _: java.nio.file.FileSystemException =>
                org.apache.commons.io.FileUtils.deleteQuietly(tmp)
            }
          }
      }
      require(zipFile.isFile && coreFile.isFile,
        s"synthetic archive build left no tree at $dir")
      zipFile
    }
  }
}
