package graft.dwca

import java.io.File
import java.nio.file.{Files, Path}
import java.util.zip.ZipFile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

import scala.jdk.CollectionConverters._

/** Reads a Darwin Core Archive (directory or .zip of delimited text files +
  * `meta.xml`) into Spark DataFrames — the Spark-native equivalent of the
  * reference's `DwCAReader`/`pd_read` usage (dwc_validator/validate_dwca.py:27-28,
  * :81-82).
  *
  * Design notes for scale: the archive text files are read by Spark's
  * distributed CSV source (splittable for uncompressed files), *not*
  * materialized on the driver. All columns are read as strings
  * (`inferSchema=false`), matching the reference's `parse_dates=False`
  * lenient-typing model; typed interpretation happens per-check via
  * `try_cast` (SURVEY.md §1.2). Zip archives are extracted to a temp dir on
  * the driver first — Spark cannot read inside zips; for 100 TB-scale
  * archives the expectation is extracted files on distributed storage.
  */
final class DwcaArchive private (
    val spark: SparkSession,
    val descriptor: ArchiveDescriptor,
    rootDir: File) {

  def coreDataFrame: DataFrame = read(descriptor.core)

  def extensionDataFrames: Seq[(TableDescriptor, DataFrame)] =
    descriptor.extensions.map(e => e -> read(e))

  /** Core ⋈ extension left join on the DwCA star-schema link: core `id` =
    * extension `coreid` (reference meta.xml declares the key —
    * test/event_archives/dwca-simple/meta.xml:17,25 — but the reference
    * never joins; SURVEY.md §2.5 names this the natural extension).
    * Extension columns are prefixed `<extRowTypeLocalName>_` to avoid
    * collisions with core column names. At scale this is a plain shuffled
    * equi-join on the id key (or broadcast when the extension is small) —
    * exactly what Catalyst picks for `core.join(ext, "left")`.
    */
  def joined(ext: TableDescriptor): DataFrame = {
    val core = coreDataFrame
    val extDf = read(ext)
    val prefix = ext.rowTypeLocalName.toLowerCase
    val renamed = extDf.columns.foldLeft(extDf) { (df, c) =>
      if (c == "coreid") df else df.withColumnRenamed(c, s"${prefix}_$c")
    }
    core.join(renamed, core("id") === renamed("coreid"), "left")
  }

  /** Read one table of the archive per its declared dialect, naming columns
    * positionally after the DwC term local names (id/coreid per SURVEY.md T4).
    */
  def read(table: TableDescriptor): DataFrame = {
    val d = table.dialect
    val reader = spark.read
      .option("sep", d.fieldsTerminatedBy)
      .option("encoding", d.encoding)
      // pandas reads empty CSV fields as NaN; pin Spark's equivalent (null).
      .option("nullValue", "")
      // Empty quote string disables quote handling (the DwCA default,
      // fieldsEnclosedBy="").
      .option("quote", d.fieldsEnclosedBy)
      .option("header", d.ignoreHeaderLines > 0)
      .option("mode", "PERMISSIVE")
      .option("inferSchema", "false")
    // NB: lineSep deliberately NOT set — unset, Spark's CSV parser handles
    // \n, \r\n and \r uniformly, covering both fixture dialects
    // (dwca-simple "\n", dwca-bad-coordinates "\r\n").
    val raw = reader.csv(new File(rootDir, table.location).getAbsolutePath)
    val names = table.columnNames
    // Tolerate files with fewer/more physical columns than declared.
    val renamed = raw.toDF(raw.columns.indices.map { i =>
      if (i < names.length) names(i) else s"_c$i"
    }: _*)
    // meta.xml <field term=… default=…/> with no index → constant column.
    table.defaultOnlyFields.foldLeft(renamed) { (df, f) =>
      if (df.columns.contains(f.localName)) df
      else df.withColumn(f.localName, lit(f.default.orNull))
    }
  }
}

object DwcaArchive {

  /** Open an archive at `path` (directory, or .zip extracted to a temp dir). */
  def open(spark: SparkSession, path: String): DwcaArchive = {
    val f = new File(path)
    val dir =
      if (f.isDirectory) f
      else if (f.isFile) extractZip(f)
      else throw new IllegalArgumentException(s"archive not found: $path")
    val meta = new File(dir, "meta.xml")
    if (!meta.isFile)
      throw new IllegalArgumentException(s"no meta.xml in archive: $path")
    new DwcaArchive(spark, MetaXml.parse(meta), dir)
  }

  /** Ceiling on driver-side extraction (bytes). Zip archives are unpacked
    * on the driver — the one deliberately non-distributed step (matches
    * the reference, which also reads the archive in-process). The cap
    * turns a would-be disk-filling extraction into a clear error; for an
    * archive beyond it, pre-extract to a directory (or distributed store)
    * and pass the directory path — every read after `open` is a normal
    * distributed Spark scan either way.
    */
  val MaxExtractBytes: Long = 8L << 30

  private[graft] def extractZip(zip: File, maxBytes: Long = MaxExtractBytes): File = {
    val tmp = Files.createTempDirectory("dwca-").toFile
    tmp.deleteOnExit()
    val zf = new ZipFile(zip)
    var extracted = 0L
    var ok = false
    try {
      zf.entries().asScala.foreach { e =>
        val target: Path = tmp.toPath.resolve(e.getName).normalize()
        if (!target.startsWith(tmp.toPath))
          throw new IllegalArgumentException(s"zip entry escapes archive dir: ${e.getName}")
        if (e.isDirectory) Files.createDirectories(target)
        else {
          Files.createDirectories(target.getParent)
          // Enforce the cap DURING the copy, not after: a single deflate-
          // bombed entry must die at the limit, never after it has already
          // filled the driver's disk.
          val in = zf.getInputStream(e)
          val out = Files.newOutputStream(target)
          try {
            val buf = new Array[Byte](64 * 1024)
            var n = in.read(buf)
            while (n >= 0) {
              extracted += n
              if (extracted > maxBytes)
                throw new IllegalArgumentException(
                  s"archive expands past $maxBytes bytes on the driver " +
                    s"(entry ${e.getName}); pre-extract it to a directory and " +
                    "pass the directory path")
              out.write(buf, 0, n)
              n = in.read(buf)
            }
          } finally { in.close(); out.close() }
        }
      }
      ok = true
    } finally {
      zf.close()
      // deleteOnExit is a no-op on a non-empty dir: a failed extraction
      // (cap breach, bad entry) must not leave partial gigabytes behind
      if (!ok) {
        Files.walk(tmp.toPath)
          .sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
      }
    }
    tmp
  }
}
