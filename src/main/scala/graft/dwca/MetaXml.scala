package graft.dwca

import java.io.File
import scala.xml.{Node, XML}

/** A positional column→term binding (reference: meta.xml `<field index=…
  * term=…/>`; see dwc_validator/test/occurrence_archives/dwca-simple/meta.xml:7-15).
  */
final case class FieldBinding(index: Option[Int], term: String, default: Option[String]) {
  /** DwC term local name, e.g. ".../terms/occurrenceID" → "occurrenceID". */
  def localName: String = term.substring(term.lastIndexOf('/') + 1)
}

/** CSV dialect options declared per file in meta.xml (reference:
  * validate_dwca.py delegates to python-dwca-reader which honours the same
  * attributes; fixtures exercise `\n` and `\r\n` line endings).
  */
final case class CsvDialect(
    fieldsTerminatedBy: String,
    linesTerminatedBy: String,
    fieldsEnclosedBy: String,
    encoding: String,
    ignoreHeaderLines: Int)

/** One data file of the archive: the core or one extension. */
final case class TableDescriptor(
    rowType: String,
    location: String,
    idIndex: Option[Int], // `<id index=…/>` for core, `<coreid index=…/>` for extensions
    isCore: Boolean,
    fields: Seq[FieldBinding],
    dialect: CsvDialect) {

  /** Row-type local name, e.g. "Occurrence". */
  def rowTypeLocalName: String = rowType.substring(rowType.lastIndexOf('/') + 1)

  /** Positional column names for the data file: the id/coreid column gets the
    * literal name "id"/"coreid" (reference convention, SURVEY.md T4); every
    * other position gets the term local name; unmapped positions get _cN.
    */
  def columnNames: Seq[String] = {
    val maxIdx = (idIndex.toSeq ++ fields.flatMap(_.index)).foldLeft(-1)(math.max)
    val names = Array.tabulate(maxIdx + 1)(i => s"_c$i")
    idIndex.foreach(i => names(i) = if (isCore) "id" else "coreid")
    fields.foreach(f => f.index.foreach { i =>
      if (!idIndex.contains(i)) names(i) = f.localName // id wins its position
    })
    names.toSeq
  }

  /** Fields declared with a default value but no column position. */
  def defaultOnlyFields: Seq[FieldBinding] = fields.filter(f => f.index.isEmpty)
}

final case class ArchiveDescriptor(core: TableDescriptor, extensions: Seq[TableDescriptor])

/** Parser for a DwC-Archive `meta.xml` descriptor (Darwin Core text
  * guidelines). Uses scala-xml (on Spark's classpath).
  */
object MetaXml {

  val OccurrenceRowType = "http://rs.tdwg.org/dwc/terms/Occurrence"
  val EventRowType = "http://rs.tdwg.org/dwc/terms/Event"

  def parse(metaXml: File): ArchiveDescriptor = parseNode(XML.loadFile(metaXml))

  def parseString(xml: String): ArchiveDescriptor = parseNode(XML.loadString(xml))

  private def parseNode(root: Node): ArchiveDescriptor = {
    val core = (root \ "core").headOption
      .map(parseTable(_, isCore = true))
      .getOrElse(throw new IllegalArgumentException("meta.xml has no <core> element"))
    val exts = (root \ "extension").map(parseTable(_, isCore = false))
    ArchiveDescriptor(core, exts.toSeq)
  }

  /** meta.xml escapes separators literally ("\n", "\t", …). */
  private[dwca] def unescape(s: String): String =
    s.replace("\\n", "\n").replace("\\r", "\r").replace("\\t", "\t")

  private def attr(n: Node, name: String, default: String): String =
    n.attribute(name).map(_.text).getOrElse(default)

  private def parseTable(n: Node, isCore: Boolean): TableDescriptor = {
    val dialect = CsvDialect(
      fieldsTerminatedBy = unescape(attr(n, "fieldsTerminatedBy", ",")),
      linesTerminatedBy = unescape(attr(n, "linesTerminatedBy", "\n")),
      fieldsEnclosedBy = unescape(attr(n, "fieldsEnclosedBy", "")),
      encoding = attr(n, "encoding", "UTF-8"),
      ignoreHeaderLines = attr(n, "ignoreHeaderLines", "0").trim.toInt)
    val idTag = if (isCore) "id" else "coreid"
    val idIndex = (n \ idTag).headOption.flatMap(_.attribute("index")).map(_.text.trim.toInt)
    val fields = (n \ "field").map { f =>
      FieldBinding(
        index = f.attribute("index").map(_.text.trim.toInt),
        term = f.attribute("term").map(_.text).getOrElse(""),
        default = f.attribute("default").map(_.text))
    }
    val location = (n \ "files" \ "location").headOption.map(_.text.trim)
      .getOrElse(throw new IllegalArgumentException("table has no <files><location>"))
    TableDescriptor(
      rowType = attr(n, "rowType", ""),
      location = location,
      idIndex = idIndex,
      isCore = isCore,
      fields = fields.toSeq,
      dialect = dialect)
  }
}
