package graft.sources

import java.io.File
import java.util

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In, IsNotNull, IsNull, StringStartsWith}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.dwca.{DwcaArchive, MetaXml, TableDescriptor}

/** DataSourceV2 `TableProvider` for Darwin Core Archives — the production
  * ingestion shape of the reference's whole-library entry point
  * (validate_dwca.py:27-28): an archive mounts as a catalog table,
  *
  * {{{
  *   spark.read.format("dwca").option("path", dir).load()                  // core
  *   spark.read.format("dwca").option("path", dir)
  *     .option("table", "Occurrence").load()                               // extension
  * }}}
  *
  * with COLUMN PRUNING pushed into the scan: `SupportsPushDownRequiredColumns`
  * narrows the read schema, and the partition reader hands the pruned index
  * set to univocity's `selectIndexes` — unreferenced columns are never
  * materialized from the parsed line, the same discipline as a parquet
  * scan's ReadSchema. FILTER PUSHDOWN (`SupportsPushDownFilters`) accepts
  * the flat string predicates a CSV row loop can fully decide — EqualTo /
  * In / IsNull / IsNotNull / StringStartsWith — and drops non-matching
  * rows inside the reader (a filter column pruned from the output is still
  * parsed for the decision); everything else returns as a residual for the
  * post-scan Filter. Semantics (dialect options, positional term naming,
  * pandas NA-token normalization, default-only constant fields) are
  * identical to [[graft.dwca.DwcaArchive.read]], which ArchiveParitySpec
  * pins against the reference fixtures; q_s1/q_s2 run THROUGH this
  * provider so the DSv2 path is oracle-hashed end to end.
  *
  * Scale notes: meta.xml parses once on the driver (it IS the catalog
  * metadata); each data file is one input partition — DwCA cores are
  * single delimited files, and correctness under custom dialects
  * (multi-char separators, quote handling) forbids naive mid-file byte
  * splits. Zip archives extract on the driver through the same
  * size-capped [[DwcaArchive.extractZip]] as the classic reader (memoized
  * per path — inferSchema and getTable share one extraction); at 100 TB
  * the archive lives pre-extracted on distributed storage and every
  * partition reads its file from there.
  */
class DwcaDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "dwca"

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DwcaDataSource.schemaFor(DwcaDataSource.resolve(options)._1)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val (td, dir) = DwcaDataSource.resolve(new CaseInsensitiveStringMap(properties))
    new DwcaTable(td, new File(dir, td.location).getAbsolutePath, schema)
  }
}

object DwcaDataSource {

  /** One driver-side extraction per zip path, shared by the
    * inferSchema/getTable double-call (and any re-read of the same
    * archive in the session's lifetime).
    */
  private val extractedZips = TrieMap.empty[String, File]

  private[sources] def resolve(options: CaseInsensitiveStringMap): (TableDescriptor, File) = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("dwca source requires option 'path'"))
    val f = new File(path)
    val dir =
      if (f.isDirectory) f
      else if (f.isFile) extractedZips.getOrElseUpdate(f.getAbsolutePath, DwcaArchive.extractZip(f))
      else throw new IllegalArgumentException(s"archive not found: $path")
    val meta = new File(dir, "meta.xml")
    if (!meta.isFile)
      throw new IllegalArgumentException(s"no meta.xml in archive: $path")
    val desc = MetaXml.parse(meta)
    val which = Option(options.get("table")).getOrElse("core")
    val td =
      if (which.equalsIgnoreCase("core")) desc.core
      else desc.extensions
        .find(e => e.rowTypeLocalName.equalsIgnoreCase(which) || e.rowType == which)
        .getOrElse(throw new IllegalArgumentException(
          s"archive has no extension '$which'; available: " +
            desc.extensions.map(_.rowTypeLocalName).mkString(", ")))
    (td, dir)
  }

  /** All-string schema: positional term names plus default-only constant
    * fields — the lenient-typing model of the classic reader (typed
    * interpretation stays per-check via try_cast).
    */
  private[sources] def schemaFor(td: TableDescriptor): StructType = {
    val positional = td.columnNames
    val defaults = td.defaultOnlyFields.map(_.localName).filterNot(positional.contains)
    StructType((positional ++ defaults).map(StructField(_, StringType, nullable = true)))
  }
}

final class DwcaTable(td: TableDescriptor, dataFile: String, tableSchema: StructType)
    extends Table with SupportsRead {

  override def name(): String = s"dwca.${td.rowTypeLocalName}"

  override def schema(): StructType = tableSchema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DwcaScanBuilder(td, dataFile, tableSchema)
}

final class DwcaScanBuilder(td: TableDescriptor, dataFile: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  private var countStar = false

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** COUNT(*) pushdown — the archive-cardinality probe every ingest runs
    * first ("how many occurrence rows is this 40 GB zip?"): an ungrouped
    * bare count answers INSIDE the reader — the CSV scan advances records
    * (and decides any pushed row filters) without materializing a single
    * column value, and ships back ONE long. Complete pushdown is sound
    * here because the archive scan is a single input partition (dialect
    * correctness forbids mid-file splits), so the partition-local count
    * IS the final answer. Anything grouped, or any other aggregate,
    * declines — Spark keeps its own aggregation over the normal scan.
    */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0)
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    countStar = supportCompletePushDown(agg)
    countStar
  }

  /** Accept the flat string predicates a row-skipping CSV scan can fully
    * decide (EqualTo / In / IsNull / IsNotNull / StringStartsWith over a
    * declared field); everything else stays a post-scan residual. Accepted
    * filters are evaluated against the PARSED value (post NA-token
    * normalization), so `IsNull` matches pandas-NA tokens exactly as the
    * classic reader's frame would — the parity the spec pins.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val known = full.fieldNames.toSet
    def acceptable(f: Filter): Boolean = f match {
      case EqualTo(a, v) => known(a) && (v == null || v.isInstanceOf[String])
      case In(a, vs) => known(a) && vs.forall(v => v == null || v.isInstanceOf[String])
      case IsNull(a) => known(a)
      case IsNotNull(a) => known(a)
      case StringStartsWith(a, _) => known(a)
      case _ => false
    }
    val (acc, residual) = filters.partition(acceptable)
    pushed = acc
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    if (countStar) new DwcaCountScan(td, dataFile, pushed)
    else new DwcaScan(td, dataFile, required, pushed)
}

/** Scan for a completely-pushed ungrouped COUNT(*): one partition, one
  * emitted row of one BIGINT. Pushed row filters still apply — the count
  * is of SURVIVING records, decided by the same in-reader predicate path
  * as a normal scan.
  */
final class DwcaCountScan(td: TableDescriptor, dataFile: String, pushed: Array[Filter])
    extends Scan with Batch {

  override def readSchema(): StructType =
    new StructType().add("count_star", org.apache.spark.sql.types.LongType, false)

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    Array(DwcaFilePartition(dataFile))

  override def createReaderFactory(): PartitionReaderFactory =
    new DwcaCountReaderFactory(td, pushed)

  override def description(): String =
    s"DwcaCountScan ${td.rowTypeLocalName} PushedAggregates: [COUNT(*)] " +
      s"PushedFilters: [${pushed.mkString(", ")}]"
}

final class DwcaCountReaderFactory(td: TableDescriptor, pushed: Array[Filter])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new DwcaCountReader(partition.asInstanceOf[DwcaFilePartition].path, td, pushed)
}

/** Drives the ordinary partition reader with an EMPTY projection (filter
  * columns still parse for the row decision — see [[DwcaPartitionReader]])
  * and reduces it to the single count row.
  */
final class DwcaCountReader(path: String, td: TableDescriptor, pushed: Array[Filter])
    extends PartitionReader[InternalRow] {

  private val inner = new DwcaPartitionReader(path, td, new StructType(), pushed)
  private var emitted = false
  private var count = 0L

  override def next(): Boolean =
    if (emitted) false
    else {
      while (inner.next()) count += 1
      emitted = true
      true
    }

  override def get(): InternalRow = new GenericInternalRow(Array[Any](count))

  override def close(): Unit = inner.close()
}

final class DwcaScan(td: TableDescriptor, dataFile: String, required: StructType,
    pushed: Array[Filter])
    extends Scan with Batch {

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    Array(DwcaFilePartition(dataFile))

  override def createReaderFactory(): PartitionReaderFactory =
    new DwcaReaderFactory(td, required, pushed)

  override def description(): String =
    s"DwcaScan ${td.rowTypeLocalName} cols=[${required.fieldNames.mkString(",")}] " +
      s"PushedFilters: [${pushed.mkString(", ")}]"
}

final case class DwcaFilePartition(path: String) extends InputPartition

final class DwcaReaderFactory(td: TableDescriptor, required: StructType,
    pushed: Array[Filter])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new DwcaPartitionReader(partition.asInstanceOf[DwcaFilePartition].path, td, required,
      pushed)
}

/** Per-partition univocity CSV parse honoring the meta.xml dialect, with
  * the pruned column index set pushed into the parser (`selectIndexes`) so
  * unused columns never materialize. The unsupported dialect combinations
  * fail LOUDLY with the same policy as the classic reader (silently
  * mis-splitting rows would corrupt every downstream count).
  */
final class DwcaPartitionReader(path: String, td: TableDescriptor, required: StructType,
    pushed: Array[Filter])
    extends PartitionReader[InternalRow] {

  import com.univocity.parsers.csv.{CsvParser, CsvParserSettings}

  private val d = td.dialect
  private val positional = td.columnNames
  private val defaults: Map[String, String] =
    td.defaultOnlyFields.flatMap(f => f.default.map(f.localName -> _)).toMap

  // the parse must materialize required positionals PLUS any positional a
  // pushed filter references (a filter column pruned from the output still
  // has to be read to decide the row) — required first, filter extras after
  private val filterCols: Array[String] = pushed.flatMap {
    case EqualTo(a, _) => Some(a)
    case In(a, _) => Some(a)
    case IsNull(a) => Some(a)
    case IsNotNull(a) => Some(a)
    case StringStartsWith(a, _) => Some(a)
    case _ => None
  }.distinct

  private val parsedNames: Array[String] = {
    val reqPos = required.fieldNames.filter(positional.contains)
    reqPos ++ filterCols.filter(c => positional.contains(c) && !reqPos.contains(c))
  }
  private val selectedIndexes: Array[Int] = parsedNames.map(positional.indexOf)
  // name → position in the SELECTED parse array (univocity emits selected
  // fields in selection order)
  private val selPos: Map[String, Int] = parsedNames.zipWithIndex.toMap

  // required field → producer: Left(position in the SELECTED parse array)
  // or Right(constant: a default-only field's value, or null)
  private val producers: Array[Either[Int, UTF8String]] =
    required.fields.map { f =>
      selPos.get(f.name) match {
        case Some(sel) => Left(sel)
        case None => Right(defaults.get(f.name).map(UTF8String.fromString).orNull)
      }
    }

  private val parser: CsvParser = {
    val settings = new CsvParserSettings
    settings.getFormat.setDelimiter(d.fieldsTerminatedBy)
    // empty fieldsEnclosedBy disables quote handling (the DwCA default,
    // same convention as Spark's CSV option): \u0000 never appears in
    // text data, so no quoting ever triggers
    settings.getFormat.setQuote(
      if (d.fieldsEnclosedBy.isEmpty) '\u0000' else d.fieldsEnclosedBy.charAt(0))
    d.linesTerminatedBy match {
      case "" | "\n" | "\r\n" | "\r" => settings.setLineSeparatorDetectionEnabled(true)
      case sep if sep.length == 1 => settings.getFormat.setLineSeparator(sep)
      case sep => throw new IllegalArgumentException(
        s"unsupported linesTerminatedBy ${sep.map(c => f"\\u${c.toInt}%04x").mkString}: " +
          "single character or \\n/\\r\\n/\\r only")
    }
    settings.setNumberOfRowsToSkip(d.ignoreHeaderLines.toLong)
    // match Spark CSV READ defaults (the classic reader's parse): no
    // whitespace trimming on unquoted fields
    settings.setIgnoreLeadingWhitespaces(false)
    settings.setIgnoreTrailingWhitespaces(false)
    // pruning reaches the parse: only the required positional columns are
    // materialized (count(*)-style scans select nothing and just count
    // records)
    if (selectedIndexes.nonEmpty)
      settings.selectIndexes(selectedIndexes.map(Integer.valueOf).toSeq: _*)
    settings.setMaxCharsPerColumn(1 << 24)
    new CsvParser(settings)
  }

  private val reader: java.io.Reader = {
    val in = new java.io.InputStreamReader(
      new java.io.FileInputStream(path), java.nio.charset.Charset.forName(d.encoding))
    parser.beginParsing(in)
    in
  }

  private var row: Array[String] = _

  /** Parsed value of a filter-referenced field for the CURRENT row, after
    * the same NA-token normalization the output path applies — so pushed
    * `IsNull` decides exactly like a post-scan filter over the classic
    * frame would.
    */
  private def rawValue(name: String): String = selPos.get(name) match {
    case Some(sel) =>
      val v = if (sel < row.length) row(sel) else null
      if (v == null || DwcaPartitionReader.NaTokens.contains(v)) null else v
    case None => defaults.get(name).orNull
  }

  /** Spark `sources.Filter` semantics over string values: comparisons with
    * null never match (three-valued logic collapses to false for a WHERE).
    */
  private def matches(): Boolean = pushed.forall {
    case EqualTo(a, v) =>
      val x = rawValue(a); x != null && v != null && x == v.asInstanceOf[String]
    case In(a, vs) =>
      val x = rawValue(a); x != null && vs.exists(v => v != null && v.asInstanceOf[String] == x)
    case IsNull(a) => rawValue(a) == null
    case IsNotNull(a) => rawValue(a) != null
    case StringStartsWith(a, p) =>
      val x = rawValue(a); x != null && x.startsWith(p)
    case _ => true // unreachable: pushFilters only accepts the cases above
  }

  override def next(): Boolean = {
    row = parser.parseNext()
    while (row != null && !matches()) row = parser.parseNext()
    row != null
  }

  override def get(): InternalRow = {
    val values = new Array[Any](producers.length)
    var i = 0
    while (i < producers.length) {
      values(i) = producers(i) match {
        case Left(sel) =>
          val v = if (sel < row.length) row(sel) else null
          // pandas NA-token normalization — identical to the classic
          // reader (empty fields already arrive as null from univocity)
          if (v == null || DwcaPartitionReader.NaTokens.contains(v)) null
          else UTF8String.fromString(v)
        case Right(const) => const
      }
      i += 1
    }
    new GenericInternalRow(values)
  }

  override def close(): Unit = {
    if (parser != null) parser.stopParsing()
    reader.close()
  }
}

object DwcaPartitionReader {
  private val NaTokens: Set[String] = DwcaArchive.PandasNaTokens.toSet
}
