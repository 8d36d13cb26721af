package graft.sources

import java.time.LocalDate
import java.util.{List => JList, Map => JMap, Set => JSet}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThanOrEqual, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Executor-side transport for [[ApiDataSource]]: instantiated BY CLASS
  * NAME on each executor (the DSv2 analogue of a JDBC driver class), so
  * the connector needs no closures to serialize. Implementations must
  * have a no-arg constructor.
  */
trait ApiTransport extends Serializable {
  /** Fetch one date window: rows matching the table schema. */
  def fetch(url: String, dateFrom: String, dateTo: String, token: String): Seq[Row]
}

/** S5 at scale — DataSourceV2 TableProvider for the REST API source
  * (reference: `get_messages(api_url, date_from, date_to, api_token)`,
  * diagnostic_group_pipeline_with_api.py:102). `ApiSource.fetchPartitioned`
  * has the parallel-fetch core; this wraps it in the full connector
  * contract so the source composes with Catalyst like any table:
  *
  *  - `spark.read.format("graft-api")` with options url/token/dateFrom/
  *    dateTo/dateCol/schema (DDL) — registered via DataSourceRegister;
  *  - PARTITION PLANNING: one InputPartition per day window; fetch runs
  *    in the PartitionReader on executors, so ingest bandwidth scales
  *    with the cluster, not the driver;
  *  - FILTER PUSHDOWN: >=/<=/= predicates on the date column narrow the
  *    planned window list BEFORE any fetch happens (whole-day granularity
  *    keeps string-date pushdown exact); pushed filters stay in the
  *    residual set, so correctness never depends on the API's filtering;
  *  - COLUMN PRUNING: the reader converts only the required columns to
  *    InternalRow (the API payload is fetched whole — pruning saves
  *    conversion + downstream width, the scan contract Catalyst expects).
  */
class ApiDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-api"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val ddl = options.get("schema")
    require(ddl != null,
      "graft-api requires a 'schema' option (DDL string) or an explicit .schema(...)")
    StructType.fromDDL(ddl)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new ApiTable(schema, properties.asScala.toMap)
}

private[sources] class ApiTable(tableSchema: StructType, props: Map[String, String])
    extends Table with SupportsRead {

  override def name(): String = s"graft-api(${props.getOrElse("url", "?")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): JSet[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ApiScanBuilder(tableSchema, props ++ options.asScala)
}

private[sources] class ApiScanBuilder(fullSchema: StructType, rawOpts: Map[String, String])
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  // table properties keep original case, CaseInsensitiveStringMap folds —
  // normalize once so both sources of options resolve identically
  private val opts = rawOpts.map { case (k, v) => k.toLowerCase -> v }

  private val dateCol = opts.getOrElse("datecol", "msg_date")
  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var from: String = opts.getOrElse("datefrom",
    sys.error("graft-api requires a 'dateFrom' option"))
  private var to: String = opts.getOrElse("dateto",
    sys.error("graft-api requires a 'dateTo' option"))

  private def isIsoDate(v: Any): Boolean =
    v.isInstanceOf[String] && v.asInstanceOf[String].matches("\\d{4}-\\d{2}-\\d{2}")

  /** Narrow the fetch window from date-column predicates. Pushed filters
    * are ALSO returned from [[pushFilters]] (kept residual): the window
    * narrowing is a fetch-volume optimization, never a correctness
    * dependency.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (candidates, _) = filters.partition {
      case GreaterThanOrEqual(c, v) => c == dateCol && isIsoDate(v)
      case LessThanOrEqual(c, v) => c == dateCol && isIsoDate(v)
      case EqualTo(c, v) => c == dateCol && isIsoDate(v)
      case _ => false
    }
    candidates.foreach {
      case GreaterThanOrEqual(_, v) =>
        if (v.asInstanceOf[String] > from) from = v.asInstanceOf[String]
      case LessThanOrEqual(_, v) =>
        if (v.asInstanceOf[String] < to) to = v.asInstanceOf[String]
      case EqualTo(_, v) =>
        val d = v.asInstanceOf[String]
        if (d > from) from = d
        if (d < to) to = d
      case _ => ()
    }
    pushed = candidates
    filters // everything stays residual — Spark re-applies post scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new ApiScan(fullSchema, required, opts, from, to)
}

private[sources] case class ApiWindow(dateFrom: String, dateTo: String)
    extends InputPartition

private[sources] class ApiScan(fullSchema: StructType, required: StructType,
                               opts: Map[String, String],
                               from: String, to: String) extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"graft-api [$from..$to] cols=${required.fieldNames.mkString(",")}"

  override def toBatch: Batch = this

  /** One partition per day — the unit the reference API accepts — so a
    * month of ingest fans out to ~30 executor-side fetches.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val start = LocalDate.parse(from)
    val end = LocalDate.parse(to)
    if (end.isBefore(start)) return Array.empty
    Iterator.iterate(start)(_.plusDays(1)).takeWhile(!_.isAfter(end))
      .map(d => ApiWindow(d.toString, d.toString): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ApiReaderFactory(fullSchema, required,
      opts.getOrElse("url", sys.error("graft-api requires a 'url' option")),
      opts.getOrElse("token", ""),
      opts.getOrElse("transport",
        sys.error("graft-api requires a 'transport' option (ApiTransport class name)")))
}

private[sources] class ApiReaderFactory(fullSchema: StructType,
                                        required: StructType, url: String,
                                        token: String, transportClass: String)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val w = partition.asInstanceOf[ApiWindow]
    new PartitionReader[InternalRow] {
      private lazy val rows: Iterator[InternalRow] = {
        val transport = Class.forName(transportClass)
          .getDeclaredConstructor().newInstance().asInstanceOf[ApiTransport]
        val fetched = transport.fetch(url, w.dateFrom, w.dateTo, token)
        val idx = required.fieldNames.map(fullSchema.fieldIndex)
        val conv = CatalystTypeConverters.createToCatalystConverter(required)
        fetched.iterator.map { r =>
          conv(Row.fromSeq(idx.toIndexedSeq.map(r.get))).asInstanceOf[InternalRow]
        }
      }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
