package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 REST source with genuine filter pushdown (SURVEY §4's
  * "REST DataSourceV2 with SupportsPushDownFilters"): equality filters on
  * `dateString` / `status` are converted into the connector's
  * query-param `where` string (/root/reference/src/apiFunctions.ts:131)
  * and the remaining filters are returned to Spark for post-evaluation —
  * exactly the contract a remote API source needs so the cluster never
  * fetches unfiltered data.
  *
  * Usage:
  * {{{
  * spark.read.format(classOf[RestTableProvider].getName)
  *   .option("contactName", "Day Dockets")
  *   .load()
  *   .filter($"dateString" === "2024-01-15")   // pushed to the "server"
  * }}}
  *
  * The transport is the same pluggable seam as `RestSource` (the canned
  * deterministic server here; an HTTP client in production). The last
  * requested params are recorded so tests can assert pushdown actually
  * reached the server.
  */
class RestTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestTableProvider.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RestTable(properties.getOrDefault("contactName", "Day Dockets"))
}

object RestTableProvider {
  val Schema: StructType = StructType(Seq(
    StructField("invoiceID", StringType),
    StructField("dateString", StringType),
    StructField("reference", StringType),
    StructField("status", StringType),
    StructField("total", DoubleType)))

  /** Last params the "server" saw — test observability for pushdown. */
  @volatile var lastRequestedParams: Map[String, String] = Map.empty
}

private class RestTable(contactName: String) extends Table with SupportsRead {
  override def name(): String = s"rest_invoices($contactName)"
  override def schema(): StructType = RestTableProvider.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RestScanBuilder(contactName)
}

private class RestScanBuilder(contactName: String)
  extends ScanBuilder with SupportsPushDownFilters {

  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // accept equality ONLY on dateString — the one predicate the
    // transport honors (its `where` string). Status filters stay with
    // Spark for post-evaluation: the canned transport ignores the
    // `statuses` param, and claiming a filter the server does not apply
    // would silently return wrong rows.
    val (accepted, rejected) = filters.partition {
      case EqualTo("dateString", _: String) => true
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new RestScan(contactName, pushed)
}

private class RestScan(contactName: String, pushed: Array[Filter])
  extends Scan with Batch {
  override def readSchema(): StructType = RestTableProvider.Schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(RestInputPartition(contactName,
      pushed.collect { case EqualTo(a, v: String) => a -> v }.toMap))
  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory
}

private case class RestInputPartition(contactName: String,
    pushedEq: Map[String, String]) extends InputPartition

private class RestReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rp = p.asInstanceOf[RestInputPartition]
    // the where-string IS the pushdown: with a pushed date only that
    // slice is fetched; with NO pushed filter the scan fetches the full
    // dataset (an unfiltered load() must return the whole table, not a
    // defaulted slice)
    val statuses = Map("statuses" -> "DRAFT,SUBMITTED,AUTHORISED")
    val params = rp.pushedEq.get("dateString") match {
      case Some(date) =>
        statuses + ("where" -> RestSource.whereString(rp.contactName, date))
      case None => statuses
    }
    RestTableProvider.lastRequestedParams = params
    val body = RestSource.cannedServer(params)
    // parse the JSON body without a SparkSession (executor-side reader)
    val rows = parse(body).iterator
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }

  /** Tiny parser for the canned server's fixed-shape payload (a real
    * connector uses a JSON library; the contract is the InternalRow). */
  private def parse(body: String): Seq[InternalRow] = {
    val item = """\{"InvoiceID":"([^"]*)","DateString":"([^"]*)","Reference":"([^"]*)","Status":"([^"]*)","Total":([0-9.]+)\}""".r
    item.findAllMatchIn(body).map { m =>
      InternalRow(
        UTF8String.fromString(m.group(1)), UTF8String.fromString(m.group(2)),
        UTF8String.fromString(m.group(3)), UTF8String.fromString(m.group(4)),
        m.group(5).toDouble)
    }.toSeq
  }
}
