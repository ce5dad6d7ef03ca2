package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REST source pattern (SURVEY §2.1 `src_api_lookup`,
  * /root/reference/src/apiFunctions.ts:130-147): the connector builds the
  * server-side `where` filter string — filter pushdown for a REST API is
  * literally query-param construction — fetches a JSON body, and parses
  * it into rows with an explicit schema (`from_json` + `explode`, never
  * schema inference on untrusted payloads).
  *
  * Transport is pluggable: tests and the harness inject an in-memory
  * `Server`; production swaps in an HTTP client. Only the `fetch`
  * seam touches the network — everything downstream is a plain
  * DataFrame.
  *
  * Scale note: a REST lookup source is a driver-side fetch of a SMALL
  * filtered result (the reference asserts exactly-one match) that then
  * broadcasts into joins — never a per-row remote call from executors
  * (that is the N+1 anti-pattern the verify join already erased).
  */
object RestSource {

  /** params → JSON response body. */
  type Server = Map[String, String] => String

  /** The reference's invoice response shape (explicit, not inferred). */
  val InvoiceSchema: StructType = StructType(Seq(
    StructField("Invoices", ArrayType(StructType(Seq(
      StructField("InvoiceID", StringType),
      StructField("DateString", StringType),
      StructField("Reference", StringType),
      StructField("Status", StringType),
      StructField("Total", DoubleType)))))))

  /** Server-side filter string
    * (/root/reference/src/apiFunctions.ts:131). */
  def whereString(contactName: String, dateIso: String): String =
    s"""Contact.Name=="$contactName"&&DateString=="$dateIso""""

  /** Conjunctive date-RANGE filter — the same `&&` grammar the
    * reference's where-string uses, with bound comparisons instead of a
    * point equality: ONE request covers a whole drop-dir of dates. */
  def whereRange(contactName: String, fromIso: String, toIso: String): String =
    s"""Contact.Name=="$contactName"&&DateString>="$fromIso"&&DateString<="$toIso""""

  private def parseInvoices(spark: SparkSession, body: String): DataFrame = {
    import spark.implicits._
    Seq(body).toDF("body")
      .select(from_json(col("body"), InvoiceSchema).as("r"))
      .select(explode(col("r.Invoices")).as("inv"))
      .select(col("inv.InvoiceID").as("invoiceID"),
        col("inv.DateString").as("dateString"),
        col("inv.Reference").as("reference"),
        col("inv.Status").as("status"),
        col("inv.Total").as("total"))
  }

  /** Fetch invoices for one contact+date: pushed filter via params, JSON
    * body → typed rows. */
  def fetchInvoices(spark: SparkSession, server: Server,
      contactName: String, dateIso: String): DataFrame =
    parseInvoices(spark, server(Map(
      "where" -> whereString(contactName, dateIso),
      "statuses" -> "DRAFT,SUBMITTED,AUTHORISED")))

  /** Fetch invoices for a whole date range in ONE request (the batched
    * form of [[fetchInvoices]] — a caller with N distinct dates issues
    * one fetch, not N sequential ones). */
  def fetchInvoicesRange(spark: SparkSession, server: Server,
      contactName: String, fromIso: String, toIso: String): DataFrame =
    parseInvoices(spark, server(Map(
      "where" -> whereRange(contactName, fromIso, toIso),
      "statuses" -> "DRAFT,SUBMITTED,AUTHORISED")))

  /** The canned server's full catalog — what an unfiltered fetch
    * returns. A date-filtered request returns that one date's slice. */
  val CatalogDates: Seq[String] =
    Seq("2024-01-15", "2024-01-16", "2024-01-17")

  /** Canned in-memory server used by the capability query and tests:
    * deterministic payload keyed by the requested date (point `==` or
    * range `>=`/`<=` filters, both from the reference's `&&` grammar); a
    * request with no date filter returns the FULL catalog (pushdown is
    * an optimization, never a semantic change). */
  def cannedServer(params: Map[String, String]): String = {
    def bound(op: String): Option[String] = params.get("where")
      .flatMap(_.split(s"DateString$op\"").lift(1))
      .map(_.takeWhile(_ != '"')).filter(_.nonEmpty)
    val dates = bound("==") match {
      case Some(d) => Seq(d)
      case None =>
        val lo = bound(">=")
        val hi = bound("<=")
        if (lo.isEmpty && hi.isEmpty) CatalogDates
        else CatalogDates.filter(d =>
          lo.forall(d >= _) && hi.forall(d <= _))
    }
    val docs = (for { date <- dates; i <- 1 to 3 } yield
      s"""{"InvoiceID":"inv-$date-$i","DateString":"$date",
         |"Reference":"DD/$i","Status":"SUBMITTED","Total":${i * 100}.25}"""
        .stripMargin.replace("\n", "")).mkString(",")
    s"""{"Invoices":[$docs]}"""
  }
}
