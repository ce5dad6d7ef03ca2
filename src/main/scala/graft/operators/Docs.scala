package graft.operators

import graft.{Oracle, Q, Tables}
import graft.Tables.StoreId
import graft.functions.Fns
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Typed Xero document model (FIXTURES.md §A7,
  * /root/reference/src/DataObject.ts:50-98,141-187). */
final case class LineItem(description: String, quantity: Int,
    unitAmount: Double, taxAmount: Double, accountCode: String,
    taxType: String)
final case class Contact(contactID: String)
final case class InvoiceDoc(docType: String, contact: Contact, date: String,
    dueDate: String, reference: String, status: String,
    lineAmountTypes: String, lineItems: Seq[LineItem])

/** Document assembly — the reference's core output: per-transaction
  * Invoice/CreditNote objects and the daily "DD" rollup invoice with its
  * fixed-header + dept + fixed-footer line-item array
  * (/root/reference/src/DataObject.ts). Typed `Dataset[InvoiceDoc]` at
  * the edge (compile-time shape, mirrors the reference's TS types);
  * everything upstream stays untyped-Catalyst.
  */
object Docs {

  private val Z = lit(0).cast(DecimalType(18, 4))

  private def li(description: Column, unitAmount: Column, taxAmount: Column,
      accountCode: Column, taxType: Column): Column =
    struct(description.as("description"), lit(1).as("quantity"),
      unitAmount.cast("double").as("unitAmount"),
      taxAmount.cast("double").as("taxAmount"),
      accountCode.as("accountCode"), taxType.as("taxType"))

  /** Per-transaction Invoice (amount > 0) / CreditNote (amount < 0)
    * documents from verified charges
    * (/root/reference/src/DataObject.ts:20-102): sign split, terms due
    * date, description template, GL switch, single inclusive line item.
    */
  def txnDocs(s: SparkSession, d: String): Dataset[InvoiceDoc] = {
    import s.implicits._
    val c = Tables.charge(s, d)
      .join(broadcast(Tables.terms(s, d)), Seq("customerId"), "left")
      .filter(col("date").isNotNull && col("amount").isNotNull) // flt_required
    val ref = Fns.refConcat(col("terminalId"), col("seqNo"))
    val desc = Fns.descTemplate(lit(null).cast("string"), ref,
      col("tranTimeStamp"), col("id"))
    c.select(
      when(col("amount") < 0, "ACCRECCREDIT").otherwise("ACCREC")
        .as("docType"),
      struct(col("xeroId").as("contactID")).as("contact"),
      Fns.dateIso(col("date")).as("date"),
      Fns.dateIso(Fns.dueDate(col("date"), col("termsType"),
        col("termsDays"))).as("dueDate"),
      ref.as("reference"),
      lit("SUBMITTED").as("status"),
      lit("Inclusive").as("lineAmountTypes"),
      array(li(desc, abs(col("amount")), lit(0.0), Fns.glCode(
        col("customerId"), StoreId), lit("EXEMPTOUTPUT"))).as("lineItems"))
      .as[InvoiceDoc]
  }

  /** Daily DD invoice (/root/reference/src/DataObject.ts:141-187):
    * [GST, FRE] ++ present-dept items (fixed probe order) ++
    * [Rounding, In-Store] — one nested document per date. */
  def ddInvoices(s: SparkSession, d: String): Dataset[InvoiceDoc] = {
    import s.implicits._
    val r = Rollup.frame(s, d)

    // dept line items in the fixed probe order, only present depts
    // (the reference's find→filter(undefined) drop)
    val deptItems = Tables.deptSales(s, d)
      .filter(col("deptCode").isin(Tables.PivotDepts: _*))
      .join(broadcast(Tables.department(s, d)), Seq("deptCode"))
      .withColumn("ord",
        array_position(
          array(Tables.PivotDepts.map(lit(_)): _*), col("deptCode")))
      .groupBy("date")
      .agg(transform(array_sort(collect_list(struct(col("ord"),
        li(concat(col("deptCode"), lit(" Department Sales")),
          col("sellEx"), lit(0.0), col("glCodeSales"),
          lit("EXEMPTOUTPUT")).as("item")))), x => x.getField("item"))
        .as("deptItems"))

    r.join(deptItems, Seq("date"), "left")
      .select(
        lit("ACCREC").as("docType"),
        struct(lit("dd-contact").as("contactID")).as("contact"),
        Fns.dateIso(col("date")).as("date"),
        Fns.dateIso(Fns.datePlus2(col("date"))).as("dueDate"),
        Fns.ddTitle(col("date"), col("customerCount"), col("totalSales"))
          .as("reference"),
        lit("SUBMITTED").as("status"),
        lit("Inclusive").as("lineAmountTypes"),
        concat(
          array(
            li(lit("Tape Sales Taxable (GST)"), col("gstSales"),
              col("totalGst"), lit("41010"), lit("OUTPUT")),
            li(lit("Tape Sales Non-Taxable (FRE)"), col("freSales"),
              lit(0.0), lit("41010"), lit("EXEMPTOUTPUT"))),
          coalesce(col("deptItems"),
            array().cast("array<struct<description:string,quantity:int," +
              "unitAmount:double,taxAmount:double,accountCode:string," +
              "taxType:string>>")),
          array(
            li(lit("Rounding from POS"), Fns.roundingNeg(col("totalRounding")),
              lit(0.0), lit("62650"), lit("BASEXCLUDED")),
            li(concat(lit("In-Store Use Expenses/COGS:\n"),
              coalesce(col("posId"), lit(""))),
              -coalesce(col("totalExp"), Z), lit(0.0), lit("51130"),
              lit("EXEMPTEXPENSES")))).as("lineItems"))
      .as[InvoiceDoc]
  }

  /** Oracle-checkable flat form of the DD invoice line items. */
  private def ddLinesSql: String = {
    val deptOrd = "1 + CAST(substr(d.deptCode, 7) AS INTEGER)"
    Oracle.withCtes(
      s"""SELECT * FROM (
         |  SELECT date, 0 AS ord, 'Tape Sales Taxable (GST)' AS description,
         |         CAST(gstSales AS DOUBLE) AS unitAmount,
         |         CAST(totalGst AS DOUBLE) AS taxAmount,
         |         '41010' AS accountCode, 'OUTPUT' AS taxType
         |  FROM r
         |  UNION ALL
         |  SELECT date, 1, 'Tape Sales Non-Taxable (FRE)',
         |         CAST(totalSales - lineSum - gstSales
         |              - (totalAccountSales - COALESCE(totalExp, Z))
         |              + COALESCE(totalOtherPayments, Z) AS DOUBLE),
         |         CAST(0 AS DOUBLE), '41010', 'EXEMPTOUTPUT'
         |  FROM r
         |  UNION ALL
         |  SELECT d.date, $deptOrd, concat(d.deptCode, ' Department Sales'),
         |         CAST(d.sellEx AS DOUBLE), CAST(0 AS DOUBLE),
         |         dd.glCodeSales, 'EXEMPTOUTPUT'
         |  FROM dept d JOIN deptdim dd ON d.deptCode = dd.deptCode
         |  WHERE d.deptCode IN (${Tables.PivotDepts.map(b => s"'$b'").mkString(", ")})
         |    AND d.date IN (SELECT date FROM till)
         |  UNION ALL
         |  SELECT date, 11, 'Rounding from POS',
         |         CAST(-COALESCE(totalRounding, Z) AS DOUBLE),
         |         CAST(0 AS DOUBLE), '62650', 'BASEXCLUDED'
         |  FROM r
         |  UNION ALL
         |  SELECT date, 12,
         |         concat('In-Store Use Expenses/COGS:', chr(10), COALESCE(posId, '')),
         |         CAST(-COALESCE(totalExp, Z) AS DOUBLE),
         |         CAST(0 AS DOUBLE), '51130', 'EXEMPTEXPENSES'
         |  FROM r
         |) t ORDER BY date, ord""".stripMargin,
      (Rollup.rollupCtes :+ Oracle.department): _*)
  }

  val queries: Seq[Q] = Seq(

    // Nested per-txn documents (rows-only: nested hash isn't stable
    // across engines; the flat twin is reshape_lineitems).
    Q.noOracle("doc_txn_nested") { (s, d) =>
      txnDocs(s, d).orderBy("reference", "date").toDF()
    },

    // Nested daily DD invoices (rows-only; flat twin below IS checked).
    Q.noOracle("doc_dd_nested") { (s, d) =>
      ddInvoices(s, d).orderBy("date").toDF()
    },

    // The DD invoice line items, exploded — full oracle over the
    // header/dept/footer assembly including posId and dept GL codes.
    Q("doc_dd_lines", ddLinesSql) { (s, d) =>
      ddInvoices(s, d).toDF()
        .select(col("date"), posexplode(col("lineItems")).as(Seq("pos", "l")))
        .select(to_date(col("date")).as("date"),
          when(col("pos") === 0, 0)
            .when(col("pos") === 1, 1)
            .when(col("l.description").endsWith(" Department Sales"),
              lit(1) + expr("CAST(substr(l.description, 7, 1) AS INT)"))
            .when(col("l.description") === "Rounding from POS", 11)
            .otherwise(12).as("ord"),
          col("l.description").as("description"),
          col("l.unitAmount").as("unitAmount"),
          col("l.taxAmount").as("taxAmount"),
          col("l.accountCode").as("accountCode"),
          col("l.taxType").as("taxType"))
        .orderBy("date", "ord")
    }
  )
}
