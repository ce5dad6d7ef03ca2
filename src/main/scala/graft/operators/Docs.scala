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

  /** Canonical JSON for one line-item struct — pinned field order,
    * `%.4f` amounts, `Fns.jsonEsc` string escaping. Raw Jackson double
    * rendering (`to_json`) is not engine-stable; `%.4f` of these
    * decimal-derived doubles is (both engines correctly round the same
    * IEEE value, and exact decimal ties cannot occur for values that
    * came from scale-4 decimals). */
  private def liJson(x: Column): Column =
    concat(lit("{\"description\":\""), Fns.jsonEsc(x.getField("description")),
      lit("\",\"quantity\":"), x.getField("quantity").cast("string"),
      lit(",\"unitAmount\":"), Fns.fmt4(x.getField("unitAmount")),
      lit(",\"taxAmount\":"), Fns.fmt4(x.getField("taxAmount")),
      lit(",\"accountCode\":\""), x.getField("accountCode"),
      lit("\",\"taxType\":\""), x.getField("taxType"), lit("\"}"))

  /** Driver-checkable serialization of a doc Dataset: scalar header
    * columns + the lineItems array as ONE canonical JSON string (the
    * harness comparator can hash strings but not array<struct>). */
  def docJson(docs: Dataset[InvoiceDoc]): DataFrame =
    docs.toDF().select(
      col("docType"), col("contact.contactID").as("contactID"),
      col("date"), col("dueDate"), col("reference"), col("status"),
      col("lineAmountTypes"),
      concat(lit("["),
        array_join(transform(col("lineItems"), liJson(_)), ","),
        lit("]")).as("lineItems_json"))

  /** SQL mirror of [[liJson]]. */
  private def liJsonSql(desc: String, unit: String, tax: String,
      acct: String, taxType: String): String =
    s"""concat('{"description":"', ${Oracle.jsonEscSql(desc)},
       |  '","quantity":1,"unitAmount":', ${Oracle.fmt4Sql(s"CAST($unit AS DOUBLE)")},
       |  ',"taxAmount":', ${Oracle.fmt4Sql(s"CAST($tax AS DOUBLE)")},
       |  ',"accountCode":"', $acct, '","taxType":"$taxType"}')""".stripMargin

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

  /** doc_txn_nested oracle: the full per-txn document, lineItems as the
    * same canonical JSON the Spark side emits. */
  private def txnNestedSql: String = {
    val desc = """concat('Customer POS Account Sale', ': ', chr(10),
                 |  '* POS ID: ', c.terminalId, '/', c.seqNo,
                 |  chr(10), '* Timestamp: ', strftime(c.tranTimeStamp, '%d/%m/%Y, %H:%M:%S'),
                 |  chr(10), '* TransactionID: ', CAST(c.id AS VARCHAR))""".stripMargin
    val acct = s"CASE WHEN c.customerId = '${StoreId}' THEN '42010' ELSE '41010' END"
    Oracle.withCtes(
      s"""SELECT CASE WHEN c.amount < 0 THEN 'ACCRECCREDIT' ELSE 'ACCREC' END AS docType,
         |       t.xeroId AS contactID,
         |       strftime(c.date, '%Y-%m-%d') AS date,
         |       strftime(${Oracle.dueDateSql("c.date", "t.termsType", "t.termsDays")}, '%Y-%m-%d') AS dueDate,
         |       concat(c.terminalId, '/', c.seqNo) AS reference,
         |       'SUBMITTED' AS status,
         |       'Inclusive' AS lineAmountTypes,
         |       concat('[', ${liJsonSql(desc, "abs(c.amount)", "0", acct, "EXEMPTOUTPUT")}, ']') AS lineItems_json
         |FROM charge c LEFT JOIN terms t ON c.customerId = t.customerId
         |WHERE c.date IS NOT NULL AND c.amount IS NOT NULL
         |ORDER BY reference, date, docType""".stripMargin,
      Oracle.charge, Oracle.terms)
  }

  /** doc_dd_nested oracle: header from the rollup frame, lineItems_json
    * assembled from the same five branches as [[ddLinesSql]] via an
    * ord-ordered string_agg. */
  private def ddNestedSql: String = {
    val gst = liJsonSql("'Tape Sales Taxable (GST)'", "gstSales", "totalGst",
      "'41010'", "OUTPUT")
    val fre = liJsonSql("'Tape Sales Non-Taxable (FRE)'",
      """totalSales - lineSum - gstSales
        |      - (totalAccountSales - COALESCE(totalExp, Z))
        |      + COALESCE(totalOtherPayments, Z)""".stripMargin,
      "0", "'41010'", "EXEMPTOUTPUT")
    val dept = liJsonSql("concat(d.deptCode, ' Department Sales')",
      "d.sellEx", "0", "dd.glCodeSales", "EXEMPTOUTPUT")
    val rnd = liJsonSql("'Rounding from POS'", "-COALESCE(totalRounding, Z)",
      "0", "'62650'", "BASEXCLUDED")
    val instore = liJsonSql(
      "concat('In-Store Use Expenses/COGS:', chr(10), COALESCE(posId, ''))",
      "-COALESCE(totalExp, Z)", "0", "'51130'", "EXEMPTEXPENSES")
    val deptOrd = "1 + CAST(substr(d.deptCode, 7) AS INTEGER)"
    Oracle.withCtes(
      s"""SELECT 'ACCREC' AS docType, 'dd-contact' AS contactID,
         |       strftime(r.date, '%Y-%m-%d') AS date,
         |       strftime(CAST(r.date + 2 * INTERVAL '1 day' AS DATE), '%Y-%m-%d') AS dueDate,
         |       concat('DD', '/', upper(strftime(r.date, '%a')), '/',
         |              CAST(r.customerCount AS VARCHAR), '/',
         |              ${Oracle.avgBasketSql("r.totalSales", "r.customerCount")}) AS reference,
         |       'SUBMITTED' AS status, 'Inclusive' AS lineAmountTypes,
         |       la.lineItems_json
         |FROM r JOIN (
         |  SELECT date, concat('[', string_agg(item, ',' ORDER BY ord), ']') AS lineItems_json
         |  FROM (
         |    SELECT date, 0 AS ord, $gst AS item FROM r
         |    UNION ALL SELECT date, 1, $fre FROM r
         |    UNION ALL SELECT d.date, $deptOrd, $dept
         |    FROM dept d JOIN deptdim dd ON d.deptCode = dd.deptCode
         |    WHERE d.deptCode IN (${Tables.PivotDepts.map(b => s"'$b'").mkString(", ")})
         |      AND d.date IN (SELECT date FROM till)
         |    UNION ALL SELECT date, 11, $rnd FROM r
         |    UNION ALL SELECT date, 12, $instore FROM r
         |  ) t GROUP BY date
         |) la ON r.date = la.date
         |ORDER BY date""".stripMargin,
      (Rollup.rollupCtes :+ Oracle.department): _*)
  }

  val queries: Seq[Q] = Seq(

    // Nested per-txn documents, serialized canonically so the driver can
    // hash them (typed Dataset[InvoiceDoc] API unchanged — txnDocs).
    Q("doc_txn_nested", txnNestedSql) { (s, d) =>
      docJson(txnDocs(s, d)).orderBy("reference", "date", "docType")
    },

    // Nested daily DD invoices, canonical-JSON line items (typed API
    // unchanged — ddInvoices; the flat twin doc_dd_lines stays below).
    Q("doc_dd_nested", ddNestedSql) { (s, d) =>
      docJson(ddInvoices(s, d)).orderBy("date")
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
