package graft

import graft.SparkSuite.{Sf0001, Sf001}
import graft.operators.Docs
import org.apache.spark.sql.functions._

/** Document-assembly semantics: nested shape, line-item ordering, sign
  * split, and the end-to-end pipeline incl. the abort path. */
class DocsSpec extends SparkSuite {

  test("txn docs: sign split, single inclusive line item, terms due date") {
    val docs = Docs.txnDocs(spark, Sf0001).collect()
    assert(docs.nonEmpty)
    docs.foreach { d =>
      assert(d.docType == "ACCREC" || d.docType == "ACCRECCREDIT")
      assert(d.lineItems.size == 1)
      assert(d.lineItems.head.unitAmount >= 0) // abs()
      assert(d.status == "SUBMITTED" && d.lineAmountTypes == "Inclusive")
      assert(d.dueDate >= d.date) // due date never precedes invoice date
    }
  }

  test("DD invoice: header + dept + footer line items in probe order") {
    val dd = Docs.ddInvoices(spark, Sf0001).collect()
    assert(dd.nonEmpty)
    dd.foreach { inv =>
      val items = inv.lineItems
      assert(items.head.description == "Tape Sales Taxable (GST)")
      assert(items(1).description == "Tape Sales Non-Taxable (FRE)")
      assert(items(items.size - 2).description == "Rounding from POS")
      assert(items.last.description.startsWith("In-Store Use Expenses/COGS:"))
      // dept items sit between, in Brand#1..Brand#9 probe order
      val depts = items.drop(2).dropRight(2).map(_.description)
      assert(depts.forall(_.endsWith(" Department Sales")))
      assert(depts == depts.sortBy(s => s.stripPrefix("Brand#").head.asDigit))
      assert(items.forall(_.quantity == 1))
    }
  }

  test("golden: canonical DD-invoice JSON for 1995-01-04 at sf0.01") {
    // pinned end-to-end serialization — header fields, dept probe order,
    // fmt4 amounts, and the \n escape in the In-Store footer. Any drift
    // in the assembly, rounding, or escaping shows up here byte-for-byte.
    val row = SparkEntry.queries("doc_dd_nested")(spark, Sf001)
      .filter(org.apache.spark.sql.functions.col("date") === "1995-01-04")
      .collect()
    assert(row.length == 1)
    val r = row.head
    assert(r.getString(0) == "ACCREC" && r.getString(1) == "dd-contact")
    assert(r.getString(3) == "1995-01-06") // dueDate = date + 2
    assert(r.getString(4) == "DD/WED/5/289551.36")
    val golden =
      """[{"description":"Tape Sales Taxable (GST)","quantity":1,"unitAmount":1447612.0243,"taxAmount":131601.0931,"accountCode":"41010","taxType":"OUTPUT"},""" +
      """{"description":"Tape Sales Non-Taxable (FRE)","quantity":1,"unitAmount":-122659.5162,"taxAmount":0.0000,"accountCode":"41010","taxType":"EXEMPTOUTPUT"},""" +
      """{"description":"Brand#1 Department Sales","quantity":1,"unitAmount":194766.2733,"taxAmount":0.0000,"accountCode":"4001","taxType":"EXEMPTOUTPUT"},""" +
      """{"description":"Brand#2 Department Sales","quantity":1,"unitAmount":85162.5120,"taxAmount":0.0000,"accountCode":"4001","taxType":"EXEMPTOUTPUT"},""" +
      """{"description":"Brand#5 Department Sales","quantity":1,"unitAmount":46573.8910,"taxAmount":0.0000,"accountCode":"4001","taxType":"EXEMPTOUTPUT"},""" +
      """{"description":"Brand#8 Department Sales","quantity":1,"unitAmount":21307.3110,"taxAmount":0.0000,"accountCode":"4001","taxType":"EXEMPTOUTPUT"},""" +
      """{"description":"Brand#9 Department Sales","quantity":1,"unitAmount":167290.5018,"taxAmount":0.0000,"accountCode":"4001","taxType":"EXEMPTOUTPUT"},""" +
      """{"description":"Rounding from POS","quantity":1,"unitAmount":0.0200,"taxAmount":0.0000,"accountCode":"62650","taxType":"BASEXCLUDED"},""" +
      """{"description":"In-Store Use Expenses/COGS:\n","quantity":1,"unitAmount":0.0000,"taxAmount":0.0000,"accountCode":"51130","taxType":"EXEMPTEXPENSES"}]"""
    assert(r.getString(7) == golden)
  }

  test("golden: canonical txn-invoice JSON (credit note 550501 at sf0.01)") {
    // ids are not unique in the synthetic data — pin the date too
    val row = SparkEntry.queries("doc_txn_nested")(spark, Sf001)
      .filter(org.apache.spark.sql.functions.col("lineItems_json")
        .contains("TransactionID: 550501") &&
        org.apache.spark.sql.functions.col("date") === "1995-02-23")
      .collect()
    assert(row.length == 1)
    val r = row.head
    assert(r.getString(0) == "ACCRECCREDIT") // negative amount → credit
    assert(r.getString(1) == "xid-604")
    assert(r.getString(2) == "1995-02-23" && r.getString(3) == "1995-03-22")
    assert(r.getString(7) ==
      """[{"description":"Customer POS Account Sale: \n* POS ID: 1/0001\n""" +
      """* Timestamp: 23/02/1995, 00:00:00\n* TransactionID: 550501",""" +
      """"quantity":1,"unitAmount":40916.1555,"taxAmount":0.0000,""" +
      """"accountCode":"41010","taxType":"EXEMPTOUTPUT"}]""")
  }

  test("pipeline clean-path: docs produced, log written, balance warns") {
    val logDir = java.nio.file.Files.createTempDirectory("plog").toString
    val r = Pipeline.run(spark, Sf0001, logDir)
    assert(r.invoices > 0 && r.creditNotes > 0 && r.ddInvoices > 0)
    assert(r.droppedRows == 0) // observed metric: fixture has no null fields
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(r.logPath)))
    // second run collides → letter-suffixed log file
    val r2 = Pipeline.run(spark, Sf0001, logDir)
    assert(r2.logPath.endsWith("response-loga.json"))
  }

  test("pipeline strict mode aborts on unverified rows (sf0.01 fixture)") {
    val logDir = java.nio.file.Files.createTempDirectory("plog2").toString
    intercept[Guards.UnverifiedChargesException] {
      Pipeline.run(spark, Sf001, logDir, strict = true)
    }
  }
}
