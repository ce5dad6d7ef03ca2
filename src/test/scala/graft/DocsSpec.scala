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
