package graft

import java.nio.file.{Files, Paths}
import graft.sources.RestSource

/** End-to-end attachment lifecycle: drop-dir bytes → invoice lookup →
  * exactly-one audit → batched push; the reference's first-file-only
  * bug (/root/reference/src/apiFunctions.ts:97) is fixed, so EVERY file
  * uploads. */
class AttachmentFlowSpec extends SparkSuite {

  private def mkDropDir(): String = {
    val dir = Files.createTempDirectory("attach").toString
    Files.write(Paths.get(dir, "DD 15.xls"), "xls-bytes-15".getBytes)
    Files.write(Paths.get(dir, "DD 16.xls"), "xls-bytes-16".getBytes)
    Files.write(Paths.get(dir, "notes.txt"), "ignored".getBytes)
    dir
  }

  /** One invoice per date — the clean path. */
  private def oneServer(params: Map[String, String]): String = {
    val date = params("where").split("DateString==\"")(1).takeWhile(_ != '"')
    s"""{"Invoices":[{"InvoiceID":"inv-$date-1","DateString":"$date",
       |"Reference":"DD/1","Status":"SUBMITTED","Total":100.25}]}"""
      .stripMargin.replace("\n", "")
  }

  test("every attachment (not just the first) uploads to its invoice") {
    val acc = spark.sparkContext.collectionAccumulator[String]("posted")
    val r = AttachmentFlow.run(spark, mkDropDir(), "2024-01",
      oneServer, post = batch => batch.foreach(acc.add))
    assert(r.files == 2 && r.uploads == 2 && r.batches >= 1)
    val posted = acc.value
    assert(posted.size == 2)
    val bodies = scala.jdk.CollectionConverters.ListHasAsScala(posted)
      .asScala.mkString("\n")
    // both files flowed through, bound to their date's invoice
    assert(bodies.contains("\"DD 15.xls\"") && bodies.contains("\"DD 16.xls\""))
    assert(bodies.contains("inv-2024-01-15-1") &&
      bodies.contains("inv-2024-01-16-1"))
    // payload really is the file bytes (base64)
    val b64 = java.util.Base64.getEncoder.encodeToString("xls-bytes-15".getBytes)
    assert(bodies.contains(b64))
  }

  test("ambiguous lookup (multi-invoice date) aborts the flow") {
    intercept[Guards.CardinalityException] {
      AttachmentFlow.run(spark, mkDropDir(), "2024-01",
        RestSource.cannedServer) // canned server: 3 invoices per date
    }
  }

  test("missing invoice aborts the flow") {
    val empty: RestSource.Server = _ => """{"Invoices":[]}"""
    intercept[Guards.CardinalityException] {
      AttachmentFlow.run(spark, mkDropDir(), "2024-01", empty)
    }
  }
}
