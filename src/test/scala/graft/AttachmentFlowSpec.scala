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

  /** One invoice per date in the requested RANGE — the clean path (the
    * flow issues a single min..max range fetch per run). */
  private def oneServer(params: Map[String, String]): String = {
    val w = params("where")
    def bound(op: String) = w.split(s"DateString$op\"")(1).takeWhile(_ != '"')
    val (from, to) = (bound(">="), bound("<="))
    val days = Iterator.iterate(java.time.LocalDate.parse(from))(_.plusDays(1))
      .takeWhile(!_.isAfter(java.time.LocalDate.parse(to)))
      .map(_.toString).toSeq
    val docs = days.map(d =>
      s"""{"InvoiceID":"inv-$d-1","DateString":"$d",
         |"Reference":"DD/1","Status":"SUBMITTED","Total":100.25}"""
        .stripMargin.replace("\n", "")).mkString(",")
    s"""{"Invoices":[$docs]}"""
  }

  test("every attachment (not just the first) uploads to its invoice, " +
      "via exactly ONE batched fetch") {
    val acc = spark.sparkContext.collectionAccumulator[String]("posted")
    val fetches = new java.util.concurrent.atomic.AtomicInteger(0)
    val counting: RestSource.Server =
      params => { fetches.incrementAndGet(); oneServer(params) }
    val r = AttachmentFlow.run(spark, mkDropDir(), "2024-01",
      counting,
      post = batch => { batch.foreach(acc.add); batch.map(_ => None) })
    assert(r.files == 2 && r.uploads == 2 && r.batches >= 1)
    assert(r.rejected == 0)
    assert(fetches.get() == 1,
      s"expected ONE range fetch per run, saw ${fetches.get()}")
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

  test("attachments dropped in SUBDIRECTORIES upload too (getDDFiles " +
      "recursion intent, minus the reference's discard bug)") {
    val dir = mkDropDir()
    Files.createDirectories(Paths.get(dir, "week3"))
    Files.write(Paths.get(dir, "week3", "DD 17.xls"), "xls-bytes-17".getBytes)
    val acc = spark.sparkContext.collectionAccumulator[String]("posted3")
    val r = AttachmentFlow.run(spark, dir, "2024-01", oneServer,
      post = batch => { batch.foreach(acc.add); batch.map(_ => None) })
    assert(r.files == 3 && r.uploads == 3)
    val bodies = scala.jdk.CollectionConverters.ListHasAsScala(acc.value)
      .asScala.mkString("\n")
    assert(bodies.contains("\"DD 17.xls\"") &&
      bodies.contains("inv-2024-01-17-1"))
  }

  test("partially-rejecting transport surfaces per-element rejections") {
    // the API refuses DD 16's upload (validation error) but accepts
    // DD 15's — the flow must report the rejection, not just "2 batches"
    val r = AttachmentFlow.run(spark, mkDropDir(), "2024-01",
      oneServer,
      post = batch => batch.map(el =>
        if (el.contains("DD 16.xls")) Some("Account code is invalid")
        else None))
    assert(r.files == 2 && r.uploads == 2)
    assert(r.rejected == 1, s"expected 1 rejected upload, got ${r.rejected}")
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
