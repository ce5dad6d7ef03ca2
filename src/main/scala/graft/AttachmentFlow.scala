package graft

import graft.sources.{RestSource, Sinks}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The reference's attachment-upload lifecycle
  * (/root/reference/src/apiFunctions.ts:90-119) composed end-to-end on
  * the data plane: binary drop-dir source → date derived from the
  * `DD {dd}.xls` file name (/root/reference/src/helpers.ts:76) →
  * invoice point-lookup join (the where-string fetch of
  * apiFunctions.ts:130-147) → exactly-one audit per file (hard abort on
  * 0 or >1 matches, apiFunctions.ts:148-170) → batched push of
  * {invoiceID, fileName, base64 payload} upload requests.
  *
  * Deliberate fix over the reference: apiFunctions.ts:97 uploads ONLY
  * `attachments[0]` (first file in the dir); here every matching file
  * flows through the same audit + push.
  *
  * Scale notes: the REST lookup is ONE driver-side range fetch per run
  * (min..max of the dates present — the where grammar's `&&`
  * conjunctions express the range, so a year-long drop dir costs one
  * request, not ~365 sequential ones) whose SMALL result broadcasts
  * into the join — never a per-row executor call; file bytes stay an
  * opaque binary column end-to-end and are only base64-encoded inside
  * the push projection.
  */
object AttachmentFlow {

  /** `rejected` = uploads the transport's per-element response refused
    * (summarizeErrors:false semantics — see Sinks.batchedPushValidated);
    * accepted + rejected = uploads. */
  final case class Result(files: Long, uploads: Long, batches: Long,
      rejected: Long = 0)

  def run(spark: SparkSession, attachDir: String, yearMonth: String,
      server: RestSource.Server, contactName: String = "Day Dockets",
      post: Seq[String] => Seq[Option[String]] =
        batch => batch.map(_ => None)): Result = {

    // recursiveFileLookup: the reference's getDDFiles recurses into
    // subdirectories (/root/reference/src/parse.ts:44-48) but drops the
    // recursive results — the intent (nested drop dirs contribute
    // attachments) is honored here, the discard bug is not
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "DD *.xls")
      .option("recursiveFileLookup", "true").load(attachDir)
      .select(element_at(split(col("path"), "/"), -1).as("fileName"),
        col("content"))
      .withColumn("dateString",
        concat(lit(yearMonth), lit("-"),
          regexp_extract(col("fileName"), "^DD (\\d\\d)\\.xls$", 1)))

    // ONE batched API fetch for the whole drop dir: the driver reads
    // only the (min, max) date bounds — a single row — and issues a
    // range where-string; dates inside the range with no file simply
    // never join
    val bounds = files
      .agg(min(col("dateString")).as("lo"), max(col("dateString")).as("hi"))
      .head()
    if (bounds.isNullAt(0)) return Result(0, 0, 0) // empty drop dir
    val invoices = RestSource.fetchInvoicesRange(
      spark, server, contactName, bounds.getString(0), bounds.getString(1))

    val joined = files.join(
      broadcast(invoices.select("invoiceID", "dateString")),
      Seq("dateString"), "left")

    // exactly-one audit: every attachment must resolve to ONE invoice
    val perFile = joined.groupBy("fileName")
      .agg(count(col("invoiceID")).as("n")).persist()
    try {
      val bad = perFile.filter(col("n") =!= 1)
      val offenders = bad.take(20)
      if (offenders.nonEmpty) {
        offenders.foreach(r => System.err.println(s"ATTACH AUDIT: $r"))
        throw new Guards.CardinalityException(
          s"${bad.count()} attachment file(s) without exactly one invoice")
      }
      val nFiles = perFile.count()

      val uploads = joined.select(col("invoiceID"), col("fileName"),
        base64(col("content")).as("payload_b64"))
      // per-element outcomes: a partially-rejected batch must surface
      // WHICH uploads the API refused, not just how many batches went out
      val outcomes = Sinks.batchedPushValidated(uploads, batchSize = 50)(post)
      try {
        val batches = outcomes.select("partition", "batch").distinct().count()
        val bad = outcomes.filter(!col("ok"))
        val rejected = bad.count()
        if (rejected > 0)
          bad.select("element", "error").take(20)
            .foreach(r => System.err.println(s"ATTACH REJECTED: $r"))
        // post-audit each file carries exactly one invoice ⇒ 1 upload/file
        Result(files = nFiles, uploads = nFiles, batches = batches,
          rejected = rejected)
      } finally outcomes.unpersist()
    } finally perFile.unpersist()
  }
}
