package graft

import graft.operators.Docs
import graft.sources.Sinks
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's `main(entity)` lifecycle (SURVEY §3.1) as one library
  * call: extract (parsed-side rows) → verify (inner + anti join, balance
  * audit, hard abort) → transform (Invoice/CreditNote docs + daily DD
  * invoices) → load (pluggable batched sink) → log (JSON with collision
  * suffixing). Driver-side config stays at the edges; the data plane is
  * one lazy DAG per stage.
  */
object Pipeline {

  /** `rejectedDocs` counts per-element validation refusals from the
    * batched load stage (summarizeErrors:false semantics — see
    * Sinks.batchedPushValidated). */
  final case class Result(invoices: Long, creditNotes: Long,
      ddInvoices: Long, unbalancedDays: Long, droppedRows: Long,
      logPath: String, rejectedDocs: Long = 0)

  private def keys = Seq("date", "customerId", "seqNo", "amount")

  /** Verification stage (/root/reference/src/helpers.ts:178-216): warn
    * on unbalanced days, ABORT on any unverified row. */
  def verify(xlsx: DataFrame, db: DataFrame): DataFrame = {
    val anti = xlsx.join(db, keys, "left_anti")
    Guards.abortIfUnverified(anti)
    xlsx.join(db, keys, "inner")
  }

  /** Full run. `strict = false` drops the fixture's deliberately
    * perturbed rows first (the clean-data path); `strict = true` keeps
    * them and the verification abort fires (the reference's
    * NOTHING-IMPORTED behavior). */
  def run(spark: SparkSession, sfDir: String, logDir: String,
      strict: Boolean = false,
      post: Seq[String] => Seq[Option[String]] =
        batch => batch.map(_ => None)): Result = {
    val db = Tables.charge(spark, sfDir)
    val parsed0 = Tables.xlsxCharges(spark, sfDir)

    // required-fields skip with an OBSERVED drop count — the reference
    // logs each dropped txn (/root/reference/src/DataObject.ts:43-46);
    // df.observe records the metric without a second pass over the data
    val dropObs = new org.apache.spark.sql.Observation("required_fields")
    val parsed1 = parsed0
      .observe(dropObs,
        sum(when(col("date").isNull || col("amount").isNull, 1L)
          .otherwise(0L)).as("dropped"))
      .filter(col("date").isNotNull && col("amount").isNotNull)

    val parsed = if (strict) parsed1
    else parsed1.join(db, keys, "left_semi") // keep only verifiable rows

    // balance audit (soft): parsed-side vs db-side daily sums
    val xs = parsed.groupBy("date").agg(sum(col("amount")).as("sx"))
    val ds = db.filter(col("id") % 7 === 0).groupBy("date")
      .agg(sum(col("amount")).as("sdb"))
    val unbalanced = xs.join(ds, Seq("date"))
      .filter(col("sx") =!= col("sdb")).select("date")
    val unbalancedDays = Guards.warnIfUnbalanced(unbalanced, sample = 5)

    // verification (hard): abort on any unmatched row
    val verified = verify(parsed, db)

    // transform: per-txn docs split by sign + the daily DD invoices —
    // ONE aggregation pass over the doc DAG for both type counts
    // (separate filter().count() calls would recompute it per type)
    val docs = Docs.txnDocs(spark, sfDir)
    val typeCounts = docs.groupBy("docType").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val invoices = typeCounts.getOrElse("ACCREC", 0L)
    val credits = typeCounts.getOrElse("ACCRECCREDIT", 0L)
    val dd = Docs.ddInvoices(spark, sfDir).count()

    // load: batched push through the pluggable transport, with
    // per-element outcomes (a partially-rejected batch surfaces its
    // refusals instead of vanishing into a batch count)
    val outcomes = Sinks.batchedPushValidated(
      docs.toDF().limit(100), batchSize = 50)(post)
    val rejected =
      try outcomes.filter(!col("ok")).count()
      finally outcomes.unpersist()

    // log sink with collision suffixing
    val summary = verified.agg(
      count(lit(1)).as("verifiedRows"),
      sum(col("amount")).cast("double").as("verifiedTotal"))
    val logPath = Sinks.writeJsonLog(summary, logDir, "response-log")

    val dropped = dropObs.get.getOrElse("dropped", 0L) match {
      case n: Long => n
      case _ => 0L
    }
    Result(invoices, credits, dd, unbalancedDays, dropped, logPath,
      rejectedDocs = rejected)
  }
}
