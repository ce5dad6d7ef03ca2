package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.util.LongAccumulator

/** Sink patterns from SURVEY §2.1: the JSON log sink with
  * collision-suffix naming (`snk_json_log`) and the batched
  * foreachPartition push sink (`snk_api_batch`). The network/transport
  * edge is pluggable, everything else is real Spark plumbing.
  */
object Sinks {

  /** JSON log file with the reference's name-collision resolution
    * (/root/reference/src/helpers.ts:55-66): probe `name.json`,
    * `namea.json`, `nameb.json`, … until free. Log payloads are small
    * driver-side artifacts (responses/requests) — but the write still
    * streams through `toLocalIterator`, so driver memory is bounded by
    * ONE partition, not the frame (VERDICT r6 note); the data-plane
    * sink remains Verify's parquet/`df.write`. Returns the path
    * written. */
  def writeJsonLog(df: DataFrame, dir: String, baseName: String): String = {
    Files.createDirectories(Paths.get(dir))
    var suffix = ""
    var n = -1
    var path = Paths.get(dir, s"$baseName.json")
    while (Files.exists(path)) {
      n += 1
      suffix = ('a' + n).toChar.toString
      path = Paths.get(dir, s"$baseName$suffix.json")
    }
    val w = Files.newBufferedWriter(path)
    try {
      w.write("[\n  ")
      val it = df.toJSON.toLocalIterator()
      var first = true
      while (it.hasNext) {
        if (!first) w.write(",\n  ")
        w.write(it.next())
        first = false
      }
      w.write("\n]")
    } finally w.close()
    path.toString
  }

  /** Batched push sink (/root/reference/src/apiFunctions.ts:58-80 posts
    * all docs in one call; at scale: per-partition batches through a
    * pluggable `post`). The `post` closure runs on executors — it must
    * be serializable and idempotent (Spark may retry tasks). Returns the
    * number of batches pushed (via accumulator). */
  def batchedPush(df: DataFrame, batchSize: Int)(
      post: Seq[String] => Unit): Long = {
    val acc: LongAccumulator =
      df.sparkSession.sparkContext.longAccumulator("batches")
    df.toJSON.foreachPartition { it: Iterator[String] =>
      it.grouped(batchSize).foreach { batch =>
        post(batch)
        acc.add(1)
      }
    }
    acc.value
  }

  /** Batched push with PER-ELEMENT outcomes — the reference's
    * `summarizeErrors: false` semantics (/root/reference/src/
    * apiFunctions.ts:68-72 posts with summarize=false so the batched
    * response carries each element's validationErrors; helpers.ts:90-101
    * then logs the full response). A partially-rejected batch is a
    * day-one reality of batch APIs: the accepted elements MUST NOT be
    * retried and the rejected ones MUST be visible, so a bare
    * batch-count return is not enough.
    *
    * `post` receives one batch and returns one outcome per element in
    * order — `None` = accepted, `Some(msg)` = that element's validation
    * error (a transport returning the wrong number of outcomes fails
    * loudly). Returns the outcome rows
    * `(element, partition, batch, ok, error)`, MATERIALIZED once
    * (persist + count) before returning so downstream counting/logging
    * does not re-fire the posts; callers unpersist when done. Same
    * executor contract as [[batchedPush]]: `post` must be serializable
    * and idempotent under task retry — and that idempotence is load-
    * bearing beyond retries: the persist is at the default storage
    * level, so a lost executor or an evicted partition RECOMPUTES the
    * mapPartitions (re-firing that partition's posts) when a later
    * action touches the lost block. "Fires once" therefore holds only
    * absent partition loss; a deployment that needs strict once-per-run
    * accounting must either post through an idempotency key (the REST
    * analog of IdempotentSink) or persist to a replicated/disk level
    * before counting. */
  def batchedPushValidated(df: DataFrame, batchSize: Int)(
      post: Seq[String] => Seq[Option[String]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val outcomes = df.toJSON.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      it.grouped(batchSize).zipWithIndex.flatMap { case (batch, bi) =>
        val errs = post(batch)
        if (errs.length != batch.length)
          throw new IllegalStateException(
            s"push transport returned ${errs.length} outcomes for a " +
              s"${batch.length}-element batch (partition $pid, batch $bi)" +
              " — per-element validation requires exactly one outcome per" +
              " posted element")
        batch.zip(errs).map { case (el, e) =>
          (el, pid, bi, e.isEmpty, e.orNull)
        }
      }
    }.toDF("element", "partition", "batch", "ok", "error")
      .persist()
    outcomes.count() // fire the posts exactly once
    outcomes
  }
}
