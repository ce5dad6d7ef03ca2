package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Temporal
import graft.streaming.StreamAsOf

/** The streaming as-of enrichment must (1) equal the batch asOf
  * operator on the same data up to the final watermark, and (2) emit
  * each event exactly once, only after the watermark passes it, with
  * late updates unable to rewrite history. */
class StreamAsOfSpec extends SparkSuite {

  test("streaming as-of ≡ batch asOf up to the final watermark") {
    val streamed = StreamAsOf
      .runAvailableNow(spark, SparkSuite.Sf001, "sao_equiv")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toSet

    val ev = Tables.events(spark, SparkSuite.Sf001)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
    // the stream's final watermark = min over both sides of max event
    // time, floored to ms (Spark tracks watermarks in ms); events past
    // it are still buffered when AvailableNow terminates
    val maxClick = clicks.agg(max("us")).head.getLong(0)
    val maxPurch = purchases.agg(max("us")).head.getLong(0)
    val wmUs = (math.min(maxClick, maxPurch) / 1000L) * 1000L
    val batch = Temporal.asOf(clicks, purchases, Seq("user_id"), "us", Seq("value"))
      .filter(col("us") <= wmUs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toSet
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"stream=${streamed.size} batch=${batch.size} " +
        s"onlyStream=${(streamed -- batch).take(3)} " +
        s"onlyBatch=${(batch -- streamed).take(3)}")
  }

  test("equal-ts updates resolve deterministically (max value); " +
      "assertUniqueUpdates raises instead") {
    val sp = spark
    import sp.implicits._
    val in = Files.createTempDirectory("sao_dup").toString
    def ts(h: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusHours(h))
    // TWO updates share (key=1, ts=h0) — the violated-uniqueness case
    Seq((1L, 101L, ts(1), 0.0), (1L, 102L, ts(10), 0.0))
      .toDF("user_id", "event_id", "ts", "value").coalesce(1)
      .write.parquet(s"$in/events")
    Seq((1L, 0L, ts(0), 3.0), (1L, 0L, ts(0), 7.0), (1L, 0L, ts(9), 1.0))
      .toDF("user_id", "event_id", "ts", "value").coalesce(1)
      .write.parquet(s"$in/updates")
    def side(dir: String) = spark.readStream
      .schema("user_id LONG, event_id LONG, ts TIMESTAMP, value DOUBLE")
      .parquet(s"$in/$dir")

    // default: the tie resolves to the MAX value (7.0) — pinned, so the
    // output can never be run-order-dependent
    val q = StreamAsOf.enrich(spark, side("events"), side("updates"),
        "0 seconds")
      .writeStream.format("memory").queryName("sao_dup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("sao_dup").collect()
      .map(r => (r.getLong(1), Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(rows.toSeq == Seq((101L, Some(7.0))), s"got ${rows.toSeq}")

    // strict: the same stream with assertUniqueUpdates fails loudly,
    // naming the offending (key, ts)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q2 = StreamAsOf.enrich(spark, side("events"), side("updates"),
          "0 seconds", assertUniqueUpdates = true)
        .writeStream.format("memory").queryName("sao_dup_strict")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination()
    }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ::: msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("not unique per (key, ts)")),
      s"cause chain: ${msgs(ex)}")
  }

  test("watermark-gated emission; late updates cannot rewrite emitted rows") {
    val sp = spark
    import sp.implicits._
    val in = Files.createTempDirectory("sao_in").toString
    val ck = Files.createTempDirectory("sao_ck").toString

    def ts(h: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusHours(h))
    def write(name: String, events: Seq[(Long, Long, Int)],
        updates: Seq[(Long, Int, Double)]): Unit = {
      events.map { case (u, id, h) => (u, id, ts(h), 0.0) }
        .toDF("user_id", "event_id", "ts", "value").coalesce(1)
        .write.mode("overwrite").parquet(s"$in/events/$name")
      updates.map { case (u, h, v) => (u, 0L, ts(h), v) }
        .toDF("user_id", "event_id", "ts", "value").coalesce(1)
        .write.mode("overwrite").parquet(s"$in/updates/$name")
    }
    // parquet sink: the memory sink cannot recover a checkpoint, and the
    // multi-run watermark progression is the point of this test. Each
    // call returns the CUMULATIVE emitted rows.
    val out = Files.createTempDirectory("sao_out").toString + "/data"
    def runOnce(): Seq[(Long, Long, Option[Double])] = {
      def side(dir: String) = spark.readStream
        .schema("user_id LONG, event_id LONG, ts TIMESTAMP, value DOUBLE")
        .parquet(s"$in/$dir/b*")
      val q = StreamAsOf.enrich(spark, side("events"), side("updates"),
          "30 minutes")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // only the no-files-yet case may read as empty — any other read
      // failure must surface, or run-1's assertions pass vacuously
      try spark.read.parquet(out).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toSeq
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("Path does not exist") ||
               e.getMessage.contains("PATH_NOT_FOUND") ||
               e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") => Nil
      }
    }

    // Run 1 — updates at h0 (v=1.0) and h2 (v=2.0); events at h1, h3.
    // After this run the watermark is min(h3, h2) - 30min = h1.5: event
    // 101 (h1) may have been flushed by the trailing no-data batch;
    // event 102 (h3) is beyond the watermark and MUST still be held.
    write("b1", Seq((1L, 101L, 1), (1L, 102L, 3)), Seq((1L, 0, 1.0), (1L, 2, 2.0)))
    val r1 = runOnce()
    assert(!r1.exists(_._2 == 102L),
      s"102 (h3) is beyond the h1.5 watermark and must be held, got $r1")
    assert(r1.toSet.subsetOf(Set[(Long, Long, Option[Double])]((1L, 101L, Some(1.0)))),
      s"got $r1")

    // Run 2 — far-future data on BOTH sides pushes the watermark past
    // everything (the global watermark is the MIN across the two
    // watermarked inputs — a silent side holds it back, so a far-future
    // event alone would flush nothing): both events must now have been
    // emitted exactly once (cumulative: no duplicates across runs),
    // 101 matched to h0 (1.0), 102 to h2 (2.0). The h100/h99 pair
    // itself stays held (beyond the new watermark).
    write("b2", Seq((2L, 201L, 100)), Seq((2L, 99, 5.0)))
    val r2 = runOnce()
    assert(r2.sortBy(_._2) == Seq((1L, 101L, Some(1.0)), (1L, 102L, Some(2.0))),
      s"cumulative emissions wrong: $r2")

    // Run 3 — a LATE update at h1 (v=9.0), far behind the watermark:
    // history is already emitted, so the cumulative output must not
    // change.
    write("b3", Seq.empty, Seq((1L, 1, 9.0)))
    val r3 = runOnce()
    assert(r3.sortBy(_._2) == r2.sortBy(_._2),
      s"late update must not rewrite emitted rows: $r3")
  }
}
