package graft

import graft.SparkSuite.Sf001
import graft.streaming.StreamAnomaly
import org.apache.spark.sql.functions._

/** The streaming anomaly flags must equal the batch ts_anomaly rows
  * for every day the final watermark closed — same doubles, same
  * flags, each day emitted exactly once. */
class StreamAnomalySpec extends SparkSuite {

  test("streaming anomaly flags ≡ batch ts_anomaly on watermark-closed days") {
    val streamed = StreamAnomaly
      .runAvailableNow(spark, Sf001, "sa_equiv")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
      .toSet

    // final watermark = max event time (delay 0), floored to ms; a day
    // is closed iff its end is at-or-before it
    val wmUs = (Tables.events(spark, Sf001)
      .agg(max(unix_micros(col("ts")))).head.getLong(0) / 1000L) * 1000L
    val batch = SparkEntry.queries("ts_anomaly")(spark, Sf001)
      .filter((unix_micros(col("day").cast("timestamp")) + 86400000000L)
        <= wmUs)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
      .toSet

    assert(batch.nonEmpty, "batch produced no closed anomaly rows")
    assert(streamed == batch,
      s"stream=${streamed.size} batch=${batch.size} " +
        s"onlyStream=${(streamed -- batch).take(3)} " +
        s"onlyBatch=${(batch -- streamed).take(3)}")
    // the fixture must exercise the flag itself, not just the stats
    assert(batch.exists(_._6), "no anomalous day in the fixture window")
  }

  test("each day emits exactly once across incremental runs; open days held") {
    val sp = spark
    import sp.implicits._
    val in = java.nio.file.Files.createTempDirectory("sa_in").toString
    val ck = java.nio.file.Files.createTempDirectory("sa_ck").toString
    val out = java.nio.file.Files.createTempDirectory("sa_out").toString + "/d"

    def ts(day: Int, h: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, day, h, 0))
    def write(name: String, rows: Seq[(Int, Int, Double)]): Unit =
      rows.map { case (d, h, v) => ("click", ts(d, h), v) }
        .toDF("event_type", "ts", "value").coalesce(1)
        .write.mode("overwrite").parquet(s"$in/b/$name")
    def runOnce(): Seq[(String, Double, Boolean)] = {
      val stream = spark.readStream
        .schema("event_type STRING, ts TIMESTAMP, value DOUBLE")
        .parquet(s"$in/b/*")
      val q = StreamAnomaly.flags(spark, stream, "0 seconds")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      try spark.read.parquet(out).collect()
        .map(r => (r.getString(1), r.getDouble(2), r.getBoolean(5)))
        .sortBy(_._1).toSeq
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("Path does not exist") ||
               e.getMessage.contains("PATH_NOT_FOUND") ||
               e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") => Nil
      }
    }

    // Run 1: days 1..7 at value 10, day 8 at 100 (the spike), plus an
    // event on day 9 that leaves day 8 CLOSED (wm = day-9 00:00) but
    // day 9 open. Ring needs 7 closed days before the first emission,
    // so days 1..6 emit nothing; day 7 is the first stats row. The NaN
    // event on day 3 must neither kill the query nor move day 3's
    // total (batch CASTs it to NULL and SUM skips it).
    write("b1", (1 to 7).map(d => (d, 12, 10.0)) :+ ((8, 12, 100.0))
      :+ ((9, 0, 10.0)) :+ ((3, 13, Double.NaN)))
    val r1 = runOnce()
    assert(r1.map(_._1) == Seq("2024-01-07", "2024-01-08"), s"got $r1")
    assert(!r1.head._3, "constant window flagged anomalous")
    assert(r1.last._3, "the 10x spike day was not flagged")

    // Run 2: far-future event closes day 9; its row appends exactly
    // once, nothing re-emits
    write("b2", Seq((20, 0, 10.0)))
    val r2 = runOnce()
    assert(r2.map(_._1) ==
      Seq("2024-01-07", "2024-01-08", "2024-01-09"), s"got $r2")
  }
}
