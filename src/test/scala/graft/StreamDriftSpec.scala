package graft

import graft.SparkSuite.Sf001
import graft.streaming.StreamDrift
import org.apache.spark.sql.functions._

/** The streaming drift monitor must equal the batch evt_drift_daily
  * rows for every day the final watermark closed — both sides run the
  * same exact integer ledger, so the comparison is bit-exact. */
class StreamDriftSpec extends SparkSuite {

  test("streaming drift ≡ batch evt_drift_daily on closed days") {
    val streamed = StreamDrift.runAvailableNow(spark, Sf001, "drift_equiv")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet

    val wmUs = (Tables.events(spark, Sf001)
      .agg(max(unix_micros(col("ts")))).head.getLong(0) / 1000L) * 1000L
    val batch = SparkEntry.queries("evt_drift_daily")(spark, Sf001)
      .filter((col("day") + 1) * 86400000000L <= wmUs)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet

    assert(batch.nonEmpty, "batch produced no closed drift rows")
    assert(streamed == batch,
      s"stream=${streamed.size} batch=${batch.size} " +
        s"onlyStream=${(streamed -- batch).take(3)} " +
        s"onlyBatch=${(batch -- streamed).take(3)}")
    // drift must be non-trivial somewhere or the ledger is untested
    assert(batch.exists(_._5 > 0), "all shifts zero — fixture degenerate")
  }

  test("a category unseen in the reference stays in the ledger at " +
      "maximal drift; restart resumes without re-emitting") {
    val sp = spark
    import sp.implicits._
    val in = java.nio.file.Files.createTempDirectory("dr_in").toString
    val ck = java.nio.file.Files.createTempDirectory("dr_ck").toString
    val out = java.nio.file.Files.createTempDirectory("dr_out").toString + "/d"

    def ts(day: Int, hour: Int = 12) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, day, hour, 0))
    def write(name: String, rows: Seq[(String, java.sql.Timestamp)]): Unit =
      rows.toDF("event_type", "ts").coalesce(1)
        .write.mode("overwrite").parquet(s"$in/b/$name")
    val reference = Map("a" -> 3L, "b" -> 1L) // refTot = 4
    def runOnce(): Seq[(Long, String, Long, Long, Long)] = {
      val stream = spark.readStream
        .schema("event_type STRING, ts TIMESTAMP")
        .parquet(s"$in/b/*")
      val q = StreamDrift.monitor(spark, stream, reference, "0 seconds")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      try spark.read.parquet(out).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
        .sortBy(t => (t._1, t._2)).toSeq
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("Path does not exist") ||
               e.getMessage.contains("PATH_NOT_FOUND") ||
               e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") => Nil
      }
    }

    // day 1: two 'a', one 'c' (NOT in the reference); day 2's event
    // closes day 1. c's shift: |1·4 − 0·3|·10⁶ // (4·3) = 333333.
    // a's: |2·4 − 3·3|·10⁶ // 12 = 83333.
    write("b1", Seq(("a", ts(1)), ("a", ts(1)), ("c", ts(1)), ("a", ts(2))))
    val r1 = runOnce()
    assert(r1 == Seq(
      (19723L, "a", 2L, 3L, 83333L),
      (19723L, "c", 1L, 3L, 333333L)), s"got $r1")

    // day 3 closes day 2 across the checkpointed restart; day 1 must
    // not re-emit. day 2: one 'a' → |1·4 − 3·1|·10⁶ // 4 = 250000.
    write("b2", Seq(("b", ts(3, 13))))
    val r2 = runOnce()
    assert(r2 == Seq(
      (19723L, "a", 2L, 3L, 83333L),
      (19723L, "c", 1L, 3L, 333333L),
      (19724L, "a", 1L, 1L, 250000L)), s"got $r2")
  }
}
