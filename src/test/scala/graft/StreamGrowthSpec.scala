package graft

import graft.SparkSuite.Sf001
import graft.streaming.StreamGrowth
import org.apache.spark.sql.functions._

/** The streaming growth curve must equal the batch evt_cum_users rows
  * for every day the final watermark closed — the attribution is exact
  * set arithmetic on both sides, so the comparison is bit-exact. */
class StreamGrowthSpec extends SparkSuite {

  test("streaming growth curve ≡ batch evt_cum_users on closed days") {
    val streamed = StreamGrowth.runAvailableNow(spark, Sf001, "growth_equiv")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    val wmUs = (Tables.events(spark, Sf001)
      .agg(max(unix_micros(col("ts")))).head.getLong(0) / 1000L) * 1000L
    val batch = SparkEntry.queries("evt_cum_users")(spark, Sf001)
      .filter((unix_micros(col("day").cast("timestamp")) + 86400000000L)
        <= wmUs)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3)))
      .toSet

    assert(batch.nonEmpty, "batch produced no closed growth rows")
    assert(streamed == batch,
      s"stream=${streamed.size} batch=${batch.size} " +
        s"onlyStream=${(streamed -- batch).take(3)} " +
        s"onlyBatch=${(batch -- streamed).take(3)}")
    // returning users must exist, or new-user attribution is untested
    assert(batch.exists(r => r._2 > r._3),
      "every active user was new — fixture never exercised attribution")
  }

  test("late-but-in-watermark events attribute to their true first day; " +
      "re-runs resume from checkpoint without re-emitting") {
    val sp = spark
    import sp.implicits._
    val in = java.nio.file.Files.createTempDirectory("gr_in").toString
    val ck = java.nio.file.Files.createTempDirectory("gr_ck").toString
    val out = java.nio.file.Files.createTempDirectory("gr_out").toString + "/d"

    // hour matters: a later batch's event at a time <= the current
    // watermark is dropped as late (delay = 0), so batch 2's day-3
    // events sit at 13:00, strictly above batch 1's 12:00 watermark
    def ts(day: Int, hour: Int = 12) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, day, hour, 0))
    def write(name: String, rows: Seq[(Long, java.sql.Timestamp)]): Unit =
      rows.toDF("user_id", "ts").coalesce(1)
        .write.mode("overwrite").parquet(s"$in/b/$name")
    def runOnce(): Seq[(String, Long, Long, Long)] = {
      val stream = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP")
        .parquet(s"$in/b/*")
      val q = StreamGrowth.curve(spark, stream, "0 seconds")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      try spark.read.parquet(out).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("Path does not exist") ||
               e.getMessage.contains("PATH_NOT_FOUND") ||
               e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") => Nil
      }
    }

    // batch 1 arrives day-2-first (out of order WITHIN the unclosed
    // window): user 1 active on days 1 and 2, user 2 only day 2. The
    // final watermark (day 3's event) closes days 1-2 in one trigger —
    // user 1 must attribute to day 1, not the first-arriving day 2.
    write("b1", Seq((1L, ts(2)), (2L, ts(2)), (1L, ts(1)), (3L, ts(3))))
    val r1 = runOnce()
    assert(r1 == Seq(("2024-01-01", 1L, 1L, 1L), ("2024-01-02", 2L, 1L, 2L)),
      s"got $r1")

    // batch 2: day 4 closes day 3; user 1 returns (0 new), user 4 is
    // new; days 1-2 must NOT re-emit across the checkpointed restart
    write("b2", Seq((1L, ts(3, 13)), (4L, ts(3, 13)), (9L, ts(4))))
    val r2 = runOnce()
    assert(r2 == Seq(
      ("2024-01-01", 1L, 1L, 1L), ("2024-01-02", 2L, 1L, 2L),
      ("2024-01-03", 3L, 2L, 4L)), s"got $r2")
  }
}
