package graft

import graft.SparkSuite.Sf001
import graft.streaming.StreamWau
import org.apache.spark.sql.functions._

/** The streaming WAU sketch must equal the batch evt_wau_sketch rows
  * for every day the final watermark closed — KMV is deterministic, so
  * the comparison is bit-exact, not a tolerance band. */
class StreamWauSpec extends SparkSuite {

  test("streaming WAU sketch ≡ batch evt_wau_sketch on closed days") {
    val streamed = StreamWau.runAvailableNow(spark, Sf001, "wau_equiv")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet

    // final watermark = max event time (delay 0), floored to ms; a day
    // is closed iff its end is at-or-before it
    val wmUs = (Tables.events(spark, Sf001)
      .agg(max(unix_micros(col("ts")))).head.getLong(0) / 1000L) * 1000L
    val batch = SparkEntry.queries("evt_wau_sketch")(spark, Sf001)
      .filter((unix_micros(col("day").cast("timestamp")) + 86400000000L)
        <= wmUs)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2)))
      .toSet

    assert(batch.nonEmpty, "batch produced no closed WAU rows")
    assert(streamed == batch,
      s"stream=${streamed.size} batch=${batch.size} " +
        s"onlyStream=${(streamed -- batch).take(3)} " +
        s"onlyBatch=${(batch -- streamed).take(3)}")
    // the estimate path (not just the exact-below-k branch) must be
    // exercised: the fixture has ≥ k weekly actives
    assert(batch.exists(_._2 >= graft.functions.KmvSketch.K),
      "fixture never filled the merged sketch")
  }

  test("sparse active days: gap days never emit, windows span gaps, " +
      "each day emits once across incremental checkpointed runs") {
    val sp = spark
    import sp.implicits._
    val in = java.nio.file.Files.createTempDirectory("wau_in").toString
    val ck = java.nio.file.Files.createTempDirectory("wau_ck").toString
    val out = java.nio.file.Files.createTempDirectory("wau_out").toString + "/d"

    def ts(day: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, day, 12, 0))
    def write(name: String, rows: Seq[(Long, Int)]): Unit =
      rows.map { case (u, d) => (u, ts(d)) }
        .toDF("user_id", "ts").coalesce(1)
        .write.mode("overwrite").parquet(s"$in/b/$name")
    def runOnce(): Seq[(String, Long, Double)] = {
      val stream = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP")
        .parquet(s"$in/b/*")
      val q = StreamWau.estimates(spark, stream, "0 seconds")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      try spark.read.parquet(out).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("Path does not exist") ||
               e.getMessage.contains("PATH_NOT_FOUND") ||
               e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") => Nil
      }
    }

    // days 1..5 and 7 active (day 6 is a GAP); users overlap across
    // days; an event on day 8 closes day 7 but leaves day 8 open.
    // < k distinct users per window → the sketch IS the exact distinct
    // set, so expected wau values are plain distinct counts.
    write("b1",
      (1 to 5).flatMap(d => Seq((d.toLong, d), (100L + d, d))) ++
        Seq((1L, 7), (999L, 7), (50L, 8)))
    val r1 = runOnce()
    // warm-up: min day = 1, so first emittable day is 7; day 7's
    // window [1..7] holds users {1,101,2,102,...,5,105,999} minus none
    // = 10 from days 1-5 + {1,999} → distinct = 11 (user 1 repeats)
    assert(r1.map(_._1) == Seq("2024-01-07"), s"got $r1")
    assert(r1.head._2 == 11L && r1.head._3 == 11.0, s"got $r1")

    // run 2: a far-future event closes day 8; its window [2..8] drops
    // day 1's users {1,101} but user 1 re-appears on day 7 → distinct
    // = {2..5,102..105,1,999,50} = 11; nothing re-emits
    write("b2", Seq((7L, 20)))
    val r2 = runOnce()
    assert(r2.map(_._1) == Seq("2024-01-07", "2024-01-08"), s"got $r2")
    assert(r2.last._2 == 11L && r2.last._3 == 11.0, s"got $r2")
  }
}
