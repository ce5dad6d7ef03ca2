package graft

import graft.streaming.StreamJoin

/** The stream-stream interval join must produce EXACTLY the batch
  * join_range rows: same two inputs, same time bound, one delivered as
  * two live streams with watermarks. Equivalence here is what makes
  * the streaming operator trustworthy as an incremental replacement
  * for the batch job. */
class StreamJoinSpec extends SparkSuite {

  test("stream-stream interval join ≡ batch join_range") {
    val streamed = StreamJoin
      .runAvailableNow(spark, SparkSuite.Sf001, "sj_equiv")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet
    val batch = SparkEntry.queries("join_range")(spark, SparkSuite.Sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"stream=${streamed.size} rows, batch=${batch.size} rows; " +
        s"onlyStream=${(streamed -- batch).take(3)} " +
        s"onlyBatch=${(batch -- streamed).take(3)}")
  }

  test("left-outer: unmatched clicks emit nulls only after the watermark closes them") {
    import java.nio.file.Files
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.functions._
    val sp = spark
    import sp.implicits._
    val in = Files.createTempDirectory("sjoin_in").toString
    val ck = Files.createTempDirectory("sjoin_ck").toString
    val out = Files.createTempDirectory("sjoin_out").toString + "/data"

    def ts(h: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusHours(h))
    def writeBoth(name: String, clicks: Seq[(Long, Long, Int)],
        errors: Seq[(Long, Long, Int)]): Unit = {
      clicks.map { case (u, id, h) => (u, id, ts(h)) }
        .toDF("user_id", "event_id", "ts").coalesce(1)
        .write.mode("overwrite").parquet(s"$in/clicks/$name")
      errors.map { case (u, id, h) => (u, id, ts(h)) }
        .toDF("user_id", "event_id", "ts").coalesce(1)
        .write.mode("overwrite").parquet(s"$in/errors/$name")
    }
    def drain(): Unit = {
      val schema = spark.read.parquet(s"$in/clicks/b1").schema
      def side(sub: String) =
        spark.readStream.schema(schema).parquet(s"$in/$sub/b*")
      val q = StreamJoin
        .clickErrorJoin(side("clicks"), side("errors"), "leftOuter")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // click 10 (user 1) gets an error in-window; click 20 (user 2) never does
    writeBoth("b1", clicks = Seq((1L, 10L, 0), (2L, 20L, 0)),
      errors = Seq((1L, 30L, 2)))
    drain()
    val first = spark.read.parquet(out)
    assert(first.filter(col("click_id") === 10 && col("error_id") === 30)
      .count() == 1)
    assert(first.filter(col("click_id") === 20).count() == 0,
      "unmatched click emitted before the watermark could prove it unmatched")

    // events far past the horizon advance the watermark → click 20 closes
    writeBoth("b2", clicks = Seq((9L, 90L, 24 * 7)),
      errors = Seq((9L, 91L, 24 * 7)))
    drain()
    val second = spark.read.parquet(out)
    val unmatched = second.filter(col("click_id") === 20)
    assert(unmatched.count() == 1)
    assert(unmatched.head().isNullAt(2), "error_id must be null")
  }

  test("the join plan carries watermarks on both sides") {
    val sp = spark
    val df = StreamJoin.clickErrorJoin(
      sp.readStream.format("rate").load()
        .selectExpr("value AS user_id", "value AS event_id",
          "timestamp AS ts"),
      sp.readStream.format("rate").load()
        .selectExpr("value AS user_id", "value AS event_id",
          "timestamp AS ts"))
    val plan = df.queryExecution.logical.toString
    assert(plan.contains("EventTimeWatermark"), plan.take(600))
  }
}
