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
