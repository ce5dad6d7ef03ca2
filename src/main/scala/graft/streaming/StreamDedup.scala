package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exactly-once event dedup — the streaming twin of the batch
  * `dedup_exact` operator for at-least-once sources (kafka redeliveries,
  * replayed files): duplicate event ids arriving within the watermark
  * horizon collapse to one row, and the id state is EVICTED once the
  * watermark passes it, so state stays bounded by the horizon's event
  * rate instead of growing with the full stream history. A plain
  * `dropDuplicates` on a stream keeps every id forever — the unbounded
  * shape this operator exists to avoid.
  */
object StreamDedup {

  /** First occurrence per event_id within a 1-hour event-time horizon. */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(Seq("event_id"))
}
