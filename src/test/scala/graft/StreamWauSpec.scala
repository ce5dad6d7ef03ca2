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
}
