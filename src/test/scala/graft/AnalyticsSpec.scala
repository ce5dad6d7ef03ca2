package graft

import org.apache.spark.sql.functions._

/** In-JVM brute-force twins for the event-analytics kernels whose
  * correctness hinges on frame semantics (the DuckDB oracle shares the
  * window formulation, so an independent sequential replay is the
  * stronger check). */
class AnalyticsSpec extends SparkSuite {

  test("evt_attribution ≡ sequential replay on sf0.001") {
    val out = SparkEntry.queries("evt_attribution")(
      spark, SparkSuite.Sf0001).collect()
    assert(out.nonEmpty)
    // reference: per user, walk events in (us, event_id) order keeping
    // running first/last click BEFORE the current row
    val ev = Tables.events(spark, SparkSuite.Sf0001)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val want = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      var first: Option[Long] = None
      var last: Option[Long] = None
      rows.sortBy(r => (r._4, r._2)).flatMap { case (u, id, typ, us) =>
        val row = if (typ == "purchase")
          Some((u, id) -> (us, first, last, last.map(us - _)))
        else None
        if (typ == "click") {
          if (first.isEmpty) first = Some(us)
          last = Some(us)
        }
        row
      }
    }.toMap
    def opt(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    val got = out.map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), opt(r, 3), opt(r, 4), opt(r, 5))).toMap
    assert(got == want, s"got ${got.size} purchases, want ${want.size}")
  }
}
