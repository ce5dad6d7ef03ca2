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

  test("evt_cum_users: growth-curve invariants hold on sf0.001") {
    val rows = SparkEntry.queries("evt_cum_users")(spark, SparkSuite.Sf0001)
      .collect()
    assert(rows.nonEmpty)
    // cumulative = running Σ new_users, monotone non-decreasing,
    // dau never exceeds the base seen so far, and the final value is
    // the corpus-wide distinct-user count
    var run = 0L
    rows.foreach { r =>
      run += r.getLong(2)
      assert(r.getLong(3) == run, s"cum != running sum on ${r.getDate(0)}")
      assert(r.getLong(1) <= run, "dau exceeds cumulative base")
    }
    val total = Tables.events(spark, SparkSuite.Sf0001)
      .select("user_id").distinct().count()
    assert(rows.last.getLong(3) == total)
    // day 1: everyone active is new
    assert(rows.head.getLong(1) == rows.head.getLong(2))
  }
}
