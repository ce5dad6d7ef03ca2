package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal

/** Semantics pins for the composed temporal joins: backward-inclusive
  * as-of matching and half-open interval overlap, on fixtures small
  * enough to enumerate by hand. */
class TemporalSpec extends SparkSuite {

  private def asOfOn(rows: Seq[(Long, Long, String)],
                     rights: Seq[(Long, Long, Double)]) = {
    val sp = spark
    import sp.implicits._
    val left = rows.toDF("k", "ts", "tag")
    val right = rights.toDF("k", "ts", "v")
    Temporal.asOf(left, right, Seq("k"), "ts", Seq("v"))
      .orderBy("k", "ts", "tag")
      .collect()
      .map(r => (r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4)))
      .toSeq
  }

  test("asOf: backward inclusive, per key, null before the first right row") {
    val out = asOfOn(
      rows = Seq((1L, 5L, "before"), (1L, 10L, "at"), (1L, 17L, "between"),
        (1L, 30L, "after"), (2L, 99L, "other-key")),
      rights = Seq((1L, 10L, 1.5), (1L, 20L, 2.5)))
    assert(out == Seq(
      ("before", -1L, -1.0),    // no right row at-or-before ts=5
      ("at", 10L, 1.5),         // inclusive: ts == right ts matches
      ("between", 10L, 1.5),
      ("after", 20L, 2.5),
      ("other-key", -1L, -1.0)  // key 2 has no right rows at all
    ))
  }

  test("asOf tolerance: stale matches null out, fresh ones survive") {
    val sp = spark
    import sp.implicits._
    val left = Seq((1L, 100L, "fresh"), (1L, 500L, "stale")).toDF("k", "ts", "tag")
    val right = Seq((1L, 90L, 7.0)).toDF("k", "ts", "v")
    val out = Temporal.asOf(left, right, Seq("k"), "ts", Seq("v"),
        tolerance = Some(50L))
      .orderBy("ts").collect()
    assert(out(0).getString(2) == "fresh" && out(0).getDouble(4) == 7.0)
    assert(out(1).getString(2) == "stale" && out(1).isNullAt(3) &&
      out(1).isNullAt(4))
  }

  test("join_asof_tol: 1-day budget populates both outcomes, and every " +
      "null-out agrees with the unbounded twin") {
    val tol = SparkEntry.queries("join_asof_tol")(spark, SparkSuite.Sf0001)
      .collect()
    val unb = SparkEntry.queries("join_asof")(spark, SparkSuite.Sf0001)
      .collect()
    assert(tol.length == unb.length)
    val fresh = tol.count(!_.isNullAt(3))
    assert(fresh > 0 && fresh < tol.length,
      s"tolerance does not discriminate: $fresh/${tol.length} fresh")
    // row-aligned (same total order): a kept match is bit-identical to
    // the unbounded join's; a nulled one was a match OLDER than 1 day
    // (or no match at all) there
    tol.zip(unb).foreach { case (t, u) =>
      assert(t.getLong(1) == u.getLong(1))
      if (!t.isNullAt(3)) assert(t.getLong(3) == u.getLong(3) &&
        t.getLong(2) - t.getLong(3) <= 86400000000L)
      else assert(u.isNullAt(3) ||
        u.getLong(2) - u.getLong(3) > 86400000000L)
    }
  }

  test("asOfForward: earliest at-or-after, inclusive, tolerance-bounded") {
    val sp = spark
    import sp.implicits._
    val left = Seq((1L, 5L, "early"), (1L, 10L, "at"), (1L, 25L, "late"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, 1.5), (1L, 20L, 2.5)).toDF("k", "ts", "v")
    val out = Temporal.asOfForward(left, right, Seq("k"), "ts", Seq("v"))
      .orderBy("ts").collect()
      .map(r => (r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4))).toSeq
    assert(out == Seq(
      ("early", 10L, 1.5), // next right row at ts=10
      ("at", 10L, 1.5),    // inclusive at equality
      ("late", -1L, -1.0)  // nothing after ts=25
    ))
    // tolerance: the match at ts=10 is 5 ahead of 'early' — a bound of 3
    // nulls it, 'at' (distance 0) survives
    val tight = Temporal.asOfForward(left, right, Seq("k"), "ts", Seq("v"),
        tolerance = Some(3L))
      .orderBy("ts").collect()
    assert(tight(0).isNullAt(3) && tight(0).isNullAt(4))
    assert(tight(1).getLong(3) == 10L)
  }

  test("pointInInterval: half-open bounds, bucket-straddling intervals match") {
    val sp = spark
    import sp.implicits._
    // width 100; interval [95, 195) straddles buckets 0 and 1 — points in
    // either bucket must match exactly once
    val iv = Seq((1L, 10L, 95L, 195L)).toDF("k", "iv_id", "lo", "hi")
    val pts = Seq(
      (1L, 1L, 94L),   // before start → no
      (1L, 2L, 95L),   // at start (inclusive) → yes, bucket 0
      (1L, 3L, 150L),  // inside, bucket 1 → yes
      (1L, 4L, 194L),  // last inside → yes
      (1L, 5L, 195L),  // at end (exclusive) → no
      (2L, 6L, 150L)   // wrong key → no
    ).toDF("k", "pt_id", "pt")
    val got = Temporal.pointInInterval(iv, pts, Seq("k"), "lo", "hi", "pt", 100L)
      .select("pt_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(2L, 3L, 4L))
  }

  test("asOf assertUniqueRight: duplicate (key, ts) right rows raise") {
    val sp = spark
    import sp.implicits._
    val left = Seq((1L, 10L, "x")).toDF("k", "ts", "tag")
    val dup = Seq((1L, 5L, 1.0), (1L, 5L, 2.0)).toDF("k", "ts", "v")
    val e = intercept[Exception] {
      Temporal.asOf(left, dup, Seq("k"), "ts", Seq("v"),
        assertUniqueRight = true).collect()
    }
    assert(e.getMessage.contains("not unique"), e.getMessage)
    // unique rights pass the check unchanged
    val ok = Seq((1L, 5L, 1.0), (1L, 6L, 2.0)).toDF("k", "ts", "v")
    val out = Temporal.asOf(left, ok, Seq("k"), "ts", Seq("v"),
      assertUniqueRight = true).collect()
    assert(out.length == 1 && out(0).getLong(3) == 6L)
  }

  test("pointInInterval: an interval longer than the bucket width raises") {
    val sp = spark
    import sp.implicits._
    // [0, 350) at width 100 spans 4 buckets — over the default cap of 2;
    // the plan must raise instead of silently exploding the sequence
    val iv = Seq((1L, 10L, 0L, 350L)).toDF("k", "iv_id", "lo", "hi")
    val pts = Seq((1L, 1L, 50L)).toDF("k", "pt_id", "pt")
    val e = intercept[Exception] {
      Temporal.pointInInterval(iv, pts, Seq("k"), "lo", "hi", "pt", 100L)
        .collect()
    }
    assert(e.getMessage.contains("bucket"), e.getMessage)
    // raising the knob makes the same interval legal — and still exact
    val got = Temporal.pointInInterval(iv, pts, Seq("k"), "lo", "hi", "pt",
        100L, maxBucketsPerInterval = 4)
      .select("pt_id").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }

  test("ts_gapfill: dense grid, observed days match raw, fill is last value") {
    val raw = SparkEntry.queries("ts_gapfill")(spark, SparkSuite.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getBoolean(3)))
    assert(raw.nonEmpty)
    raw.groupBy(_._1).foreach { case (u, rows) =>
      val days = rows.map(_._2).sorted
      // the grid is DENSE: every day between min and max present once
      assert(days.toSeq == (days.min to days.max).toSeq, s"user $u grid has gaps")
      // forward fill: an unobserved day carries the previous day's value
      val byDay = rows.map(r => r._2 -> r).toMap
      rows.filter(!_._4).foreach { case (_, day, v, _) =>
        assert(byDay(day - 1)._3 == v,
          s"user $u day $day: fill $v != prev ${byDay(day - 1)._3}")
      }
    }
  }

  test("scd2_history: runs collapse, intervals chain, one current per key") {
    val hist = SparkEntry.queries("scd2_history")(spark, SparkSuite.Sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getBoolean(5)))
    assert(hist.nonEmpty)
    hist.groupBy(_._1).foreach { case (u, rows) =>
      val sorted = rows.sortBy(_._2)
      // versions are 1..n
      assert(sorted.map(_._2).toSeq == (1 to sorted.length).toSeq)
      // consecutive versions never repeat a state (runs collapsed)…
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 != b._3 || a._4 == b._4,
          s"user $u: consecutive versions with same state ${a._3}")
        case _ => ()
      }
      // …and intervals chain: valid_to == next valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 == b._4,
          s"user $u v${a._2}: valid_to ${a._5} != next valid_from ${b._4}")
        case _ => ()
      }
      // exactly one open (current) version, and it is the last
      assert(sorted.count(_._6) == 1 && sorted.last._6)
      assert(sorted.last._5 == -1L)
    }
  }

  test("cdc_apply: deletes drop keys, re-inserts flag as changelog, " +
      "survivors carry the latest upsert") {
    val snap = SparkEntry.queries("cdc_apply")(spark, SparkSuite.Sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3), r.getBoolean(4)))
    assert(snap.nonEmpty)
    // one row per key, never a delete state
    assert(snap.map(_._1).distinct.length == snap.length)
    assert(snap.forall(_._2 != "error"))
    // replay the log in-JVM: last op per user decides
    val log = operators.Temporal.queries.find(_.name == "cdc_apply").get
    val ev = Tables.events(spark, SparkSuite.Sf0001)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("value"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(4)))
    val expect = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val last = rows.maxBy(r => (r._3, r._2, r._5, r._4))
      if (last._5 == "error") None
      else Some((u, last._5, last._4, last._3))
    }.toSet
    assert(snap.map(t => (t._1, t._2, t._3, t._4)).toSet == expect)
    // provenance flag is exactly "updated at-or-after the cutoff" (this
    // dense fixture puts every user in the changelog; the sf0.01 oracle
    // run exercises the FULL JOIN's base-only branch too)
    val cut = 1706572800000000L
    assert(snap.forall(t => t._5 == (t._4 >= cut)))
    assert(log.oracle.isDefined)
  }

  test("scd2_snapshot: every day-close row sits inside the " +
      "scd2_history interval that contains its probe") {
    val hist = SparkEntry.queries("scd2_history")(spark, SparkSuite.Sf0001)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) Long.MaxValue else r.getLong(4)))
    val snap = SparkEntry.queries("scd2_snapshot")(spark, SparkSuite.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    assert(snap.nonEmpty)
    val byUser = hist.groupBy(_._1)
    snap.foreach { case (u, day, state, since) =>
      val probe = (day + 1) * 86400000000L - 1
      val covering = byUser(u).filter(h => h._3 <= probe && probe < h._4)
      // zero-width versions (same-us ties) never cover a probe; exactly
      // one real interval does, and the snapshot must read it
      assert(covering.length == 1, s"user $u day $day: ${covering.length}")
      assert(covering.head._2 == state && covering.head._3 == since,
        s"user $u day $day: snapshot ($state, $since) vs ${covering.head}")
    }
    // grid is dense: per user, days run min..max with no holes
    snap.groupBy(_._1).foreach { case (u, rows) =>
      val days = rows.map(_._2).sorted.toSeq
      assert(days == (days.head to days.last).toSeq,
        s"user $u: snapshot grid has holes")
    }
  }

  test("join_asof_near: every error takes its truly closest click, " +
      "ties to the earlier side") {
    val out = SparkEntry.queries("join_asof_near")(spark, SparkSuite.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(5)) None else Some(r.getString(5))))
    assert(out.nonEmpty)
    val ev = Tables.events(spark, SparkSuite.Sf0001)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val clicksBy = ev.filter(_._2 == "click").groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(_._3).sorted }
    var sawB = 0; var sawF = 0
    out.foreach { case (u, id, us, near, dir) =>
      clicksBy.get(u) match {
        case None => assert(near.isEmpty && dir.isEmpty, s"err $id: no clicks")
        case Some(cs) =>
          val best = cs.minBy(c => (math.abs(c - us), c))
          // min distance with tie to the earlier click == the query's
          // backward-wins-on-tie rule
          assert(near.contains(best), s"err $id: ${near} vs $best")
          val d = dir.get
          if (d == "b") { sawB += 1; assert(best <= us) }
          else { sawF += 1; assert(best > us) }
      }
    }
    assert(sawB > 0 && sawF > 0, "fixture never exercised one direction")
  }

  test("scd2_incremental ≡ scd2_history row-for-row (the merge is " +
      "indistinguishable from a full rebuild), drop path exercised") {
    def rows(q: String) = SparkEntry.queries(q)(spark, SparkSuite.Sf001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getBoolean(5))).toSeq
    val inc = rows("scd2_incremental")
    val full = rows("scd2_history")
    assert(inc == full, "incremental merge diverges from full rebuild")
    // non-vacuity, replayed from the raw stream: at least one user has
    // batch-period versions, and at least one user's first batch event
    // repeats their open state (the drop path)
    val ev = Tables.events(spark, SparkSuite.Sf001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val cut = (ev.map(_._2).min + ev.map(_._2).max) / 2
    assert(full.exists(_._4 >= cut), "no batch-period versions — vacuous")
    val dropUsers = ev.groupBy(_._1).count { case (_, es) =>
      val sorted = es.sortBy(e => (e._2, e._3, e._4))
      val (pre, post) = sorted.partition(_._2 < cut)
      pre.nonEmpty && post.nonEmpty && {
        val openState = pre.foldLeft(List.empty[String]) { (acc, e) =>
          if (acc.headOption.contains(e._4)) acc else e._4 :: acc
        }.head
        post.head._4 == openState
      }
    }
    assert(dropUsers >= 1, "no leading batch state equals an open " +
      "state — the dedup-at-the-boundary path is untested")
  }

  test("plans: asOf has no join at all; range join never nested-loops") {
    val asofPlan = SparkEntry.queries("join_asof")(spark, SparkSuite.Sf001)
      .queryExecution.executedPlan.toString
    assert(!asofPlan.contains("Join"),
      "as-of must be the union+window shape, not a join:\n" + asofPlan.take(600))
    val rangePlan = SparkEntry.queries("join_range")(spark, SparkSuite.Sf001)
      .queryExecution.executedPlan.toString
    assert(!rangePlan.contains("CartesianProduct") &&
      !rangePlan.contains("BroadcastNestedLoopJoin"), rangePlan.take(600))
    assert(rangePlan.contains("Join"), "range join lost its equi-join")
  }
}
