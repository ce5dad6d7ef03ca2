package graft

import org.apache.spark.sql.functions._
import graft.functions.KmvSketch

/** KMV sketch pins: the bounded-state aggregator must equal the
  * window-form query bit-for-bit (same hash, same estimator), stay
  * exact below k distinct values, and land near the true cardinality
  * on real data. */
class SketchSpec extends SparkSuite {

  test("aggregator ≡ window-form query, fed RAW duplicated rows") {
    val sp = spark
    import sp.implicits._
    // raw events (duplicate users galore) through the aggregator…
    val agg = Tables.events(spark, SparkSuite.Sf001)
      .select(col("event_type"), col("user_id").cast("string").as("u"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(KmvSketch.toColumn.name("kmv_est"))
      .collect().toMap
    // …must equal the oracled window form exactly (same doubles)
    val q = SparkEntry.queries("sketch_kmv_distinct")(spark, SparkSuite.Sf001)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(q.nonEmpty)
    q.foreach { case (et, est) =>
      assert(agg(et) == est, s"$et: aggregator ${agg(et)} != query $est")
    }
  }

  test("two-stage KmvState → KmvUnion rollup ≡ the evt_wau_sketch " +
      "window twin, fed raw duplicated events") {
    import graft.functions.{KmvState, KmvUnion}
    val sp = spark
    import sp.implicits._
    // stage 1: one bounded sketch per day from RAW user ids
    val daily = Tables.events(spark, SparkSuite.Sf001)
      .select(col("ts").cast("date").cast("string").as("day"),
        col("user_id").cast("string").as("u"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(KmvState.toColumn.name("sk"))
    // stage 2: each day's sketch contributes to the 7 trailing windows
    // it falls inside; one merge per output day
    val est = daily.flatMap { case (day, sk) =>
        val d0 = java.time.LocalDate.parse(day)
        (0 to 6).map(i => (d0.plusDays(i).toString, sk))
      }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(KmvUnion.toColumn.name("wau"))
      .collect().toMap
    val q = SparkEntry.queries("evt_wau_sketch")(spark, SparkSuite.Sf001)
      .collect().map(r => r.getDate(0).toString -> r.getDouble(2)).toMap
    assert(q.nonEmpty)
    q.foreach { case (day, v) =>
      assert(est(day) == v, s"$day: aggregator ${est(day)} != query $v")
    }
  }

  test("sketch WAU tracks the exact evt_dau_wau within KMV error") {
    // k=32 ⇒ expected relative error ≈ 1/√30 ≈ 18%; deterministic on
    // the fixture (no random seed anywhere), so pin both the mean and
    // a generous per-day worst case
    val exact = SparkEntry.queries("evt_dau_wau")(spark, SparkSuite.Sf001)
      .collect().map(r => r.getDate(0).toString -> r.getLong(2)).toMap
    val est = SparkEntry.queries("evt_wau_sketch")(spark, SparkSuite.Sf001)
      .collect().map(r => r.getDate(0).toString -> r.getDouble(2)).toMap
    assert(est.keySet == exact.keySet,
      s"day sets diverge: ${est.keySet.diff(exact.keySet)} / " +
        s"${exact.keySet.diff(est.keySet)}")
    val relErrs = exact.map { case (day, w) =>
      math.abs(est(day) - w) / w.toDouble
    }
    assert(relErrs.max < 0.6,
      s"worst-day relative error ${relErrs.max} exceeds the KMV band")
    assert(relErrs.sum / relErrs.size < 0.25,
      s"mean relative error ${relErrs.sum / relErrs.size} exceeds the KMV band")
  }

  test("below k distinct values the sketch is exact") {
    val vals = (1 to 10).map(i => s"v$i")
    val buf = vals.foldLeft(KmvSketch.zero)(KmvSketch.reduce)
    assert(KmvSketch.finish(buf) == 10.0)
    // duplicates must not inflate it
    val buf2 = (vals ++ vals).foldLeft(KmvSketch.zero)(KmvSketch.reduce)
    assert(KmvSketch.finish(buf2) == 10.0)
  }

  test("merge is order-insensitive and cap-respecting") {
    val a = (1 to 100).map(i => s"a$i").foldLeft(KmvSketch.zero)(KmvSketch.reduce)
    val b = (1 to 100).map(i => s"b$i").foldLeft(KmvSketch.zero)(KmvSketch.reduce)
    val ab = KmvSketch.merge(a, b)
    val ba = KmvSketch.merge(b, a)
    assert(ab == ba)
    assert(ab.size == KmvSketch.K)
    assert(ab == ab.sorted && ab.distinct == ab)
  }

  test("bottom-k sample aggregator ≡ the window-form quantile twin") {
    val sp = spark
    import sp.implicits._
    val samples = Tables.events(spark, SparkSuite.Sf001)
      .select(col("event_type"), col("event_id").cast("string"), col("value"))
      .as[(String, String, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(graft.functions.BottomKSample.toColumn.name("sample"))
      .collect().toMap
    val q = SparkEntry.queries("sketch_quantile")(spark, SparkSuite.Sf001)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(4), r.getDouble(5))).toMap
    assert(q.nonEmpty)
    q.foreach { case (et, (p50, p90)) =>
      val s = samples(et)
      assert(graft.functions.BottomKSample.quantile(s, 0.5) == p50,
        s"$et p50: sample says ${graft.functions.BottomKSample.quantile(s, 0.5)}, query $p50")
      assert(graft.functions.BottomKSample.quantile(s, 0.9) == p90)
    }
    // the sketch must bracket the exact quantile reasonably on real data
    val exact = SparkEntry.queries("sketch_quantile")(spark, SparkSuite.Sf001)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    q.foreach { case (et, (p50, _)) =>
      assert(math.abs(p50 - exact(et)) <= math.abs(exact(et)) * 0.5 + 1.0,
        s"$et: p50 est $p50 vs exact ${exact(et)}")
    }
  }

  test("bottom-k sample: duplicate keys with different values merge " +
      "order-independently") {
    import graft.functions.BottomKSample
    // the same key carrying two different values: a hash-only insert key
    // would keep whichever value each partition saw first, making the
    // merged sample partition-order dependent
    val dupA = ("k1", 1.0); val dupB = ("k1", 2.0)
    val rest = (1 to 80).map(i => (s"r$i", i.toDouble))
    val b1 = (dupA +: rest).foldLeft(BottomKSample.zero)(BottomKSample.reduce)
    val b2 = (dupB +: rest.reverse)
      .foldLeft(BottomKSample.zero)(BottomKSample.reduce)
    assert(BottomKSample.finish(BottomKSample.merge(b1, b2)) ==
      BottomKSample.finish(BottomKSample.merge(b2, b1)))
    // exact duplicate (key, value) pairs still collapse to one entry
    val c1 = Seq(dupA, dupA, dupA).foldLeft(BottomKSample.zero)(BottomKSample.reduce)
    assert(BottomKSample.finish(c1) == Seq(1.0))
  }

  test("Misra-Gries: superset + error bound vs exact counts, synthetic") {
    import graft.functions.FreqSketch
    val rnd = new scala.util.Random(42)
    // Zipf-ish stream: a few hot items over a long tail of 5000 keys
    val stream = Seq.fill(2000)("hot1") ++ Seq.fill(1200)("hot2") ++
      Seq.fill(400)("warm") ++ Seq.fill(20000)(s"cold${rnd.nextInt(5000)}")
    val shuffled = rnd.shuffle(stream)
    val n = shuffled.size.toLong
    val exact = shuffled.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bar = n / (FreqSketch.K + 1)
    // single-pass reduce AND chunked reduce+merge must both honor the
    // guarantee (content may differ within the band — that's the trade)
    val direct = shuffled.foldLeft(FreqSketch.zero)(FreqSketch.reduce)
    val merged = shuffled.grouped(1000)
      .map(_.foldLeft(FreqSketch.zero)(FreqSketch.reduce))
      .reduce(FreqSketch.merge)
    for (sk <- Seq(direct, merged)) {
      assert(sk.size <= FreqSketch.K)
      exact.foreach { case (k, f) =>
        if (f > bar)
          assert(sk.contains(k), s"item $k freq $f > bar $bar missing")
      }
      sk.foreach { case (k, est) =>
        val f = exact.getOrElse(k, 0L)
        assert(est <= f, s"$k overestimated: $est > $f")
        assert(est >= f - bar, s"$k underestimated beyond bound: $est < $f - $bar")
      }
    }
  }

  test("Misra-Gries contains every sketch_heavyhitters answer on real data") {
    import graft.functions.FreqSketch
    val sp = spark
    import sp.implicits._
    val toks = Tables.documents(spark, SparkSuite.Sf0001)
      .select(explode(filter(split(col("text"), " "), t => t =!= "")).as("term"))
      .as[String]
    // one global group, many partitions: exercises Spark's merge path
    val sketch = toks.groupByKey(_ => 1)
      .agg(FreqSketch.toColumn.name("sk")).collect().head._2
    val hh = SparkEntry.queries("sketch_heavyhitters")(spark, SparkSuite.Sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(hh.nonEmpty, "no heavy hitters in the fixture corpus")
    hh.foreach { case (term, cnt) =>
      assert(sketch.contains(term),
        s"heavy hitter '$term' (cnt $cnt) missing from the sketch")
      assert(sketch(term) <= cnt)
    }
  }

  test("estimate lands within 50% of the true cardinality") {
    val rows = SparkEntry.queries("sketch_kmv_distinct")(spark, SparkSuite.Sf001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val est = r.getDouble(2)
      assert(est > exact * 0.5 && est < exact * 1.5,
        s"${r.getString(0)}: est $est vs exact $exact")
    }
  }

  // ── KMV intersection ───────────────────────────────────────────────

  /** The production intersection estimator from two O(k) sketches —
    * the form sketch_kmv_intersect's window twin oracles. Membership of
    * a union-sketch hash in a side's SKETCH is exact set membership: if
    * h ∈ A and h is among the k smallest of A∪B, fewer than k union
    * hashes are smaller, so fewer than k of A's are — h is in A's
    * bottom-k. */
  private def intersectEst(skA: List[String], skB: List[String]): Double = {
    import graft.functions.{KmvSketch, KmvUnion}
    val u = KmvUnion.reduce(skA, skB)
    val c = u.count(h => skA.contains(h) && skB.contains(h))
    c.toDouble * KmvSketch.finish(u) / math.min(KmvSketch.K, u.size)
  }

  test("two per-week KmvState sketches reproduce sketch_kmv_intersect's " +
      "estimate bit-for-bit, fed raw duplicated events") {
    import graft.functions.KmvState
    val sp = spark
    import sp.implicits._
    val weekly = Tables.events(spark, SparkSuite.Sf001)
      .select(expr("datediff(cast(ts as date), DATE'1970-01-01') div 7")
        .as("wk"), col("user_id").cast("string").as("u"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(KmvState.toColumn.name("sk"))
      .collect().toMap
    val q = SparkEntry.queries("sketch_kmv_intersect")(spark, SparkSuite.Sf001)
      .collect().map(r => r.getLong(0) -> r.getDouble(6)).toMap
    assert(q.nonEmpty, "no consecutive week pairs in the fixture")
    q.foreach { case (w, est) =>
      val own = intersectEst(weekly(w), weekly(w + 1))
      assert(own == est, s"week $w: sketches $own != query $est")
    }
  }

  test("below k the intersection estimate IS the exact overlap (sf0.001)") {
    val rows = SparkEntry.queries("sketch_kmv_intersect")(
      spark, SparkSuite.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(4) < graft.functions.KmvSketch.K,
        s"fixture outgrew the exact branch: ${r.getLong(4)} union users")
      assert(r.getDouble(6) == r.getLong(3).toDouble,
        s"week ${r.getLong(0)}: est ${r.getDouble(6)} != " +
          s"exact ${r.getLong(3)}")
    }
  }

  test("partial-overlap corpus: intersection estimates usable per pair, " +
      "unbiased-ish in the mean (8 disjoint 600-union / 200-shared pairs)") {
    // 8 independent week pairs, each |A|=|B|=400, |A∩B|=200,
    // |A∪B|=600 ≫ k=32, disjoint user universes, weeks strided by 3 so
    // no cross-pair week is consecutive. The md5 draw is deterministic
    // — a SINGLE pair's (k−1)/u_k union estimate has a heavy right
    // tail (pair 0 here lands at 430), so the per-pair bound is
    // order-of-magnitude (×3 either way) and the tighter claim is on
    // the 8-pair mean (lands at 265; bound ±35% allows the estimator's
    // skew, not arbitrary garbage).
    val sp = spark
    import sp.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("kmvint").toString
    val dayNs = 86400L * 1000000000L
    val w0 = 3000L // an arbitrary epoch week
    val rows = (0 until 8).flatMap { i =>
      val (w, base) = (w0 + 3L * i, i * 1000L)
      (0L until 400L).map(u => (w * 7 * dayNs, base + u)) ++
        (200L until 600L).map(u => ((w + 1) * 7 * dayNs, base + u))
    }
    rows.toDF("ts", "user_id").write.mode("overwrite")
      .parquet(s"$tmp/events.parquet")
    val out = SparkEntry.queries("sketch_kmv_intersect")(spark, tmp)
      .collect()
    assert(out.length == 8, s"want 8 pairs, got:\n${out.mkString("\n")}")
    out.foreach { r =>
      assert(r.getLong(1) == 400 && r.getLong(2) == 400 &&
        r.getLong(3) == 200 && r.getLong(4) == 600, r.toString)
      val est = r.getDouble(6)
      assert(est > 200.0 / 3 && est < 200.0 * 3,
        s"week ${r.getLong(0)}: estimate $est out of order-of-magnitude")
    }
    val mean = out.map(_.getDouble(6)).sum / out.length
    assert(math.abs(mean - 200.0) <= 70.0,
      s"8-pair mean estimate $mean too far from 200")
  }

  test("agg_incremental_merge: the epoch cut genuinely splits days, " +
      "and estimates are sane vs exact distinct") {
    import org.apache.spark.sql.functions._
    // the merge only proves mergeability if base and delta both carry
    // rows for the SAME days — a day-aligned cut would reduce it to a
    // trivial disjoint union
    val parts = Tables.orders(spark, SparkSuite.Sf001)
      .select(to_date(col("o_orderdate")).as("day"),
        (col("o_orderkey") % 4 === 0).as("delta"))
      .groupBy("day").agg(countDistinct("delta").as("n"))
    val days = parts.count()
    assert(parts.filter(col("n") === 2).count() > days / 2,
      "epoch cut is day-aligned — merge degenerates to disjoint union")
    // estimates: exact below K (the common case at sf0.001), and never
    // absurd above it
    val exact = Tables.orders(spark, SparkSuite.Sf001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(countDistinct("o_custkey").as("nd"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    SparkEntry.queries("agg_incremental_merge")(spark, SparkSuite.Sf001)
      .collect().foreach { r =>
        val (day, est) = (r.getDate(0).toString, r.getDouble(3))
        exact.get(day).foreach { nd =>
          if (nd < 32) assert(est == nd.toDouble, s"$day: $est != exact $nd")
          else assert(est > nd / 3.0 && est < nd * 3.0,
            s"$day: estimate $est wild vs exact $nd")
        }
      }
  }

  test("sketch_cms: one-sided error (est ≥ exact, every probe key) and " +
      "within the d=4/w=64 expectation bound") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("sketch_cms")(spark, SparkSuite.Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.length == 20)
    val n = Tables.events(spark, SparkSuite.Sf001).count()
    out.foreach { case (uid, exact, est, over) =>
      assert(est >= exact, s"user $uid: CMS UNDERcounted $est < $exact")
      assert(over == est - exact, s"user $uid: overcount ledger wrong")
      // E[over] ≤ N/64 per row before the min-of-4; 8× headroom keeps
      // the assertion meaningful without being flaky on collisions
      assert(over <= n / 8,
        s"user $uid: overcount $over implausible for N=$n, w=64")
    }
  }

  test("sketch_cms counters MERGE: per-epoch matrices add to the full " +
      "matrix (the map-side-combine law)") {
    import org.apache.spark.sql.functions._
    // rebuild the counter matrix independently, split by an epoch cut,
    // and check cell-wise addition — CMS's mergeability is linearity
    // of the counters, the property that lets 1000 executors build
    // partial matrices and a reduce add them
    def counters(filter: org.apache.spark.sql.Column): Map[(Int, Long), Long] =
      Tables.events(spark, SparkSuite.Sf001)
        .filter(filter)
        .select(explode(array((0 to 3).map(r => struct(lit(r).as("r"),
          (conv(substring(md5(concat(lit(s"cms$r#"),
            col("user_id").cast("string"))), 1, 13), 16, 10)
            .cast("long") % 64).as("b"))): _*)).as("rb"))
        .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
        .agg(count(lit(1)).as("c"))
        .collect().map(x => (x.getInt(0), x.getLong(1)) -> x.getLong(2))
        .toMap
    val full = counters(lit(true))
    val a = counters(col("event_id") % 2 === 0)
    val b = counters(col("event_id") % 2 =!= 0)
    assert(a.nonEmpty && b.nonEmpty, "epoch cut degenerate")
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == full, "per-epoch CMS matrices do not add to the full")
  }

  test("sketch_hll: estimate within the m=64 error regime of the exact " +
      "count, ledger columns consistent") {
    val out = SparkEntry.queries("sketch_hll")(spark, SparkSuite.Sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.nonEmpty)
    out.foreach { case (et, exact, vZero, sScaled, est) =>
      // Σ 2^(50-M) over 64 registers: at least 64·2^3 (all registers at
      // the rho cap 47), at most 64·2^50 (all empty)
      assert(sScaled >= 64L * 8 && sScaled <= (64L << 50),
        s"$et: s_scaled $sScaled outside the register range")
      assert(vZero >= 0 && vZero <= 64)
      // relative error: σ ≈ 1.04/√64 = 13%; allow 3σ ≈ 40% (and only
      // trust the raw estimate where linear counting wouldn't fire)
      if (vZero == 0 && exact > 160)
        assert(math.abs(est - exact) / exact < 0.4,
          s"$et: HLL est $est vs exact $exact drifted > 40%")
    }
  }

  test("sketch_hll registers MERGE: per-epoch register vectors fold by " +
      "MAX into the full-corpus registers bit-for-bit") {
    import org.apache.spark.sql.functions._
    // the HLL merge law — registers of any corpus split combine by
    // element-wise max; this is what lets 1000 executors sketch shards
    // independently and a reduce fold 64 small ints per group
    def regs(filter: org.apache.spark.sql.Column): Map[(String, Long), Int] =
      Tables.events(spark, SparkSuite.Sf001)
        .filter(filter)
        .select("event_type", "user_id").distinct()
        .select(col("event_type"),
          conv(substring(md5(col("user_id").cast("string")), 1, 13), 16, 10)
            .cast("long").as("h52"))
        .select(col("event_type"), (col("h52") % 64).as("b"),
          when(expr("h52 div 64") === 0, lit(47))
            .otherwise(lit(47) - length(bin(expr("h52 div 64")))).as("rho"))
        .groupBy("event_type", "b").agg(max("rho").as("m"))
        .collect().map(x => (x.getString(0), x.getLong(1)) -> x.getInt(2))
        .toMap
    val full = regs(lit(true))
    val a = regs(col("user_id") % 2 === 0)
    val b = regs(col("user_id") % 2 =!= 0)
    assert(a.nonEmpty && b.nonEmpty, "epoch cut degenerate")
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> math.max(a.getOrElse(k, 0), b.getOrElse(k, 0))).toMap
    assert(merged == full, "per-epoch HLL registers do not MAX-fold " +
      "to the full-corpus registers")
  }

  test("evt_wau_hll: row-aligned with the KMV form, estimate within " +
      "HLL error of exact trailing-7-day actives, daily registers " +
      "MAX-fold into each window") {
    val hll = SparkEntry.queries("evt_wau_hll")(spark, SparkSuite.Sf001)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val kmv = SparkEntry.queries("evt_wau_sketch")(spark, SparkSuite.Sf001)
      .collect().map(_.getDate(0).toString).toSet
    assert(hll.keySet == kmv, "the three WAU forms must be row-aligned")

    // exact trailing-7-day actives per output day
    val ud = Tables.events(spark, SparkSuite.Sf001)
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("1970-01-01")).as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getInt(1)))
    val errs = hll.map { case (day, (vZero, sScaled, est)) =>
      val d = java.time.LocalDate.parse(day).toEpochDay
      val exact = ud.filter(p => p._2 >= d - 6 && p._2 <= d)
        .map(_._1).distinct.length
      assert(est > 0 && sScaled > 0 && vZero >= 0 && vZero <= 64)
      math.abs(est - exact) / exact
    }
    // m=64 raw HLL has ~13% standard error; allow 3 sigma on the mean
    assert(errs.sum / errs.size < 0.40,
      f"mean HLL relative error ${errs.sum / errs.size}%.3f")

    // register linearity on one window: per-day registers MAX-fold to
    // the window's s_scaled for the LAST output day
    val lastDay = hll.keySet.max
    val d1 = java.time.LocalDate.parse(lastDay).toEpochDay
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val regs = Array.fill(64)(0L)
    ud.filter(p => p._2 >= d1 - 6 && p._2 <= d1).map(_._1).distinct
      .foreach { u =>
        val h52 = java.lang.Long.parseLong(md5hex(u.toString).take(13), 16)
        val b = (h52 % 64).toInt
        val hi = h52 / 64
        val rho = if (hi == 0) 47L else 47L - java.lang.Long.toBinaryString(hi).length
        regs(b) = math.max(regs(b), rho)
      }
    val sWant = regs.map(m => 1L << (50 - m)).sum
    assert(hll(lastDay)._2 == sWant, "window registers diverge from " +
      "the per-user MAX-fold replay")
  }
}
