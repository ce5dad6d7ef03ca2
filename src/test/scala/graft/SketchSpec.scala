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
}
