package graft

import org.scalacheck.Gen
import graft.operators.Temporal

/** Property tests: the distributed temporal joins against brute-force
  * in-memory reference implementations on random data — ties,
  * boundaries, empty keys, and tolerance edges included by
  * construction (timestamps are drawn from a SMALL range so collisions
  * actually happen). */
class TemporalPropertySpec extends SparkSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    SparkSuite.samples(g, n)

  private val leftGen = for {
    k <- Gen.choose(1L, 4L)
    ts <- Gen.choose(0L, 40L)
  } yield (k, ts)

  private val rightGen = for {
    k <- Gen.choose(1L, 5L) // key 5 exists only on the right
    ts <- Gen.choose(0L, 40L)
    v <- Gen.choose(1, 999)
  } yield (k, ts, v.toDouble)

  test("asOf ≡ brute force on random data (ties and misses included)") {
    val sp = spark
    import sp.implicits._
    val leftRows = samples(leftGen, 120).distinct
      .zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong) }
    val rightRaw = samples(rightGen, 80)
    // dedupe right per (k, ts) like the operator contract requires:
    // keep max v as the tie winner
    val rightRows = rightRaw.groupBy(t => (t._1, t._2))
      .map { case ((k, ts), g) => (k, ts, g.map(_._3).max) }.toSeq

    val got = Temporal.asOf(
      leftRows.toDF("k", "ts", "lid"),
      rightRows.toDF("k", "ts", "v"),
      Seq("k"), "ts", Seq("v"))
      .collect()
      .map(r => (r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toSeq.sortBy(_._1)

    val expected = leftRows.map { case (k, ts, lid) =>
      val cands = rightRows.filter(r => r._1 == k && r._2 <= ts)
      if (cands.isEmpty) (lid, None, None)
      else {
        val best = cands.maxBy(_._2)
        (lid, Some(best._2), Some(best._3))
      }
    }.sortBy(_._1)

    assert(got == expected)
  }

  test("pointInInterval ≡ brute force on random data") {
    val sp = spark
    import sp.implicits._
    val ivRows = samples(leftGen, 60).distinct.zipWithIndex.map {
      case ((k, lo), i) => (k, i.toLong, lo, lo + 7L) // width 7 < bucket 10
    }
    val ptRows = samples(rightGen, 90).distinct.zipWithIndex.map {
      case ((k, ts, _), i) => (k, 1000L + i, ts)
    }
    val got = Temporal.pointInInterval(
      ivRows.toDF("k", "iv_id", "lo", "hi"),
      ptRows.toDF("k", "pt_id", "pt"),
      Seq("k"), "lo", "hi", "pt", bucketWidth = 10L)
      .select("iv_id", "pt_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      (ik, ivId, lo, hi) <- ivRows
      (pk, ptId, pt) <- ptRows
      if ik == pk && pt >= lo && pt < hi
    } yield (ivId, ptId)).toSet
    assert(got == expected)
    assert(got.nonEmpty, "fixture produced no overlaps — widen the ranges")
  }

  test("intervalOverlapPairs ≡ brute force on random intervals " +
      "(zero-length, exact-touch, and bucket-boundary cases included)") {
    val sp = spark
    import sp.implicits._
    // small timestamp range over bucket width 10 → intervals routinely
    // start/end ON bucket boundaries, touch exactly (ea == sb, the
    // closed-interval overlap's equality edge), and zero-length
    // (start == end) sessions appear by construction
    val spanGen = for {
      u <- Gen.choose(1L, 6L)
      lo <- Gen.choose(0L, 50L)
      len <- Gen.frequency((2, Gen.const(0L)), (8, Gen.choose(0L, 19L)))
    } yield (u, lo, lo + len)
    val rows = SparkSuite.samples(spanGen, 120).distinct
      .zipWithIndex.map { case ((u, lo, hi), i) => (u, i, lo, hi) }

    val got = Temporal.intervalOverlapPairs(
      rows.toDF("user_id", "sid", "start_us", "end_us"),
      bucketWidth = 10L, maxBucketsPerInterval = 3)
      .select("user_a", "sid_a", "user_b", "sid_b").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
      .toSet
    val expected = (for {
      (ua, ia, sa, ea) <- rows
      (ub, ib, sb, eb) <- rows
      if ua < ub && sa <= eb && sb <= ea
    } yield (ua, ia, ub, ib)).toSet
    assert(got == expected)
    assert(expected.nonEmpty, "fixture produced no overlaps")
    // the edge cases must actually occur in the sample
    assert(rows.exists { case (_, _, lo, hi) => lo == hi },
      "no zero-length interval in the sample")
    assert(expected.exists { case (ua, ia, ub, ib) =>
      val a = rows.find(r => r._1 == ua && r._2 == ia).get
      val b = rows.find(r => r._1 == ub && r._2 == ib).get
      a._4 == b._3 || b._4 == a._3
    }, "no exact-touch overlap in the sample")
  }
}
