package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Temporal

/** Interval-overlap scale law (DedupScaleSpec's pattern applied to
  * [[Temporal.intervalOverlapPairs]]): the events fixture is small, so a
  * quadratic regression in the bucket-join candidate generation would be
  * invisible to the oracle suite. This spec synthesizes session corpora
  * ×1/×4/×16 — each replica TIME-SHIFTED into a disjoint range with
  * disjoint user ids, the way a growing real corpus adds new time, not
  * denser time — and asserts the overlap pairs and the enumerated
  * per-bucket join work both grow EXACTLY ×k (co-occupancy law: work is
  * Σ_bucket n·(n−1)/2, never sessions²). All assertions are exact count
  * equalities — deterministic on a contended host (ADVICE r5: wall-clock
  * growth assertions flake; the count law is the real detector).
  *
  * The fixture carries a skewed long-session tail (every 10th user's
  * first session spans 100 hours ≈ 101 hour-buckets) so the law is
  * checked under exactly the skew that motivates the width guard, and a
  * final case pins the guard itself: a pathological months-long session
  * raises in-plan instead of silently exploding.
  */
class IntervalScaleSpec extends SparkSuite {

  private val HourUs = 3600000000L
  private val BaseUs = 1700000000000000L
  private val ShiftUs = 1000L * HourUs // ≫ a replica's ~115 h footprint

  /** 40 users × 5 sessions per replica; 10-min per-user phase offsets
    * create cross-user co-occupancy; u % 10 == 0 gets the 100 h tail. */
  private def spans(reps: Int): DataFrame =
    spark.range(reps).toDF("rep")
      .crossJoin(spark.range(40).toDF("u"))
      .crossJoin(spark.range(5).toDF("j"))
      .select(
        (col("u") + col("rep") * 100000L).as("user_id"),
        col("j").cast("int").as("sid"),
        (lit(BaseUs) + col("rep") * ShiftUs + col("j") * (3 * HourUs) +
          (col("u") % 7) * 600000000L).as("start_us"))
      .withColumn("end_us", col("start_us") +
        when(col("user_id") % 100000 % 10 === 0 && col("sid") === 0,
          100 * HourUs).otherwise(HourUs))

  /** Enumerated bucket-join work: Σ n·(n−1)/2 over hour buckets — the
    * rows the equi-join actually produces, before any filter hides
    * them. This is the quantity that must scale with co-occupancy. */
  private def bucketWork(sp: DataFrame): Long =
    sp.select(explode(sequence(expr("start_us div 3600000000"),
        expr("end_us div 3600000000"))).as("bk"))
      .groupBy("bk").count()
      .agg(sum(expr("count * (count - 1) div 2")).as("w"))
      .head.getLong(0)

  test("overlap pairs and bucket work grow exactly ×k under " +
      "time-shifted replication (skewed long-session tail included)") {
    val s1 = spans(1)
    val p1 = Temporal.intervalOverlapPairs(s1, HourUs).count()
    val w1 = bucketWork(s1)
    assert(p1 > 0 && w1 > 0, s"degenerate base: pairs=$p1 work=$w1")
    for (k <- Seq(4, 16)) {
      val sk = spans(k)
      assert(Temporal.intervalOverlapPairs(sk, HourUs).count() == p1 * k,
        s"×$k replication broke the linear pair law (base $p1)")
      assert(bucketWork(sk) == w1 * k,
        s"×$k replication broke the co-occupancy work law (base $w1)")
    }
  }

  test("kernel matches the brute-force O(n²) overlap join on the base " +
      "corpus") {
    val sp = spans(1)
    val a = sp.select(col("user_id").as("ua"), col("sid").as("ja"),
      col("start_us").as("sa"), col("end_us").as("ea"))
    val b = sp.select(col("user_id").as("ub"), col("sid").as("jb"),
      col("start_us").as("sb"), col("end_us").as("eb"))
    val brute = a.join(b, col("ua") < col("ub") &&
        col("sa") <= col("eb") && col("sb") <= col("ea")).count()
    assert(Temporal.intervalOverlapPairs(sp, HourUs).count() == brute)
  }

  test("a pathological months-long session raises the width guard " +
      "in-plan instead of exploding") {
    val sp = spans(1).withColumn("end_us",
      when(col("user_id") === 0 && col("sid") === 0,
        col("start_us") + 2000 * HourUs).otherwise(col("end_us")))
    val e = intercept[Exception] {
      Temporal.intervalOverlapPairs(sp, HourUs).count()
    }
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(c => Option(c.getMessage).getOrElse("")).mkString("\n")
    assert(msgs(e).contains("intervalOverlapPairs"),
      s"expected the width-guard raise, got: ${msgs(e).take(400)}")
  }
}
