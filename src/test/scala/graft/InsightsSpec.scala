package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Independent twins and invariants for the Insights module. The DuckDB
  * oracle already pins engine parity; these tests pin SEMANTICS against
  * in-JVM sequential replays (interp, gaps, acf, z) and closed-form
  * invariants (cube margins, handshake lemma, ntile ≡ window ntile).
  */
class InsightsSpec extends SparkSuite {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, SparkSuite.Sf0001)

  test("win_decile_spend ≡ native ntile window twin") {
    val got = q("win_decile_spend").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq.sorted
    val sp = Tables.orders(spark, SparkSuite.Sf0001)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(sum(col("o_totalprice").cast(Tables.M)).as("spend"))
    val w = Window.orderBy(col("spend"), col("custkey"))
    val want = sp.withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_cust"),
        min("spend").cast("double").as("lo"),
        max("spend").cast("double").as("hi"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq.sorted
    assert(got == want)
  }

  test("win_decile_spend plan has no Window node (the scale contract)") {
    val plan = q("win_decile_spend").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"global-window leak:\n$plan")
  }

  test("ts_interp_linear ≡ sequential replay; observed days pass through") {
    val rows = q("ts_interp_linear").collect()
    assert(rows.nonEmpty)
    // replay: per user, last value per day (by us, event_id, value desc),
    // then straight-line segments between observed days
    val ev = Tables.events(spark, SparkSuite.Sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = ev.groupBy(_._1).flatMap { case (u, es) =>
      val byDay = es.groupBy(e => e._2 / 86400000000L).map { case (day, g) =>
        day -> g.maxBy(e => (e._2, e._3, e._4))._4
      }
      val (d0, d1) = (byDay.keys.min, byDay.keys.max)
      (d0 to d1).map { day =>
        val v = byDay.get(day).getOrElse {
          val (pd, pv) = byDay.filter(_._1 < day).maxBy(_._1)
          val (nd, nv) = byDay.filter(_._1 > day).minBy(_._1)
          pv + (nv - pv) * (day - pd).toDouble / (nd - pd).toDouble
        }
        (u, day) -> (v, byDay.contains(day))
      }
    }
    val got = rows.map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getDouble(2), r.getBoolean(3))).toMap
    assert(got.size == want.size)
    want.foreach { case (k, (v, obs)) =>
      val (gv, gobs) = got(k)
      assert(gobs == obs, s"observed flag at $k")
      assert(gv == v, s"value at $k: got $gv want $v")
    }
  }

  test("ts_acf: 7 lags in [-1,1], exact vs in-JVM sufficient statistics") {
    val rows = q("ts_acf").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == (1L to 7L))
    rows.foreach { case (_, _, a) => assert(a >= -1.0 && a <= 1.0) }
    // exact replay: daily revenue quantized to $1000 units, pairs at
    // calendar lag k
    val dly = Tables.orders(spark, SparkSuite.Sf0001)
      .groupBy(datediff(col("o_orderdate").cast("date"),
        to_date(lit("1992-01-01"))).as("di"))
      .agg((sum(col("o_totalprice").cast(Tables.M)) * 100)
        .cast("long").as("cents"))
      .collect().map(r => r.getInt(0) -> BigInt(r.getLong(1) / 100000L))
      .toMap
    rows.foreach { case (k, n, acf) =>
      val pairs = dly.toSeq.flatMap { case (di, x) =>
        dly.get(di - k.toInt).map(y => (x, y)) }
      assert(pairs.size.toLong == n)
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val nd = n.toDouble
      val want = (nd * sxy.toDouble - sx.toDouble * sy.toDouble) /
        (math.sqrt(nd * sxx.toDouble - sx.toDouble * sx.toDouble) *
          math.sqrt(nd * syy.toDouble - sy.toDouble * sy.toDouble))
      assert(math.abs(acf - want) < 1e-12, s"lag $k: got $acf want $want")
    }
  }

  test("evt_ab_lift: z recomputes from the four counts") {
    val r = q("evt_ab_lift").collect().head
    val (na, ca, nb, cb) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(na > 0 && nb > 0)
    // the high-value threshold must keep pooled p inside (0,1) — a
    // degenerate p would zero the variance (z = x/0 trips ANSI)
    assert(ca + cb > 0 && ca + cb < na + nb)
    val p = (ca + cb).toDouble / (na + nb)
    val z = (cb.toDouble / nb - ca.toDouble / na) /
      math.sqrt(p * (1d - p) * (1d / na + 1d / nb))
    assert(r.getDouble(6) == z)
    // cohorts partition the user base
    val users = Tables.events(spark, SparkSuite.Sf0001)
      .select("user_id").distinct().count()
    assert(na + nb == users)
  }

  test("agg_cube: margins are consistent") {
    val rows = q("agg_cube").collect()
      .map(r => (r.getLong(0), r.isNullAt(1), r.isNullAt(2), r.getLong(3)))
    val total = Tables.orders(spark, SparkSuite.Sf0001).count()
    // gid bit semantics: 0=cell, 1=status rolled up, 2=priority rolled
    // up, 3=grand total; every stratum re-sums to the corpus
    (0L to 3L).foreach { gid =>
      assert(rows.filter(_._1 == gid).map(_._4).sum == total, s"gid=$gid")
    }
    val grand = rows.filter(_._1 == 3L)
    assert(grand.length == 1 && grand.head._2 && grand.head._3)
    // null pattern matches the gid bits everywhere
    rows.foreach { case (gid, pNull, sNull, _) =>
      assert(pNull == ((gid & 2L) != 0) && sNull == ((gid & 1L) != 0))
    }
  }

  test("chk_fk_orphans: clean edges 0, planted purge fires exactly") {
    val got = q("chk_fk_orphans").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size == 8)
    val planted = "lineitem->orders[parents%97 purged]"
    got.filterKeys(_ != planted).foreach { case (fk, n) =>
      assert(n == 0L, s"unexpected orphans on clean edge $fk")
    }
    val want = Tables.lineitem(spark, SparkSuite.Sf0001)
      .filter(col("l_orderkey") % 97 === 0).count()
    assert(want > 0 && got(planted) == want)
  }

  test("graph_degree_dist: handshake lemma") {
    val rows = q("graph_degree_dist").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val li = Tables.lineitem(spark, SparkSuite.Sf0001)
      .filter(col("l_partkey") < 400)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
    val e = li.select(col("ok"), col("p").as("p1"))
      .join(li.select(col("ok"), col("p").as("p2")), Seq("ok"))
      .filter(col("p1") < col("p2")).select("p1", "p2").distinct().count()
    assert(rows.map { case (deg, n) => deg * n }.sum == 2 * e)
  }

  test("win_order_gap ≡ sequential replay") {
    val got = q("win_order_gap").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val o = Tables.orders(spark, SparkSuite.Sf0001)
      .select(col("o_custkey"), col("o_orderdate").cast("date"),
        col("o_orderkey")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val want = o.groupBy(_._1).flatMap { case (c, os) =>
      val days = os.sortBy(r => (r._2.toEpochDay, r._3)).map(_._2.toEpochDay)
      val gaps = days.sliding(2).collect { case Array(a, b) => b - a }.toSeq
      if (gaps.isEmpty) None
      else Some(c -> (gaps.size.toLong, gaps.min, gaps.max, gaps.sum))
    }
    assert(got == want)
  }

  test("evt_stickiness: ratio bounds and month arithmetic") {
    val rows = q("evt_stickiness").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sumDau, nDays, mau, s) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nDays >= 1 && nDays <= 31)
      assert(s > 0.0 && s <= 1.0, s"stickiness $s out of (0,1]")
      assert(s == sumDau.toDouble / nDays / mau)
    }
  }

  test("chk_benford: digit counts partition the orders; expected " +
      "proportions sum to 1; chi-square terms replay") {
    val rows = q("chk_benford").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    val nOrders = Tables.orders(spark, SparkSuite.Sf0001).count()
    assert(rows.map(_._2).sum == nOrders, "counts partition orders")
    assert(rows.forall(r => r._1 >= 1 && r._1 <= 9), "digits in 1..9")
    assert(math.abs(rows.map(_._4).sum +
      (1 to 9).filter(d => !rows.exists(_._1 == d))
        .map(d => math.log(1 + 1.0 / d) / math.log(10)).sum - 1.0) < 1e-12,
      "Benford proportions sum to 1")
    val total = rows.map(_._2).sum
    rows.foreach { case (d, n, pObs, pBen, chi) =>
      assert(pObs == n.toDouble / total, s"digit $d p_obs")
      assert(pBen == math.log(1 + 1.0 / d) / math.log(10), s"digit $d p_ben")
      val e = total * pBen
      assert(chi == math.pow(n.toDouble - e, 2) / e, s"digit $d chi2")
    }
  }

  test("evt_survival: risk-set ledger balances, ppm identities hold, " +
      "and the panel fixture produces real churn") {
    val rows = SparkEntry.queries("evt_survival")(spark, SparkSuite.Sf001)
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("at_risk"),
        r.getAs[Long]("churned"), r.getAs[Long]("hazard_ppm"),
        r.getAs[Long]("km_factor_ppm")))
      .sortBy(_._1)
    assert(rows.head._1 == 0 && rows.last._1 == 13, "grid not 0..13")
    rows.foreach { case (k, n, ch, hz, km) =>
      assert(ch <= n, s"k=$k: churned $ch > at_risk $n")
      assert(hz == ch * 1000000L / n, s"k=$k hazard identity")
      assert(km == (n - ch) * 1000000L / n, s"k=$k KM-factor identity")
    }
    // next risk set loses at least this offset's churn events
    // (the remainder of the drop is right-censoring, not output)
    rows.toSeq.sliding(2).foreach { case Seq((k, n, ch, _, _), (_, n2, _, _, _)) =>
      assert(n2 <= n - ch, s"k=$k: at_risk $n → $n2 with $ch churned")
    }
    assert(rows.map(_._3).sum > 0, "panel fixture produced zero churn " +
      "events — survival table is degenerate again")
  }

  test("chk_expectations: full suite shape, one organic failure, " +
      "counters replay against the raw tables") {
    val rows = q("chk_expectations").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.length == 12, s"expected 12 rules, got ${rows.length}")
    val byRule = rows.map(t => t._1 -> ((t._2, t._3))).toMap
    // the synthetic data genuinely ships ~half its lines before the
    // order date — the suite must CATCH that, and nothing else
    val failing = rows.filter(!_._3).map(_._1).toList
    assert(failing == List("lineitem.ship_not_before_order"),
      s"failing rules: ${failing.mkString(",")}")
    assert(byRule("lineitem.ship_not_before_order")._1 > 0)
    // counter replays
    val o = Tables.orders(spark, SparkSuite.Sf0001)
    assert(byRule("orders.row_count_min")._1 == o.count())
    val li = Tables.lineitem(spark, SparkSuite.Sf0001)
    val early = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") < col("o_orderdate")).count()
    assert(byRule("lineitem.ship_not_before_order")._1 == early)
    assert(byRule("orders.pk_unique") == ((0L, true)))
    assert(byRule("lineitem.fk_orders") == ((0L, true)))
  }

  test("mba_assoc_rules: direction pairing, integer identities, and a " +
      "full in-JVM replay of every rule") {
    val rows = q("mba_assoc_rules").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    // replay: baskets → pair supports → rules
    val li = Tables.lineitem(spark, SparkSuite.Sf0001)
      .filter(col("l_partkey") < 400)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val n = li.map(_._1).distinct.length.toLong
    val sup = li.groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    val pairSup = li.groupBy(_._1).values.flatMap { basket =>
      basket.map(_._2).distinct.sorted.combinations(2).map(s => (s(0), s(1)))
    }.toSeq.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val want = pairSup.filter(_._2 >= 3).flatMap { case ((a, b), s) =>
      Seq((a, b, s), (b, a, s))
    }.map { case (ante, cons, s) =>
      (ante, cons, s, 100 * s / sup(ante),
        1000000L * s * n / (sup(ante) * sup(cons)))
    }.toSeq.sorted
    assert(rows.toSeq.sorted == want)
    // lift is direction-symmetric by construction; confidence is not
    rows.groupBy(t => (math.min(t._1, t._2), math.max(t._1, t._2)))
      .foreach { case (k, ts) =>
        assert(ts.length == 2, s"pair $k missing a direction")
        assert(ts.map(_._5).distinct.length == 1, s"pair $k lift differs")
      }
    assert(rows.forall(_._4 <= 100), "confidence above 100%")
  }

  test("chk_dist_ks ≡ exact binned-KS replay in-JVM; statistic bounded") {
    val r = q("chk_dist_ks").collect().head
    val (na, nb, ksPpm, ksBin) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val orders = Tables.orders(spark, SparkSuite.Sf0001)
      .select("o_orderpriority", "o_totalprice").collect()
      .map(x => (x.getString(0), x.getDouble(1)))
      .filter(t => t._1 == "1-URGENT" || t._1 == "5-LOW")
    def bin(v: Double): Long = math.floor(v).toLong / 500
    val a = orders.filter(_._1 == "1-URGENT").map(t => bin(t._2))
    val b = orders.filter(_._1 == "5-LOW").map(t => bin(t._2))
    assert(na == a.length.toLong && nb == b.length.toLong)
    val bins = (a ++ b).distinct.sorted
    var fa = 0L; var fb = 0L
    val devs = bins.map { bn =>
      fa += a.count(_ == bn); fb += b.count(_ == bn)
      bn -> math.abs(fa * nb - fb * na)
    }
    val dmax = devs.map(_._2).max
    assert(ksPpm == dmax * 1000000L / (na * nb))
    assert(ksBin == devs.filter(_._2 == dmax).map(_._1).min)
    assert(ksPpm >= 0 && ksPpm <= 1000000L)
  }

  test("win_value_band ≡ in-JVM peer-band replay; RANGE genuinely " +
      "differs from a ROWS frame on this data") {
    val rows = q("win_value_band").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    val byCust = rows.groupBy(_._2)
    var rangeNeqRows = false
    byCust.foreach { case (c, os) =>
      val prices = os.map(_._3)
      val total = prices.map(p => BigDecimal(p).setScale(4)).sum
      val sorted = os.sortBy(o => (o._3, o._1))
      sorted.zipWithIndex.foreach { case ((ok, _, p, nBand, share), i) =>
        val band = prices.filter(q => q >= p - 500 && q <= p + 500)
        assert(nBand == band.length.toLong, s"cust $c order $ok n_band")
        val want = (band.map(q => BigDecimal(q).setScale(4)).sum.toDouble
          / total.toDouble)
        assert(share == want, s"cust $c order $ok share")
        // a ±1-ROWS neighborhood (3 rows) disagreeing with the value
        // band somewhere proves RANGE ≠ ROWS here
        val rowsCount = math.min(i + 1, 2) + math.min(sorted.length - i, 2) - 1
        if (rowsCount.toLong != nBand) rangeNeqRows = true
      }
    }
    assert(rangeNeqRows, "value band ≡ a rows frame everywhere — " +
      "fixture exercises nothing")
  }

  test("agg_corr_ols ≡ exact sufficient-statistics replay (bit-equal " +
      "doubles); r bounded") {
    val rows = q("agg_corr_ols").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.length == 3)
    val li = Tables.lineitem(spark, SparkSuite.Sf0001)
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1).toLong,
        BigDecimal(r.getDouble(1 + 1)).setScale(4).*(100).toLongExact))
    rows.foreach { case (flag, n, rr, slope, icept) =>
      val g = li.filter(_._1 == flag)
      assert(n == g.length.toLong)
      val sx = BigInt(g.map(_._2).sum)
      val sy = g.map(t => BigInt(t._3)).sum
      val sxy = g.map(t => BigInt(t._2) * BigInt(t._3)).sum
      val sxx = g.map(t => BigInt(t._2) * BigInt(t._2)).sum
      val syy = g.map(t => BigInt(t._3) * BigInt(t._3)).sum
      val covN = (BigInt(n) * sxy - sx * sy).toDouble
      val varxN = (BigInt(n) * sxx - sx * sx).toDouble
      val varyN = (BigInt(n) * syy - sy * sy).toDouble
      assert(rr == covN / (math.sqrt(varxN) * math.sqrt(varyN)),
        s"$flag r")
      assert(slope == covN / varxN, s"$flag slope")
      assert(icept == (sy.toDouble - (covN / varxN) * sx.toDouble) / n,
        s"$flag intercept")
      assert(math.abs(rr) <= 1.0, s"$flag |r| > 1")
    }
  }

  test("ts_theilsen ≡ exact median-of-pairwise-slopes replay; robust to " +
      "a planted outlier day where OLS is not") {
    val got = q("ts_theilsen").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    val daily = Tables.events(spark, SparkSuite.Sf0001)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .select(col("event_type"),
        datediff(col("day"), lit("1970-01-01")).as("d"), col("c"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
    got.foreach { case (et, nPairs, slope) =>
      val pts = daily(et).map(t => (t._2, t._3)).sortBy(_._1)
      val slopes = (for {
        i <- pts.indices; j <- pts.indices if pts(j)._1 > pts(i)._1
      } yield (pts(j)._2 - pts(i)._2).toDouble /
          (pts(j)._1 - pts(i)._1).toDouble).sorted
      assert(nPairs == slopes.length.toLong, s"$et pair count")
      val n = slopes.length
      val med =
        if (n % 2 == 1) slopes(n / 2)
        else (slopes(n / 2 - 1) + slopes(n / 2)) / 2
      assert(slope == med, s"$et: spark $slope vs replay $med")
    }
    // robustness: on a synthetic 10-day unit-slope series with one
    // 100× outlier day, Theil-Sen's median-of-slopes stays ~1 while the
    // OLS slope is dragged far off — the 29.3% breakdown point at work
    val base = (0 until 10).map(d => (d, if (d == 9) 1000L else d.toLong))
    val sl = (for {
      i <- base.indices; j <- base.indices if j > i
    } yield (base(j)._2 - base(i)._2).toDouble / (j - i)).sorted
    val tsMed = (sl(sl.length / 2 - 1) + sl(sl.length / 2)) / 2
    val n = base.length.toDouble
    val (sx, sy) = (base.map(_._1).sum.toDouble, base.map(_._2).sum.toDouble)
    val sxy = base.map(t => t._1 * t._2.toDouble).sum
    val sxx = base.map(t => t._1.toDouble * t._1).sum
    val ols = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(tsMed - 1.0) < 0.2, s"Theil-Sen dragged: $tsMed")
    assert(ols > 30, s"outlier fixture too tame for the contrast: $ols")
  }

  test("ts_mann_kendall ≡ exact pairwise-sign replay; tau_b bounded and " +
      "sign-consistent with S") {
    val got = q("ts_mann_kendall").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    val daily = Tables.events(spark, SparkSuite.Sf0001)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .select(col("event_type"),
        datediff(col("day"), lit("1970-01-01")).as("d"), col("c"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
    got.foreach { case (et, sStat, nPairs, tauB) =>
      val pts = daily(et).map(t => (t._2, t._3)).sortBy(_._1)
      val pairs = for {
        i <- pts.indices; j <- pts.indices if pts(j)._1 > pts(i)._1
      } yield java.lang.Long.signum(pts(j)._2 - pts(i)._2).toLong
      assert(sStat == pairs.sum, s"$et: S ${sStat} vs replay ${pairs.sum}")
      assert(nPairs == pairs.length.toLong, s"$et pair count")
      val untied = pairs.count(_ != 0)
      val want = sStat.toDouble /
        (math.sqrt(nPairs.toDouble) * math.sqrt(untied.toDouble))
      assert(tauB == want, s"$et: tau_b $tauB vs replay $want")
      assert(math.abs(tauB) <= 1.0, s"$et: |tau_b| > 1")
      assert(java.lang.Long.signum(sStat).toDouble == math.signum(tauB)
        || sStat == 0L, s"$et: tau sign disagrees with S")
    }
  }

  test("ts_stl ≡ in-JVM decomposition replay; components reassemble " +
      "exactly and the weekly profile is centered per series") {
    val got = q("ts_stl").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.nonEmpty)
    // replay from the exact daily decimal totals
    val daily = Tables.events(spark, SparkSuite.Sf0001)
      .groupBy(col("event_type"),
        datediff(col("ts").cast("date"), lit("1970-01-01")).as("d"))
      .agg(sum(col("value").cast("decimal(10,4)")).as("v"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1),
        BigDecimal(r.getDecimal(2))))
      .groupBy(_._1)
    val expect = daily.flatMap { case (et, rows) =>
      val byDay = rows.map(t => t._2 -> t._3).toMap
      val interior = byDay.keys.toSeq.sorted.flatMap { d =>
        val win = (d - 3 to d + 3).flatMap(byDay.get)
        if (win.length == 7) {
          val tSum = win.sum
          Some((d, byDay(d), tSum, byDay(d) * 7 - tSum))
        } else None
      }
      val seas = interior.groupBy(_._1 % 7).map { case (dow, xs) =>
        dow -> xs.map(_._4).sum.toDouble / (7 * xs.length)
      }
      interior.map { case (d, v, tSum, _) =>
        val trend = tSum.toDouble / 7
        val sc = seas(d % 7)
        (et, d.toLong) -> (v.toDouble, trend, sc, v.toDouble - trend - sc)
      }
    }
    assert(got.toMap == expect, "STL ledger diverges from replay")
    // structural invariants: exact reassembly row-by-row, and each
    // series' seasonal components sum to ~0 over its interior days
    got.foreach { case ((et, d), (actual, trend, seasonal, resid)) =>
      assert(actual - trend - seasonal == resid, s"$et/$d reassembly")
    }
    // the seasonal component is exactly the per-weekday mean of the
    // detrended series, so residuals must average to ~0 within every
    // (series, weekday) cell — the defining property of the fit
    got.groupBy { case ((et, d), _) => (et, d % 7) }.foreach {
      case ((et, dow), rows) =>
        val meanResid = rows.map(_._2._4).sum / rows.length
        val scale = 1 + rows.map(r => math.abs(r._2._1)).max
        assert(math.abs(meanResid) < 1e-9 * scale,
          s"$et dow=$dow residual mean $meanResid not ~0")
    }
  }

  test("evt_ab_cuped ≡ exact-integer replay; CUPED adjustment is the " +
      "textbook theta * covariate-imbalance correction") {
    val Array(row) = q("evt_ab_cuped").collect()
    val (na, nb) = (row.getLong(0), row.getLong(1))
    val (theta, liftRaw, liftCuped) =
      (row.getDouble(2), row.getDouble(3), row.getDouble(4))
    // replay with BigInt moments over per-user ten-thousandths
    val ev = Tables.events(spark, SparkSuite.Sf0001)
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("1970-01-01")).as("d"),
        col("event_type"), col("value").cast("decimal(10,4)").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        BigDecimal(r.getDecimal(3))))
    val days = ev.map(_._2)
    val mid = (days.min + days.max + 1) / 2
    val users = ev.groupBy(_._1).map { case (uid, xs) =>
      def tot(p: Int => Boolean) = (xs.collect {
        case (_, d, "purchase", v) if p(d) => v
      }.sum * 10000).toBigInt
      (uid, tot(_ < mid), tot(_ >= mid))
    }.toSeq
    val n = BigInt(users.length)
    val sx = users.map(_._2).sum; val sy = users.map(_._3).sum
    val sxy = users.map(u => u._2 * u._3).sum
    val sxx = users.map(u => u._2 * u._2).sum
    val a = users.filter(_._1 % 2 == 0); val b = users.filter(_._1 % 2 == 1)
    assert(na == a.length.toLong && nb == b.length.toLong)
    val thetaW = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val dy = b.map(_._3).sum.toDouble / b.length -
      a.map(_._3).sum.toDouble / a.length
    val dx = b.map(_._2).sum.toDouble / b.length -
      a.map(_._2).sum.toDouble / a.length
    assert(theta == thetaW, s"theta $theta vs replay $thetaW")
    assert(liftRaw == dy / 10000, s"lift_raw $liftRaw vs ${dy / 10000}")
    assert(liftCuped == (dy - thetaW * dx) / 10000,
      s"lift_cuped $liftCuped vs ${(dy - thetaW * dx) / 10000}")
    // the adjustment direction: cuped differs from raw exactly by
    // theta * covariate imbalance (non-degenerate on this fixture)
    assert(dx != 0.0 && theta != 0.0, "degenerate CUPED fixture")
  }

  test("evt_matched_lift ≡ exact nearest-covariate matching replay " +
      "(stratum-exact, backward-wins ties, min-user dedup)") {
    val Array(row) = q("evt_matched_lift").collect()
    val (nT, nM) = (row.getLong(0), row.getLong(1))
    val (att, meanDist) = (row.getDouble(2), row.getDouble(3))
    val ev = Tables.events(spark, SparkSuite.Sf0001)
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("1970-01-01")).as("d"),
        col("event_type"), col("value").cast("decimal(10,4)").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        BigDecimal(r.getDecimal(3))))
    val days = ev.map(_._2)
    val mid = (days.min + days.max + 1) / 2
    val users = ev.groupBy(_._1).map { case (uid, xs) =>
      def tot(p: Int => Boolean) = (xs.collect {
        case (_, dd, "purchase", v) if p(dd) => v
      }.sum * 10000).toLongExact
      val stratum = xs.collect { case (_, dd, _, _) if dd < mid => dd }
        .distinct.length.toLong
      (uid, tot(_ < mid), tot(_ >= mid), stratum)
    }.toSeq
    val treated = users.filter(_._1 % 2 == 1)
    val controls = users.filter(_._1 % 2 == 0)
      .groupBy(u => (u._4, u._2)) // (stratum, x) → min-user representative
      .map { case ((st, x), xs) => (st, x) -> xs.minBy(_._1)._3 }
    val byStratum = controls.keys.groupBy(_._1)
      .map { case (st, ks) => st -> ks.map(_._2).toSeq.sorted }
    assert(nT == treated.length.toLong)
    val matches = treated.flatMap { case (_, x, y, st) =>
      byStratum.get(st).flatMap { xs =>
        val back = xs.filter(_ <= x).lastOption
        val fwd = xs.find(_ >= x)
        val pick = (back, fwd) match {
          case (None, None) => None
          case (Some(b), None) => Some(b)
          case (None, Some(f)) => Some(f)
          case (Some(b), Some(f)) =>
            Some(if (x - b <= f - x) b else f)
        }
        pick.map(cx => (y - controls((st, cx)), math.abs(x - cx)))
      }
    }
    assert(nM == matches.length.toLong, s"matched $nM vs ${matches.length}")
    val wantAtt =
      matches.map(_._1).sum.toDouble / matches.length / 10000
    val wantDist =
      matches.map(_._2).sum.toDouble / matches.length / 10000
    assert(att == wantAtt, s"att $att vs replay $wantAtt")
    assert(meanDist == wantDist, s"mean_dist $meanDist vs $wantDist")
    // non-degenerate: some treated actually matched, and matching is
    // genuinely nearest (distance 0 exists for same-x pairs if any)
    assert(nM > 0 && nM <= nT)
  }

  test("win_pareto_curve ≡ exact sorted-replay; shares concave-monotone " +
      "and the curve ends at 1") {
    val got = q("win_pareto_curve").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq == (1L to 10L))
    val spends = Tables.orders(spark, SparkSuite.Sf0001)
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast(Tables.M)).as("s"))
      .collect()
      .map(r => (r.getLong(0), (BigDecimal(r.getDecimal(1)) * 10000)
        .toLongExact))
    val n = spends.length
    val ranked = spends.sortBy { case (id, c) => (-c, id) }.zipWithIndex
    val byDec = ranked.groupBy { case (_, i) => i.toLong * 10 / n + 1 }
      .view.mapValues(xs => (xs.length.toLong,
        xs.map(x => BigInt(x._1._2)).sum)).toMap
    val tc = spends.map(s => BigInt(s._2)).sum
    var cum = BigInt(0)
    got.foreach { case (dec, nCust, rev, share, cumShare) =>
      val (wn, wc) = byDec(dec)
      cum += wc
      assert(nCust == wn, s"decile $dec count")
      assert(BigInt(rev) == wc, s"decile $dec revenue")
      assert(share == wc.toDouble / tc.toDouble, s"decile $dec share")
      assert(cumShare == cum.toDouble / tc.toDouble, s"decile $dec cum")
    }
    // rank order ⇒ the PER-CUSTOMER average is non-increasing across
    // deciles (raw decile sums can cross when sizes differ by ±1),
    // and the cumulative curve is monotone ending at exactly Σ/Σ
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._3.toDouble / a._2 >= b._3.toDouble / b._2,
          s"avg spend rose ${a._1}→${b._1}")
        assert(a._5 <= b._5, "cum_share fell")
      case _ => ()
    }
    assert(got.last._5 == 1.0, "curve does not end at 1")
  }

  test("ts_iqr_outliers ≡ nearest-rank quartile replay; fences honor " +
      "the 1.5-IQR rule row for row") {
    val got = q("ts_iqr_outliers").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
      .toMap
    assert(got.nonEmpty)
    val dly = Tables.events(spark, SparkSuite.Sf0001)
      .groupBy(col("event_type"),
        datediff(col("ts").cast("date"), lit("1970-01-01")).as("d"))
      .agg(sum(col("value").cast("decimal(10,4)")).as("v"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1).toLong,
        BigDecimal(r.getDecimal(2))))
    dly.groupBy(_._1).foreach { case (et, rows) =>
      val sorted = rows.map(r => (r._3, r._2)).sortBy(identity)
      val n = sorted.length
      val q1 = sorted((n + 3) / 4 - 1)._1.toDouble
      val q3 = sorted((3 * n + 3) / 4 - 1)._1.toDouble
      val iqr = q3 - q1
      rows.foreach { case (_, d, v) =>
        val (ga, g1, g3, flag) = got((et, d))
        assert(ga == v.toDouble && g1 == q1 && g3 == q3,
          s"$et/$d quartiles")
        assert(flag == (v.toDouble < q1 - 1.5 * iqr
          || v.toDouble > q3 + 1.5 * iqr), s"$et/$d flag")
      }
      assert(q1 <= q3, s"$et quartile order")
    }
  }

  test("graph_copurchase_recs ≡ exact weighted top-3 replay; " +
      "recommendation weights are symmetric") {
    val got = q("graph_copurchase_recs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val li = Tables.lineitem(spark, SparkSuite.Sf0001)
      .filter(col("l_partkey") < 400)
      .select("l_orderkey", "l_partkey").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val pw = li.groupBy(_._1).values.flatMap { xs =>
      val ps = xs.map(_._2)
      for (i <- ps.indices; j <- ps.indices
           if ps(i) < ps(j)) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val dir = pw.toSeq.flatMap { case ((a, b), w) =>
      Seq((a, b, w), (b, a, w)) }
    val want = dir.groupBy(_._1).toSeq.flatMap { case (src, xs) =>
      xs.sortBy { case (_, rec, w) => (-w, rec) }.take(3).zipWithIndex
        .map { case ((_, rec, w), i) => (src, (i + 1).toLong, rec, w) }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == want, "top-3 recs diverge from replay")
    // symmetry of the underlying weights: w(a,b) = w(b,a) by build
    got.foreach { case (src, _, rec, w) =>
      val key = if (src < rec) (src, rec) else (rec, src)
      assert(pw(key) == w, s"($src,$rec) weight")
    }
  }

  test("evt_did ≡ exact cell-mean replay; the estimate is the literal " +
      "difference of arm deltas") {
    val Array(row) = q("evt_did").collect()
    val (na, nb) = (row.getLong(0), row.getLong(1))
    val (preC, postC, preT, postT, did) = (row.getDouble(2),
      row.getDouble(3), row.getDouble(4), row.getDouble(5),
      row.getDouble(6))
    val ev = Tables.events(spark, SparkSuite.Sf0001)
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("1970-01-01")).as("d"),
        col("event_type"), col("value").cast("decimal(10,4)").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        BigDecimal(r.getDecimal(3))))
    val days = ev.map(_._2)
    val mid = (days.min + days.max + 1) / 2
    val users = ev.groupBy(_._1).map { case (uid, xs) =>
      def tot(p: Int => Boolean) = (xs.collect {
        case (_, dd, "purchase", v) if p(dd) => v
      }.sum * 10000).toBigInt
      (uid, tot(_ < mid), tot(_ >= mid))
    }.toSeq
    val a = users.filter(_._1 % 2 == 0); val b = users.filter(_._1 % 2 == 1)
    assert(na == a.length.toLong && nb == b.length.toLong)
    def m(s: BigInt, n: Int) = s.toDouble / n / 10000
    val (wPreC, wPostC) = (m(a.map(_._2).sum, a.length),
      m(a.map(_._3).sum, a.length))
    val (wPreT, wPostT) = (m(b.map(_._2).sum, b.length),
      m(b.map(_._3).sum, b.length))
    assert((preC, postC, preT, postT) == ((wPreC, wPostC, wPreT, wPostT)),
      "cell means diverge from replay")
    assert(did == (wPostT - wPreT) - (wPostC - wPreC), "did identity")
    // the estimate nets out a common additive time trend by
    // construction: shifting both arms' post means by +c cancels
    assert(((wPostT + 5.0) - wPreT) - ((wPostC + 5.0) - wPreC)
      == (wPostT - wPreT) - (wPostC - wPreC) ||
      math.abs((((wPostT + 5.0) - wPreT) - ((wPostC + 5.0) - wPreC))
        - ((wPostT - wPreT) - (wPostC - wPreC))) < 1e-9)
  }

  test("graph_assortativity ≡ exact degree-moment replay; |r| ≤ 1") {
    val Array(row) = q("graph_assortativity").collect()
    val (nE, nN, r) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    val li = Tables.lineitem(spark, SparkSuite.Sf0001)
      .filter(col("l_partkey") < 400)
      .select("l_orderkey", "l_partkey").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { xs =>
      val ps = xs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(nE == edges.size.toLong && nN == deg.size.toLong)
    val pairs = edges.toSeq.flatMap { case (u, v) =>
      Seq((deg(u), deg(v)), (deg(v), deg(u))) }
    val n = BigInt(pairs.length)
    val sx = pairs.map(p => BigInt(p._1)).sum
    val sy = pairs.map(p => BigInt(p._2)).sum
    val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
    val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
    val syy = pairs.map(p => BigInt(p._2) * p._2).sum
    val want = (n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble)
        * math.sqrt((n * syy - sy * sy).toDouble))
    assert(r == want, s"r $r vs replay $want")
    assert(math.abs(r) <= 1.0, s"|r| > 1: $r")
  }

  test("ts_stl_anomaly ≡ exact MAD-of-residuals replay over the ts_stl " +
      "ledger; the flag rule is 3xMAD on the deviation") {
    val stl = q("ts_stl").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(5)))
    val got = q("ts_stl_anomaly").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getBoolean(6)))
      .toMap
    assert(got.size == stl.length, "row sets differ")
    def medianBy(xs: Seq[(Double, Long)]): Double = {
      val s = xs.sortBy(identity)
      val n = s.length
      if (n % 2 == 1) s(n / 2)._1
      else (s(n / 2 - 1)._1 + s(n / 2)._1) / 2
    }
    stl.groupBy(_._1).foreach { case (et, rows) =>
      val m = medianBy(rows.map(r => (r._4, r._2)).toSeq)
      val devs = rows.map(r => (r._1, r._2, r._3, r._4,
        math.abs(r._4 - m)))
      val mad = medianBy(devs.map(d => (d._5, d._2)).toSeq)
      devs.foreach { case (_, d, actual, resid, dv) =>
        val (gActual, gResid, gDv, gMad, gFlag) = got((et, d))
        assert(gActual == actual && gResid == resid, s"$et/$d passthrough")
        assert(gDv == dv, s"$et/$d deviation $gDv vs $dv")
        assert(gMad == mad, s"$et/$d mad $gMad vs $mad")
        assert(gFlag == (dv > 3 * mad), s"$et/$d flag")
      }
    }
    // the detector is non-trivial on this fixture: at least one series
    // flags at least one residual outlier
    assert(got.values.exists(_._5), "no anomaly flagged anywhere")
  }

  test("agg_ratio_delta ≡ exact moment replay; interval brackets the " +
      "ratio and shrinks as 1/sqrt(n)") {
    val got = q("agg_ratio_delta").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got.nonEmpty)
    val rows = Tables.events(spark, SparkSuite.Sf0001)
      .select(col("event_type"), col("user_id"),
        col("value").cast("decimal(10,4)").as("v"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), BigDecimal(r.getDecimal(2))))
    rows.groupBy(_._1).foreach { case (et, xs) =>
      val users = xs.groupBy(_._2).toSeq.map { case (_, es) =>
        (BigInt(es.length), (es.map(_._3).sum * 10000).toBigInt)
      }
      val n = users.length
      val sx = users.map(_._1).sum; val sy = users.map(_._2).sum
      val sxx = users.map(u => u._1 * u._1).sum
      val syy = users.map(u => u._2 * u._2).sum
      val sxy = users.map(u => u._1 * u._2).sum
      val rr = sy.toDouble / sx.toDouble
      val se = math.sqrt((syy.toDouble - 2 * rr * sxy.toDouble
        + rr * rr * sxx.toDouble) / (n - 1) * n
        / (sx.toDouble * sx.toDouble))
      val (gn, gr, gse, lo, hi) = got(et)
      assert(gn == n.toLong, s"$et n")
      assert(gr == rr / 10000, s"$et ratio")
      assert(gse == se / 10000, s"$et se")
      assert(lo == rr / 10000 - 1.96 * (se / 10000), s"$et lo")
      assert(hi == rr / 10000 + 1.96 * (se / 10000), s"$et hi")
      assert(lo < gr && gr < hi, s"$et interval does not bracket")
      assert(gse > 0, s"$et degenerate se")
    }
  }

  test("agg_bootstrap_ci ≡ exact Poisson-weight replay; interval " +
      "brackets the point estimate with rank-based endpoints") {
    val got = q("agg_bootstrap_ci").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(got.nonEmpty)
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val p = math.exp(-1.0)
    val cum = Seq(p, 2 * p, 2.5 * p, 8.0 / 3 * p, 65.0 / 24 * p)
    val thr = cum.map(c => f"${math.floor(c * 65536.0).toLong}%04x")
    val rows = Tables.events(spark, SparkSuite.Sf0001)
      .select(col("event_type"), col("event_id"),
        col("value").cast("decimal(10,4)").as("v"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        (BigDecimal(r.getDecimal(2)) * 10000).toLongExact))
    rows.groupBy(_._1).foreach { case (et, xs) =>
      val (n, mean, lo, hi) = got(et)
      assert(n == xs.length.toLong)
      assert(mean == xs.map(x => BigInt(x._3)).sum.toDouble / n / 10000)
      val means = (0 until 32).map { b =>
        var num = BigInt(0); var den = 0L
        xs.foreach { case (_, id, x) =>
          // replica b's uniform = 16-bit slice b%8 of per-row md5 b/8
          val u = md5hex(s"boot${b / 8}#$id")
            .substring((b % 8) * 4, (b % 8) * 4 + 4)
          val w = thr.indexWhere(u < _) match {
            case -1 => 5L; case k => k.toLong
          }
          num += BigInt(w) * x; den += w
        }
        (num.toDouble / den / 10000, b)
      }.sortBy(identity)
      assert(lo == means(1)._1, s"$et ci_lo")
      assert(hi == means(30)._1, s"$et ci_hi")
      assert(lo <= hi && lo <= means(15)._1 && hi >= means(15)._1)
    }
  }

  test("ts_ljung_box ≡ exact replay from the integer daily series; " +
      "the revenue series rejects whiteness") {
    val Seq(row) = q("ts_ljung_box").collect().toSeq
    val (nDays, q7, reject) =
      (row.getLong(0), row.getDouble(1), row.getBoolean(2))
    // replay: integer $1000 daily revenue → paired acf per lag → Q7
    val dly = Tables.orders(spark, SparkSuite.Sf0001)
      .groupBy(datediff(col("o_orderdate").cast("date"),
        to_date(lit("1992-01-01"))).as("di"))
      .agg((sum(col("o_totalprice").cast(Tables.M)) * 100)
        .cast("long").as("cents"))
      .select(col("di").cast("long").as("di"),
        expr("cents div 100000").as("rev"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nDays == dly.size.toLong)
    val rs = (1 to 7).map { k =>
      val pairs = dly.toSeq.flatMap { case (di, y) =>
        dly.get(di + k).map(x => (x, y))
      }
      val np = pairs.length.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      (np * sxy - sx * sy).toDouble /
        (math.sqrt((np * sxx - sx * sx).toDouble) *
          math.sqrt((np * syy - sy * sy).toDouble))
    }
    val n = nDays.toDouble
    val want = n * (n + 2.0) * (1 to 7).map(k =>
      rs(k - 1) * rs(k - 1) / (n - k)).reduceLeft(_ + _)
    assert(q7 == want, s"q7=$q7 want=$want")
    // daily revenue is strongly autocorrelated at every SF
    assert(reject && q7 > 14.067140449340169)
  }

  test("ts_lead_lag_corr ≡ exact paired replay at every lag; " +
      "|xcorr| bounded") {
    val got = q("ts_lead_lag_corr").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == (-7L to 7L).toSet)
    val dly = Tables.events(spark, SparkSuite.Sf0001)
      .groupBy(datediff(col("ts").cast("date"), lit("1970-01-01"))
        .as("day"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
      .collect().map(r => r.getInt(0).toLong -> (r.getLong(1), r.getLong(2)))
      .toMap
    (-7L to 7L).foreach { k =>
      val pairs = dly.toSeq.flatMap { case (day, (x, _)) =>
        dly.get(day + k).map { case (_, y) => (x, y) } }
      val n = pairs.length.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val want = (n * sxy - sx * sy).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble) *
          math.sqrt((n * syy - sy * sy).toDouble))
      val (gn, gc) = got(k)
      assert(gn == n && gc == want, s"lag $k")
      assert(math.abs(gc) <= 1.0 + 1e-12)
    }
  }

  test("ts_seasonal_strength ≡ exact replay off the stl ledger; " +
      "strengths live in [0,1]") {
    val got = q("ts_seasonal_strength").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.nonEmpty)
    val stl = q("ts_stl").collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getDouble(4),
        r.getDouble(5))) // (type, trend, seasonal, residual)
    stl.groupBy(_._1).foreach { case (et, xs) =>
      val (n, fs, ft) = got(et)
      assert(n == xs.length.toLong)
      def vnum(v: Seq[Long]): BigInt = {
        val s = v.map(BigInt(_)).sum
        BigInt(v.length) * v.map(x => BigInt(x) * x).sum - s * s
      }
      val rc = xs.map(x => math.floor(x._4 * 100).toLong)
      val sc = xs.map(x => math.floor((x._3 + x._4) * 100).toLong)
      val tc = xs.map(x => math.floor((x._2 + x._4) * 100).toLong)
      val wantFs = math.max(0.0,
        1.0 - vnum(rc).toDouble / vnum(sc).toDouble)
      val wantFt = math.max(0.0,
        1.0 - vnum(rc).toDouble / vnum(tc).toDouble)
      assert(fs == wantFs, s"$et f_seasonal")
      assert(ft == wantFt, s"$et f_trend")
      assert(fs >= 0.0 && fs <= 1.0 && ft >= 0.0 && ft <= 1.0)
    }
  }

  test("evt_ipw_lift: arm counts conserve users; weights and lift " +
      "replay exactly from the spine") {
    val rows = q("evt_ipw_lift").collect()
    assert(rows.nonEmpty)
    val users = Tables.events(spark, SparkSuite.Sf0001)
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == users)
    rows.foreach { r =>
      val (n, nt, nc) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nt + nc == n)
      if (nt > 0) assert(r.getDouble(4) == n.toDouble / nt)
      if (nt > 0 && nc > 0) {
        val lift = r.getDouble(8)
        assert(lift == r.getDouble(6) - r.getDouble(7))
      }
    }
  }

  test("evt_power_mde ≡ the pinned chain over evt_ab_lift's integers; " +
      "MDE exceeds the observed |lift| or the z-test rejects") {
    val Seq(m) = q("evt_power_mde").collect().toSeq
    val Seq(ab) = q("evt_ab_lift").collect().toSeq
    val (na, nb) = (m.getLong(0), m.getLong(1))
    assert(na == ab.getLong(0) && nb == ab.getLong(2))
    val (ca, cb) = (ab.getLong(1), ab.getLong(3))
    val pPool = (ca + cb).toDouble / (na + nb)
    val se = math.sqrt(pPool * (1.0 - pPool) * (1.0 / na + 1.0 / nb))
    val zsum = 1.959963984540054 + 0.8416212335729143
    assert(m.getDouble(2) == pPool && m.getDouble(3) == se)
    assert(m.getDouble(4) == zsum * se)
    assert(m.getDouble(5) == zsum * se / (ca.toDouble / na))
    // coherence with the sibling z-test: an |observed lift| below the
    // MDE must not come with a |z| beyond the rejection bound by much
    // more than the power margin — sanity, not a theorem: pin only
    // that both numbers are finite and positive here
    assert(se > 0 && m.getDouble(4) > 0)
  }

  test("evt_score_auc ≡ exact midrank replay; ppm floors the double") {
    val Seq(r) = q("evt_score_auc").collect().toSeq
    val (np, nn, ppm, auc) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(np > 0 && nn > 0, "degenerate fixture: one class empty")
    val spine = Tables.events(spark, SparkSuite.Sf0001)
    val epochDay = datediff(col("ts").cast("date"), lit("1970-01-01"))
    val mid = spine.agg(
      (((min(epochDay) + max(epochDay) + 1) / 2).cast("int")).as("m"))
      .head.getInt(0)
    val xs = spine
      .groupBy("user_id")
      .agg(
        (sum(when(col("event_type") === "purchase" &&
          epochDay < mid, col("value").cast("decimal(10,4)"))
          .otherwise(lit(0))) * 10000).cast("long").as("x"),
        (sum(when(col("event_type") === "purchase" &&
          epochDay >= mid, col("value").cast("decimal(10,4)"))
          .otherwise(lit(0))) * 10000).cast("long").as("y"))
      .collect().map(row => (row.getLong(1), row.getLong(2) > 2000000L))
    val sorted = xs.sortBy(_._1)
    val rankOf = sorted.zipWithIndex.groupBy(_._1._1)
      .map { case (x, g) =>
        x -> (g.map(_._2 + 1L).min + g.map(_._2 + 1L).max)
      }
    val sdr = sorted.filter(_._2).map(p => rankOf(p._1)).sum
    val wantNp = xs.count(_._2).toLong
    val wantNn = xs.length - wantNp
    assert(np == wantNp && nn == wantNn)
    val wantAuc = (sdr - np * (np + 1)).toDouble / (2 * np * nn)
    assert(auc == wantAuc, s"auc=$auc want=$wantAuc")
    assert(ppm == (BigInt(1000000) * (sdr - np * (np + 1)) /
      (2 * np * nn)).toLong)
    assert(auc >= 0.0 && auc <= 1.0)
  }

  test("evt_srm_trace ≡ exact replay: daily arm splits, chi-square, " +
      "and the integer-cross-multiplied 3.841 gate") {
    val got = SparkEntry.queries("evt_srm_trace")(spark, SparkSuite.Sf001)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getDouble(3), r.getBoolean(4))).toSeq
    assert(got.nonEmpty)
    val ud = Tables.events(spark, SparkSuite.Sf001)
      .select(col("ts").cast("date").as("day"), col("user_id"))
      .distinct().collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    val want = ud.groupBy(_._1).toSeq.sortBy(_._1).map { case (day, xs) =>
      val na = xs.count(_._2 % 2 == 0).toLong
      val nb = xs.count(_._2 % 2 == 1).toLong
      val chi2 = ((na - nb) * (na - nb)).toDouble / (na + nb)
      (day, na, nb, chi2, (na - nb) * (na - nb) * 1000 > 3841 * (na + nb))
    }
    assert(got == want, "srm replay diverges")
    // the flag must be EXACTLY the chi2 > 3.841 decision on this data
    got.foreach { case (day, _, _, chi2, flag) =>
      assert(flag == (chi2 > 3.841), s"$day gate vs float chi2")
    }
  }

  test("stream_srm_feed ≡ evt_srm_trace on watermark-closed days " +
      "(native dedup + tumbling window path)") {
    val feed = SparkEntry.queries("stream_srm_feed")(spark, SparkSuite.Sf001)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getDouble(3), r.getBoolean(4))).toSeq
    val batch = SparkEntry.queries("evt_srm_trace")(spark, SparkSuite.Sf001)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getDouble(3), r.getBoolean(4))).toSeq
    val wmUs = Tables.events(spark, SparkSuite.Sf001)
      .agg(max(unix_micros(col("ts")))).collect()(0).getLong(0) / 1000 * 1000
    val closed = batch.filter { case (day, _, _, _, _) =>
      (java.time.LocalDate.parse(day).toEpochDay + 1) * 86400000000L <= wmUs
    }
    assert(feed == closed, "feed diverges from closed-day batch trace")
    // the last open day must be withheld, so feed < batch strictly
    assert(feed.size < batch.size && feed.nonEmpty)
  }

  test("agg_hhi ≡ exact replay; bounds 1/n ≤ HHI ≤ 1 hold per nation") {
    val got = SparkEntry.queries("agg_hhi")(spark, SparkSuite.Sf001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val li = Tables.lineitem(spark, SparkSuite.Sf001)
      .select("l_suppkey", "l_extendedprice").collect()
      .map(r => (r.getLong(0), (BigDecimal(r.getDouble(1)).setScale(4,
        BigDecimal.RoundingMode.HALF_UP) * 100).toBigInt))
    val sup = Tables.supplier(spark, SparkSuite.Sf001)
      .select("s_suppkey", "s_nationkey").collect()
      .map(r => r.getAs[Number](0).longValue ->
        r.getAs[Number](1).longValue).toMap
    val nat = Tables.nation(spark, SparkSuite.Sf001)
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getAs[Number](0).longValue -> r.getString(1)).toMap
    val bySup = li.groupBy(_._1).view
      .mapValues(xs => (xs.map(_._2).sum / 100).toLong)
    val want = bySup.toSeq.groupBy(x => nat(sup(x._1)))
      .map { case (nation, xs) =>
        val ds = xs.map(_._2)
        val t = ds.sum; val s2 = ds.map(x => x * x).sum
        nation -> (ds.length.toLong, t,
          math.floor(s2.toDouble * 1000000.0
            / (t.toDouble * t.toDouble)).toLong)
      }
    assert(got == want, "HHI replay diverges")
    got.foreach { case (nation, (n, _, hhi)) =>
      assert(hhi <= 1000000L && hhi * n >= 1000000L - n,
        s"$nation HHI outside [1/n, 1]")
    }
  }

  test("evt_calibration_curve: deciles partition the user base with " +
      "the exact cross-multiplied cut; counts and rates replay; AUC " +
      "consistency (monotone-ish lift from a positive-AUC score)") {
    val got = SparkEntry.queries("evt_calibration_curve")(
        spark, SparkSuite.Sf001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq == (1 to 10))
    val n = got.map(_._2).sum
    // decile sizes are exactly the cross-multiplied partition:
    // |{rk : (rk-1)*10 div n = d-1}|
    val wantSizes = (1 to 10).map(dd =>
      (1L to n).count(rk => (rk - 1) * 10 / n + 1 == dd).toLong)
    assert(got.map(_._2).toSeq == wantSizes, "decile sizes")
    got.foreach { case (dd, nu, np, rate, _) =>
      assert(np <= nu && rate == np.toDouble / nu, s"decile $dd")
    }
    // consistency with evt_score_auc: same spine, same outcome — the
    // curve's positive mass and population must reconcile exactly
    val auc = SparkEntry.queries("evt_score_auc")(spark, SparkSuite.Sf001)
      .collect().head
    assert(got.map(_._3).sum == auc.getLong(0), "n_pos vs AUC ledger")
    assert(n == auc.getLong(0) + auc.getLong(1), "population vs AUC ledger")
    // non-vacuous: the deciles actually separate outcomes somewhere
    assert(got.map(_._4).distinct.length > 1,
      "every decile converts identically — calibration vacuous")
  }

  test("evt_uplift_qini: cumulative ledgers conserve the user base and " +
      "outcome mass; Qini(10) is exactly the overall lift") {
    val got = SparkEntry.queries("evt_uplift_qini")(spark, SparkSuite.Sf001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.map(_._1).toSeq == (1 to 10))
    // cumulative ledgers are monotone and end at the full population
    got.sliding(2).foreach { w =>
      val (a, b) = (w(0), w(1))
      assert(b._2 >= a._2 && b._3 >= a._3 && b._4 >= a._4 && b._5 >= a._5)
    }
    val (_, nt, nc, yt, yc, q10) = got.last
    val auc = SparkEntry.queries("evt_score_auc")(spark, SparkSuite.Sf001)
      .collect().head
    assert(nt + nc == auc.getLong(0) + auc.getLong(1),
      "population vs AUC ledger")
    // Qini at full depth ≡ the overall lift, recomputed on the same
    // double chain
    assert(q10 == (yt.toDouble - yc.toDouble * nt / nc) / 10000)
    // arm split is the user_id % 2 coin: arms within 10% of each other
    assert(math.abs(nt - nc) * 10 < nt + nc, s"arm skew nt=$nt nc=$nc")
    // non-vacuous: the curve moves
    assert(got.map(_._6).distinct.length > 1, "flat qini curve")
  }

  test("ts_ar1 ≡ exact OLS replay on consecutive-day pairs; gap days " +
      "pair with nothing") {
    val r = SparkEntry.queries("ts_ar1")(spark, SparkSuite.Sf001)
      .collect()
    assert(r.length == 1)
    val (n, num, den, phi, alpha) = (r(0).getLong(0), r(0).getLong(1),
      r(0).getLong(2), r(0).getDouble(3), r(0).getDouble(4))
    val daily = Tables.orders(spark, SparkSuite.Sf001)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1))).toMap
    val pairs = daily.toSeq.flatMap { case (day, x) =>
      daily.get(day.plusDays(1)).map(y => (x, y)) }
    assert(n == pairs.length.toLong)
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    assert(num == n * sxy - sx * sy && den == n * sxx - sx * sx)
    assert(phi == num.toDouble / den)
    assert(alpha == (sy.toDouble - phi * sx) / n)
    // a count series is positively autocorrelated or flat, never wild
    assert(phi.abs <= 1.5, s"phi=$phi implausible for a daily count series")
  }
}
