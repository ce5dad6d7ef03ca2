package graft

import java.time.LocalDate
import graft.SparkSuite.Sf001
import graft.functions.Fns
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Scalar-function unit + property tests — the calendar edges SURVEY
  * §7.4 flags (month-length clamping, year rollover, EOM rule), plus the
  * UDF-twin equivalence that proves the extension surface (§2.11).
  * ScalaCheck generators are sampled with fixed seeds (scalatestplus is
  * not in the offline cache) and evaluated as ONE DataFrame per
  * property.
  */
class FnsSpec extends SparkSuite {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    SparkSuite.samples(g, n)

  /** JS-semantics model of getDueDate
    * (/root/reference/src/helpers.ts:228-259) to property-test against. */
  private def model(d: LocalDate, tt: String, days: Int): LocalDate = tt match {
    case "DAYSAFTERBILLDATE" => d.plusDays(days.toLong)
    case "OFFOLLOWINGMONTH" =>
      d.plusMonths(1).withDayOfMonth(1).plusDays(days.toLong - 1)
    case "NONE" => val m = d.plusMonths(1); m.withDayOfMonth(m.lengthOfMonth)
    case _ => d // unrecognized non-null terms: bill date unchanged
  }

  private val genCase: Gen[(LocalDate, String, Int)] = for {
    off <- Gen.choose(0L, 365L * 30)
    tt <- Gen.oneOf("DAYSAFTERBILLDATE", "OFFOLLOWINGMONTH", "NONE", "COD")
    days <- Gen.choose(1, 45)
  } yield (LocalDate.of(1995, 1, 1).plusDays(off), tt, days)

  test("dueDate builtin expression matches the JS-semantics model (300 cases)") {
    val cases = samples(genCase, 300)
    val df = cases.map { case (d, tt, days) =>
      (java.sql.Date.valueOf(d), if (tt == "NONE") null else tt, days)
    }.toDF("date", "termsType", "termsDays")
    val got = df.select(
      Fns.dueDate(col("date"), col("termsType"), col("termsDays")))
      .as[java.sql.Date].collect().map(_.toLocalDate)
    cases.zip(got).foreach { case ((d, tt, days), g) =>
      assert(g == model(d, tt, days), s"($d, $tt, $days)")
    }
  }

  test("dueDate UDF twin ≡ builtin expression on real data") {
    val df = Tables.charge(spark, Sf001).filter(col("id") % 53 === 0)
      .join(broadcast(Tables.terms(spark, Sf001)), Seq("customerId"))
    val mismatch = df.select(
      Fns.dueDate(col("date"), col("termsType"), col("termsDays")).as("a"),
      Fns.dueDateUdf(col("date"), col("termsType"), col("termsDays")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(mismatch.count() == 0)
  }

  test("dueDate calendar edges") {
    def one(d: String, tt: String, days: Int): String =
      Seq((java.sql.Date.valueOf(d), if (tt == "NONE") null else tt, days))
        .toDF("date", "termsType", "termsDays")
        .select(Fns.dueDate(col("date"), col("termsType"), col("termsDays")))
        .head.getDate(0).toString
    // year rollover, both rules
    assert(one("2023-12-15", "DAYSAFTERBILLDATE", 30) == "2024-01-14")
    assert(one("2023-12-15", "OFFOLLOWINGMONTH", 10) == "2024-01-10")
    // termsDays beyond the following month's length rolls over (JS Date)
    assert(one("2023-01-15", "OFFOLLOWINGMONTH", 31) == "2023-03-03")
    // null terms: last day of FOLLOWING month (the JS day=0/month+2 trick)
    assert(one("2023-01-31", "NONE", 0) == "2023-02-28")
    assert(one("2024-01-31", "NONE", 0) == "2024-02-29") // leap year
    assert(one("2023-12-05", "NONE", 0) == "2024-01-31")
  }

  test("excelSerial round-trips against datediff (200 cases)") {
    val serials = samples(Gen.choose(1, 60000), 200)
    val rows = serials.toDF("s")
      .select(col("s"),
        datediff(Fns.excelSerial(col("s")), to_date(lit("1899-12-30"))).as("rt"))
      .as[(Int, Int)].collect()
    rows.foreach { case (s, rt) => assert(rt == s) }
  }

  test("seqnoPad zero-pads to width 4") {
    val vs = samples(Gen.choose(0, 9999), 100)
    val rows = vs.toDF("v").select(col("v"), Fns.seqnoPad(col("v")))
      .as[(Int, String)].collect()
    rows.foreach { case (v, s) =>
      assert(s.length == 4 && s.toInt == v, s"$v -> $s")
    }
  }

  test("avgBasket exact cent rounding (half-up)") {
    val got = Seq((BigDecimal("100.25"), 2L), (BigDecimal("200.01"), 2L))
      .toDF("s", "n")
      .select(Fns.avgBasket(col("s"), col("n"))).as[String].collect().toSeq
    // 100.25/2 = 50.125 → 50.13 (half-up); 200.01/2 = 100.005 → 100.01
    assert(got == Seq("50.13", "100.01"))
  }

  test("avgBasket ties at the cent boundary: HALF_UP sweep vs BigDecimal") {
    // exact x.xx5 per-customer values (the tie the integer-cent formula
    // must break upward) for many counts, plus random scale-4 totals —
    // all compared against java.math.BigDecimal divide(…, HALF_UP)
    val ties = for {
      n <- 1L to 40L
      c <- Seq(0L, 1L, 7L, 99L, 12345L)
    } yield (BigDecimal(n * (c * 100L + 50L), 4), n)
    val rand = samples(for {
      x <- Gen.choose(0L, 5000000000L)
      n <- Gen.choose(1L, 500L)
    } yield (BigDecimal(x, 4), n), 300)
    val cases = (ties ++ rand).toSeq
    val got = cases.toDF("s", "n")
      .select(Fns.avgBasket(col("s").cast("decimal(18,4)"), col("n")))
      .as[String].collect().toSeq
    cases.zip(got).foreach { case ((s, n), g) =>
      val exp = s.bigDecimal
        .divide(java.math.BigDecimal.valueOf(n), 2,
          java.math.RoundingMode.HALF_UP).toPlainString
      assert(g == exp, s"avgBasket($s, $n): got $g want $exp")
    }
  }

  test("round2 matches BigDecimal HALF_UP model") {
    val vals = samples(Gen.choose(-10000000L, 10000000L), 150)
      .map(u => BigDecimal(u, 4)) // scale-4 decimals incl. x.xx50 ties
    val got = vals.map(v => (v, BigDecimal(
      Seq(v).toDF("v").select(Fns.round2(col("v").cast("decimal(12,4)")))
        .head.getDecimal(0))))
    got.foreach { case (v, r) =>
      assert(r == v.setScale(2, BigDecimal.RoundingMode.HALF_UP), s"$v")
    }
  }

  test("idDash branch properties") {
    val rows = Seq(
      ("a-b-c", Some(1.0)), ("a-b-c", None), ("", Some(2.0)),
      ("", None), (null, Some(3.0)), (null, None), ("plain", None))
      .toDF("raw", "amt")
      .select(col("raw"), col("amt"), Fns.idDash(col("raw"), col("amt"), "42"))
      .collect().map(r => (Option(r.getString(0)), r.get(1), r.getString(2)))
    val out = rows.map(_._3)
    assert(out(0) == "ab-c")                     // first dash only
    assert(out(1) == null && out(6) == null)     // id but NO amount -> null
    assert(out(2) == "42" && out(4) == "42")     // blank/null + amount -> store
    assert(out(3) == null && out(5) == null)     // blank/null, no amount -> null
  }

  test("config dispatch: known entities resolve, unknown throws") {
    assert(Config.forEntity("pw").storeExpenseGl == "51130")
    // reference index mapping: pw→1, wb→0 (helpers.ts:36-44)
    assert(Config.forEntity("pw").tenantIndex == 1)
    assert(Config.forEntity("wb").tenantIndex == 0)
    intercept[Config.UnknownEntityException] { Config.forEntity("xx") }
  }

  test("chk_config data plane: broadcast dispatch join + strict gate") {
    val s = spark
    import s.implicits._
    val out = graft.SparkEntry.queries("chk_config")(spark, SparkSuite.Sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.getString(2)), r.getString(6))).toMap
    // known entities carry their config, no error
    assert(out("pw")._2.contains("logs/pw") && out("pw")._3 == null)
    assert(out("wb")._2.contains("logs/wb") && out("wb")._3 == null)
    // derived invalid entities carry the reference's exact message
    val invalid = out.keySet -- Set("pw", "wb")
    assert(invalid.nonEmpty)
    invalid.foreach(e =>
      assert(out(e)._2.isEmpty && out(e)._3 == Config.InvalidEntityMsg))
    // strict form: the reference's throw branch
    Config.requireAllKnown(Seq("pw", "wb").toDF("entity")) // no throw
    val e = intercept[Config.UnknownEntityException] {
      Config.requireAllKnown(Seq("pw", "zz").toDF("entity"))
    }
    assert(e.getMessage.contains("zz"))
  }
}
