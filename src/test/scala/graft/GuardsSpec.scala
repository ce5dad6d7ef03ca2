package graft

import graft.SparkSuite.Sf001
import org.apache.spark.sql.functions._

/** Reference error-semantics: abort / warn / exactly-one guards. */
class GuardsSpec extends SparkSuite {

  private def anti = Tables.xlsxCharges(spark, Sf001)
    .join(Tables.charge(spark, Sf001),
      Seq("date", "customerId", "seqNo", "amount"), "left_anti")

  test("abortIfUnverified throws on fixture's perturbed rows") {
    val e = intercept[Guards.UnverifiedChargesException] {
      Guards.abortIfUnverified(anti.limit(3), sample = 3)
    }
    assert(e.n == 3)
  }

  test("abortIfUnverified passes an empty frame") {
    Guards.abortIfUnverified(anti.filter(lit(false)))
  }

  test("warnIfUnbalanced returns the offending-day count") {
    val days = SparkEntry.queries("chk_balance_warn")(spark, Sf001)
    assert(Guards.warnIfUnbalanced(days, sample = 1) > 0)
    assert(Guards.warnIfUnbalanced(days.filter(lit(false))) == 0)
  }

  test("requireExactlyOne: 1 passes, 0 and 2 throw") {
    val till = Tables.tillTotals(spark, Sf001)
    val one = till.orderBy("date").limit(1)
    assert(Guards.requireExactlyOne(one, "till row").count() == 1)
    intercept[Guards.CardinalityException] {
      Guards.requireExactlyOne(till.filter(lit(false)), "till row")
    }
    intercept[Guards.CardinalityException] {
      Guards.requireExactlyOne(till.limit(2), "till row")
    }
  }
}
