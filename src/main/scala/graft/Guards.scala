package graft

import org.apache.spark.sql.DataFrame

/** The reference's runtime error semantics (SURVEY §2.9) as library
  * guards: hard abort on unverified rows, soft warning on unbalanced
  * days, exactly-one cardinality assertion.
  */
object Guards {

  final class UnverifiedChargesException(val n: Long)
    extends IllegalStateException(
      s"$n unverified charge(s) — NOTHING IMPORTED")

  /** Hard abort when the verification anti-join is non-empty
    * (/root/reference/src/helpers.ts:200-214: print each offender, then
    * throw). One action on the happy path (`take` short-circuits as
    * soon as offenders surface); the exact count runs only when already
    * aborting. */
  def abortIfUnverified(unverified: DataFrame, sample: Int = 20): Unit = {
    val offenders = unverified.take(sample)
    if (offenders.nonEmpty) {
      offenders.foreach(r => System.err.println(s"UNVERIFIED: $r"))
      throw new UnverifiedChargesException(unverified.count())
    }
  }

  /** Soft audit (/root/reference/src/helpers.ts:188-198): warn loudly,
    * continue. Returns the offending-day count so callers reuse it
    * instead of re-running the audit join. */
  def warnIfUnbalanced(unbalancedDays: DataFrame, sample: Int = 20): Long = {
    val n = unbalancedDays.count()
    if (n > 0) {
      System.err.println(s"WARNING: $n day(s) failed the balance audit:")
      unbalancedDays.show(sample, truncate = false)
    }
    n
  }

  final class CardinalityException(msg: String)
    extends IllegalStateException(msg)

  /** Exactly-one assertion (/root/reference/src/apiFunctions.ts:148-170):
    * `df` must have exactly one row; 0 or >1 throws. Returns the row's
    * frame for chaining. */
  def requireExactlyOne(df: DataFrame, what: String): DataFrame = {
    val n = df.limit(2).count()
    if (n == 0) throw new CardinalityException(s"no $what found")
    if (n > 1) throw new CardinalityException(s"more than one $what found")
    df
  }
}
