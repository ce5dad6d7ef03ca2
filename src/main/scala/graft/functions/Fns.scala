package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The engine's scalar-function library: every §2.8 function from
  * SURVEY.md as a composable `Column` function built from codegen'd
  * Spark built-ins (no UDFs in the hot path — `dueDateUdf` exists only
  * to prove the extension surface and is tested ≡ `dueDate`).
  */
object Fns {

  /** Trading-terms due date (/root/reference/src/helpers.ts:228-259).
    * Four branches, JS `Date` rollover semantics:
    *  - DAYSAFTERBILLDATE: date + termsDays.
    *  - OFFOLLOWINGMONTH: day `termsDays` of the following month, with
    *    natural rollover when termsDays exceeds the month length
    *    (`new Date(y, m+1, d)` in JS ≡ first-of-next-month + (d-1) days).
    *  - null terms: "EOM after EOM" — JS `day=0, month+=2` trick ≡ last
    *    day of the following month.
    *  - non-null terms matching neither constant: the reference's nested
    *    ternary falls through and returns the bill date unchanged.
    */
  def dueDate(date: Column, termsType: Column, termsDays: Column): Column =
    when(termsType === "DAYSAFTERBILLDATE", date_add(date, termsDays))
      .when(termsType === "OFFOLLOWINGMONTH",
        date_add(trunc(add_months(date, 1), "MM"), termsDays - lit(1)))
      .when(termsType.isNull, last_day(add_months(date, 1)))
      .otherwise(date)

  /** Scala-UDF twin of [[dueDate]] (extension-surface demo; SURVEY §2.11).
    * Kept off every query path — tests assert UDF ≡ built-in version. */
  val dueDateUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((date: java.sql.Date, termsType: String, termsDays: Integer) => {
      val ld = date.toLocalDate
      val res = termsType match {
        case "DAYSAFTERBILLDATE" => ld.plusDays(termsDays.toLong)
        case "OFFOLLOWINGMONTH" =>
          ld.plusMonths(1).withDayOfMonth(1).plusDays(termsDays.toLong - 1)
        case null =>
          val m = ld.plusMonths(1)
          m.withDayOfMonth(m.lengthOfMonth)
        case _ => ld
      }
      java.sql.Date.valueOf(res)
    })

  /** TZ_OFFSET shift (/root/reference/src/helpers.ts:262): UTC instant →
    * wall-clock at tz. */
  def tzShift(ts: Column, tz: String): Column = from_utc_timestamp(ts, tz)

  /** ISO day string — `.toISOString().slice(0,10)`
    * (/root/reference/src/DataObject.ts:55 et al.). */
  def dateIso(d: Column): Column = date_format(d, "yyyy-MM-dd")

  /** en-AU locale timestamp `dd/MM/yyyy, HH:mm:ss`
    * (/root/reference/src/DataObject.ts:30-40). */
  def dateLocale(ts: Column): Column = date_format(ts, "dd/MM/yyyy, HH:mm:ss")

  /** Upper-cased weekday abbreviation, e.g. "TUE"
    * (/root/reference/src/queries.ts:144). */
  def weekdayAbbrev(d: Column): Column = upper(date_format(d, "EEE"))

  /** Excel serial day → date (/root/reference/src/parse.ts:64):
    * `Date.UTC(0, 0, serial - 1)` ≡ 1899-12-30 + serial days. */
  def excelSerial(serial: Column): Column =
    date_add(to_date(lit("1899-12-30")), serial)

  /** DD-invoice fixed due date: date + 2 days
    * (/root/reference/src/DataObject.ts:147). */
  def datePlus2(d: Column): Column = date_add(d, 2)

  /** GST gross-up ×11 (/root/reference/src/DataObject.ts:113) — with the
    * `?? 0` precedence bug fixed via a real coalesce. */
  def gstGross(totalGst: Column): Column =
    coalesce(totalGst, lit(0).cast(DecimalType(12, 4))) * 11

  /** Negated rounding (/root/reference/src/DataObject.ts:139). */
  def roundingNeg(r: Column): Column =
    -coalesce(r, lit(0).cast(DecimalType(12, 4)))

  /** 2-dp rounding (`toFixed(2)` analog,
    * /root/reference/src/queries.ts:15). */
  def round2(c: Column): Column = round(c, 2)

  /** Zero-pad seq number to 4 (/root/reference/src/parse.ts:94). */
  def seqnoPad(c: Column): Column = lpad(c.cast("string"), 4, "0")

  /** Customer-id normalization (/root/reference/src/parse.ts:86-93):
    * the reference's ternary nests under the amount-cell check, so an id
    * with no amount yields null — value AND amount present → strip FIRST
    * dash; blank id with amount → store id; no amount → null. */
  def idDash(raw: Column, amount: Column, storeId: String): Column =
    when(amount.isNotNull && raw.isNotNull && length(raw) > 0,
      regexp_replace(raw, "^([^-]*)-", "$1"))
      .when(amount.isNotNull, lit(storeId))
      .otherwise(lit(null).cast("string"))

  /** Conditional GL account code (/root/reference/src/DataObject.ts:29);
    * store-id plays the "45678" special case. */
  def glCode(customerId: Column, storeId: String): Column =
    when(customerId === storeId, "42010").otherwise("41010")

  /** POS reference `terminalId/seqNo`
    * (/root/reference/src/DataObject.ts:28). */
  def refConcat(terminalId: Column, seqNo: Column): Column =
    concat_ws("/", terminalId, seqNo)

  /** Multiline line-item description template
    * (/root/reference/src/DataObject.ts:30-40). */
  def descTemplate(notes: Column, ref: Column, ts: Column, id: Column): Column =
    concat(
      coalesce(notes, lit("Customer POS Account Sale")),
      lit(": \n* POS ID: "), ref,
      lit("\n* Timestamp: "), dateLocale(ts),
      lit("\n* TransactionID: "), id.cast("string"))

  /** Average basket `toFixed(2)` string
    * (/root/reference/src/queries.ts:146). Exact integer-cent arithmetic:
    * half-up rounding of (totalSales/count) to cents via
    * floor((2a+b)/2b) — engine-identical, unlike `round(double, 2)`
    * whose tie-breaking differs between Spark (shortest-repr half-up)
    * and DuckDB (binary-nearest). */
  def avgBasket(totalSales: Column, customerCount: Column): Column = {
    val x = (totalSales.cast(DecimalType(18, 4)) * 10000).cast("long")
    val n = customerCount.cast("long")
    val cents = floor((x * 2 + n * 100) / (n * 200)).cast("long")
    concat(floor(cents / lit(100.0)).cast("long").cast("string"), lit("."),
      lpad((cents % 100).cast("string"), 2, "0"))
  }

  /** DD title `DD/{WEEKDAY}/{count}/{avg}`
    * (/root/reference/src/queries.ts:144-146). */
  def ddTitle(date: Column, customerCount: Column, totalSales: Column): Column =
    concat_ws("/", lit("DD"), weekdayAbbrev(date),
      customerCount.cast("string"), avgBasket(totalSales, customerCount))

  /** Attachment file name `DD {dd}.xls`
    * (/root/reference/src/helpers.ts:76). */
  def fileName(date: Column): Column =
    concat(lit("DD "), lpad(dayofmonth(date).cast("string"), 2, "0"),
      lit(".xls"))

  /** Canonical 4-dp rendering of a double for the document JSON:
    * half-up via exact integer math on the IEEE product `|x|·10⁴+0.5` —
    * deterministic and engine-identical (`Oracle.fmt4Sql` mirrors it),
    * unlike `%.4f` (Java rounds the double's SHORTEST repr half-up, C
    * and DuckDB round the exact binary value — they disagree whenever
    * the shortest repr ends in 5 at the cut). */
  def fmt4(x: Column): Column = {
    val n = floor(abs(x) * 10000 + 0.5).cast("long")
    concat(
      when(x < 0 && n > 0, "-").otherwise(""),
      floor(n / 10000).cast("long").cast("string"), lit("."),
      lpad((n % 10000).cast("string"), 4, "0"))
  }

  /** JSON string escape for the canonical document serialization:
    * backslash, double quote, newline — the only JSON-special characters
    * these payloads can carry. Literal (non-regex) replaces, mirrored
    * 1:1 by `replace(...)` in the DuckDB oracles. */
  def jsonEsc(c: Column): Column =
    replace(
      replace(
        replace(c, lit("\\"), lit("\\\\")),
        lit("\""), lit("\\\"")),
      lit("\n"), lit("\\n"))
}
