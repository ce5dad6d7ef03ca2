package graft.operators

import graft.{Oracle, Q, Tables}
import graft.Tables.StoreId
import graft.functions.Fns
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.8: one oracle-checked query per scalar function in the
  * `Fns` library. Small deterministic row sets, total order in every
  * output.
  */
object Scalars {

  private val o = Oracle

  val queries: Seq[Q] = Seq(

    // Trading-terms due date (/root/reference/src/helpers.ts:228-259):
    // all branches exercised (termsType is null for 3 of 5 segments,
    // OFFOLLOWINGMONTH rolls over month lengths; unknown non-null terms
    // return the bill date unchanged, as in the reference's ternary).
    Q("fn_duedate", o.withCtes(
      s"""SELECT c.id, c.date, t.termsType, t.termsDays,
         |  ${o.dueDateSql("c.date", "t.termsType", "t.termsDays")} AS dueDate
         |FROM charge c JOIN terms t ON c.customerId = t.customerId
         |WHERE c.id % 53 = 0 ORDER BY c.id""".stripMargin, o.charge, o.terms)) {
      (s, d) =>
        Tables.charge(s, d).filter(col("id") % 53 === 0)
          .join(broadcast(Tables.terms(s, d)), Seq("customerId"))
          .select(col("id"), col("date"), col("termsType"), col("termsDays"),
            Fns.dueDate(col("date"), col("termsType"), col("termsDays"))
              .as("dueDate"))
          .orderBy("id")
    },

    // TZ shift (/root/reference/src/helpers.ts:262): UTC instant →
    // Adelaide wall clock (half-hour offset + DST).
    Q("fn_tz_offset",
      """SELECT event_id,
        |       strftime(timezone('Australia/Adelaide', timezone('UTC', CAST(ts AS TIMESTAMP))),
        |                '%Y-%m-%d %H:%M:%S') AS local_ts
        |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin) {
      (s, d) =>
        Tables.events(s, d).filter(col("event_id") < 200)
          .select(col("event_id"),
            date_format(Fns.tzShift(col("ts"), "Australia/Adelaide"),
              "yyyy-MM-dd HH:mm:ss").as("local_ts"))
          .orderBy("event_id")
    },

    // ISO day string (/root/reference/src/DataObject.ts:55).
    Q("fn_date_iso",
      """SELECT o_orderkey, strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS iso
        |FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""".stripMargin) {
      (s, d) =>
        Tables.orders(s, d).filter(col("o_orderkey") < 100)
          .select(col("o_orderkey"),
            Fns.dateIso(to_date(col("o_orderdate"))).as("iso"))
          .orderBy("o_orderkey")
    },

    // en-AU locale timestamp (/root/reference/src/DataObject.ts:30-40).
    Q("fn_date_locale", o.withCtes(
      """SELECT id, strftime(tranTimeStamp, '%d/%m/%Y, %H:%M:%S') AS fmt
        |FROM charge WHERE id < 20000 ORDER BY id""".stripMargin, o.charge)) {
      (s, d) =>
        Tables.chargeSub(s, d, 200)
          .select(col("id"), Fns.dateLocale(col("tranTimeStamp")).as("fmt"))
          .orderBy("id")
    },

    // Weekday abbreviation (/root/reference/src/queries.ts:144).
    Q("fn_weekday", o.withCtes(
      """SELECT date, upper(strftime(date, '%a')) AS wd FROM till
        |WHERE date < DATE '1995-04-01' ORDER BY date""".stripMargin,
      o.tillTotals)) { (s, d) =>
      Tables.tillTotals(s, d).filter(col("date") < "1995-04-01")
        .select(col("date"), Fns.weekdayAbbrev(col("date")).as("wd"))
        .orderBy("date")
    },

    // Excel serial date (/root/reference/src/parse.ts:64).
    Q("fn_excel_serial",
      """SELECT p_partkey, CAST(DATE '1899-12-30' + (p_size + 45000) * INTERVAL '1 day' AS DATE) AS d
        |FROM part WHERE p_partkey < 100 ORDER BY p_partkey""".stripMargin) {
      (s, d) =>
        Tables.part(s, d).filter(col("p_partkey") < 100)
          .select(col("p_partkey"),
            Fns.excelSerial(col("p_size") + 45000).as("d"))
          .orderBy("p_partkey")
    },

    // Fixed 2-day due date (/root/reference/src/DataObject.ts:147).
    Q("fn_date_plus2", o.withCtes(
      """SELECT date, CAST(date + 2 * INTERVAL '1 day' AS DATE) AS dueDate
        |FROM till WHERE date < DATE '1995-04-01' ORDER BY date""".stripMargin,
      o.tillTotals)) { (s, d) =>
      Tables.tillTotals(s, d).filter(col("date") < "1995-04-01")
        .select(col("date"), Fns.datePlus2(col("date")).as("dueDate"))
        .orderBy("date")
    },

    // GST gross-up ×11 (/root/reference/src/DataObject.ts:113) — with the
    // `?? 0` precedence bug corrected to a real coalesce.
    Q("fn_gst", o.withCtes(
      """SELECT date,
        |       CAST(COALESCE(totalGst, CAST(0 AS DECIMAL(12,4))) * 11 AS DOUBLE) AS gstSales
        |FROM till ORDER BY date""".stripMargin, o.tillTotals)) { (s, d) =>
      Tables.tillTotals(s, d)
        .select(col("date"),
          Fns.gstGross(col("totalGst")).cast("double").as("gstSales"))
        .orderBy("date")
    },

    // Negated rounding (/root/reference/src/DataObject.ts:139).
    Q("fn_rounding_neg", o.withCtes(
      """SELECT date,
        |       CAST(-COALESCE(totalRounding, CAST(0 AS DECIMAL(12,4))) AS DOUBLE) AS rounding
        |FROM till ORDER BY date""".stripMargin, o.tillTotals)) { (s, d) =>
      Tables.tillTotals(s, d)
        .select(col("date"),
          Fns.roundingNeg(col("totalRounding")).cast("double").as("rounding"))
        .orderBy("date")
    },

    // Absolute value (/root/reference/src/DataObject.ts:65).
    Q("fn_abs", o.withCtes(
      """SELECT id, CAST(abs(amount) AS DOUBLE) AS unitAmount
        |FROM charge WHERE id < 20000 ORDER BY id""".stripMargin, o.charge)) {
      (s, d) =>
        Tables.chargeSub(s, d, 200)
          .select(col("id"), abs(col("amount")).cast("double").as("unitAmount"))
          .orderBy("id")
    },

    // 2-dp rounding, `toFixed(2)` analog (/root/reference/src/queries.ts:15)
    // — exact decimal in, HALF_UP in both engines.
    Q("fn_round2", o.withCtes(
      """SELECT id, CAST(round(amount, 2) AS DOUBLE) AS r2
        |FROM charge WHERE id < 20000 ORDER BY id""".stripMargin, o.charge)) {
      (s, d) =>
        Tables.chargeSub(s, d, 200)
          .select(col("id"), Fns.round2(col("amount")).cast("double").as("r2"))
          .orderBy("id")
    },

    // Average basket `toFixed(2)` string (/root/reference/src/queries.ts:146).
    Q("fn_avg_basket", o.withCtes(
      s"""SELECT date, ${o.avgBasketSql("totalSales", "customerCount")} AS avgBasket
         |FROM till ORDER BY date""".stripMargin, o.tillTotals)) { (s, d) =>
      Tables.tillTotals(s, d)
        .select(col("date"),
          Fns.avgBasket(col("totalSales"), col("customerCount")).as("avgBasket"))
        .orderBy("date")
    },

    // Zero-pad to 4 (/root/reference/src/parse.ts:94).
    Q("fn_seqno_pad",
      """SELECT l_orderkey, l_linenumber,
        |       lpad(CAST(l_linenumber AS VARCHAR), 4, '0') AS seqNo
        |FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber""".stripMargin) {
      (s, d) =>
        Tables.lineitem(s, d).filter(col("l_orderkey") < 100)
          .select(col("l_orderkey"), col("l_linenumber"),
            Fns.seqnoPad(col("l_linenumber")).as("seqNo"))
          .orderBy("l_orderkey", "l_linenumber")
    },

    // Customer-id normalization (/root/reference/src/parse.ts:86-93):
    // dash-strip / store-default / null branches all exercised; the
    // dash-strip branch is gated on the amount cell being present (the
    // reference's ternary nests under the amount check, so an id with no
    // amount yields null).
    Q("fn_id_dash", s"""
      |SELECT c_custkey, raw,
      |       CASE WHEN amt IS NOT NULL AND raw IS NOT NULL AND length(raw) > 0
      |              THEN regexp_replace(raw, '^([^-]*)-', '\\1')
      |            WHEN amt IS NOT NULL THEN '$StoreId'
      |            ELSE NULL END AS customerId
      |FROM (SELECT c_custkey,
      |             CASE WHEN c_custkey % 3 = 0
      |                    THEN concat(CAST(c_custkey AS VARCHAR), '-', CAST(c_nationkey AS VARCHAR))
      |                  WHEN c_custkey % 3 = 1 THEN NULL
      |                  ELSE CAST(c_custkey AS VARCHAR) END AS raw,
      |             CASE WHEN c_custkey % 2 = 0 THEN c_acctbal END AS amt
      |      FROM customer) t
      |ORDER BY c_custkey""".stripMargin.trim) { (s, d) =>
      val base = Tables.customer(s, d).select(
        col("c_custkey"),
        when(col("c_custkey") % 3 === 0,
          concat(col("c_custkey").cast("string"), lit("-"),
            col("c_nationkey").cast("string")))
          .when(col("c_custkey") % 3 === 1, lit(null).cast("string"))
          .otherwise(col("c_custkey").cast("string")).as("raw"),
        when(col("c_custkey") % 2 === 0, col("c_acctbal")).as("amt"))
      base.select(col("c_custkey"), col("raw"),
        Fns.idDash(col("raw"), col("amt"), StoreId).as("customerId"))
        .orderBy("c_custkey")
    },

    // Conditional GL code (/root/reference/src/DataObject.ts:29).
    Q("fn_glcode", o.withCtes(
      s"""SELECT id, customerId,
         |       CASE WHEN customerId = '$StoreId' THEN '42010' ELSE '41010' END AS accountCode
         |FROM charge WHERE customerId IN ('$StoreId', '100') ORDER BY id""".stripMargin,
      o.charge)) { (s, d) =>
      Tables.charge(s, d).filter(col("customerId").isin(StoreId, "100"))
        .select(col("id"), col("customerId"),
          Fns.glCode(col("customerId"), StoreId).as("accountCode"))
        .orderBy("id")
    },

    // POS reference concat (/root/reference/src/DataObject.ts:28).
    Q("fn_ref_concat", o.withCtes(
      """SELECT id, concat(terminalId, '/', seqNo) AS ref
        |FROM charge WHERE id < 20000 ORDER BY id""".stripMargin, o.charge)) {
      (s, d) =>
        Tables.chargeSub(s, d, 200)
          .select(col("id"),
            Fns.refConcat(col("terminalId"), col("seqNo")).as("ref"))
          .orderBy("id")
    },

    // Multiline description template (/root/reference/src/DataObject.ts:30-40).
    Q("fn_desc_template", o.withCtes(
      """SELECT id,
        |       concat('Customer POS Account Sale', ': ', chr(10), '* POS ID: ',
        |              terminalId, '/', seqNo,
        |              chr(10), '* Timestamp: ', strftime(tranTimeStamp, '%d/%m/%Y, %H:%M:%S'),
        |              chr(10), '* TransactionID: ', CAST(id AS VARCHAR)) AS description
        |FROM charge WHERE id < 10000 ORDER BY id""".stripMargin, o.charge)) {
      (s, d) =>
        Tables.chargeSub(s, d, 100)
          .select(col("id"),
            Fns.descTemplate(lit(null).cast("string"),
              Fns.refConcat(col("terminalId"), col("seqNo")),
              col("tranTimeStamp"), col("id")).as("description"))
          .orderBy("id")
    },

    // DD title template (/root/reference/src/queries.ts:144-146).
    Q("fn_ddtitle", o.withCtes(
      s"""SELECT date,
         |       concat('DD', '/', upper(strftime(date, '%a')), '/',
         |              CAST(customerCount AS VARCHAR), '/',
         |              ${o.avgBasketSql("totalSales", "customerCount")}) AS ddTitle
         |FROM till ORDER BY date""".stripMargin, o.tillTotals)) { (s, d) =>
      Tables.tillTotals(s, d)
        .select(col("date"),
          Fns.ddTitle(col("date"), col("customerCount"), col("totalSales"))
            .as("ddTitle"))
        .orderBy("date")
    },

    // Attachment file name (/root/reference/src/helpers.ts:76).
    Q("fn_filename", o.withCtes(
      """SELECT date, concat('DD ', lpad(CAST(day(date) AS VARCHAR), 2, '0'), '.xls') AS fileName
        |FROM till WHERE date < DATE '1995-04-01' ORDER BY date""".stripMargin,
      o.tillTotals)) { (s, d) =>
      Tables.tillTotals(s, d).filter(col("date") < "1995-04-01")
        .select(col("date"), Fns.fileName(col("date")).as("fileName"))
        .orderBy("date")
    },

    // Null defaulting (`??` fallbacks, /root/reference/src/parse.ts:85-95).
    Q("fn_coalesce", o.withCtes(
      """SELECT customerId, COALESCE(termsType, 'NONE') AS termsTypeOrDefault,
        |       COALESCE(nullif(termsDays, 10), -1) AS termsDaysOrSentinel
        |FROM terms ORDER BY customerId""".stripMargin, o.terms)) { (s, d) =>
      Tables.terms(s, d)
        .select(col("customerId"),
          coalesce(col("termsType"), lit("NONE")).as("termsTypeOrDefault"),
          coalesce(nullif(col("termsDays"), lit(10)), lit(-1))
            .as("termsDaysOrSentinel"))
        .orderBy("customerId")
    },

    // Object → JSON text (/root/reference/src/helpers.ts:98): compact
    // JSON, declaration key order in both engines.
    Q("fn_json_out", o.withCtes(
      """SELECT id,
        |       to_json(struct_pack(id := id, customerId := customerId,
        |                           seqNo := seqNo)) AS js
        |FROM charge WHERE id < 10000 ORDER BY id""".stripMargin, o.charge)) {
      (s, d) =>
        Tables.chargeSub(s, d, 100)
          .select(col("id"),
            to_json(struct(col("id"), col("customerId"), col("seqNo")))
              .as("js"))
          .orderBy("id")
    }
  )
}
