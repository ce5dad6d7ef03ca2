package graft.operators

import graft.{Oracle, Q}
import graft.sources.{RestSource, XlsxTableProvider, XlsxWrite}
import org.apache.spark.sql.functions._

/** The remaining SURVEY §2 inventory rows as concrete queries, so every
  * ID in the operator tables has a runnable, checkable entry:
  * `src_xlsx_grid` (the cell-grid parser over the §A5 literal fixture),
  * `src_jdbc_lookup` / `src_jdbc_daily` (the Postgres lookup/fan-out
  * patterns over the parquet-backed views — no JDBC endpoint exists in
  * this harness, the access pattern is what's expressed),
  * `snk_attach` (binary file source feeding the attachment sink path),
  * `join_api_point` (REST point-lookup join + cardinality audit),
  * `fn_where_string` (API filter-string construction).
  */
object Inventory {

  /** Gap-30-min session spans per user — the win_sessionize kernel
    * (lag-gap flags → running session id → one grouped aggregate),
    * exposed for composition: join_interval_overlap consumes the spans
    * as its interval relation. Returns
    * (user_id, sid, start_us, end_us, n, total). */
  private[graft] def sessionSpans(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    graft.Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("ns",
        when(lag(col("us"), 1).over(w).isNull
          || col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("ns")).over(wRun).cast("int"))
      .groupBy("user_id", "sid")
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"),
        count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(10, 4)))
          .cast("double").as("total"))
  }

  /** SQL mirror of [[sessionSpans]] as a CTE chain ending in `sp`. */
  private[graft] val sessionSpansSql: String =
    """e AS (
      |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
      |  FROM events
      |), f AS (
      |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
      |                   OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS ns
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
      |), g AS (
      |  SELECT *, CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER) AS sid
      |  FROM f
      |), sp AS (
      |  SELECT user_id, sid, MIN(us) AS start_us, MAX(us) AS end_us,
      |         COUNT(*) AS n,
      |         CAST(SUM(CAST(value AS DECIMAL(10,4))) AS DOUBLE) AS total
      |  FROM g GROUP BY user_id, sid
      |)""".stripMargin

  /** The FIXTURES.md §A5 grid as a REAL `.xlsx` workbook (sheet
    * "A4 Summary", date serial in B3 as the reference reads it,
    * /root/reference/src/parse.ts:63-64), written to a deterministic
    * temp drop-dir. Returns the dir. */
  private def fixtureCells: Seq[XlsxWrite.CellOut] = {
    def s(ref: String, v: String) = XlsxWrite.CellOut(ref, v, isNumber = false)
    def n(ref: String, v: String) = XlsxWrite.CellOut(ref, v, isNumber = true)
    Seq(
      n("B3", "45000"),
      n("D15", "-2.50"), // till variance (parse.ts:65: ws?.D15?.v ?? 0)
      s("C5", "Amount"),
      s("C21", "Amount"),
      n("C22", "100.00"), s("D22", "45-678"), n("E22", "12"), s("F22", "note a"),
      n("C23", "-25.50"), s("D23", "9001"), n("E23", "13"),
      n("C24", "0.00"), s("D24", "9002"), n("E24", "14"),
      n("C26", "50.00"), s("D26", ""), n("E26", "15"),
      s("C27", "Amount"),
      n("C28", "77.77"), s("D28", "skipped"), n("E28", "77"),
      n("C29", "-30.00"), s("D29", "7001"), n("E29", "16"), s("F29", "pay note"),
      n("C31", "20.00"), s("D31", "7002"), n("E31", "17"),
      s("D32", "Total Charges"))
  }

  /** Content-addressed fixture drop dir: the directory NAME carries a
    * hash of the exact file set, so the drop-dir queries (which read
    * the whole directory) can never pick up stale files from an older
    * fixture version or a concurrent run's different content — those
    * live under a different name. Creation is atomic (write to a temp
    * dir, ATOMIC_MOVE into place; a concurrent creator of the same
    * content harmlessly loses the move), so a reader never sees a
    * half-written directory. */
  private def contentDropDir(name: String,
      files: Seq[(String, Array[Byte])]): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val digest = java.security.MessageDigest.getInstance("MD5")
    files.foreach { case (n, b) =>
      digest.update(n.getBytes("UTF-8")); digest.update(b)
    }
    val tag = digest.digest().take(8).map("%02x".format(_)).mkString
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), s"$name-$tag")
    if (!Files.exists(dir)) {
      val tmp = Files.createTempDirectory(s"$name-stage-")
      files.foreach { case (n, b) => Files.write(tmp.resolve(n), b) }
      try Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
      catch {
        // the concurrent creator won the rename — Linux reports that as
        // ENOTEMPTY (DirectoryNotEmptyException) for a non-empty target,
        // other platforms as FileAlreadyExists; either way OUR staged
        // copy is now redundant: drop it instead of leaking temp dirs
        case _: java.nio.file.FileAlreadyExistsException
            | _: java.nio.file.DirectoryNotEmptyException =>
          val ls = Files.list(tmp)
          try ls.forEach(p => Files.deleteIfExists(p))
          finally ls.close()
          Files.deleteIfExists(tmp)
      }
    }
    dir.toString
  }

  def ensureXlsxFixture(): String =
    contentDropDir("graft-xlsx-drop",
      Seq("DD 15.xlsx" -> XlsxWrite.workbook("A4 Summary", fixtureCells)))

  /** The SAME grid written as a legacy BIFF8 `.xls` — the reference's
    * own output extension (/root/reference/src/helpers.ts:76). */
  def ensureXlsFixture(): String =
    contentDropDir("graft-xls-drop",
      Seq("DD 16.xls" ->
        graft.sources.XlsWrite.workbook("A4 Summary", fixtureCells)))

  /** CSV drop-dir fixture: two daily files plus one malformed line —
    * the "partners upload CSVs" ingest a drop-dir pipeline sees. */
  def ensureCsvFixture(): String = {
    import java.nio.charset.StandardCharsets.UTF_8
    contentDropDir("graft-csv-drop", Seq(
      "day1.csv" ->
        ("id,date,amount,customer\n" +
          "1,2023-03-15,100.00,45678\n" +
          "2,2023-03-15,-25.50,9001\n" +
          "bad,notadate,xx,\n").getBytes(UTF_8),
      "day2.csv" ->
        ("id,date,amount,customer\n" +
          "10,2023-03-16,50.00,42\n").getBytes(UTF_8)))
  }

  val queries: Seq[Q] = Seq(

    // CSV drop-dir ingestion with an explicit schema and PERMISSIVE
    // bad-record capture: the malformed line surfaces as a row with
    // null typed columns and the raw line in the corrupt column —
    // quarantine-able downstream instead of failing the whole feed (or
    // silently vanishing). Schema-applied CSV scans parallelize per
    // file split at scale; nothing here is driver-side.
    Q("src_csv_dropdir",
      """SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS id, DATE '2023-03-15' AS date,
        |         CAST(100.00 AS DOUBLE) AS amount, '45678' AS customer,
        |         CAST(NULL AS VARCHAR) AS corrupt
        |  UNION ALL SELECT 2, DATE '2023-03-15', -25.50, '9001', NULL
        |  UNION ALL SELECT 10, DATE '2023-03-16', 50.00, '42', NULL
        |  UNION ALL SELECT NULL, NULL, NULL, NULL, 'bad,notadate,xx,'
        |) t ORDER BY corrupt IS NOT NULL, id""".stripMargin) { (s, _) =>
      val dir = ensureCsvFixture()
      s.read
        .schema("id BIGINT, date DATE, amount DOUBLE, customer STRING, " +
          "_corrupt_record STRING")
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(dir)
        .select(col("id"), col("date"), col("amount"), col("customer"),
          col("_corrupt_record").as("corrupt"))
        .orderBy(col("corrupt").isNotNull, col("id"))
    },

    // REAL workbook-bytes ingestion end-to-end: the §A5 fixture written
    // as an actual .xlsx (ZIP + OOXML), listed and parsed by the
    // XlsxTableProvider DSv2 source (one partition per file), the date
    // serial fetched from B3 exactly like the reference
    // (/root/reference/src/parse.ts:63), then the SAME CellGrid band
    // parse as src_xlsx_grid. Oracle: the expected parsed rows.
    Q("src_xlsx_file",
      """SELECT * FROM (
        |  SELECT 'SALE' AS rowType, DATE '2023-03-15' AS date, CAST(100.00 AS DOUBLE) AS amount,
        |         '45678' AS customerId, '0012' AS seqNo, 'note a' AS notes, 22 AS row_idx
        |  UNION ALL SELECT 'CR', DATE '2023-03-15', CAST(-25.50 AS DOUBLE), '9001', '0013', NULL, 23
        |  UNION ALL SELECT 'SALE', DATE '2023-03-15', CAST(50.00 AS DOUBLE), '42', '0015', NULL, 26
        |  UNION ALL SELECT 'PAYMENT', DATE '2023-03-15', CAST(30.00 AS DOUBLE), '7001', '0016', 'pay note', 29
        |  UNION ALL SELECT 'PAYMENT', DATE '2023-03-15', CAST(20.00 AS DOUBLE), '7002', '0017', NULL, 31
        |) t ORDER BY row_idx""".stripMargin) { (s, _) =>
      val dir = ensureXlsxFixture()
      val grid = s.read.format(classOf[XlsxTableProvider].getName)
        .option("sheet", "A4 Summary")
        .option("pattern", "^DD \\d\\d\\.xlsx$")
        .load(dir)
      // each workbook's date comes from ITS OWN B3 (the reference's
      // per-file ws.B3.v read) — distributed, no driver point lookup
      CellGrid.parsePerFile(grid)
        .withColumn("amount", col("amount").cast("double"))
        .orderBy("row_idx")
    },

    // The SAME end-to-end flow from a legacy BIFF8 .xls workbook — the
    // reference's production format (its filename template writes
    // `.xls`, /root/reference/src/helpers.ts:76; SheetJS reads both at
    // src/parse.ts:61-63). The DSv2 source dispatches on the CFB magic
    // to the first-party Xls reader; identical oracle rows prove the
    // binary path parses the grid identically to OOXML.
    Q("src_xls_file",
      """SELECT * FROM (
        |  SELECT 'SALE' AS rowType, DATE '2023-03-15' AS date, CAST(100.00 AS DOUBLE) AS amount,
        |         '45678' AS customerId, '0012' AS seqNo, 'note a' AS notes, 22 AS row_idx
        |  UNION ALL SELECT 'CR', DATE '2023-03-15', CAST(-25.50 AS DOUBLE), '9001', '0013', NULL, 23
        |  UNION ALL SELECT 'SALE', DATE '2023-03-15', CAST(50.00 AS DOUBLE), '42', '0015', NULL, 26
        |  UNION ALL SELECT 'PAYMENT', DATE '2023-03-15', CAST(30.00 AS DOUBLE), '7001', '0016', 'pay note', 29
        |  UNION ALL SELECT 'PAYMENT', DATE '2023-03-15', CAST(20.00 AS DOUBLE), '7002', '0017', NULL, 31
        |) t ORDER BY row_idx""".stripMargin) { (s, _) =>
      val dir = ensureXlsFixture()
      val grid = s.read.format(classOf[XlsxTableProvider].getName)
        .option("sheet", "A4 Summary")
        .option("pattern", "^DD \\d\\d\\.xls$")
        .load(dir)
      CellGrid.parsePerFile(grid)
        .withColumn("amount", col("amount").cast("double"))
        .orderBy("row_idx")
    },

    // XLSX cell-grid parse (/root/reference/src/parse.ts:61-146) over
    // the FIXTURES.md §A5 literal grid; oracle = the expected parsed
    // rows as literals (the parse is deterministic).
    Q("src_xlsx_grid",
      """SELECT * FROM (
        |  SELECT 'SALE' AS rowType, DATE '2023-03-15' AS date, CAST(100.00 AS DOUBLE) AS amount,
        |         '45678' AS customerId, '0012' AS seqNo, 'note a' AS notes, 22 AS row_idx
        |  UNION ALL SELECT 'CR', DATE '2023-03-15', CAST(-25.50 AS DOUBLE), '9001', '0013', NULL, 23
        |  UNION ALL SELECT 'SALE', DATE '2023-03-15', CAST(50.00 AS DOUBLE), '42', '0015', NULL, 26
        |  UNION ALL SELECT 'PAYMENT', DATE '2023-03-15', CAST(30.00 AS DOUBLE), '7001', '0016', 'pay note', 29
        |  UNION ALL SELECT 'PAYMENT', DATE '2023-03-15', CAST(20.00 AS DOUBLE), '7002', '0017', NULL, 31
        |) t ORDER BY row_idx""".stripMargin) { (s, _) =>
      import s.implicits._
      val grid = Seq(
        (5, "Amount", null, null, null, null),
        (21, "Amount", null, null, null, null),
        (22, "100.00", "45-678", "12", "note a", null),
        (23, "-25.50", "9001", "13", null, null),
        (24, "0.00", "9002", "14", null, null),
        (25, null, null, null, null, null),
        (26, "50.00", "", "15", null, null),
        (27, "Amount", null, null, null, null),
        (28, "77.77", "skipped", "77", null, null),
        (29, "-30.00", "7001", "16", "pay note", null),
        (31, "20.00", "7002", "17", null, null),
        (32, null, "Total Charges", null, null, null)
      ).toDF("row_idx", "colC", "colD", "colE", "colF", "colG")
      CellGrid.parse(grid, excelSerialDate = 45000)
        .withColumn("amount", col("amount").cast("double"))
        .orderBy("row_idx")
    },

    // Postgres point lookup (findUniqueOrThrow on till date,
    // /root/reference/src/queries.ts:57-59): one filtered row off the
    // unique-per-date view — the JDBC predicate-pushdown pattern.
    Q("src_jdbc_lookup", Oracle.withCtes(
      """SELECT date, customerCount, CAST(totalSales AS DOUBLE) AS totalSales,
        |       CAST(totalGst AS DOUBLE) AS totalGst, orderCount
        |FROM till WHERE date = DATE '1995-01-04'""".stripMargin,
      Oracle.tillTotals)) { (s, d) =>
      graft.Tables.tillTotals(s, d).filter(col("date") === "1995-01-04")
        .select(col("date"), col("customerCount"),
          col("totalSales").cast("double").as("totalSales"),
          col("totalGst").cast("double").as("totalGst"), col("orderCount"))
    },

    // The 5-query daily fan-out (/root/reference/src/queries.ts:56-122,
    // `Promise.all`): one date through the full rollup frame — Catalyst
    // runs the independent aggregate branches concurrently, and the date
    // predicate pushes below every groupBy.
    Q("src_jdbc_daily", Oracle.withCtes(
      """SELECT date, customerCount, CAST(totalSales AS DOUBLE) AS totalSales,
        |       CAST(COALESCE(totalExp, Z) AS DOUBLE) AS totalExp,
        |       CAST(COALESCE(totalCustCharges, Z) AS DOUBLE) AS totalCustCharges,
        |       CAST(COALESCE(totalOtherPayments, Z) AS DOUBLE) AS totalOtherPayments
        |FROM r WHERE date = DATE '1995-01-04'""".stripMargin,
      Rollup.rollupCtes: _*)) { (s, d) =>
      val Z = lit(0).cast(org.apache.spark.sql.types.DecimalType(18, 4))
      Rollup.frame(s, d).filter(col("date") === "1995-01-04")
        .select(col("date"), col("customerCount"),
          col("totalSales").cast("double").as("totalSales"),
          coalesce(col("totalExp"), Z).cast("double").as("totalExp"),
          coalesce(col("totalCustCharges"), Z).cast("double")
            .as("totalCustCharges"),
          coalesce(col("totalOtherPayments"), Z).cast("double")
            .as("totalOtherPayments"))
    },

    // Binary-file source feeding the attachment sink path
    // (/root/reference/src/apiFunctions.ts:90-119 uploads one file per
    // invoice): file bytes as rows. Oracle-checked via the
    // sf-independent projection — the fixed table-file names plus
    // consistency booleans proving real bytes were read (content length
    // equals the listed length, and is non-empty).
    Q("snk_attach",
      Seq("customer", "documents", "embeddings", "events", "lineitem",
        "nation", "orders", "part", "region", "supplier")
        .map(t => s"SELECT '$t.parquet' AS fileName, TRUE AS nonempty, TRUE AS len_match")
        .mkString("", "\nUNION ALL\n", "\nORDER BY fileName")) { (s, d) =>
      s.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet").load(d)
        .select(
          element_at(split(col("path"), "/"), -1).as("fileName"),
          (col("length") > 0).as("nonempty"),
          (length(col("content")).cast("long") === col("length"))
            .as("len_match"))
        .orderBy("fileName")
    },

    // REST point-lookup join + exactly-one audit
    // (/root/reference/src/apiFunctions.ts:97-109,130-171): attachments
    // joined to fetched invoices on date, match-count bucketed.
    Q("join_api_point",
      """WITH att AS (
        |  SELECT '2024-01-15' AS dateString, 'DD 15.xls' AS fileName
        |  UNION ALL SELECT '2024-01-16', 'DD 16.xls'
        |), inv AS (
        |  SELECT 'inv-2024-01-15-1' AS invoiceID, '2024-01-15' AS dateString
        |  UNION ALL SELECT 'inv-2024-01-15-2', '2024-01-15'
        |  UNION ALL SELECT 'inv-2024-01-15-3', '2024-01-15'
        |)
        |SELECT a.fileName, COUNT(i.invoiceID) AS n_matches,
        |       CASE WHEN COUNT(i.invoiceID) = 1 THEN 'ok'
        |            WHEN COUNT(i.invoiceID) = 0 THEN 'missing'
        |            ELSE 'ambiguous' END AS status
        |FROM att a LEFT JOIN inv i ON a.dateString = i.dateString
        |GROUP BY a.fileName ORDER BY a.fileName""".stripMargin) { (s, _) =>
      import s.implicits._
      val att = Seq(("2024-01-15", "DD 15.xls"), ("2024-01-16", "DD 16.xls"))
        .toDF("dateString", "fileName")
      val inv = RestSource.fetchInvoices(s, RestSource.cannedServer,
        "Day Dockets", "2024-01-15")
      att.join(inv.select("invoiceID", "dateString"), Seq("dateString"), "left")
        .groupBy("fileName")
        .agg(count(col("invoiceID")).as("n_matches"))
        .withColumn("status",
          when(col("n_matches") === 1, "ok")
            .when(col("n_matches") === 0, "missing")
            .otherwise("ambiguous"))
        .orderBy("fileName")
    },

    // Sessionization, window-SQL form (gaps-and-islands): the batch twin
    // of streaming.Sessionize (flatMapGroupsWithState) — tests assert
    // kernel ≡ window ≡ stateful-stream. 30-minute gap over events.
    Q("win_sessionize", s"""WITH ${Inventory.sessionSpansSql}
        |SELECT user_id, sid, start_us, end_us, n, total
        |FROM sp ORDER BY user_id, sid""".stripMargin) { (s, d) =>
      Inventory.sessionSpans(s, d).orderBy("user_id", "sid")
    },

    // The SAME sessionization through Spark's NATIVE session_window —
    // the idiomatic form (one expression, and the only form that also
    // runs structured-streaming with state eviction for free).
    // Boundary semantics differ from the window-SQL form: session_window
    // merges an event only while the gap is STRICTLY below 30 min (the
    // session extends to [event, event+gap)), so the oracle's
    // new-session predicate is >= where win_sessionize's is > — on a
    // µs-resolution stream only an exactly-30:00.000000 gap separates
    // them, but the oracle pins the native semantics, not the other
    // query's.
    Q("win_sessionize_native",
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
        |  FROM events
        |), f AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |                   OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), g AS (
        |  SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM f
        |)
        |SELECT user_id, MIN(us) AS start_us, MAX(us) AS end_us,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(10,4))) AS DOUBLE) AS total
        |FROM g GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin) {
      (s, d) =>
        graft.Tables.events(s, d)
          .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("us"),
            col("value"))
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"),
            count(lit(1)).as("n"),
            sum(col("value").cast(org.apache.spark.sql.types.DecimalType(10, 4)))
              .cast("double").as("total"))
          .select("user_id", "start_us", "end_us", "n", "total")
          .orderBy("user_id", "start_us")
    },

    // ── streaming sessionize feed, driver-visible (§2.10) ──────────────

    // Sessionize.statefulSessions (flatMapGroupsWithState, event-time
    // timeouts) materialized through an AvailableNow drop-dir run and
    // oracled against the batch window-SQL kernel restricted to the
    // stream's emission contract: every session CLOSED IN-STREAM by a
    // later same-user event is emitted unconditionally; a user's open
    // TAIL session is emitted only when its timeout end_ms + gap is
    // strictly below the final watermark (max event time, ms-floored,
    // delay 0 — `timeoutTimestamp < wm`, pinned in the 4.1.2
    // bytecode). `total` deliberately absent (arrival-ordered Double
    // fold; the exact-decimal total is win_sessionize's).
    Q("stream_sessionize_feed", s"""WITH ${Inventory.sessionSpansSql},
        |wm AS (
        |  SELECT (MAX(epoch_us(CAST(ts AS TIMESTAMP))) // 1000) AS wm_ms
        |  FROM events
        |), mx AS (
        |  SELECT user_id, MAX(sid) AS last_sid FROM sp GROUP BY user_id
        |)
        |SELECT sp.user_id, start_us, end_us, CAST(n AS BIGINT) AS n
        |FROM sp JOIN mx ON sp.user_id = mx.user_id, wm
        |WHERE sp.sid < mx.last_sid
        |   OR (end_us // 1000) + 1800000 < wm_ms
        |ORDER BY sp.user_id, start_us""".stripMargin) { (s, d) =>
      graft.streaming.Sessionize
        .runAvailableNow(s, d, "stream_sessionize_feed_sink")
        .select(col("user_id"), col("start_us"), col("end_us"), col("n"))
        .orderBy("user_id", "start_us")
    },

    // API filter-string construction
    // (/root/reference/src/apiFunctions.ts:131).
    Q("fn_where_string", Oracle.withCtes(
      """SELECT date,
        |       concat('Contact.Name=="Day Dockets"&&DateString=="',
        |              strftime(date, '%Y-%m-%d'), '"') AS whereString
        |FROM till WHERE date < DATE '1995-02-01' ORDER BY date""".stripMargin,
      Oracle.tillTotals)) { (s, d) =>
      graft.Tables.tillTotals(s, d).filter(col("date") < "1995-02-01")
        .select(col("date"),
          concat(lit("Contact.Name==\"Day Dockets\"&&DateString==\""),
            date_format(col("date"), "yyyy-MM-dd"), lit("\""))
            .as("whereString"))
        .orderBy("date")
    },

    // ── quoted/multiline CSV roundtrip (the interchange edge cases) ────

    // The CSV semantics that break naive splitters: fields containing
    // the DELIMITER, embedded QUOTES, and embedded NEWLINES — all three
    // planted into one synthetic field per document, written through
    // Spark's CSV writer (RFC-4180-style quoting) and read back with
    // `multiLine` (a quoted newline makes records span physical lines,
    // so the file is no longer line-splittable — the reader must parse
    // quote state, which is why multiLine CSV reads are one task per
    // file at scale and big corpora ship JSONL instead; this query IS
    // that trade documented as code). Answer is format-independent ⇒
    // the plain-table oracle pins write→quote→parse with a per-language
    // character checksum that any quoting slip breaks.
    Q("src_csv_quoted",
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(length(concat('v,"', substr(text, 1, 20), '"',
        |                              chr(10), lang))) AS BIGINT)
        |         AS char_checksum
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) {
      (s, d) =>
        val tricky = concat(lit("v,\""), substring(col("text"), 1, 20),
          lit("\"\n"), col("lang"))
        val path = graft.LayoutCache.materialize("graft_csvq", d,
          "documents") { stage =>
          graft.Tables.documents(s, d)
            .select(col("doc_id"), tricky.as("tricky"), col("lang"))
            .coalesce(4)
            .write.mode("overwrite").csv(stage)
        }
        s.read.schema("doc_id BIGINT, tricky STRING, lang STRING")
          .option("multiLine", "true").csv(path)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("tricky"))).cast("long").as("char_checksum"))
          .orderBy("lang")
    }
  )
}
