package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The A4-Summary cell-grid parser
  * (/root/reference/src/parse.ts:56-146) as a declarative band
  * extraction — the reference's stateful row loop (`i = 21`,
  * `triggerCount`, do-while tail) becomes a running trigger-count
  * window (SURVEY §2.6 `win_sentinel_band`):
  *
  *  - rows before 21 are out of scope (the loop starts there);
  *  - `colC == "Amount"` rows are band triggers; band = running count;
  *  - band 1 (between the two headers): charge rows — sign-split into
  *    sales/credits, zero amounts and all-empty rows dropped;
  *  - band 2 from `trigger2 + 2` (the loop's double increment) until the
  *    `"Total Charges"` footer: payment rows, `abs()` amounts;
  *  - `"Total Debtors"` marker row: audit total in colG; `isBalanced` =
  *    exact-decimal sum(sales ∪ credits) == totalDebtors.
  *
  * Grid schema: `(row_idx int, colC, colD, colE, colF, colG string)` —
  * one worksheet flattened to rows (FIXTURES.md §A5), plus a `file_name`
  * column when the grid comes from the DSv2 xlsx source (one partition
  * per workbook). Values are schema-on-read strings (sentinels share the
  * data columns), so numeric reads are `try_cast`.
  *
  * EVERY window here partitions by workbook: grids without a `file_name`
  * column (inline single-sheet fixtures) get a constant file id, so the
  * plan is per-file-parallel whenever the input actually has many files —
  * a drop-dir of thousands of workbooks fans out one window partition
  * per workbook instead of funnelling all sheets through one task.
  */
object CellGrid {

  private val M = DecimalType(12, 2)

  /** Workbook id column: the partition key of every CellGrid window. */
  val FileCol = "file_name"

  private def amountNum(c: Column): Column = c.try_cast(M)
  private def isEmpty(c: Column): Column = c.isNull || length(c) === 0

  /** First-dash-only strip (JS `replace(/-/, "")`). */
  private def stripFirstDash(c: Column): Column =
    regexp_replace(c, "^(.*?)-", "$1")

  /** Inline fixtures carry no file column — give them a constant one so
    * the same per-workbook windows apply to every grid shape. */
  private def withFileId(grid: DataFrame): DataFrame =
    if (grid.columns.contains(FileCol)) grid
    else grid.withColumn(FileCol, lit("(inline)"))

  /** Tag every grid row with its band and parsed charge fields. */
  def banded(grid: DataFrame): DataFrame = {
    val w = Window.partitionBy(FileCol).orderBy("row_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val trigger = when(col("colC") === "Amount", 1).otherwise(0)
    withFileId(grid).filter(col("row_idx") >= 21)
      .withColumn("isTrigger", trigger === 1)
      .withColumn("band", sum(trigger).over(w))
  }

  /** Parsed summary: one DataFrame with rowType ∈ SALE | CR | PAYMENT,
    * reference-shaped columns. SINGLE-WORKBOOK contract: the one scalar
    * serial stamps every row — a multi-file drop-dir must use
    * [[parsePerFile]], which reads each workbook's own B3 (one scalar
    * here would stamp file A's date on file B's rows). Pass
    * `keepFile = true` to retain the workbook id column. */
  def parse(grid: DataFrame, excelSerialDate: Int,
      keepFile: Boolean = false): DataFrame =
    finish(parseRows(grid),
      date_add(to_date(lit("1899-12-30")), lit(excelSerialDate)), keepFile)

  /** Multi-workbook parse: each file's date comes from ITS OWN B3
    * serial (the reference's per-workbook `ws.B3.v` read,
    * /root/reference/src/parse.ts:63-64), joined back as a broadcast
    * one-row-per-file map — no driver-side point lookup, so a drop-dir
    * of thousands of workbooks derives every date distributed. Requires
    * the grid to carry `colB` (the DSv2 source schema does). */
  def parsePerFile(grid: DataFrame, keepFile: Boolean = false): DataFrame = {
    require(grid.columns.contains("colB"),
      "parsePerFile needs the colB column (each workbook's B3 serial)")
    val serials = withFileId(grid)
      .groupBy(FileCol)
      .agg(min(when(col("row_idx") === 3, col("colB").try_cast("int")))
        .as("__serial"))
    finish(
      parseRows(grid).join(broadcast(serials), Seq(FileCol)),
      date_add(to_date(lit("1899-12-30")), col("__serial")), keepFile)
  }

  /** Shared band/row extraction, file column retained, date left to the
    * caller ([[parse]] scalar vs [[parsePerFile]] per-workbook). */
  private def parseRows(grid: DataFrame): DataFrame = {
    val b = banded(grid)

    val perFile = Window.partitionBy(FileCol).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val trigger2Row = min(when(col("isTrigger") && col("band") === 2,
      col("row_idx"))).over(perFile)
    val totalChargesRow = min(when(col("colD") === "Total Charges",
      col("row_idx"))).over(perFile)

    val withBounds = b.withColumn("t2", trigger2Row)
      .withColumn("tc", totalChargesRow)

    val allEmpty = isEmpty(col("colC")) && isEmpty(col("colD")) &&
      isEmpty(col("colE")) && isEmpty(col("colF"))
    val amt = amountNum(col("colC"))

    // charge band: strictly between the two Amount headers
    val isChargeRow = col("band") === 1 && !col("isTrigger") && !allEmpty &&
      abs(round(coalesce(amt, lit(0).cast(M)), 2)) =!= 0
    // payment band: from t2+2 (the loop's extra increment) to the footer
    val isPaymentRow = col("band") === 2 && col("row_idx") >= col("t2") + 2 &&
      (col("tc").isNull || col("row_idx") < col("tc")) &&
      col("colD") =!= "Total Charges" && !allEmpty &&
      amt.isNotNull

    val chargeCustomer =
      when(col("colC").isNotNull && !isEmpty(col("colD")),
        stripFirstDash(col("colD")))
        .when(col("colC").isNotNull, lit(Tables.StoreId))
        .otherwise(lit(null).cast("string"))

    withBounds
      .withColumn("rowType",
        when(isChargeRow && amt < 0, "CR")
          .when(isChargeRow, "SALE")
          .when(isPaymentRow, "PAYMENT"))
      .filter(col("rowType").isNotNull)
      .select(
        col(FileCol),
        col("rowType"),
        when(col("rowType") === "PAYMENT", abs(amt)).otherwise(amt)
          .as("amount"),
        when(col("rowType") === "PAYMENT", col("colD"))
          .otherwise(chargeCustomer).as("customerId"),
        substring(concat(lit("0000"), col("colE")), -4, 4).as("seqNo"),
        col("colF").as("notes"),
        col("row_idx"))
  }

  /** Stamp the date column and emit the reference-shaped column order. */
  private def finish(rows: DataFrame, date: Column,
      keepFile: Boolean): DataFrame =
    rows.select(
      (if (keepFile) Seq(col(FileCol)) else Nil) ++ Seq(
        col("rowType"),
        date.as("date"),
        col("amount"),
        col("customerId"),
        col("seqNo"),
        col("notes"),
        col("row_idx")): _*)

  /** Audit total: colG of the row whose colD carries the
    * "Total Debtors" marker (value search in the reference,
    * /root/reference/src/parse.ts:135-136). */
  def totalDebtors(grid: DataFrame): java.math.BigDecimal = {
    val r = grid.filter(col("colD") === "Total Debtors")
      .select(amountNum(col("colG")).as("v")).collect()
    if (r.isEmpty || r.head.isNullAt(0)) java.math.BigDecimal.ZERO
    else r.head.getDecimal(0)
  }

  /** Exact-decimal balance audit
    * (/root/reference/src/parse.ts:139-143 — done in Decimal, not the
    * reference's float `===`). */
  def isBalanced(parsed: DataFrame, totalDebtors: java.math.BigDecimal): Boolean = {
    val s = parsed.filter(col("rowType").isin("SALE", "CR"))
      .agg(coalesce(sum(col("amount")), lit(0).cast(M)).as("s"))
      .head().getDecimal(0)
    s.compareTo(totalDebtors) == 0
  }
}
