package graft

import graft.operators.CellGrid
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** FIXTURES.md §A5 micro-fixture replay of the reference parser
  * (/root/reference/src/parse.ts:76-146): pre-row-21 junk (including a
  * decoy "Amount"), two real triggers, spacer rows, zero amounts,
  * negative → CR, dash ids, blank-id default, the skipped row after the
  * second trigger, the "Total Charges" footer, and both isBalanced
  * outcomes. */
class CellGridSpec extends SparkSuite {
  import spark.implicits._

  // (row_idx, colC, colD, colE, colF, colG)
  private def grid(debtors: String): DataFrame = Seq(
    (5, "Amount", null, null, null, null),            // decoy before row 21
    (19, "junk", "junk", null, null, null),           // pre-window row
    (21, "Amount", null, null, null, null),           // trigger 1
    (22, "100.00", "45-678", "12", "note a", null),   // sale, dash id
    (23, "-25.50", "9001", "13", null, null),         // credit note
    (24, "0.00", "9002", "14", null, null),           // zero → dropped
    (25, null, null, null, null, null),               // spacer → dropped
    (26, "50.00", "", "15", null, null),              // blank id → store
    (27, "Amount", null, null, null, null),           // trigger 2
    (28, "77.77", "skipped", "77", null, null),       // t2+1 → skipped
    (29, "-30.00", "7001", "16", "pay note", null),   // payment (abs)
    (30, null, null, null, null, null),               // spacer → dropped
    (31, "20.00", "7002", "17", null, null),          // payment
    (32, null, "Total Charges", null, null, null),    // footer
    (40, null, "Total Debtors", null, null, debtors)  // audit row
  ).toDF("row_idx", "colC", "colD", "colE", "colF", "colG")

  test("band extraction replays the reference parser") {
    val parsed = CellGrid.parse(grid("124.50"), excelSerialDate = 45000)
      .orderBy("row_idx").collect()

    val byType = parsed.groupBy(_.getString(0))
    assert(byType("SALE").map(_.getInt(6)).toSeq == Seq(22, 26))
    assert(byType("CR").map(_.getInt(6)).toSeq == Seq(23))
    assert(byType("PAYMENT").map(_.getInt(6)).toSeq == Seq(29, 31))

    val r22 = parsed.find(_.getInt(6) == 22).get
    assert(r22.getString(3) == "45678")        // FIRST dash stripped only
    assert(r22.getString(4) == "0012")         // seqNo zero-padded
    assert(r22.getString(5) == "note a")
    assert(r22.getDate(1).toString == "2023-03-15") // excel serial 45000

    val r26 = parsed.find(_.getInt(6) == 26).get
    assert(r26.getString(3) == Tables.StoreId) // blank id + amount → store

    val r29 = parsed.find(_.getInt(6) == 29).get
    assert(r29.getDecimal(2).doubleValue == 30.0) // payment abs()
  }

  test("first-dash-only semantics on multi-dash ids") {
    val g = Seq(
      (21, "Amount", null, null, null, null),
      (22, "10.00", "ab-cd-ef", "1", null, null),
      (23, "Amount", null, null, null, null),
      (26, null, "Total Charges", null, null, null)
    ).toDF("row_idx", "colC", "colD", "colE", "colF", "colG")
    val parsed = CellGrid.parse(g, 45000).collect()
    assert(parsed.head.getString(3) == "abcd-ef")
  }

  test("decoy 'Amount' before row 21 does not trigger a band") {
    // only rows 22 and 26 are sales — the decoy at row 5 is out of scope
    val parsed = CellGrid.parse(grid("124.50"), 45000).collect()
    assert(!parsed.exists(_.getInt(6) == 19))
  }

  test("balance audit: exact-decimal equality, both outcomes") {
    val p = CellGrid.parse(grid("124.50"), 45000)
    // 100.00 - 25.50 + 50.00 = 124.50 → balanced
    assert(CellGrid.isBalanced(p, CellGrid.totalDebtors(grid("124.50"))))
    assert(!CellGrid.isBalanced(p, CellGrid.totalDebtors(grid("999.99"))))
  }

  test("multi-workbook drop-dir: bands computed independently per file, " +
      "every window partitioned by workbook") {
    import graft.sources.{XlsxTableProvider, XlsxWrite}
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-xlsx-multi")
    def sc(ref: String, v: String) = XlsxWrite.CellOut(ref, v, isNumber = false)
    def nc(ref: String, v: String) = XlsxWrite.CellOut(ref, v, isNumber = true)
    def book(amount: String, serial: String) =
      XlsxWrite.workbook("A4 Summary", Seq(
        nc("B3", serial),
        sc("C21", "Amount"),
        nc("C22", amount), sc("D22", "9001"), nc("E22", "12"),
        sc("C27", "Amount"),
        nc("C29", "-30.00"), sc("D29", "7001"), nc("E29", "16"),
        sc("D32", "Total Charges")))
    // DIFFERENT dates per workbook: each file must carry its own B3
    Files.write(dir.resolve("DD 01.xlsx"), book("100.00", "45000"))
    Files.write(dir.resolve("DD 02.xlsx"), book("200.00", "45010"))

    val gridDf = spark.read.format(classOf[XlsxTableProvider].getName)
      .option("sheet", "A4 Summary")
      .option("pattern", "^DD \\d\\d\\.xlsx$")
      .load(dir.toString)
    val parsed = CellGrid.parsePerFile(gridDf, keepFile = true)

    // bands/bounds AND dates are per-workbook: each file contributes its
    // own SALE and payment stamped with ITS OWN B3 date — a shared
    // global band counter or a single scalar serial would corrupt
    // everything after file 1
    val got = parsed
      .select(col("file_name"), col("rowType"),
        col("amount").cast("double").as("amount"),
        col("date").cast("string"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getString(3)))
      .toSet
    assert(got == Set(
      ("DD 01.xlsx", "SALE", 100.0, "2023-03-15"),
      ("DD 01.xlsx", "PAYMENT", 30.0, "2023-03-15"),
      ("DD 02.xlsx", "SALE", 200.0, "2023-03-25"),
      ("DD 02.xlsx", "PAYMENT", 30.0, "2023-03-25")))

    // the scale property itself: no partition-less window anywhere
    val wins = parsed.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.nonEmpty)
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "partition-less window in the CellGrid parse plan")
  }
}
