package graft

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}
import graft.sources.{Xlsx, XlsxTableProvider, XlsxWrite}
import org.apache.spark.sql.functions._

/** Real workbook-bytes ingestion: writer→reader round trip, per-file
  * partitioning, inline-string payloads, and the real-bytes path
  * agreeing with the pre-parsed grid path. */
class XlsxSpec extends SparkSuite {

  private def write(dir: String, name: String,
      cells: Seq[XlsxWrite.CellOut]): Unit =
    Files.write(Paths.get(dir, name), XlsxWrite.workbook("A4 Summary", cells))

  test("writer -> DSv2 reader round-trip incl. XML-escaped strings") {
    val dir = Files.createTempDirectory("xlsx").toString
    write(dir, "DD 01.xlsx", Seq(
      XlsxWrite.CellOut("B3", "45000", isNumber = true),
      XlsxWrite.CellOut("C21", "a & b <c> \"d\"", isNumber = false),
      XlsxWrite.CellOut("D22", "", isNumber = false),
      XlsxWrite.CellOut("H7", "-12.50", isNumber = true)))
    val df = spark.read.format(classOf[XlsxTableProvider].getName).load(dir)
    val byRow = df.collect().map(r => r.getInt(1) -> r).toMap
    assert(byRow(3).getString(3) == "45000")             // colB
    assert(byRow(21).getString(4) == "a & b <c> \"d\"")  // colC, unescaped
    assert(byRow(22).getString(5) == "")                 // colD empty string
    assert(byRow(7).getString(9) == "-12.50")            // colH
    assert(byRow(21).getString(0) == "DD 01.xlsx")       // file_name
  }

  test("one partition per workbook; name pattern filters the listing") {
    val dir = Files.createTempDirectory("xlsx2").toString
    val cells = Seq(XlsxWrite.CellOut("A1", "x", isNumber = false))
    write(dir, "DD 01.xlsx", cells)
    write(dir, "DD 02.xlsx", cells)
    write(dir, "notes.xlsx", cells)
    Files.write(Paths.get(dir, "junk.txt"), "not a workbook".getBytes)
    val dd = spark.read.format(classOf[XlsxTableProvider].getName)
      .option("pattern", "^DD \\d\\d\\.xlsx$").load(dir)
    assert(dd.rdd.getNumPartitions == 2) // one task per matched file
    assert(dd.select("file_name").distinct().count() == 2)
    val all = spark.read.format(classOf[XlsxTableProvider].getName).load(dir)
    assert(all.select("file_name").distinct().count() == 3) // default: *.xlsx
  }

  test("parser handles inline strings and a workbook with no sharedStrings") {
    val sheet =
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>hello inline</t></is></c>
        |<c r="B1"><v>42</v></c><c r="C1" t="str"><v>fx</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val workbook =
      """<?xml version="1.0"?><workbook><sheets>
        |<sheet name="S" sheetId="1" r:id="rId1"
        | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"/>
        |</sheets></workbook>""".stripMargin
    val rels =
      """<?xml version="1.0"?><Relationships>
        |<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin
    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    def put(n: String, b: String): Unit = {
      zip.putNextEntry(new ZipEntry(n)); zip.write(b.getBytes("UTF-8"))
      zip.closeEntry()
    }
    put("xl/workbook.xml", workbook)
    put("xl/_rels/workbook.xml.rels", rels)
    put("xl/worksheets/sheet1.xml", sheet)
    zip.close()
    val cells = Xlsx.parse(bos.toByteArray, "S")
      .map(c => (c.row, c.col) -> c.value).toMap
    assert(cells((1, "A")) == "hello inline")
    assert(cells((1, "B")) == "42")
    assert(cells((1, "C")) == "fx")
  }

  test("till variance reads from D15 with the reference's ?? 0 default") {
    val dir = operators.Inventory.ensureXlsxFixture()
    val grid = spark.read.format(classOf[XlsxTableProvider].getName)
      .option("pattern", "^DD \\d\\d\\.xlsx$").load(dir)
    def variance(g: org.apache.spark.sql.DataFrame) =
      g.filter(col("row_idx") === 15)
        .agg(coalesce(sum(col("colD").try_cast("decimal(12,2)")),
          lit(0).cast("decimal(12,2)")))
        .head.getDecimal(0)
    assert(variance(grid).toPlainString == "-2.50")
    // a workbook without D15 defaults to 0 (parse.ts:65: ws?.D15?.v ?? 0)
    val bare = Files.createTempDirectory("xlsx3").toString
    write(bare, "DD 09.xlsx", Seq(XlsxWrite.CellOut("B3", "45000", isNumber = true)))
    val bareGrid = spark.read.format(classOf[XlsxTableProvider].getName)
      .load(bare)
    assert(variance(bareGrid).toPlainString == "0.00")
  }

  test("missing sheet name fails loudly, not with an empty frame") {
    val dir = Files.createTempDirectory("xlsx4").toString
    write(dir, "DD 03.xlsx", Seq(XlsxWrite.CellOut("A1", "x", isNumber = false)))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format(classOf[XlsxTableProvider].getName)
        .option("sheet", "No Such Sheet").load(dir).collect()
    }
    assert(e.getMessage.contains("No Such Sheet") ||
      Option(e.getCause).exists(_.getMessage.contains("No Such Sheet")))
  }

  test("styled date serials: Excel-written dates flag isDate, raw value kept") {
    // Excel stores a date as a NUMERIC serial + a date-format style;
    // the writer's isDate emits exactly that shape (s="1" → numFmtId 14)
    val bytes = XlsxWrite.workbook("A4 Summary", Seq(
      XlsxWrite.CellOut("B3", "45000", isNumber = true, isDate = true),
      XlsxWrite.CellOut("C22", "100.00", isNumber = true),
      XlsxWrite.CellOut("D22", "note", isNumber = false)))
    val cells = Xlsx.parse(bytes, "A4 Summary")
      .map(c => (c.row, c.col) -> c).toMap
    val b3 = cells((3, "B"))
    assert(b3.isDate, "date style not detected via styles.xml")
    assert(b3.value == "45000") // raw serial, like the reference's ws.B3.v
    assert(Xlsx.serialDate(b3.value.toDouble).toString == "2023-03-15")
    assert(!cells((22, "C")).isDate) // plain numeric: not a date
    assert(!cells((22, "D")).isDate) // string: not a date
  }

  test("custom date format codes are detected; bracketed/quoted text is not") {
    // hand-built styles.xml: xf 1 → custom "dd/mm/yyyy" (date), xf 2 →
    // custom currency with quoted text and color block (NOT a date)
    val styles =
      """<?xml version="1.0"?><styleSheet>
        |<numFmts count="2">
        |<numFmt numFmtId="164" formatCode="dd/mm/yyyy"/>
        |<numFmt numFmtId="165" formatCode="[Red]&quot;paid yds&quot; 0.00"/>
        |</numFmts>
        |<cellXfs count="3"><xf numFmtId="0"/><xf numFmtId="164"/><xf numFmtId="165"/></cellXfs>
        |</styleSheet>""".stripMargin
    val sheet =
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" s="1"><v>45000</v></c><c r="B1" s="2"><v>9.95</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val workbook =
      """<?xml version="1.0"?><workbook><sheets>
        |<sheet name="S" sheetId="1" r:id="rId1"
        | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"/>
        |</sheets></workbook>""".stripMargin
    val rels =
      """<?xml version="1.0"?><Relationships>
        |<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin
    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    def put(n: String, b: String): Unit = {
      zip.putNextEntry(new ZipEntry(n)); zip.write(b.getBytes("UTF-8"))
      zip.closeEntry()
    }
    put("xl/workbook.xml", workbook)
    put("xl/_rels/workbook.xml.rels", rels)
    put("xl/styles.xml", styles)
    put("xl/worksheets/sheet1.xml", sheet)
    zip.close()
    val cells = Xlsx.parse(bos.toByteArray, "S")
      .map(c => (c.row, c.col) -> c).toMap
    assert(cells((1, "A")).isDate)   // dd/mm/yyyy → date
    assert(!cells((1, "B")).isDate)  // 'd'/'y'/'s' only in quotes/brackets
  }

  test("malformed BIFF .xls bytes are rejected loudly, naming the format") {
    // OLE2/CFB magic but truncated garbage — must fail loudly, never an
    // empty read (valid BIFF8 now parses via the Xls reader, XlsSpec)
    val biff = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1)
      .map(_.toByte) ++ Array.fill(64)(0.toByte)
    val e = intercept[IllegalArgumentException] {
      Xlsx.parse(biff, "A4 Summary")
    }
    assert(e.getMessage.contains(".xls") && e.getMessage.contains("BIFF"))
  }

  test("real-bytes path equals the pre-parsed grid path") {
    val viaFile = SparkEntry.queries("src_xlsx_file")(spark, "")
      .collect().map(_.toSeq)
    val viaGrid = SparkEntry.queries("src_xlsx_grid")(spark, "")
      .collect().map(_.toSeq)
    assert(viaFile.nonEmpty)
    assert(viaFile.toSeq == viaGrid.toSeq)
  }
}
