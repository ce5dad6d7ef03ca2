package graft

import java.nio.file.{Files, Paths}
import graft.sources.{Xls, Xlsx, XlsxTableProvider, XlsWrite, XlsxWrite}

/** Legacy BIFF8 `.xls` ingestion: writer→reader round trip through the
  * real CFB mini-stream, value/date parity with the OOXML path for the
  * same grid, RK edge cases, large-stream (regular FAT) layout, and the
  * DSv2 source reading a mixed .xls/.xlsx drop-dir. */
class XlsSpec extends SparkSuite {

  private val grid = Seq(
    XlsxWrite.CellOut("B3", "45000", isNumber = true),
    XlsxWrite.CellOut("C21", "Day Dockets – café & ledger", isNumber = false),
    XlsxWrite.CellOut("D22", "", isNumber = false),
    XlsxWrite.CellOut("H7", "-12.5", isNumber = true),
    XlsxWrite.CellOut("A1", "45292", isNumber = true, isDate = true))

  test("writer -> reader round trip via the CFB mini-stream") {
    val bytes = XlsWrite.workbook("A4 Summary", grid)
    assert(bytes.length >= 512 * 4) // header + FAT + dir + miniFAT at least
    val cells = Xls.parse(bytes, "A4 Summary")
      .map(c => (c.row, c.col) -> c).toMap
    assert(cells((3, "B")).value == "45000")
    assert(cells((21, "C")).value == "Day Dockets – café & ledger") // UTF-16 SST
    assert(cells((22, "D")).value == "")
    assert(cells((7, "H")).value == "-12.5")
    assert(cells((1, "A")).isDate && cells((1, "A")).value == "45292")
    assert(!cells((3, "B")).isDate)
  }

  test(".xls and .xlsx of the same grid parse identically") {
    val viaXls = Xls.parse(XlsWrite.workbook("S", grid), "S")
    val viaXlsx = Xlsx.parse(XlsxWrite.workbook("S", grid), "S")
    assert(viaXls.sortBy(c => (c.row, c.col)) ==
      viaXlsx.sortBy(c => (c.row, c.col)))
  }

  test("RK decoding: int, x100, and truncated-double forms") {
    // fInt: 300 → (300<<2)|2
    assert(Xls.rkValue((300 << 2) | 2) == 300.0)
    // fInt negative
    assert(Xls.rkValue((-300 << 2) | 2) == -300.0)
    // fInt + x100: 12345 /100
    assert(Xls.rkValue((12345 << 2) | 3) == 123.45)
    // truncated double: high 30 bits of 1.5's IEEE bits
    val bits15 = java.lang.Double.doubleToLongBits(1.5)
    assert(Xls.rkValue(((bits15 >> 32) & 0xfffffffcL).toInt) == 1.5)
  }

  test("large workbook takes the regular FAT stream path") {
    val many = (1 to 900).map(i =>
      XlsxWrite.CellOut(s"A${i}", s"row-$i-payload-padding-padding", isNumber = false))
    val bytes = XlsWrite.workbook("Big", many)
    val cells = Xls.parse(bytes, "Big")
    assert(cells.size == 900)
    assert(cells.find(_.row == 900).get.value == "row-900-payload-padding-padding")
  }

  test("unknown sheet fails loudly, naming what exists") {
    val bytes = XlsWrite.workbook("S", grid)
    val e = intercept[IllegalArgumentException](Xls.parse(bytes, "Nope"))
    assert(e.getMessage.contains("Nope") && e.getMessage.contains("S"))
  }

  test("BIFF5 ('Book' stream) is rejected loudly") {
    // rename the directory entry Workbook → Book in place: entry 1 sits
    // at 1024 + 128 in the writer's fixed layout (header, FAT, dir)
    val bytes = XlsWrite.workbook("S", grid)
    val off = 1024 + 128
    assert(new String(bytes, off, 16, java.nio.charset.StandardCharsets.UTF_16LE)
      .startsWith("Workbook"))
    val book = "Book".getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    java.util.Arrays.fill(bytes, off, off + 64, 0.toByte)
    System.arraycopy(book, 0, bytes, off, book.length)
    bytes(off + 64) = (book.length + 2).toByte // name length incl. null
    val e = intercept[IllegalArgumentException](Xls.parse(bytes, "S"))
    assert(e.getMessage.contains("BIFF5"))
  }

  test("a truncated container fails loudly, never a zero-padded parse") {
    val bytes = XlsWrite.workbook("S", grid)
    val cut = java.util.Arrays.copyOf(bytes, bytes.length - 600)
    val e = intercept[IllegalArgumentException](Xls.parse(cut, "S"))
    assert(e.getMessage.toLowerCase.contains("truncated"))
  }

  test("an SST string straddling the record end fails loudly") {
    val bytes = XlsWrite.workbook("S", grid)
    // locate the SST record: id 0x00fc, and 12 bytes in (past total/
    // unique) the first string's XLUnicodeString header — cch=27
    // ("Day Dockets – café & ledger"), wide flag set
    val sst = bytes.indices.dropRight(16).find { i =>
      (bytes(i) & 0xff) == 0xfc && bytes(i + 1) == 0 &&
        bytes(i + 12) == 27 && bytes(i + 13) == 0 && bytes(i + 14) == 1
    }.getOrElse(fail("SST record not found in fixture"))
    // shrink the declared record length so the UTF-16 body straddles the
    // record end: the reader must raise the CONTINUE diagnostic, not an
    // ArrayIndexOutOfBoundsException from reading past the copy
    bytes(sst + 2) = 12; bytes(sst + 3) = 0
    val e = intercept[IllegalArgumentException](Xls.parse(bytes, "S"))
    assert(e.getMessage.contains("CONTINUE"), e.getMessage)
  }

  test("DSv2 source reads a mixed .xls/.xlsx drop-dir by magic") {
    val dir = Files.createTempDirectory("xlsdir").toString
    Files.write(Paths.get(dir, "DD 01.xls"),
      XlsWrite.workbook("A4 Summary", Seq(
        XlsxWrite.CellOut("B3", "100", isNumber = true))))
    Files.write(Paths.get(dir, "DD 02.xlsx"),
      XlsxWrite.workbook("A4 Summary", Seq(
        XlsxWrite.CellOut("B3", "200", isNumber = true))))
    val df = spark.read.format(classOf[XlsxTableProvider].getName).load(dir)
    val byFile = df.collect()
      .filter(_.getInt(1) == 3)
      .map(r => r.getString(0) -> r.getString(3)).toMap // file_name -> colB
    assert(byFile == Map("DD 01.xls" -> "100", "DD 02.xlsx" -> "200"))
  }
}
