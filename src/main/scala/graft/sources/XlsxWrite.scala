package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal OOXML workbook WRITER — fixture/test twin of [[Xlsx]] and a
  * usable single-sheet xlsx sink. Emits a structurally complete package
  * ([Content_Types], package rels, workbook, workbook rels, shared
  * strings, one worksheet) that real spreadsheet tools and [[Xlsx]]
  * both read. Strings go through sharedStrings (like real producers);
  * numerics are written as plain `<v>` cells. */
object XlsxWrite {

  /** `isDate` writes the cell the way Excel stores dates: a plain
    * numeric serial carrying a date-format style (`s="1"` → cellXf 1 →
    * builtin numFmtId 14, m/d/yyyy). */
  final case class CellOut(ref: String, value: String, isNumber: Boolean,
      isDate: Boolean = false)

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  def workbook(sheetName: String, cells: Seq[CellOut]): Array[Byte] = {
    val strings = cells.filter(!_.isNumber).map(_.value).distinct
    val sidx = strings.zipWithIndex.toMap

    val byRow = cells.groupBy(_.ref.dropWhile(_.isLetter).toInt).toSeq.sortBy(_._1)
    val sheetXml = {
      val rows = byRow.map { case (r, cs) =>
        val cxml = cs.sortBy(_.ref).map { c =>
          if (c.isDate) s"""<c r="${c.ref}" s="1"><v>${c.value}</v></c>"""
          else if (c.isNumber) s"""<c r="${c.ref}"><v>${c.value}</v></c>"""
          else s"""<c r="${c.ref}" t="s"><v>${sidx(c.value)}</v></c>"""
        }.mkString
        s"""<row r="$r">$cxml</row>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$rows</sheetData></worksheet>"""
        .stripMargin
    }
    val sstXml = {
      val sis = strings.map(s => s"<si><t>${esc(s)}</t></si>").mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${strings.size}" uniqueCount="${strings.size}">$sis</sst>"""
        .stripMargin
    }
    val workbookXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets><sheet name="${esc(sheetName)}" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin
    val workbookRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
        |<Relationship Id="rId3" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
        |</Relationships>""".stripMargin
    // minimal stylesheet: cellXf 0 = General, cellXf 1 = builtin date
    // format 14 — what `isDate` cells reference via s="1"
    val stylesXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<fonts count="1"><font/></fonts><fills count="1"><fill/></fills><borders count="1"><border/></borders>
        |<cellStyleXfs count="1"><xf numFmtId="0"/></cellStyleXfs>
        |<cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="14" applyNumberFormat="1"/></cellXfs>
        |</styleSheet>""".stripMargin
    val pkgRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
        |<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
        |</Types>""".stripMargin

    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    def put(name: String, body: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(body.getBytes("UTF-8"))
      zip.closeEntry()
    }
    put("[Content_Types].xml", contentTypes)
    put("_rels/.rels", pkgRels)
    put("xl/workbook.xml", workbookXml)
    put("xl/_rels/workbook.xml.rels", workbookRels)
    put("xl/sharedStrings.xml", sstXml)
    put("xl/styles.xml", stylesXml)
    put("xl/worksheets/sheet1.xml", sheetXml)
    zip.close()
    bos.toByteArray
  }
}
