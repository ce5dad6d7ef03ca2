package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable

/** Minimal real XLSX (OOXML) workbook parsing — pure JDK (ZIP + StAX),
  * no external libraries. This is the binary seam the reference crosses
  * with the SheetJS `xlsx` package (/root/reference/src/parse.ts:61-69
  * reads workbook bytes, then drives cell lookups like `ws.B3.v`); here
  * the bytes→grid step is first-party so the engine can ingest actual
  * workbook files, not just pre-parsed grids.
  *
  * Supported (the subset a Day-Docket workbook uses): sheet resolution
  * by NAME via workbook.xml + its rels, shared strings (including rich
  * runs), inline strings, formula-string and numeric/boolean cells.
  * Legacy BIFF `.xls` is out of scope (that format needs a binary
  * parser; the reference's own regex accepts `.xls[x]?`).
  *
  * Cell values stay raw STRINGS — the grid is schema-on-read (sentinel
  * text shares columns with numbers), numeric reads happen downstream
  * via `try_cast` exactly as in CellGrid.
  */
object Xlsx {

  final case class Cell(row: Int, col: String, value: String)

  private val factory = {
    val f = XMLInputFactory.newInstance()
    // untrusted content: no DTDs, no external entities
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  /** All zip entries → bytes (workbook parts are small; the scale unit
    * is one workbook per task, not one giant workbook). */
  private def entries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = mutable.Map[String, Array[Byte]]()
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out(e.getName) = zin.readAllBytes()
      e = zin.getNextEntry
    }
    out.toMap
  }

  /** sharedStrings.xml → indexed strings (concatenating rich-text runs:
    * every <t> inside one <si>). */
  private def sharedStrings(xml: Array[Byte]): IndexedSeq[String] = {
    val r = factory.createXMLStreamReader(new ByteArrayInputStream(xml))
    val out = mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inSi = false
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = true; cur.clear()
            case "t" if inSi => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inT =>
          cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => inSi = false; out += cur.toString
            case _ =>
          }
        case _ =>
      }
    }
    out.toIndexedSeq
  }

  /** workbook.xml + workbook.xml.rels → sheet name → part path. */
  private def sheetPaths(parts: Map[String, Array[Byte]]): Map[String, String] = {
    def attrs(xml: Array[Byte], elem: String): Seq[Map[String, String]] = {
      val r = factory.createXMLStreamReader(new ByteArrayInputStream(xml))
      val out = mutable.ArrayBuffer[Map[String, String]]()
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == elem) {
          out += (0 until r.getAttributeCount)
            .map(i => r.getAttributeLocalName(i) -> r.getAttributeValue(i))
            .toMap
        }
      }
      out.toSeq
    }
    val rels = attrs(parts("xl/_rels/workbook.xml.rels"), "Relationship")
      .map(a => a("Id") -> a("Target")).toMap
    attrs(parts("xl/workbook.xml"), "sheet").map { a =>
      val target = rels(a("id")) // r:id resolves by local name
      val path = if (target.startsWith("/")) target.drop(1) else s"xl/$target"
      a("name") -> path
    }.toMap
  }

  /** One worksheet part → cells. Handles t="s" (shared), t="inlineStr",
    * t="str" (formula result), t="b", and plain numeric cells. */
  private def sheetCells(xml: Array[Byte],
      shared: IndexedSeq[String]): Seq[Cell] = {
    val r = factory.createXMLStreamReader(new ByteArrayInputStream(xml))
    val out = mutable.ArrayBuffer[Cell]()
    var ref = ""
    var typ = ""
    var inV = false
    var inIsT = false
    val cur = new StringBuilder
    def flush(): Unit = if (ref.nonEmpty && cur.nonEmpty) {
      val col = ref.takeWhile(_.isLetter)
      val row = ref.dropWhile(_.isLetter).toInt
      val v = typ match {
        case "s" => shared(cur.toString.trim.toInt)
        case _ => cur.toString
      }
      out += Cell(row, col, v)
      cur.clear()
    }
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "c" =>
            ref = Option(r.getAttributeValue(null, "r")).getOrElse("")
            typ = Option(r.getAttributeValue(null, "t")).getOrElse("")
            cur.clear()
          case "v" => inV = true
          case "t" if typ == "inlineStr" => inIsT = true
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS if inV || inIsT =>
          cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "v" => inV = false
          case "t" if inIsT => inIsT = false
          case "c" => flush(); ref = ""
          case _ =>
        }
        case _ =>
      }
    }
    out.toSeq
  }

  /** Parse one workbook's bytes: the named sheet's cells. */
  def parse(bytes: Array[Byte], sheetName: String): Seq[Cell] = {
    val parts = entries(bytes)
    val shared = parts.get("xl/sharedStrings.xml")
      .map(sharedStrings).getOrElse(IndexedSeq.empty)
    val path = sheetPaths(parts).getOrElse(sheetName,
      throw new IllegalArgumentException(
        s"sheet '$sheetName' not found in workbook"))
    sheetCells(parts(path), shared)
  }
}
