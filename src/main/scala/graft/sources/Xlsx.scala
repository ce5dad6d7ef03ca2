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
  * runs), inline strings, formula-string and numeric/boolean cells, and
  * STYLED cells — the `s=` style index resolves through styles.xml
  * cellXfs → numFmtId, and date-formatted numeric cells (how Excel
  * itself stores dates: a serial plus a date style) are flagged
  * `isDate`. Values stay raw (the reference reads `ws.B3.v`, the raw
  * serial — /root/reference/src/parse.ts:64); [[serialDate]] converts
  * when a consumer wants the calendar date.
  *
  * Legacy BIFF8 `.xls` (an OLE2/CFB binary container, not a ZIP) is
  * detected by magic and dispatched to the first-party [[Xls]] reader —
  * the reference's file regex accepts `.xls[x]?` via SheetJS and its own
  * output template writes `.xls`. Unsupported legacy forms (BIFF5,
  * encrypted) fail loudly there; never a silent empty read.
  *
  * Cell values stay raw STRINGS — the grid is schema-on-read (sentinel
  * text shares columns with numbers), numeric reads happen downstream
  * via `try_cast` exactly as in CellGrid.
  */
object Xlsx {

  final case class Cell(row: Int, col: String, value: String,
      isDate: Boolean = false)

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

  /** Builtin OOXML number-format ids that render as dates/times (ECMA-376
    * §18.8.30: 14-22 date/time, 27-36 and 50-58 East Asian dates,
    * 45-47 elapsed times). */
  private val BuiltinDateIds: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet

  /** Date-format heuristic for CUSTOM format codes (same approach as the
    * common readers): strip color/condition `[...]` blocks, quoted
    * literals, and escaped chars; what's left is a date format iff it
    * still contains a y/m/d/h/s token. */
  private[sources] def isDateFmt(id: Int, code: Option[String]): Boolean =
    BuiltinDateIds(id) || code.exists { c =>
      c.replaceAll("\\[[^\\]]*\\]", "")
        .replaceAll("\"[^\"]*\"", "")
        .replaceAll("\\\\.", "")
        .exists(ch => "ymdhsYMDHS".indexOf(ch.toInt) >= 0)
    }

  /** xl/styles.xml → the cellXf indices (the `s=` attribute domain)
    * whose number format is a date format. */
  private def dateStyles(xml: Array[Byte]): Set[Int] = {
    val r = factory.createXMLStreamReader(new ByteArrayInputStream(xml))
    val custom = mutable.Map[Int, String]()
    val xfFmtIds = mutable.ArrayBuffer[Int]()
    var inCellXfs = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "numFmt" =>
            for (id <- Option(r.getAttributeValue(null, "numFmtId"));
                 code <- Option(r.getAttributeValue(null, "formatCode")))
              custom(id.toInt) = code
          case "cellXfs" => inCellXfs = true
          case "xf" if inCellXfs =>
            xfFmtIds += Option(r.getAttributeValue(null, "numFmtId"))
              .map(_.toInt).getOrElse(0)
          case _ =>
        }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
          inCellXfs = false
        case _ =>
      }
    }
    xfFmtIds.zipWithIndex.collect {
      case (fmt, i) if isDateFmt(fmt, custom.get(fmt)) => i
    }.toSet
  }

  /** One worksheet part → cells. Handles t="s" (shared), t="inlineStr",
    * t="str" (formula result), t="b", t="d" (ISO date literal), and
    * plain numeric cells — with the `s=` style index resolved against
    * the date styles so styled date serials carry `isDate = true`. */
  private def sheetCells(xml: Array[Byte], shared: IndexedSeq[String],
      dateStyleIdx: Set[Int]): Seq[Cell] = {
    val r = factory.createXMLStreamReader(new ByteArrayInputStream(xml))
    val out = mutable.ArrayBuffer[Cell]()
    var ref = ""
    var typ = ""
    var style = -1
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
      // dates: either an explicit ISO date cell, or (how Excel actually
      // writes them) a NUMERIC serial whose style is a date format
      val isDate = typ == "d" ||
        ((typ == "" || typ == "n") && dateStyleIdx(style))
      out += Cell(row, col, v, isDate)
      cur.clear()
    }
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "c" =>
            ref = Option(r.getAttributeValue(null, "r")).getOrElse("")
            typ = Option(r.getAttributeValue(null, "t")).getOrElse("")
            style = Option(r.getAttributeValue(null, "s"))
              .flatMap(_.toIntOption).getOrElse(-1)
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

  /** OLE2/CFB compound-file magic — the container of legacy BIFF `.xls`
    * workbooks (and .doc/.ppt). Not a ZIP; never valid OOXML. */
  private def isCompoundFile(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 &&
      bytes.take(8).map(_ & 0xff).sameElements(
        Seq(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1))

  /** Excel 1900-system serial → calendar date (serial 0 = 1899-12-30,
    * matching CellGrid's `date_add(to_date('1899-12-30'), serial)`). */
  def serialDate(serial: Double): java.time.LocalDate =
    java.time.LocalDate.of(1899, 12, 30).plusDays(serial.toLong)

  /** Parse one workbook's bytes: the named sheet's cells. Legacy BIFF8
    * `.xls` bytes (OLE2/CFB magic) dispatch to the first-party [[Xls]]
    * reader — the reference's own filename template writes `.xls`
    * (/root/reference/src/helpers.ts:76) — and unsupported legacy forms
    * (BIFF5, encrypted) still fail loudly there, never a silent empty
    * read. */
  def parse(bytes: Array[Byte], sheetName: String): Seq[Cell] = {
    if (isCompoundFile(bytes))
      return Xls.parse(bytes, sheetName)
    val parts = entries(bytes)
    val shared = parts.get("xl/sharedStrings.xml")
      .map(sharedStrings).getOrElse(IndexedSeq.empty)
    val styles = parts.get("xl/styles.xml")
      .map(dateStyles).getOrElse(Set.empty)
    val path = sheetPaths(parts).getOrElse(sheetName,
      throw new IllegalArgumentException(
        s"sheet '$sheetName' not found in workbook"))
    sheetCells(parts(path), shared, styles)
  }
}
