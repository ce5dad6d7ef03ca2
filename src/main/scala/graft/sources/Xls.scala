package graft.sources

import scala.collection.mutable

/** Minimal legacy BIFF8 `.xls` workbook parsing — pure JDK, from the
  * MS-CFB and MS-XLS public specifications. This closes the reference's
  * actual production format: its file regex accepts `DD \d\d.xls[x]?`
  * and its own output filename template writes `.xls`
  * (/root/reference/src/parse.ts:41, /root/reference/src/helpers.ts:76);
  * SheetJS reads both transparently at /root/reference/src/parse.ts:61-63.
  *
  * Two layers:
  *  - [[Cfb]]: the OLE2 compound-file container — header, DIFAT→FAT,
  *    directory, and BOTH stream paths (regular FAT chains and the
  *    mini-FAT mini-stream that real small workbooks live in).
  *  - BIFF8 records: BOF (version-checked — BIFF5 "Book" and encrypted
  *    workbooks are rejected LOUDLY), SST/LABELSST shared strings,
  *    NUMBER / RK / MULRK numerics, BOOLERR, FORMULA with a cached
  *    numeric or STRING result, XF/FORMAT for date-style detection
  *    (same `isDate` contract as [[Xlsx]]).
  *
  * Values surface as raw strings in [[Xlsx.Cell]] — integral doubles
  * render without a decimal point, so a BIFF workbook and an OOXML
  * workbook of the same grid parse IDENTICALLY (XlsSpec pins it).
  */
object Xls {

  // ── little-endian primitives ─────────────────────────────────────────

  private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xff
  private def u16(b: Array[Byte], o: Int): Int = u8(b, o) | (u8(b, o + 1) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (u16(b, o).toLong | (u16(b, o + 2).toLong << 16)) & 0xffffffffL
  private def i32(b: Array[Byte], o: Int): Int = u32(b, o).toInt
  private def f64(b: Array[Byte], o: Int): Double = {
    var bits = 0L
    var i = 7
    while (i >= 0) { bits = (bits << 8) | u8(b, o + i); i -= 1 }
    java.lang.Double.longBitsToDouble(bits)
  }

  // ── CFB (OLE2 compound file) container ───────────────────────────────

  private val EndOfChain = 0xfffffffeL
  private val FreeSect = 0xffffffffL

  private object Cfb {
    final case class Entry(name: String, objType: Int, start: Long, size: Long)

    final class File(bytes: Array[Byte]) {
      private val sectorSize = 1 << u16(bytes, 30)
      private val miniSize = 1 << u16(bytes, 32)
      private val miniCutoff = u32(bytes, 56)

      private def sector(n: Long): Array[Byte] = {
        val off = ((n + 1) * sectorSize).toInt
        if (off >= bytes.length)
          throw new IllegalArgumentException(
            s"truncated CFB container: sector $n lies past the file end " +
              s"(${bytes.length} bytes) — corrupt '.xls' workbook")
        java.util.Arrays.copyOfRange(bytes, off,
          math.min(off + sectorSize, bytes.length))
      }

      /** FAT = header DIFAT (109 entries) + chained DIFAT sectors. */
      private val fat: Array[Long] = {
        val fatSectors = mutable.ArrayBuffer[Long]()
        var i = 0
        while (i < 109) {
          val v = u32(bytes, 76 + 4 * i)
          if (v != FreeSect && v != EndOfChain) fatSectors += v
          i += 1
        }
        var difat = u32(bytes, 68)
        val perSector = sectorSize / 4 - 1
        while (difat != EndOfChain && difat != FreeSect) {
          val s = sector(difat)
          for (j <- 0 until perSector) {
            val v = u32(s, 4 * j)
            if (v != FreeSect && v != EndOfChain) fatSectors += v
          }
          difat = u32(s, sectorSize - 4)
        }
        fatSectors.toArray.flatMap { fs =>
          val s = sector(fs)
          (0 until sectorSize / 4).map(j => u32(s, 4 * j))
        }
      }

      private def chain(start: Long): Seq[Long] = {
        val out = mutable.ArrayBuffer[Long]()
        var cur = start
        while (cur != EndOfChain && cur != FreeSect && out.size <= fat.length) {
          out += cur
          cur = fat(cur.toInt)
        }
        out.toSeq
      }

      private def readChain(start: Long, size: Long): Array[Byte] = {
        val got = chain(start).flatMap(sector).toArray
        if (got.length < size)
          throw new IllegalArgumentException(
            s"truncated CFB container: stream declares $size bytes, " +
              s"chain holds ${got.length} — corrupt '.xls' workbook")
        got.take(size.toInt)
      }

      val entries: Seq[Entry] = {
        val dir = chain(u32(bytes, 48)).flatMap(sector).toArray
        (0 until dir.length / 128).flatMap { i =>
          val o = i * 128
          val nameLen = u16(dir, o + 64)
          if (nameLen < 2) None
          else Some(Entry(
            new String(dir, o, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE),
            u8(dir, o + 66), u32(dir, o + 116), u32(dir, o + 120)))
        }
      }

      private lazy val root = entries.find(_.objType == 5).getOrElse(
        throw new IllegalArgumentException("CFB: no root storage entry"))
      private lazy val miniStream: Array[Byte] = readChain(root.start, root.size)
      private lazy val miniFat: Array[Long] = {
        val raw = chain(u32(bytes, 60)).flatMap(sector).toArray
        (0 until raw.length / 4).map(j => u32(raw, 4 * j)).toArray
      }

      def stream(e: Entry): Array[Byte] =
        if (e.size >= miniCutoff) readChain(e.start, e.size)
        else {
          // mini-FAT chain over 64-byte mini sectors inside the root's
          // mini stream — where every real small workbook lives
          val out = mutable.ArrayBuffer[Byte]()
          var cur = e.start
          var guard = 0
          while (cur != EndOfChain && cur != FreeSect && guard <= miniFat.length) {
            val off = (cur * miniSize).toInt
            out ++= java.util.Arrays.copyOfRange(miniStream, off,
              math.min(off + miniSize, miniStream.length))
            cur = miniFat(cur.toInt)
            guard += 1
          }
          if (out.size < e.size)
            throw new IllegalArgumentException(
              s"truncated CFB container: mini stream declares ${e.size} " +
                s"bytes, chain holds ${out.size} — corrupt '.xls' workbook")
          out.take(e.size.toInt).toArray
        }
    }
  }

  // ── BIFF8 record stream ──────────────────────────────────────────────

  private def colLetters(c: Int): String =
    if (c < 26) ('A' + c).toChar.toString
    else colLetters(c / 26 - 1) + ('A' + c % 26).toChar

  private def render(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  /** RkNumber: bit0 = ×1/100, bit1 = 30-bit int vs truncated double. */
  private[graft] def rkValue(rk: Int): Double = {
    val v =
      if ((rk & 2) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xfffffffcL) << 32)
    if ((rk & 1) != 0) v / 100.0 else v
  }

  /** XLUnicodeRichExtendedString at `o`; returns (text, bytesConsumed). */
  private def xluString(b: Array[Byte], o: Int): (String, Int) = {
    // every segment is bounds-checked: a string whose header, body, or
    // trailers straddle the record end means it continues in a CONTINUE
    // record — raise the same descriptive diagnostic as the caller's
    // record-start check, not an ArrayIndexOutOfBoundsException
    def need(upTo: Int, what: String): Unit =
      if (upTo > b.length)
        throw new IllegalArgumentException(
          s"XLUnicodeString $what spills into a CONTINUE record — " +
            "workbook too large for this minimal BIFF8 reader")
    need(o + 3, "header")
    val cch = u16(b, o)
    val flags = u8(b, o + 2)
    var p = o + 3
    val cRun = if ((flags & 0x08) != 0) {
      need(p + 2, "rich-run count"); val n = u16(b, p); p += 2; n
    } else 0
    val cbExt = if ((flags & 0x04) != 0) {
      need(p + 4, "ext-block length"); val n = i32(b, p); p += 4; n
    } else 0
    val s =
      if ((flags & 0x01) != 0) {
        need(p + 2 * cch, "UTF-16 body")
        val t = new String(b, p, 2 * cch,
          java.nio.charset.StandardCharsets.UTF_16LE); p += 2 * cch; t
      } else {
        need(p + cch, "compressed body")
        val t = new String(b, p, cch,
          java.nio.charset.StandardCharsets.ISO_8859_1); p += cch; t
      }
    p += 4 * cRun + cbExt
    need(p, "rich-run/ext trailer")
    (s, p - o)
  }

  private final case class Rec(id: Int, data: Array[Byte])

  private def records(wb: Array[Byte], from: Int): Iterator[Rec] =
    new Iterator[Rec] {
      private var off = from
      def hasNext: Boolean = off + 4 <= wb.length
      def next(): Rec = {
        val id = u16(wb, off); val len = u16(wb, off + 2)
        if (off + 4 + len > wb.length)
          throw new IllegalArgumentException(
            s"truncated BIFF record (id 0x${id.toHexString} declares $len " +
              s"bytes past the stream end) — corrupt '.xls' workbook")
        val d = java.util.Arrays.copyOfRange(wb, off + 4, off + 4 + len)
        off += 4 + len
        Rec(id, d)
      }
    }

  /** Parse one `.xls` workbook's bytes: the named sheet's cells, same
    * contract as [[Xlsx.parse]]. */
  def parse(bytes: Array[Byte], sheetName: String): Seq[Xlsx.Cell] = {
    if (bytes.length < 512)
      throw new IllegalArgumentException(
        "truncated OLE2/CFB container — not a readable BIFF '.xls' workbook")
    val cfb = new Cfb.File(bytes)
    if (cfb.entries.exists(e => e.name == "Book" && e.objType == 2))
      throw new IllegalArgumentException(
        "BIFF5 '.xls' workbook ('Book' stream) — only BIFF8 (Excel 97+) " +
          "is supported; re-save the workbook")
    val wbEntry = cfb.entries.find(e => e.name == "Workbook" && e.objType == 2)
      .getOrElse(throw new IllegalArgumentException(
        "CFB container has no 'Workbook' stream — not an Excel workbook"))
    val wb = cfb.stream(wbEntry)

    // globals substream: BOF version, SST, XF/FORMAT, BoundSheet8
    val sst = mutable.ArrayBuffer[String]()
    val xfIfmt = mutable.ArrayBuffer[Int]()
    val customFmt = mutable.Map[Int, String]()
    val sheets = mutable.ArrayBuffer[(String, Long)]()
    val globals = records(wb, 0)
    if (!globals.hasNext) throw new IllegalArgumentException("empty Workbook stream")
    val bof = globals.next()
    if (bof.id != 0x0809 || u16(bof.data, 0) != 0x0600)
      throw new IllegalArgumentException(
        "unsupported BIFF version — only BIFF8 (Excel 97+) is supported")
    var done = false
    while (globals.hasNext && !done) {
      val r = globals.next()
      r.id match {
        case 0x000a => done = true // EOF of globals
        case 0x002f =>
          throw new IllegalArgumentException(
            "encrypted '.xls' workbook (FilePass record) — not supported")
        case 0x00fc => // SST
          val unique = i32(r.data, 4)
          var p = 8
          var i = 0
          while (i < unique) {
            if (p >= r.data.length)
              throw new IllegalArgumentException(
                "SST spills into a CONTINUE record — workbook too large " +
                  "for this minimal BIFF8 reader")
            val (s, n) = xluString(r.data, p)
            sst += s; p += n; i += 1
          }
        case 0x00e0 => xfIfmt += u16(r.data, 2) // XF: ifmt at offset 2
        case 0x041e => // FORMAT: ifmt, XLUnicodeString (no rich/ext)
          val id = u16(r.data, 0)
          val cch = u16(r.data, 2)
          val hi = (u8(r.data, 4) & 1) != 0
          val code =
            if (hi) new String(r.data, 5, 2 * cch,
              java.nio.charset.StandardCharsets.UTF_16LE)
            else new String(r.data, 5, cch,
              java.nio.charset.StandardCharsets.ISO_8859_1)
          customFmt(id) = code
        case 0x0085 => // BoundSheet8
          val pos = u32(r.data, 0)
          val cch = u8(r.data, 6)
          val hi = (u8(r.data, 7) & 1) != 0
          val name =
            if (hi) new String(r.data, 8, 2 * cch,
              java.nio.charset.StandardCharsets.UTF_16LE)
            else new String(r.data, 8, cch,
              java.nio.charset.StandardCharsets.ISO_8859_1)
          sheets += name -> pos
        case _ => ()
      }
    }

    val sheetPos = sheets.collectFirst { case (n, p) if n == sheetName => p }
      .getOrElse(throw new IllegalArgumentException(
        s"sheet '$sheetName' not found in workbook " +
          s"(has: ${sheets.map(_._1).mkString(", ")})"))

    def dated(ixfe: Int): Boolean =
      ixfe < xfIfmt.length && {
        val ifmt = xfIfmt(ixfe)
        Xlsx.isDateFmt(ifmt, customFmt.get(ifmt))
      }

    val cells = mutable.ArrayBuffer[Xlsx.Cell]()
    def add(rw: Int, c: Int, ixfe: Int, v: String): Unit =
      cells += Xlsx.Cell(rw + 1, colLetters(c), v, dated(ixfe))

    val it = records(wb, sheetPos.toInt).buffered
    if (!it.hasNext || it.next().id != 0x0809)
      throw new IllegalArgumentException("sheet substream has no BOF")
    var sheetDone = false
    while (it.hasNext && !sheetDone) {
      val r = it.next()
      r.id match {
        case 0x000a => sheetDone = true
        case 0x0203 => // NUMBER
          add(u16(r.data, 0), u16(r.data, 2), u16(r.data, 4),
            render(f64(r.data, 6)))
        case 0x027e => // RK
          add(u16(r.data, 0), u16(r.data, 2), u16(r.data, 4),
            render(rkValue(i32(r.data, 6))))
        case 0x00bd => // MULRK: rw, colFirst, (ixfe+rk)*, colLast
          val rw = u16(r.data, 0); val c0 = u16(r.data, 2)
          val n = (r.data.length - 6) / 6
          for (k <- 0 until n)
            add(rw, c0 + k, u16(r.data, 4 + 6 * k),
              render(rkValue(i32(r.data, 6 + 6 * k))))
        case 0x00fd => // LABELSST
          add(u16(r.data, 0), u16(r.data, 2), u16(r.data, 4),
            sst(i32(r.data, 6)))
        case 0x0205 => // BOOLERR (boolean flavour only)
          if (u8(r.data, 7) == 0)
            add(u16(r.data, 0), u16(r.data, 2), u16(r.data, 4),
              if (u8(r.data, 6) != 0) "TRUE" else "FALSE")
        case 0x0006 => // FORMULA: cached numeric result, or a STRING record
          val rw = u16(r.data, 0); val c = u16(r.data, 2)
          val ixfe = u16(r.data, 4)
          if (u16(r.data, 12) == 0xffff) {
            if (u8(r.data, 6) == 0 && it.hasNext && it.head.id == 0x0207) {
              val s = it.next() // STRING: cached string result
              add(rw, c, ixfe, xluString(s.data, 0)._1)
            }
          } else add(rw, c, ixfe, render(f64(r.data, 6)))
        case _ => ()
      }
    }
    cells.toSeq
  }
}
