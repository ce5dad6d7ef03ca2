package graft.sources

import scala.collection.mutable

/** Minimal BIFF8 `.xls` WRITER — fixture/test twin of [[Xls]], mirroring
  * [[XlsxWrite]] for the OOXML side. Emits a spec-shaped CFB container
  * (header → FAT → directory → mini-FAT → data) holding one `Workbook`
  * stream; small workbooks go through the mini-stream exactly as real
  * producers write them (so the reader's mini-FAT path is what the
  * round-trip exercises), large ones through regular FAT chains.
  *
  * Cells: strings → SST + LABELSST; integral numerics that fit 30 bits
  * → RK (fInt form, exercising the reader's RK decoder); other
  * numerics → NUMBER; `isDate` cells carry XF 1 (builtin ifmt 14,
  * m/d/yyyy) — the same raw-serial-plus-date-style shape Excel uses
  * and [[XlsxWrite]] mirrors for OOXML.
  */
object XlsWrite {

  private final class Buf {
    val b = mutable.ArrayBuffer[Byte]()
    def u8(v: Int): this.type = { b += (v & 0xff).toByte; this }
    def u16(v: Int): this.type = { u8(v); u8(v >> 8) }
    def u32(v: Long): this.type = { u16(v.toInt & 0xffff); u16((v >> 16).toInt & 0xffff) }
    def f64(v: Double): this.type = {
      var bits = java.lang.Double.doubleToLongBits(v)
      for (_ <- 0 until 8) { u8((bits & 0xff).toInt); bits >>= 8 }
      this
    }
    def bytes(xs: Array[Byte]): this.type = { b ++= xs; this }
    def pad(to: Int, fill: Int = 0): this.type = {
      while (b.size < to) u8(fill); this
    }
    def result: Array[Byte] = b.toArray
  }

  private def rec(id: Int, data: Array[Byte]): Array[Byte] =
    new Buf().u16(id).u16(data.length).bytes(data).result

  private def biffString16(s: String): Array[Byte] = {
    val hi = s.exists(_ >= 256)
    val out = new Buf().u16(s.length).u8(if (hi) 1 else 0)
    if (hi) out.bytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
    else out.bytes(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    out.result
  }

  private def colIndex(letters: String): Int =
    letters.foldLeft(0)((a, ch) => a * 26 + (ch - 'A' + 1)) - 1

  /** One workbook's bytes from the shared CellOut fixture model. */
  def workbook(sheetName: String, cells: Seq[XlsxWrite.CellOut]): Array[Byte] = {
    val strings = cells.filter(!_.isNumber).map(_.value).distinct
    val sidx = strings.zipWithIndex.toMap

    // ── sheet substream ──
    val sheet = new Buf()
    sheet.bytes(rec(0x0809, // BOF, worksheet
      new Buf().u16(0x0600).u16(0x0010).u16(0x0dbb).u16(0x07cc)
        .u32(0).u32(0).result))
    cells.foreach { c =>
      val col = colIndex(c.ref.takeWhile(_.isLetter))
      val row = c.ref.dropWhile(_.isLetter).toInt - 1
      val ixfe = if (c.isDate) 1 else 0
      if (!c.isNumber)
        sheet.bytes(rec(0x00fd, new Buf().u16(row).u16(col).u16(ixfe)
          .u32(sidx(c.value)).result))
      else {
        val d = c.value.toDouble
        val asInt = d == math.rint(d) && d >= -(1 << 29) && d < (1 << 29)
        if (asInt)
          sheet.bytes(rec(0x027e, new Buf().u16(row).u16(col).u16(ixfe)
            .u32(((d.toLong << 2) | 2L) & 0xffffffffL).result))
        else
          sheet.bytes(rec(0x0203, new Buf().u16(row).u16(col).u16(ixfe)
            .f64(d).result))
      }
    }
    sheet.bytes(rec(0x000a, Array.empty))

    // ── globals substream (BoundSheet8 position patched after) ──
    def globalsWith(sheetPos: Long): Array[Byte] = {
      val g = new Buf()
      g.bytes(rec(0x0809, // BOF, globals
        new Buf().u16(0x0600).u16(0x0005).u16(0x0dbb).u16(0x07cc)
          .u32(0).u32(0).result))
      g.bytes(rec(0x00e0, new Buf().u16(0).u16(0).pad(20).result)) // XF 0
      g.bytes(rec(0x00e0, new Buf().u16(0).u16(14).pad(20).result)) // XF 1: date
      g.bytes(rec(0x0085, { // BoundSheet8
        val n = new Buf().u32(sheetPos).u8(0).u8(0)
        val hi = sheetName.exists(_ >= 256)
        n.u8(sheetName.length).u8(if (hi) 1 else 0)
        if (hi) n.bytes(sheetName.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
        else n.bytes(sheetName.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
        n.result
      }))
      if (strings.nonEmpty) {
        val sst = new Buf().u32(strings.size).u32(strings.size)
        strings.foreach(s => sst.bytes(biffString16(s)))
        g.bytes(rec(0x00fc, sst.result))
      }
      g.bytes(rec(0x000a, Array.empty))
      g.result
    }
    val globalsLen = globalsWith(0).length // position-independent length
    val biff = globalsWith(globalsLen) ++ sheet.result

    cfb(biff)
  }

  // ── CFB container ────────────────────────────────────────────────────

  private def dirEntry(name: String, objType: Int, start: Long, size: Long,
      child: Long = 0xffffffffL): Array[Byte] = {
    val e = new Buf()
    val utf = name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    e.bytes(utf).pad(64)
    e.u16(utf.length + 2) // name length incl. terminator
    e.u8(objType).u8(1)   // color: black
    e.u32(0xffffffffL).u32(0xffffffffL).u32(child) // left, right, child
    e.pad(116)            // CLSID + state + timestamps
    e.u32(start).u32(size).u32(0)
    e.result // 128 bytes
  }

  private def cfb(biff: Array[Byte]): Array[Byte] = {
    val S = 512
    val mini = biff.length < 4096
    val out = new Buf()

    // data sector plan (sector numbers are FAT-space)
    val dataSectors: Int =
      if (mini) (biff.length + 63) / 64 * 64 match {
        case m => (m + S - 1) / S // mini container sectors
      }
      else (biff.length + S - 1) / S
    val fatSector = 0L
    val dirSector = 1L
    val miniFatSector = 2L
    val firstData = if (mini) 3L else 2L

    // header
    out.bytes(Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1)
      .map(_.toByte))
    out.pad(24)
    out.u16(0x003e).u16(0x0003).u16(0xfffe) // minor, major 3, little-endian
    out.u16(9).u16(6)                       // sector 512, mini sector 64
    out.pad(44)
    out.u32(1)            // number of FAT sectors
    out.u32(dirSector)    // first directory sector
    out.u32(0)            // transaction
    out.u32(4096)         // mini stream cutoff
    out.u32(if (mini) miniFatSector else 0xfffffffeL) // first mini FAT sector
    out.u32(if (mini) 1 else 0)                       // # mini FAT sectors
    out.u32(0xfffffffeL).u32(0)                       // no DIFAT chain
    out.u32(fatSector)    // DIFAT[0]
    for (_ <- 1 until 109) out.u32(0xffffffffL)

    // FAT sector
    val fatStart = out.b.size
    out.u32(0xfffffffdL)  // sector 0: FATSECT
    out.u32(0xfffffffeL)  // directory: end of chain
    if (mini) out.u32(0xfffffffeL) // mini FAT: end of chain
    for (k <- 0 until dataSectors)
      out.u32(if (k == dataSectors - 1) 0xfffffffeL else firstData + k + 1)
    out.pad(fatStart + S, 0xff) // FREESECT

    // directory sector: Root + Workbook + two empty entries
    val miniBytes = if (mini) (biff.length + 63) / 64 * 64 else 0
    out.bytes(dirEntry("Root Entry", 5,
      if (mini) firstData else 0xfffffffeL, miniBytes, child = 1))
    out.bytes(dirEntry("Workbook", 2,
      if (mini) 0 else firstData, biff.length))
    out.pad(out.b.size + 256) // two empty 128-byte entries

    // mini FAT sector
    if (mini) {
      val mfStart = out.b.size
      val miniSectors = (biff.length + 63) / 64
      for (k <- 0 until miniSectors)
        out.u32(if (k == miniSectors - 1) 0xfffffffeL else k + 1L)
      out.pad(mfStart + S, 0xff)
    }

    // data sectors (mini container or the stream itself), zero-padded
    val dataStart = out.b.size
    out.bytes(biff)
    out.pad(dataStart + dataSectors * S)
    out.result
  }
}
