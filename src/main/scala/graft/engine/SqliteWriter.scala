package graft.engine

import scala.collection.mutable.ArrayBuffer

/**
 * Minimal from-scratch SQLite3 WRITER — bulk-creates a database file
 * per the public file format (sqlite.org/fileformat2.html): table
 * b-trees built bottom-up (leaf pages in rowid order, interior levels
 * above), record serial-type encoding, overflow chains for large
 * blobs, and a page-1 sqlite_master catalog. Append-only bulk create:
 * exactly what an MBTiles archive sink needs, no update machinery.
 *
 * Output is readable by stock sqlite3 (verified in tests via an
 * independent reader).
 */
object SqliteWriter {

  val PageSize = 4096
  private val Usable = PageSize // no reserved bytes

  /** One table to write: CREATE sql + ordered rows (values: null |
    * Long | Double | String | Array[Byte]); rowids assigned 1..N. */
  case class Table(name: String, createSql: String, rows: Seq[Array[Any]])

  // ---------------- record encoding ----------------

  private def varint(out: ArrayBuffer[Byte], v0: Long): Unit = {
    // SQLite varint: big-endian 7-bit groups, high bit = continuation
    if (v0 >= 0 && v0 <= 127) { out += v0.toByte; return }
    val bytes = ArrayBuffer.empty[Byte]
    var v = v0
    var i = 0
    while (i < 8 && (v != 0 || i == 0)) { bytes += (v & 0x7f).toByte; v >>>= 7; i += 1 }
    // (9-byte form unnecessary for our value range)
    val rev = bytes.reverse
    for (j <- rev.indices.dropRight(1)) out += (rev(j) | 0x80).toByte
    out += rev.last
  }

  private def serialType(v: Any): (Long, Array[Byte]) = v match {
    case null => (0L, Array.emptyByteArray)
    case l: Long =>
      if (l == 0) (8L, Array.emptyByteArray)
      else if (l == 1) (9L, Array.emptyByteArray)
      else if (l >= Byte.MinValue && l <= Byte.MaxValue) (1L, Array(l.toByte))
      else if (l >= Short.MinValue && l <= Short.MaxValue) (2L, beBytes(l, 2))
      else if (l >= -(1L << 23) && l < (1L << 23)) (3L, beBytes(l, 3))
      else if (l >= Int.MinValue && l <= Int.MaxValue) (4L, beBytes(l, 4))
      else if (l >= -(1L << 47) && l < (1L << 47)) (5L, beBytes(l, 6))
      else (6L, beBytes(l, 8))
    case i: Int => serialType(i.toLong)
    case d: Double => (7L, beBytes(java.lang.Double.doubleToLongBits(d), 8))
    case s: String =>
      val b = s.getBytes("UTF-8")
      (13L + 2 * b.length, b)
    case b: Array[Byte] => (12L + 2 * b.length, b)
    case other => throw new IllegalArgumentException(s"unsupported value $other")
  }

  private def beBytes(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >>> (8 * (n - 1 - i))) & 0xff).toByte)

  /** Encode one record (header of serial types + body). */
  def encodeRecord(values: Array[Any]): Array[Byte] = {
    val typed = values.map(serialType)
    val typesBuf = ArrayBuffer.empty[Byte]
    typed.foreach { case (t, _) => varint(typesBuf, t) }
    // header length includes its own varint — sizes here stay 1-byte
    var hdrLen = typesBuf.length + 1
    if (hdrLen > 127) hdrLen = typesBuf.length + 2 // 2-byte header-length varint
    val out = ArrayBuffer.empty[Byte]
    varint(out, hdrLen.toLong)
    out ++= typesBuf
    typed.foreach { case (_, b) => out ++= b }
    out.toArray
  }

  // ---------------- b-tree page construction ----------------

  private final class PageAlloc {
    val pages = ArrayBuffer.empty[Array[Byte]] // index i = page i+1
    def alloc(): Int = { pages += new Array[Byte](PageSize); pages.length }
    def apply(no: Int): Array[Byte] = pages(no - 1)
  }

  private def putU16(p: Array[Byte], off: Int, v: Int): Unit = {
    p(off) = ((v >>> 8) & 0xff).toByte; p(off + 1) = (v & 0xff).toByte
  }
  private def putU32(p: Array[Byte], off: Int, v: Long): Unit = {
    p(off) = ((v >>> 24) & 0xff).toByte; p(off + 1) = ((v >>> 16) & 0xff).toByte
    p(off + 2) = ((v >>> 8) & 0xff).toByte; p(off + 3) = (v & 0xff).toByte
  }

  /** Leaf cell bytes for (rowid, record); spills to overflow pages. */
  private def leafCell(alloc: PageAlloc, rowid: Long, rec: Array[Byte]): Array[Byte] = {
    val p = rec.length
    val x = Usable - 35
    val out = ArrayBuffer.empty[Byte]
    varint(out, p.toLong)
    varint(out, rowid)
    if (p <= x) { out ++= rec; return out.toArray }
    val m = (Usable - 12) * 32 / 255 - 23
    val k = m + (p - m) % (Usable - 4)
    val inline = if (k <= x) k else m
    out ++= rec.take(inline)
    // overflow chain
    var rest = rec.drop(inline)
    val firstPage = alloc.alloc()
    out ++= beBytes(firstPage.toLong, 4)
    var cur = firstPage
    while (rest.nonEmpty) {
      val page = alloc(cur)
      val take = math.min(rest.length, Usable - 4)
      System.arraycopy(rest, 0, page, 4, take)
      rest = rest.drop(take)
      val next = if (rest.nonEmpty) alloc.alloc() else 0
      putU32(page, 0, next.toLong)
      cur = next
    }
    out.toArray
  }

  /** Write cells into leaf pages; returns (pageNo, maxRowid) per leaf. */
  private def buildLeaves(alloc: PageAlloc, cells: Seq[(Long, Array[Byte])]): Seq[(Int, Long)] = {
    val leaves = ArrayBuffer.empty[(Int, Long)]
    var pending = ArrayBuffer.empty[(Long, Array[Byte])]
    var used = 8 // leaf header
    def flush(): Unit = if (pending.nonEmpty) {
      val no = alloc.alloc()
      val page = alloc(no)
      page(0) = 13
      putU16(page, 3, pending.length)
      var contentStart = PageSize
      pending.zipWithIndex.foreach { case ((_, cell), i) =>
        contentStart -= cell.length
        System.arraycopy(cell, 0, page, contentStart, cell.length)
        putU16(page, 8 + 2 * i, contentStart)
      }
      putU16(page, 5, contentStart)
      leaves += ((no, pending.last._1))
      pending = ArrayBuffer.empty
      used = 8
    }
    cells.foreach { case (rowid, cell) =>
      if (pending.nonEmpty && used + 2 + cell.length > PageSize) flush()
      pending += ((rowid, cell))
      used += 2 + cell.length
    }
    flush()
    leaves.toSeq
  }

  /** Stack interior levels over the children until one root remains. */
  private def buildInterior(alloc: PageAlloc, children0: Seq[(Int, Long)]): Int = {
    var children = children0
    while (children.length > 1) {
      val parents = ArrayBuffer.empty[(Int, Long)]
      var group = ArrayBuffer.empty[(Int, Long)]
      var used = 12
      def flush(): Unit = if (group.nonEmpty) {
        if (group.length == 1 && parents.nonEmpty) {
          // never emit a 0-cell interior page: promote the lone child
          parents += group.head
          group = ArrayBuffer.empty
          used = 12
          return
        }
        val no = alloc.alloc()
        val page = alloc(no)
        page(0) = 5
        val interiorCells = group.dropRight(1)
        putU16(page, 3, interiorCells.length)
        putU32(page, 8, group.last._1.toLong) // right-most child
        var contentStart = PageSize
        interiorCells.zipWithIndex.foreach { case ((child, maxRowid), i) =>
          val cell = ArrayBuffer.empty[Byte]
          cell ++= beBytes(child.toLong, 4)
          varint(cell, maxRowid)
          contentStart -= cell.length
          System.arraycopy(cell.toArray, 0, page, contentStart, cell.length)
          putU16(page, 12 + 2 * i, contentStart)
        }
        putU16(page, 5, if (interiorCells.isEmpty) PageSize else contentStart)
        parents += ((no, group.last._2))
        group = ArrayBuffer.empty
        used = 12
      }
      children.foreach { c =>
        if (group.nonEmpty && used + 2 + 13 > PageSize) flush()
        group += c
        used += 2 + 13
      }
      flush()
      children = parents.toSeq
    }
    children.head._1
  }

  private def buildTable(alloc: PageAlloc, rows: Seq[Array[Any]]): Int = {
    if (rows.isEmpty) { // empty table = one empty leaf
      val no = alloc.alloc()
      val page = alloc(no)
      page(0) = 13
      putU16(page, 5, PageSize)
      return no
    }
    val cells = rows.zipWithIndex.map { case (r, i) =>
      val rowid = (i + 1).toLong
      (rowid, leafCell(alloc, rowid, encodeRecord(r)))
    }
    buildInterior(alloc, buildLeaves(alloc, cells))
  }

  /** Write the database. Tables build in order; page 1 holds the
    * catalog. */
  def write(path: String, tables: Seq[Table]): Unit = {
    val alloc = new PageAlloc
    require(alloc.alloc() == 1) // page 1 reserved for sqlite_master
    val roots = tables.map(t => t -> buildTable(alloc, t.rows))

    // sqlite_master rows: (type, name, tbl_name, rootpage, sql)
    val masterCells = roots.zipWithIndex.map { case ((t, root), i) =>
      val rec = encodeRecord(Array[Any]("table", t.name, t.name, root.toLong, t.createSql))
      ((i + 1).toLong, leafCell(alloc, (i + 1).toLong, rec))
    }
    // page 1: 100-byte header + leaf btree
    val p1 = alloc(1)
    putU16(p1, 16, PageSize)
    p1(18) = 1; p1(19) = 1 // file format versions
    p1(21) = 64; p1(22) = 32; p1(23) = 32 // payload fractions
    putU32(p1, 24, 1) // change counter
    putU32(p1, 28, alloc.pages.length.toLong) // page count
    putU32(p1, 44, 4) // schema format 4
    putU32(p1, 40, 1) // schema cookie
    putU32(p1, 48, 0) // default cache size
    putU32(p1, 56, 1) // text encoding utf-8
    putU32(p1, 92, 1) // version-valid-for == change counter
    putU32(p1, 96, 3045001) // written-by sqlite version number
    System.arraycopy("SQLite format 3".getBytes("ISO-8859-1"), 0, p1, 0, 15)
    val hdrOff = 100
    p1(hdrOff) = 13
    putU16(p1, hdrOff + 3, masterCells.length)
    var contentStart = PageSize
    masterCells.zipWithIndex.foreach { case ((_, cell), i) =>
      contentStart -= cell.length
      System.arraycopy(cell, 0, p1, contentStart, cell.length)
      putU16(p1, hdrOff + 8 + 2 * i, contentStart)
    }
    putU16(p1, hdrOff + 5, contentStart)

    // fix the page count now that master overflow pages (if any) exist
    putU32(p1, 28, alloc.pages.length.toLong)
    val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(path), 1 << 20)
    alloc.pages.foreach(out.write)
    out.close()
  }
}
