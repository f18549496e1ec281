package graft.engine

import scala.collection.mutable.ArrayBuffer

/**
 * STREAMING from-scratch SQLite3 writer: pages spill to the file the
 * moment they fill, so archive size never hits driver memory — the
 * bounded-state analog of the reference's batched-INSERT streaming
 * write (`mbtiles/Mbtiles.java:597`). Retained state is only
 *
 *   - the current leaf page being packed (≤ 1 page per open table),
 *   - the pending-children fringe of each interior level (≤ ~250
 *     entries × ~3 levels — interior pages flush incrementally too),
 *   - the deferred page-1 catalog (a handful of CREATE statements).
 *
 * Multiple tables may be OPEN CONCURRENTLY (the MBTiles drain feeds
 * `map` and `images` in the same pass): pages are position-written, so
 * interleaved allocation is fine. Page 1 (header + sqlite_master) is
 * written last at offset 0. Same public-format layout rules as
 * [[SqliteWriter]]; output passes stock sqlite3 `PRAGMA
 * integrity_check`.
 */
final class SqliteStreamWriter(path: String) {
  import SqliteWriter.{Bytes, PageSize, encodeRecord, varint}

  private val chan = java.nio.channels.FileChannel.open(
    java.nio.file.Paths.get(path),
    java.nio.file.StandardOpenOption.CREATE,
    java.nio.file.StandardOpenOption.WRITE,
    java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
  private var nextPage = 2 // page 1 reserved for the catalog
  private var retained = 0L
  private var maxRetained0 = 0L

  /** High-water mark of bytes buffered in open-table state — the
    * bounded-memory guarantee a spec can assert. */
  def maxRetainedBytes: Long = maxRetained0

  private def alloc(): Int = { val n = nextPage; nextPage += 1; n }

  // Pages are allocated-and-written in ascending order (the one
  // exception is the final page-1 catalog), so writes coalesce into a
  // fixed write-behind buffer instead of one pwrite syscall per 4 KB
  // page. A non-contiguous page flushes the run and starts a new one.
  private val WriteBufPages = 512
  private val writeBuf = java.nio.ByteBuffer.allocate(WriteBufPages * PageSize)
  private var bufStartPage = -1

  private def flushWriteBuf(): Unit = {
    if (bufStartPage > 0 && writeBuf.position() > 0) {
      writeBuf.flip()
      var off = (bufStartPage - 1L) * PageSize
      while (writeBuf.hasRemaining) off += chan.write(writeBuf, off)
    }
    writeBuf.clear()
    bufStartPage = -1
  }

  private def writePage(no: Int, bytes: Array[Byte]): Unit = {
    if (bufStartPage < 0) bufStartPage = no
    else if (no != bufStartPage + writeBuf.position() / PageSize) {
      flushWriteBuf(); bufStartPage = no
    }
    writeBuf.put(bytes, 0, PageSize)
    if (writeBuf.remaining() < PageSize) flushWriteBuf()
  }

  private def beBytes(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >>> (8 * (n - 1 - i))) & 0xff).toByte)

  private def putU16(p: Array[Byte], off: Int, v: Int): Unit = {
    p(off) = ((v >>> 8) & 0xff).toByte; p(off + 1) = (v & 0xff).toByte
  }
  private def putU32(p: Array[Byte], off: Int, v: Long): Unit = {
    p(off) = ((v >>> 24) & 0xff).toByte; p(off + 1) = ((v >>> 16) & 0xff).toByte
    p(off + 2) = ((v >>> 8) & 0xff).toByte; p(off + 3) = (v & 0xff).toByte
  }

  /** Leaf cell for (rowid, record); overflow pages are allocated AND
    * written immediately, so only the in-cell prefix is retained. */
  private def leafCell(rowid: Long, rec: Array[Byte]): Array[Byte] = {
    val p = rec.length
    val x = PageSize - 35
    val out = new Bytes(math.min(p, x) + 22)
    varint(out, p.toLong)
    varint(out, rowid)
    if (p <= x) { out.addAll(rec, 0, p); return out.toArray }
    val m = (PageSize - 12) * 32 / 255 - 23
    val k = m + (p - m) % (PageSize - 4)
    val inline = if (k <= x) k else m
    out.addAll(rec, 0, inline)
    var off = inline
    var cur = alloc()
    out.addAll(beBytes(cur.toLong, 4), 0, 4)
    val page = new Array[Byte](PageSize)
    while (off < p) {
      java.util.Arrays.fill(page, 0.toByte)
      val take = math.min(p - off, PageSize - 4)
      System.arraycopy(rec, off, page, 4, take)
      off += take
      val next = if (off < p) alloc() else 0
      putU32(page, 0, next.toLong)
      writePage(cur, page)
      cur = next
    }
    out.toArray
  }

  /** Max children buffered per interior level before an incremental
    * interior-page flush (one page holds ~272 cells of ≤15 bytes;
    * flushing at 250 leaves headroom and ≥1 pending child, so the
    * final bottom-up flush can always promote a lone child instead of
    * emitting a 0-cell page). */
  private val InteriorFanout = 250

  final class TableBuilder private[SqliteStreamWriter] () {
    private var rowid = 0L
    private var done = false
    private val pending = ArrayBuffer.empty[(Long, Array[Byte])] // current leaf cells
    private var used = 8
    private val levels = ArrayBuffer(ArrayBuffer.empty[(Int, Long)]) // pending children per level

    def nextRowid: Long = rowid + 1

    def addRow(values: Array[Any]): Long = {
      require(!done, "table already finished")
      rowid += 1
      val cell = leafCell(rowid, encodeRecord(values))
      if (pending.nonEmpty && used + 2 + cell.length > PageSize) flushLeaf()
      pending += ((rowid, cell))
      used += 2 + cell.length
      retained += cell.length + 2
      if (retained > maxRetained0) maxRetained0 = retained
      rowid
    }

    private def flushLeaf(): Unit = {
      val no = alloc()
      val page = new Array[Byte](PageSize)
      page(0) = 13
      putU16(page, 3, pending.length)
      var contentStart = PageSize
      pending.zipWithIndex.foreach { case ((_, cell), i) =>
        contentStart -= cell.length
        System.arraycopy(cell, 0, page, contentStart, cell.length)
        putU16(page, 8 + 2 * i, contentStart)
      }
      putU16(page, 5, contentStart)
      writePage(no, page)
      retained -= (used - 8)
      addChild(0, (no, pending.last._1))
      pending.clear()
      used = 8
    }

    private def addChild(level: Int, c: (Int, Long)): Unit = {
      if (levels.length <= level) levels += ArrayBuffer.empty[(Int, Long)]
      val l = levels(level)
      l += c
      retained += 16
      if (retained > maxRetained0) maxRetained0 = retained
      if (l.length > InteriorFanout) {
        val group = l.take(InteriorFanout)
        l.remove(0, InteriorFanout)
        retained -= 16L * InteriorFanout
        addChild(level + 1, flushInterior(group.toSeq))
      }
    }

    /** Write one interior page over `group` (≥2 children). */
    private def flushInterior(group: Seq[(Int, Long)]): (Int, Long) = {
      val no = alloc()
      val page = new Array[Byte](PageSize)
      page(0) = 5
      val interiorCells = group.dropRight(1)
      putU16(page, 3, interiorCells.length)
      putU32(page, 8, group.last._1.toLong) // right-most child
      var contentStart = PageSize
      interiorCells.zipWithIndex.foreach { case ((child, maxRowid), i) =>
        val cell = new Bytes(13)
        cell.addAll(beBytes(child.toLong, 4), 0, 4)
        varint(cell, maxRowid)
        contentStart -= cell.len
        System.arraycopy(cell.arr, 0, page, contentStart, cell.len)
        putU16(page, 12 + 2 * i, contentStart)
      }
      putU16(page, 5, if (interiorCells.isEmpty) PageSize else contentStart)
      writePage(no, page)
      (no, group.last._2)
    }

    /** Flush remaining state bottom-up; returns the root page. */
    def finish(): Int = {
      require(!done, "table already finished")
      done = true
      if (rowid == 0) { // empty table = one empty leaf
        val no = alloc()
        val page = new Array[Byte](PageSize)
        page(0) = 13
        putU16(page, 5, PageSize)
        writePage(no, page)
        return no
      }
      if (pending.nonEmpty) flushLeaf()
      var level = 0
      while (true) {
        val l = levels(level)
        val higherEmpty = levels.drop(level + 1).forall(_.isEmpty)
        if (l.length == 1 && higherEmpty) {
          retained -= 16
          return l.head._1
        }
        if (l.nonEmpty) {
          val child = if (l.length == 1) l.head else flushInterior(l.toSeq)
          retained -= 16L * l.length
          l.clear()
          addChild(level + 1, child)
        }
        level += 1
      }
      throw new IllegalStateException("unreachable")
    }
  }

  def newTable(): TableBuilder = new TableBuilder()

  /** Write the page-1 header + sqlite_master catalog and close. */
  def close(catalog: Seq[SqliteStreamWriter.Catalog]): Unit = {
    val p1 = new Array[Byte](PageSize)
    val masterCells = catalog.zipWithIndex.map { case (c, i) =>
      val typ = if (c.isView) "view" else "table"
      val rec = encodeRecord(Array[Any](typ, c.name, c.name,
        if (c.isView) 0L else c.root.toLong, c.createSql))
      leafCell((i + 1).toLong, rec) // may alloc+write overflow pages
    }
    putU16(p1, 16, PageSize)
    p1(18) = 1; p1(19) = 1 // file format versions
    p1(21) = 64; p1(22) = 32; p1(23) = 32 // payload fractions
    putU32(p1, 24, 1) // change counter
    putU32(p1, 28, (nextPage - 1).toLong) // page count
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
    masterCells.zipWithIndex.foreach { case (cell, i) =>
      contentStart -= cell.length
      System.arraycopy(cell, 0, p1, contentStart, cell.length)
      putU16(p1, hdrOff + 8 + 2 * i, contentStart)
    }
    putU16(p1, hdrOff + 5, contentStart)
    putU32(p1, 28, (nextPage - 1).toLong) // incl. catalog overflow pages
    writePage(1, p1)
    flushWriteBuf()
    chan.close()
  }
}

object SqliteStreamWriter {
  /** Catalog entry: a finished table (root > 0) or a view (root = 0,
    * e.g. the MBTiles `tiles` compatibility view). */
  case class Catalog(name: String, createSql: String, root: Int, isView: Boolean = false)
}

/** Open-addressed primitive long set (no boxing) for blob dedup at
  * archive scale — 300M planet tiles would box to ~10 GB in a
  * HashSet[Long]; this stays at ~8 bytes/slot. 0 is handled via a
  * sentinel flag. */
final class LongHashSet(initialCapacity: Int = 1 << 16) {
  private var cap = Integer.highestOneBit(math.max(initialCapacity, 16) * 2 - 1)
  private var table = new Array[Long](cap)
  private var used = 0
  private var hasZero = false

  def size: Int = used + (if (hasZero) 1 else 0)

  /** Add; returns true iff newly inserted. */
  def add(v: Long): Boolean = {
    if (v == 0L) {
      if (hasZero) return false
      hasZero = true
      return true
    }
    // Long arithmetic: at planet scale (~300M entries) `used * 10`
    // overflows Int, the grow check goes false-negative, and a full
    // table turns insert() into an infinite probe loop
    if (used.toLong * 10 >= cap.toLong * 7) grow()
    insert(table, cap, v)
  }

  private def insert(t: Array[Long], c: Int, v: Long): Boolean = {
    var i = (java.lang.Long.hashCode(v * -7046029254386353131L) & (c - 1))
    while (true) {
      val cur = t(i)
      if (cur == 0L) { t(i) = v; used += 1; return true }
      if (cur == v) return false
      i = (i + 1) & (c - 1)
    }
    false
  }

  private def grow(): Unit = {
    val old = table
    cap <<= 1
    require(cap > 0, "LongHashSet capacity overflow (>2^30 entries) — shard the dedup set")
    table = new Array[Long](cap)
    used = 0
    old.foreach(v => if (v != 0L) insert(table, cap, v))
  }
}
