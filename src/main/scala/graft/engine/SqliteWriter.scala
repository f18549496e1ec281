package graft.engine

import scala.collection.mutable.ArrayBuffer

/**
 * From-scratch SQLite3 WRITER facade — record serial-type encoding per
 * the public file format (sqlite.org/fileformat2.html) plus a bulk
 * `write` convenience that streams the given tables through
 * [[SqliteStreamWriter]] (the page builder: b-trees bottom-up, leaf
 * and interior pages spilled incrementally, overflow chains, page-1
 * catalog). Output is readable by stock sqlite3 (verified in tests).
 */
object SqliteWriter {

  val PageSize = 4096

  /** One table to write: CREATE sql + ordered rows (values: null |
    * Long | Double | String | Array[Byte]); rowids assigned 1..N. */
  case class Table(name: String, createSql: String, rows: Seq[Array[Any]])

  // ---------------- record encoding ----------------

  /** Unboxed growable byte buffer — the record/cell encoders run per
    * tile in the archive drains, where a generic ArrayBuffer[Byte]
    * would box every byte of every blob. */
  private[engine] final class Bytes(initial: Int) {
    private[engine] var arr = new Array[Byte](math.max(initial, 16))
    private[engine] var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > arr.length) {
        var c = arr.length << 1
        while (c < len + n) c <<= 1
        arr = java.util.Arrays.copyOf(arr, c)
      }
    def add(b: Byte): Unit = { ensure(1); arr(len) = b; len += 1 }
    def addAll(src: Array[Byte], off: Int, n: Int): Unit = {
      ensure(n); System.arraycopy(src, off, arr, len, n); len += n
    }
    def toArray: Array[Byte] =
      if (len == arr.length) arr else java.util.Arrays.copyOf(arr, len)
  }

  /** SQLite varint: big-endian 7-bit groups, high bit = continuation
    * (9-byte form unnecessary for our value range). */
  private[engine] def varint(out: Bytes, v: Long): Unit = {
    if (v >= 0 && v <= 127) { out.add(v.toByte); return }
    var n = 1
    var t = v >>> 7
    while (t != 0) { n += 1; t >>>= 7 }
    var i = n - 1
    while (i > 0) { out.add((((v >>> (7 * i)) & 0x7f) | 0x80).toByte); i -= 1 }
    out.add((v & 0x7f).toByte)
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

  private[engine] def beBytes(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >>> (8 * (n - 1 - i))) & 0xff).toByte)

  /** Encode one record (header of serial types + body). */
  def encodeRecord(values: Array[Any]): Array[Byte] = {
    val typed = values.map(serialType)
    val typesBuf = new Bytes(values.length * 2)
    typed.foreach { case (t, _) => varint(typesBuf, t) }
    // header length includes its own varint — sizes here stay 1-byte
    var hdrLen = typesBuf.len + 1
    if (hdrLen > 127) hdrLen = typesBuf.len + 2 // 2-byte header-length varint
    var total = hdrLen
    typed.foreach { case (_, b) => total += b.length }
    val out = new Bytes(total)
    varint(out, hdrLen.toLong)
    out.addAll(typesBuf.arr, 0, typesBuf.len)
    typed.foreach { case (_, b) => out.addAll(b, 0, b.length) }
    out.toArray
  }

  /** Bulk write: stream each table through the incremental writer. */
  def write(path: String, tables: Seq[Table]): Unit = {
    val w = new SqliteStreamWriter(path)
    val entries = tables.map { t =>
      val b = w.newTable()
      t.rows.foreach(b.addRow)
      SqliteStreamWriter.Catalog(t.name, t.createSql, b.finish())
    }
    w.close(entries)
  }
}
