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

  private[engine] def beBytes(v: Long, n: Int): Array[Byte] =
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
