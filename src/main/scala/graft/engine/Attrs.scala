package graft.engine

import scala.collection.mutable.ArrayBuffer

/**
 * Packed attribute encoding: sorted (key, value) UTF-8 pairs, each
 * varint-length-prefixed. Computed ONCE per output feature and carried
 * through the tile fan-out as opaque bytes — Tungsten ships it as a
 * binary blob with zero per-row decode cost; only the tile encoder
 * walks the pairs (sequentially, allocation-light).
 */
object Attrs {
  val Empty: Array[Byte] = Array.empty

  def pack(attrs: Map[String, String]): Array[Byte] = {
    if (attrs.isEmpty) return Empty
    val out = new java.io.ByteArrayOutputStream(64)
    def w(s: String): Unit = {
      val b = s.getBytes("UTF-8")
      var v = b.length
      while ((v & ~0x7f) != 0) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
      out.write(v)
      out.write(b)
    }
    attrs.toSeq.sortBy(_._1).foreach { case (k, v) => w(k); w(if (v == null) "" else v) }
    out.toByteArray
  }

  /** Walk pairs without building a Map. */
  def foreachPair(bytes: Array[Byte])(f: (String, String) => Unit): Unit = {
    var i = 0
    def rs(): String = {
      var len = 0
      var shift = 0
      var more = true
      while (more) {
        val x = bytes(i) & 0xff; i += 1
        len |= (x & 0x7f) << shift
        shift += 7
        more = (x & 0x80) != 0
      }
      val s = new String(bytes, i, len, "UTF-8")
      i += len
      s
    }
    while (i < bytes.length) {
      val k = rs()
      val v = rs()
      f(k, v)
    }
  }

  def unpack(bytes: Array[Byte]): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    foreachPair(bytes)((k, v) => b += (k -> v))
    b.result()
  }
}
