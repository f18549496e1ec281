package graft.engine

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/**
 * Mapbox Vector Tile codec: geometry command encoding and the tile
 * protobuf assembly, written directly against the MVT 2.1 wire format
 * (the reference implements the same format in `VectorTile.java:1186-1317`
 * for commands and `VectorTile.java:546-592` for proto assembly; ours is
 * an independent implementation over the public spec).
 *
 * Layout: a Tile is `repeated Layer = 3`; a Layer has version(15)=2,
 * name(1), features(2), keys(3), values(4), extent(5)=4096; a Feature
 * has id(1), packed tags(2), type(3), packed geometry(4). Geometry
 * commands: MoveTo=1, LineTo=2, ClosePath=7; command int =
 * (id & 0x7) | (count << 3); coordinates are zigzag deltas.
 */
object Mvt {
  val Extent = 4096

  @inline def zigzag(v: Int): Int = (v << 1) ^ (v >> 31)
  @inline def unzigzag(v: Int): Int = (v >>> 1) ^ -(v & 1)

  final val MoveTo = 1
  final val LineTo = 2
  final val ClosePath = 7
  @inline def cmd(id: Int, count: Int): Int = (id & 0x7) | (count << 3)

  /** Encode a multipoint: one MoveTo with all (zigzag-delta) points. */
  def encodePoints(pts: Array[(Int, Int)]): Array[Int] = {
    val out = new ArrayBuffer[Int](1 + pts.length * 2)
    out += cmd(MoveTo, pts.length)
    var px = 0; var py = 0
    pts.foreach { case (x, y) =>
      out += zigzag(x - px); out += zigzag(y - py)
      px = x; py = y
    }
    out.toArray
  }

  /**
   * Encode lines: each an array of (x,y) ints. Consecutive duplicate
   * points are dropped; lines with < 2 points after dedup are skipped.
   */
  def encodeLines(lines: Seq[Array[(Int, Int)]]): Array[Int] = {
    val out = ArrayBuffer.empty[Int]
    var px = 0; var py = 0
    lines.foreach { line0 =>
      val line = dedupConsecutive(line0)
      if (line.length >= 2) {
        out += cmd(MoveTo, 1)
        out += zigzag(line(0)._1 - px); out += zigzag(line(0)._2 - py)
        px = line(0)._1; py = line(0)._2
        out += cmd(LineTo, line.length - 1)
        var i = 1
        while (i < line.length) {
          out += zigzag(line(i)._1 - px); out += zigzag(line(i)._2 - py)
          px = line(i)._1; py = line(i)._2
          i += 1
        }
      }
    }
    out.toArray
  }

  /**
   * Encode polygon rings (closed in input; trailing dup point removed
   * before encoding; ClosePath implied). Caller orients shells positive
   * (surveyor formula in y-down screen space), holes negative.
   */
  def encodeRings(rings: Seq[Array[(Int, Int)]]): Array[Int] = {
    val out = ArrayBuffer.empty[Int]
    var px = 0; var py = 0
    rings.foreach { ring0 =>
      var ring = dedupConsecutive(ring0)
      if (ring.length >= 2 && ring.head == ring.last) ring = ring.dropRight(1)
      if (ring.length >= 3) {
        out += cmd(MoveTo, 1)
        out += zigzag(ring(0)._1 - px); out += zigzag(ring(0)._2 - py)
        px = ring(0)._1; py = ring(0)._2
        out += cmd(LineTo, ring.length - 1)
        var i = 1
        while (i < ring.length) {
          out += zigzag(ring(i)._1 - px); out += zigzag(ring(i)._2 - py)
          px = ring(i)._1; py = ring(i)._2
          i += 1
        }
        out += cmd(ClosePath, 1)
      }
    }
    out.toArray
  }

  private def dedupConsecutive(pts: Array[(Int, Int)]): Array[(Int, Int)] = {
    if (pts.length < 2) pts
    else {
      val out = new ArrayBuffer[(Int, Int)](pts.length)
      out += pts(0)
      var i = 1
      while (i < pts.length) {
        if (pts(i) != out.last) out += pts(i)
        i += 1
      }
      out.toArray
    }
  }

  /** Decode geometry commands into absolute-coordinate parts.
    * Each part = (isClosed, points). */
  def decodeCommands(geomType: Int, cmds: Array[Int]): Seq[(Boolean, Array[(Int, Int)])] = {
    val parts = ArrayBuffer.empty[(Boolean, Array[(Int, Int)])]
    var cur = ArrayBuffer.empty[(Int, Int)]
    var x = 0; var y = 0
    var i = 0
    while (i < cmds.length) {
      val c = cmds(i); i += 1
      val id = c & 0x7
      val count = c >>> 3
      id match {
        case MoveTo =>
          var k = 0
          while (k < count) {
            if (cur.nonEmpty && geomType != 1) { parts += ((false, cur.toArray)); cur = ArrayBuffer.empty }
            x += unzigzag(cmds(i)); y += unzigzag(cmds(i + 1)); i += 2
            cur += ((x, y))
            k += 1
          }
        case LineTo =>
          var k = 0
          while (k < count) {
            x += unzigzag(cmds(i)); y += unzigzag(cmds(i + 1)); i += 2
            cur += ((x, y))
            k += 1
          }
        case ClosePath =>
          // spec mandates count == 1 and consumes no operands; an empty
          // ring (ClosePath with no accumulated points) is dropped
          if (cur.nonEmpty) { parts += ((true, cur.toArray)); cur = ArrayBuffer.empty }
        case _ => throw new IllegalArgumentException(s"bad command $id")
      }
    }
    if (cur.nonEmpty) parts += ((false, cur.toArray))
    parts.toSeq
  }

  // ---- protobuf wire writer ----

  /** Growable flat-array wire writer. The previous BAOS-backed form
    * allocated ~1 KB per writer and `packedUints` built a whole inner
    * writer per field — at ~3 writers per FEATURE that was the single
    * biggest allocation source in the tile encode stage (r6 probe:
    * 23 us/tile). Same bytes out; `reset`/`appendTo` let encodeLayer
    * reuse one writer across features. */
  final class ProtoWriter(initialCapacity: Int = 64) {
    private var buf = new Array[Byte](initialCapacity)
    private var len = 0
    private def ensure(n: Int): Unit = {
      if (len + n > buf.length) {
        var c = buf.length * 2
        while (c < len + n) c *= 2
        buf = java.util.Arrays.copyOf(buf, c)
      }
    }
    def reset(): Unit = len = 0
    def size: Int = len
    def writeVarint(v0: Long): Unit = {
      ensure(10)
      var v = v0
      while ((v & ~0x7fL) != 0) { buf(len) = ((v & 0x7f) | 0x80).toByte; len += 1; v >>>= 7 }
      buf(len) = v.toByte; len += 1
    }
    def key(field: Int, wire: Int): Unit = writeVarint((field << 3) | wire)
    def str(field: Int, s: String): Unit = bytes(field, s.getBytes("UTF-8"))
    def bytes(field: Int, b: Array[Byte]): Unit = {
      key(field, 2); writeVarint(b.length)
      ensure(b.length); System.arraycopy(b, 0, buf, len, b.length); len += b.length
    }
    /** Length-delimited field from another writer's current content —
      * `bytes(field, other.toBytes)` without the intermediate copy. */
    def appendTo(field: Int, other: ProtoWriter): Unit = {
      key(field, 2); writeVarint(other.len)
      ensure(other.len); System.arraycopy(other.buf, 0, buf, len, other.len); len += other.len
    }
    def uint(field: Int, v: Long): Unit = { key(field, 0); writeVarint(v) }
    def packedUints(field: Int, vs: Array[Int]): Unit = {
      // measure the packed payload first (no inner writer, no copy)
      var plen = 0
      var i = 0
      while (i < vs.length) { plen += varintLen(vs(i).toLong & 0xffffffffL); i += 1 }
      key(field, 2); writeVarint(plen.toLong)
      ensure(plen)
      i = 0
      while (i < vs.length) {
        var v = vs(i).toLong & 0xffffffffL
        while ((v & ~0x7fL) != 0) { buf(len) = ((v & 0x7f) | 0x80).toByte; len += 1; v >>>= 7 }
        buf(len) = v.toByte; len += 1
        i += 1
      }
    }
    def double(field: Int, v: Double): Unit = {
      key(field, 1)
      ensure(8)
      val bits = java.lang.Double.doubleToLongBits(v)
      var i = 0
      while (i < 8) { buf(len) = ((bits >>> (8 * i)) & 0xff).toByte; len += 1; i += 1 }
    }
    def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  /**
   * Scale a command stream down by 2^scale (reference
   * `VectorTile.java:113-200` "unscale"): lines render into the
   * feature store at extra precision so rounding cannot create
   * artificial endpoint intersections before line merging; the final
   * archive write divides back down, dropping collapsed points and
   * degenerate parts.
   */
  def unscale(geomType: Int, commands: Array[Int], scale: Int): Array[Int] = {
    if (scale <= 0) return commands
    val parts = decodeCommands(geomType, commands)
    def down(pts: Array[(Int, Int)]): Array[(Int, Int)] = {
      val out = ArrayBuffer.empty[(Int, Int)]
      pts.foreach { case (x, y) =>
        val p = (math.round(x.toDouble / (1 << scale)).toInt,
          math.round(y.toDouble / (1 << scale)).toInt)
        if (out.isEmpty || out.last != p) out += p
      }
      out.toArray
    }
    geomType match {
      case 1 => encodePoints(down(parts.flatMap(_._2).toArray))
      case 2 => encodeLines(parts.map(p => down(p._2)).filter(_.length >= 2))
      // decoded ClosePath rings are OPEN (the closing point is implicit),
      // so a valid triangle is 3 points — >= 4 would drop it
      case _ => encodeRings(parts.map(p => down(p._2)).filter(_.length >= 3))
    }
  }

  /** One feature inside a layer: pre-encoded geometry commands and
    * PACKED attrs (graft.engine.Attrs pairs, sorted by key). `scale` >
    * 0 means coordinates are at 2^scale extra precision (lines between
    * render and final write). */
  case class LayerFeature(id: Long, geomType: Int, commands: Array[Int], attrs: Array[Byte],
                          scale: Int = 0) {
    def attrsMap: Map[String, String] = Attrs.unpack(attrs)
  }
  object LayerFeature {
    def of(id: Long, geomType: Int, commands: Array[Int], attrs: Map[String, String]): LayerFeature =
      LayerFeature(id, geomType, commands, Attrs.pack(attrs))
  }

  /** Encode one layer. Attr values are type-sniffed (long/double/bool/string). */
  def encodeLayer(name: String, features: Seq[LayerFeature]): Array[Byte] = {
    val keys = ArrayBuffer.empty[String]
    val keyIdx = mutable.HashMap.empty[String, Int]
    val values = ArrayBuffer.empty[String] // canonical form "t:payload"
    val valIdx = mutable.HashMap.empty[String, Int]

    def keyOf(k: String): Int = keyIdx.getOrElseUpdate(k, { keys += k; keys.length - 1 })
    def valOf(v: String): Int = {
      val canon = sniff(v) match {
        case ('i', s) => "i:" + s
        case ('d', s) => "d:" + s
        case ('b', s) => "b:" + s
        case (_, s) => "s:" + s
      }
      valIdx.getOrElseUpdate(canon, { values += canon; values.length - 1 })
    }

    val tagBuf = ArrayBuffer.empty[Int]
    // one reused writer per feature (reset between) — same bytes as a
    // fresh writer per feature without the per-feature garbage
    val fw = new ProtoWriter(256)
    val layer = new ProtoWriter(1024)
    layer.uint(15, 2) // version
    layer.str(1, name)
    features.foreach { f =>
      fw.reset()
      if (f.id != 0) fw.uint(1, f.id)
      tagBuf.clear()
      Attrs.foreachPair(f.attrs) { (k, v) => tagBuf += keyOf(k); tagBuf += valOf(v) }
      if (tagBuf.nonEmpty) fw.packedUints(2, tagBuf.toArray)
      fw.uint(3, f.geomType)
      fw.packedUints(4, f.commands)
      layer.appendTo(2, fw)
    }
    keys.foreach(layer.str(3, _))
    values.foreach { canon =>
      fw.reset()
      val payload = canon.substring(2)
      canon.charAt(0) match {
        case 'i' => fw.key(4, 0); fw.writeVarint(payload.toLong) // field 4 = int_value (int64, plain varint)
        case 'd' => fw.double(3, payload.toDouble)
        case 'b' => fw.uint(7, if (payload == "true") 1 else 0)
        case _ => fw.str(1, payload)
      }
      layer.appendTo(4, fw)
    }
    layer.uint(5, Extent)
    layer.toBytes
  }

  /** Exception-free type sniff (this runs per attr per feature — a
    * try/catch-based parse would throw millions of times per job). */
  private def sniff(v: String): (Char, String) = {
    if (v == "true" || v == "false") return ('b', v)
    val n = v.length
    if (n == 0 || n > 18) return ('s', v)
    var i = if (v.charAt(0) == '-') 1 else 0
    if (i == n) return ('s', v)
    var digits = 0
    var dots = 0
    var ok = true
    while (i < n && ok) {
      val c = v.charAt(i)
      if (c >= '0' && c <= '9') digits += 1
      else if (c == '.') dots += 1
      else ok = false
      i += 1
    }
    val neg = v.charAt(0) == '-'
    val leadZero = (if (neg) n > 2 && v.charAt(1) == '0' else n > 1 && v.charAt(0) == '0') &&
      (dots == 0 || v.charAt(if (neg) 2 else 1) != '.')
    if (!ok || digits == 0 || leadZero) ('s', v)
    else if (dots == 0) ('i', v)
    else if (dots == 1) {
      val d = java.lang.Double.parseDouble(v)
      if (java.lang.Double.toString(d) == v) ('d', v) else ('s', v)
    } else ('s', v)
  }

  /** Assemble a full tile from (layerName -> features), gzip optional. */
  def encodeTile(layers: Seq[(String, Seq[LayerFeature])]): Array[Byte] = {
    val w = new ProtoWriter
    layers.foreach { case (name, feats) => w.bytes(3, encodeLayer(name, feats)) }
    w.toBytes
  }

  /** BEST_SPEED gzip with a per-thread pooled Deflater, like the
    * reference's FastGzipOutputStream (`util/Gzip.java`). A Deflater
    * holds ~256KB of native zlib state — allocating one per tile
    * (hundreds of thousands of tiles) would thrash native memory; the
    * pool makes gzip allocation-free except for the output buffer. */
  private val deflaterPool = ThreadLocal.withInitial[java.util.zip.Deflater](() =>
    new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true))
  private val gzipBufPool = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](64 * 1024))

  /** Inputs up to this size take the from-scratch [[FastDeflate]]
    * path: zlib's per-stream deflateReset clears a 64 KB hash table,
    * which dominates the call for tile-sized payloads (r6 probe on
    * the 974 k-tile scaling corpus: 23.2 s zlib -> 4.3 s fast, ratio
    * penalty 2.1 %). Larger payloads keep zlib, whose dynamic-Huffman
    * ratio wins once the fixed cost amortizes. */
  private val FastGzipMaxLen = 32 * 1024

  def gzip(b: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32()
    crc.update(b)
    val c = crc.getValue
    val sz = b.length.toLong
    if (b.length <= FastGzipMaxLen) {
      val body = FastDeflate.deflate(b)
      val out = new Array[Byte](10 + body.length + 8)
      // gzip header: magic, deflate, no flags/mtime/xfl, OS=unknown(255)
      out(0) = 0x1f; out(1) = 0x8b.toByte; out(2) = 8; out(9) = 0xff.toByte
      System.arraycopy(body, 0, out, 10, body.length)
      var o = 10 + body.length
      out(o) = (c & 0xff).toByte; out(o + 1) = ((c >> 8) & 0xff).toByte
      out(o + 2) = ((c >> 16) & 0xff).toByte; out(o + 3) = ((c >> 24) & 0xff).toByte
      out(o + 4) = (sz & 0xff).toByte; out(o + 5) = ((sz >> 8) & 0xff).toByte
      out(o + 6) = ((sz >> 16) & 0xff).toByte; out(o + 7) = ((sz >> 24) & 0xff).toByte
      return out
    }
    val d = deflaterPool.get()
    d.reset()
    d.setInput(b)
    d.finish()
    val out = new java.io.ByteArrayOutputStream(b.length / 3 max 64)
    // gzip header: magic, deflate, no flags/mtime/xfl, OS=unknown(255)
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte))
    val buf = gzipBufPool.get()
    while (!d.finished()) {
      val n = d.deflate(buf)
      if (n > 0) out.write(buf, 0, n)
    }
    out.write(Array[Byte](
      (c & 0xff).toByte, ((c >> 8) & 0xff).toByte, ((c >> 16) & 0xff).toByte, ((c >> 24) & 0xff).toByte,
      (sz & 0xff).toByte, ((sz >> 8) & 0xff).toByte, ((sz >> 16) & 0xff).toByte, ((sz >> 24) & 0xff).toByte))
    out.toByteArray
  }

  def gunzip(b: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
    in.readAllBytes()
  }

  /** Encoded byte length of an (unsigned) varint. */
  def varintLen(v0: Long): Int = {
    var v = v0
    var n = 1
    while ((v & ~0x7fL) != 0) { v >>>= 7; n += 1 }
    n
  }

  /** FNV-1a 64-bit hash (content-dedup key, like the reference's
    * `util/Hashing.java`). */
  def fnv1a64(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) {
      h ^= (b(i) & 0xff)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  // ---- minimal tile decoder (tests / verify round-trips) ----

  case class DecodedFeature(layer: String, id: Long, geomType: Int,
                            parts: Seq[(Boolean, Array[(Int, Int)])],
                            attrs: Map[String, String])

  def decodeTile(bytes: Array[Byte]): Seq[DecodedFeature] = {
    val out = ArrayBuffer.empty[DecodedFeature]
    val r = new ProtoReader(bytes)
    while (r.hasMore) {
      val (field, wire) = r.readKey()
      if (field == 3 && wire == 2) out ++= decodeLayer(r.readBytes())
      else r.skip(wire)
    }
    out.toSeq
  }

  private def decodeLayer(bytes: Array[Byte]): Seq[DecodedFeature] = {
    var name = ""
    val keys = ArrayBuffer.empty[String]
    val values = ArrayBuffer.empty[String]
    val rawFeatures = ArrayBuffer.empty[Array[Byte]]
    val r = new ProtoReader(bytes)
    while (r.hasMore) {
      val (field, wire) = r.readKey()
      field match {
        case 1 => name = new String(r.readBytes(), "UTF-8")
        case 2 => rawFeatures += r.readBytes()
        case 3 => keys += new String(r.readBytes(), "UTF-8")
        case 4 => values += decodeValue(r.readBytes())
        case _ => r.skip(wire)
      }
    }
    rawFeatures.map { fb =>
      var id = 0L; var geomType = 0
      var tags = Array.empty[Int]; var cmds = Array.empty[Int]
      val fr = new ProtoReader(fb)
      while (fr.hasMore) {
        val (field, wire) = fr.readKey()
        field match {
          case 1 => id = fr.readVarint()
          case 2 => tags = fr.readPackedUints()
          case 3 => geomType = fr.readVarint().toInt
          case 4 => cmds = fr.readPackedUints()
          case _ => fr.skip(wire)
        }
      }
      val attrs = tags.grouped(2).collect { case Array(k, v) => keys(k) -> values(v) }.toMap
      DecodedFeature(name, id, geomType, decodeCommands(geomType, cmds), attrs)
    }.toSeq
  }

  private def decodeValue(b: Array[Byte]): String = {
    val r = new ProtoReader(b)
    var res = ""
    while (r.hasMore) {
      val (field, wire) = r.readKey()
      field match {
        case 1 => res = new String(r.readBytes(), "UTF-8")
        case 3 => res = r.readDouble().toString
        case 4 | 5 => res = r.readVarint().toString
        case 6 => val v = r.readVarint(); res = ((v >>> 1) ^ -(v & 1)).toString
        case 7 => res = (r.readVarint() == 1).toString
        case _ => r.skip(wire)
      }
    }
    res
  }

  final class ProtoReader(b: Array[Byte]) {
    private var pos = 0
    def hasMore: Boolean = pos < b.length
    def readVarint(): Long = {
      var v = 0L; var shift = 0
      var more = true
      while (more) {
        val x = b(pos) & 0xff; pos += 1
        v |= (x & 0x7fL) << shift
        shift += 7
        more = (x & 0x80) != 0
      }
      v
    }
    def readKey(): (Int, Int) = { val k = readVarint(); ((k >>> 3).toInt, (k & 7).toInt) }
    def readBytes(): Array[Byte] = {
      val len = readVarint().toInt
      val out = java.util.Arrays.copyOfRange(b, pos, pos + len)
      pos += len
      out
    }
    def readDouble(): Double = {
      var bits = 0L
      var i = 0
      while (i < 8) { bits |= (b(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8
      java.lang.Double.longBitsToDouble(bits)
    }
    def readPackedUints(): Array[Int] = {
      val bytes = readBytes()
      val inner = new ProtoReader(bytes)
      val out = ArrayBuffer.empty[Int]
      while (inner.hasMore) out += inner.readVarint().toInt
      out.toArray
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint()
      case 1 => pos += 8
      case 2 => val len = readVarint().toInt; pos += len
      case 5 => pos += 4
    }
  }
}
