package graft.sources

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.util.zip.{Deflater, Inflater}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import scala.collection.mutable.ArrayBuffer

/**
 * From-scratch OSM PBF codec — the openstreetmap.org PBF format
 * (fileformat.proto / osmformat.proto, public spec): a sequence of
 * `[int4 BE header-len][BlobHeader][Blob]` frames, where each
 * `OSMData` blob holds one zlib-compressed `PrimitiveBlock` with a
 * shared string table, delta-coded dense nodes, ways, and relations.
 *
 * The reference decodes the same format in
 * `reader/osm/PbfDecoder.java:409` / `reader/osm/OsmInputFile.java`
 * (block-parallel); here each blob is an independent decode unit, so
 * [[OsmPbfDataSource]] maps blob ranges to Spark `InputPartition`s
 * and a planet file scans with cluster-wide parallelism.
 *
 * Includes a writer (dense nodes, per-block string tables, zlib) so
 * specs and gate queries can synthesize deterministic fixtures
 * without external data; round-trip equality plus entity-level
 * cross-checks against the reference's public monaco expectations
 * (`OsmInputFileTest.java:23-57`) pin the codec.
 */
object OsmPbf {

  /** One decoded OSM element, flattened for the DSv2 row shape. */
  final case class Entity(
      kind: String, // node | way | relation
      id: Long,
      lat: Double, // NaN for way/relation
      lon: Double,
      tags: Seq[(String, String)],
      refs: Array[Long], // way node refs, empty otherwise
      memberTypes: Array[String],
      memberIds: Array[Long],
      memberRoles: Array[String],
      version: Int,
      timestamp: Long, // epoch seconds, 0 if absent
      changeset: Long,
      uid: Int,
      user: String,
      // LocationsOnWays (osmium add-locations-to-ways): per-ref
      // coordinates carried on the way itself — empty when absent
      refLats: Array[Double] = Array.empty,
      refLons: Array[Double] = Array.empty)

  final case class Header(
      left: Double, bottom: Double, right: Double, top: Double,
      requiredFeatures: Seq[String], optionalFeatures: Seq[String],
      writingProgram: String, source: String,
      replicationTimestamp: Long, replicationSequence: Long, replicationBaseUrl: String)

  /** Driver-side blob index entry: where the Blob message bytes live.
    * `kindHint` comes from the BlobHeader's indexdata when the writer
    * recorded one (graft writes "node"/"way"/"relation"; other
    * producers leave it empty = unknown). */
  final case class BlobRef(path: String, offset: Long, size: Int, isHeader: Boolean,
                           kindHint: String = "")

  // ---------------------------------------------------------------------------
  // protobuf wire primitives
  // ---------------------------------------------------------------------------

  /** Minimal protobuf wire-format reader over a byte-array window. */
  final class Pb(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end

    def varint(): Long = {
      var v = 0L; var shift = 0
      while (true) {
        val b = buf(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
      }
      v
    }
    @inline def zigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

    /** Returns (field, wireType). */
    def tag(): (Int, Int) = { val t = varint().toInt; (t >>> 3, t & 7) }

    def lenWindow(): Pb = {
      val n = varint().toInt
      val w = new Pb(buf, pos, pos + n)
      pos += n
      w
    }
    def bytesValue(): Array[Byte] = {
      val n = varint().toInt
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n
      out
    }
    def stringValue(): String = new String(bytesValue(), "UTF-8")

    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => pos += 8
      case 2 => val n = varint().toInt; pos += n
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"osmpbf: unsupported wire type $w")
    }

    def packedVarints(): Array[Long] = {
      val w = lenWindow()
      val out = new ArrayBuffer[Long]()
      while (w.hasMore) out += w.varint()
      out.toArray
    }
  }

  /** Minimal protobuf writer. */
  final class PbOut {
    private val bos = new ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { bos.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      bos.write(v.toInt)
    }
    @inline def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
    def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def int(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def sint(field: Int, v: Long): Unit = { tag(field, 0); varint(zigzag(v)) }
    def bytes(field: Int, b: Array[Byte]): Unit = { tag(field, 2); varint(b.length.toLong); bos.write(b) }
    def str(field: Int, s: String): Unit = bytes(field, s.getBytes("UTF-8"))
    def msg(field: Int, m: PbOut): Unit = bytes(field, m.result)
    def packed(field: Int, vs: Iterable[Long], zz: Boolean): Unit = {
      val inner = new PbOut
      vs.foreach(v => inner.varint(if (zz) inner.zigzag(v) else v))
      bytes(field, inner.result)
    }
    def result: Array[Byte] = bos.toByteArray
  }

  // ---------------------------------------------------------------------------
  // blob framing
  // ---------------------------------------------------------------------------

  /**
   * Driver-side index scan: reads only the 4-byte lengths and the
   * tiny BlobHeader messages (seeking past each blob body), so a
   * planet file indexes in O(#blobs) small reads. Mirrors the split
   * discovery the reference does eagerly in `OsmInputFile.get()`.
   */
  def indexBlobs(path: String, conf: Configuration): Seq[BlobRef] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    val in = new DataInputStream(new java.io.BufferedInputStream(fs.open(p), 1 << 16))
    val out = ArrayBuffer[BlobRef]()
    var off = 0L
    try {
      while (off < len) {
        val headerLen = in.readInt()
        val hb = new Array[Byte](headerLen)
        in.readFully(hb)
        // BlobHeader: 1=type string, 2=indexdata, 3=datasize
        val pb = new Pb(hb, 0, hb.length)
        var typ = ""
        var indexdata = ""
        var datasize = -1
        while (pb.hasMore) {
          pb.tag() match {
            case (1, 2) => typ = pb.stringValue()
            case (2, 2) => indexdata = pb.stringValue()
            case (3, 0) => datasize = pb.varint().toInt
            case (_, w) => pb.skip(w)
          }
        }
        require(datasize >= 0, s"osmpbf: BlobHeader without datasize at offset $off in $path")
        val blobOff = off + 4 + headerLen
        require(blobOff + datasize <= len,
          s"osmpbf: truncated file — blob at $blobOff declares $datasize bytes past EOF in $path")
        var toSkip = datasize.toLong
        while (toSkip > 0) {
          val skipped = in.skip(toSkip)
          if (skipped <= 0) throw new java.io.EOFException(
            s"osmpbf: unexpected EOF while skipping blob at $blobOff in $path")
          toSkip -= skipped
        }
        out += BlobRef(path, blobOff, datasize, typ == "OSMHeader",
          kindHint = if (Set("node", "way", "relation")(indexdata)) indexdata else "")
        off = blobOff + datasize
      }
    } catch {
      // the loop exits normally at off == len, so EOF mid-frame (the
      // 4-byte length word or the BlobHeader itself truncated) is
      // always corrupt input — fail as loudly as body truncation does
      case e: EOFException => throw new EOFException(
        s"osmpbf: truncated frame header at offset $off (file length $len) in $path" +
          Option(e.getMessage).map(m => s": $m").getOrElse(""))
    } finally in.close()
    out.toSeq
  }

  def readBlobBytes(ref: BlobRef, conf: Configuration): Array[Byte] = {
    val p = new Path(ref.path)
    val in = p.getFileSystem(conf).open(p)
    try {
      in.seek(ref.offset)
      val b = new Array[Byte](ref.size)
      in.readFully(b)
      b
    } finally in.close()
  }

  /**
   * LZ4 BLOCK format decode, from the published spec (lz4.org block
   * format): per sequence a token byte carries the literal length in
   * the high nibble and the match length - 4 in the low nibble (15
   * means extended by a run of 255-valued bytes plus a terminator), a
   * 2-byte little-endian match offset follows the literals, and match
   * copies run byte-wise so overlapping matches (offset < length) RLE
   * correctly. The osm.pbf `lz4_data` field carries one raw block
   * whose decompressed size is the blob's `raw_size` — the same
   * contract the reference decodes via lz4-java
   * (`reader/osm/PbfDecoder.java:80-95`).
   */
  def lz4DecompressBlock(src: Array[Byte], rawSize: Int): Array[Byte] = {
    val out = new Array[Byte](rawSize)
    var sp = 0
    var op = 0
    // every read/write is range-checked with a descriptive failure —
    // a corrupt blob must name itself, not surface as a bare
    // ArrayIndexOutOfBoundsException four stack frames deep
    def corrupt(what: String): Nothing =
      throw new IllegalArgumentException(
        s"corrupt lz4 blob: $what (src pos $sp/${src.length}, out pos $op/$rawSize)")
    while (sp < src.length) {
      val token = src(sp) & 0xff; sp += 1
      var litLen = token >>> 4
      if (litLen == 15) {
        var b = 255
        while (b == 255) {
          if (sp >= src.length) corrupt("truncated literal-length extension")
          b = src(sp) & 0xff; sp += 1; litLen += b
        }
      }
      if (sp + litLen > src.length) corrupt(s"literal run of $litLen overruns input")
      if (op + litLen > rawSize) corrupt(s"literal run of $litLen overruns raw_size")
      System.arraycopy(src, sp, out, op, litLen)
      sp += litLen; op += litLen
      if (sp < src.length) { // the last sequence ends after its literals
        if (sp + 2 > src.length) corrupt("truncated match offset")
        val offset = (src(sp) & 0xff) | ((src(sp + 1) & 0xff) << 8)
        sp += 2
        require(offset > 0 && offset <= op, s"lz4: bad match offset $offset at out pos $op")
        var matchLen = token & 0xf
        if (matchLen == 15) {
          var b = 255
          while (b == 255) {
            if (sp >= src.length) corrupt("truncated match-length extension")
            b = src(sp) & 0xff; sp += 1; matchLen += b
          }
        }
        matchLen += 4
        if (op + matchLen > rawSize) corrupt(s"match of $matchLen overruns raw_size")
        val from = op - offset
        if (offset >= matchLen) {
          // non-overlapping (the dominant case): one bulk copy instead
          // of billions of per-byte bounds-checked stores on a planet
          System.arraycopy(out, from, out, op, matchLen)
          op += matchLen
        } else {
          // overlapping match = intentional RLE; byte-wise is the spec
          var f = from; var i = 0
          while (i < matchLen) { out(op) = out(f); op += 1; f += 1; i += 1 }
        }
      }
    }
    require(op == rawSize, s"lz4: decompressed $op bytes, blob raw_size says $rawSize")
    out
  }

  /** Blob message → uncompressed payload (raw, zlib, or lz4 block). */
  def inflateBlob(blob: Array[Byte]): Array[Byte] = {
    val pb = new Pb(blob, 0, blob.length)
    var raw: Array[Byte] = null
    var rawSize = -1
    var zlib: Array[Byte] = null
    var lz4: Array[Byte] = null
    while (pb.hasMore) {
      pb.tag() match {
        case (1, 2) => raw = pb.bytesValue()
        case (2, 0) => rawSize = pb.varint().toInt
        case (3, 2) => zlib = pb.bytesValue()
        case (6, 2) => lz4 = pb.bytesValue()
        case (f, 2) if f == 4 || f == 5 || f == 7 =>
          // fileformat.proto: 4 = lzma_data, 5 = OBSOLETE_bzip2_data, 7 = zstd_data
          val codec = f match { case 4 => "lzma"; case 5 => "bzip2"; case _ => "zstd" }
          throw new UnsupportedOperationException(
            s"osmpbf: blob compression field $f ($codec) not supported; re-encode with zlib")
        case (_, w) => pb.skip(w)
      }
    }
    if (raw != null) raw
    else if (lz4 != null) {
      require(rawSize >= 0, "osmpbf: lz4 blob lacks the mandatory raw_size")
      lz4DecompressBlock(lz4, rawSize)
    } else {
      require(zlib != null, "osmpbf: blob has neither raw, zlib_data nor lz4_data")
      val inf = new Inflater()
      inf.setInput(zlib)
      var out = new Array[Byte](if (rawSize > 0) rawSize else math.max(1 << 16, zlib.length * 8))
      var n = 0
      while (!inf.finished()) {
        if (n == out.length) out = java.util.Arrays.copyOf(out, out.length * 2)
        val got = inf.inflate(out, n, out.length - n)
        n += got
        if (got == 0 && !inf.finished())
          throw new IllegalArgumentException("osmpbf: truncated or corrupt zlib blob")
      }
      inf.end()
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }
  }

  // ---------------------------------------------------------------------------
  // HeaderBlock
  // ---------------------------------------------------------------------------

  def decodeHeader(payload: Array[Byte]): Header = {
    val pb = new Pb(payload, 0, payload.length)
    var l, b, r, t = Double.NaN
    val req = ArrayBuffer[String](); val opt = ArrayBuffer[String]()
    var wp = ""; var src = ""; var rts = 0L; var rseq = 0L; var rurl = ""
    while (pb.hasMore) {
      pb.tag() match {
        case (1, 2) =>
          val w = pb.lenWindow()
          while (w.hasMore) w.tag() match {
            // divide (not multiply by 1e-9): 1e9 is exactly representable,
            // so the quotient is correctly rounded and matches the
            // decimal the encoder started from
            case (1, 0) => l = w.zigzag(w.varint()) / 1e9
            case (2, 0) => r = w.zigzag(w.varint()) / 1e9
            case (3, 0) => t = w.zigzag(w.varint()) / 1e9
            case (4, 0) => b = w.zigzag(w.varint()) / 1e9
            case (_, ww) => w.skip(ww)
          }
        case (4, 2) => req += pb.stringValue()
        case (5, 2) => opt += pb.stringValue()
        case (16, 2) => wp = pb.stringValue()
        case (17, 2) => src = pb.stringValue()
        case (32, 0) => rts = pb.varint()
        case (33, 0) => rseq = pb.varint()
        case (34, 2) => rurl = pb.stringValue()
        case (_, w) => pb.skip(w)
      }
    }
    Header(l, b, r, t, req.toSeq, opt.toSeq, wp, src, rts, rseq, rurl)
  }

  /** File header (bounds + replication metadata), driver-side. */
  def readHeader(path: String, conf: Configuration): Option[Header] =
    indexBlobs(path, conf).find(_.isHeader).map { ref =>
      decodeHeader(inflateBlob(readBlobBytes(ref, conf)))
    }

  // ---------------------------------------------------------------------------
  // PrimitiveBlock decode
  // ---------------------------------------------------------------------------

  /**
   * Decode one OSMData payload. `wantKinds` empty = all kinds; a
   * non-matching primitive group is skipped WITHOUT decoding its
   * packed arrays (the group-level pushdown the DSv2 scan relies on).
   */
  def decodeBlock(payload: Array[Byte], wantKinds: Set[String]): Iterator[Entity] = {
    val want = if (wantKinds.isEmpty) Set("node", "way", "relation") else wantKinds
    // pass 1: string table, granularity, offsets, group windows
    val pb = new Pb(payload, 0, payload.length)
    var strings: Array[String] = Array("")
    val groups = ArrayBuffer[(Int, Int)]()
    var granularity = 100L
    var dateGranularity = 1000L
    var latOff = 0L; var lonOff = 0L
    while (pb.hasMore) {
      pb.tag() match {
        case (1, 2) =>
          val w = pb.lenWindow()
          val ss = ArrayBuffer[String]()
          while (w.hasMore) w.tag() match {
            case (1, 2) => ss += w.stringValue()
            case (_, ww) => w.skip(ww)
          }
          strings = ss.toArray
        case (2, 2) =>
          val w = pb.lenWindow()
          groups += ((w.pos, w.end))
        case (17, 0) => granularity = pb.varint()
        case (18, 0) => dateGranularity = pb.varint()
        case (19, 0) => latOff = pb.varint()
        case (20, 0) => lonOff = pb.varint()
        case (_, w) => pb.skip(w)
      }
    }
    val st = strings
    @inline def deg(off: Long, raw: Long): Double = (off + granularity * raw) / 1e9
    @inline def ts(raw: Long): Long = raw * dateGranularity / 1000L

    groups.iterator.flatMap { case (gs, ge) =>
      decodeGroup(payload, gs, ge, st, want, deg, ts, latOff, lonOff)
    }
  }

  private final case class InfoVals(version: Int, timestamp: Long, changeset: Long, uid: Int, user: String)
  private val NoInfo = InfoVals(0, 0L, 0L, 0, "")

  private def decodeInfo(w: Pb, st: Array[String], ts: Long => Long): InfoVals = {
    var version = 0; var timestamp = 0L; var changeset = 0L; var uid = 0; var user = ""
    while (w.hasMore) w.tag() match {
      case (1, 0) => version = w.varint().toInt
      case (2, 0) => timestamp = ts(w.varint())
      case (3, 0) => changeset = w.varint()
      case (4, 0) => uid = w.varint().toInt
      case (5, 0) => user = st(w.varint().toInt)
      case (_, ww) => w.skip(ww)
    }
    InfoVals(version, timestamp, changeset, uid, user)
  }

  private def tagsOf(keys: Array[Long], vals: Array[Long], st: Array[String]): Seq[(String, String)] = {
    val n = math.min(keys.length, vals.length)
    val out = new ArrayBuffer[(String, String)](n)
    var i = 0
    while (i < n) { out += ((st(keys(i).toInt), st(vals(i).toInt))); i += 1 }
    out.toSeq
  }

  private val EmptyLongs = Array.empty[Long]
  private val EmptyStrs = Array.empty[String]

  // scalastyle:off method.length
  private def decodeGroup(buf: Array[Byte], gs: Int, ge: Int, st: Array[String],
                          want: Set[String], deg: (Long, Long) => Double, ts: Long => Long,
                          latOff: Long, lonOff: Long): Iterator[Entity] = {
    val out = ArrayBuffer[Entity]()
    val pb = new Pb(buf, gs, ge)
    while (pb.hasMore) {
      pb.tag() match {
        case (1, 2) => // plain Node
          val w = pb.lenWindow()
          if (want("node")) {
            var id = 0L; var lat = 0L; var lon = 0L
            var keys = EmptyLongs; var vals = EmptyLongs
            var info = NoInfo
            while (w.hasMore) w.tag() match {
              case (1, 0) => id = w.zigzag(w.varint())
              case (2, 2) => keys = w.packedVarints()
              case (3, 2) => vals = w.packedVarints()
              case (4, 2) => info = decodeInfo(w.lenWindow(), st, ts)
              case (8, 0) => lat = w.zigzag(w.varint())
              case (9, 0) => lon = w.zigzag(w.varint())
              case (_, ww) => w.skip(ww)
            }
            out += Entity("node", id, deg(latOff, lat), deg(lonOff, lon),
              tagsOf(keys, vals, st), EmptyLongs, EmptyStrs, EmptyLongs, EmptyStrs,
              info.version, info.timestamp, info.changeset, info.uid, info.user)
          }
        case (2, 2) => // DenseNodes
          val w = pb.lenWindow()
          if (want("node")) {
            var ids = EmptyLongs; var lats = EmptyLongs; var lons = EmptyLongs
            var keysVals = EmptyLongs
            var dvVersion = EmptyLongs; var dvTs = EmptyLongs; var dvCs = EmptyLongs
            var dvUid = EmptyLongs; var dvUserSid = EmptyLongs
            while (w.hasMore) w.tag() match {
              case (1, 2) => ids = w.packedVarints().map(w.zigzag)
              case (5, 2) =>
                val di = w.lenWindow()
                while (di.hasMore) di.tag() match {
                  case (1, 2) => dvVersion = di.packedVarints()
                  case (2, 2) => dvTs = di.packedVarints().map(di.zigzag)
                  case (3, 2) => dvCs = di.packedVarints().map(di.zigzag)
                  case (4, 2) => dvUid = di.packedVarints().map(di.zigzag)
                  case (5, 2) => dvUserSid = di.packedVarints().map(di.zigzag)
                  case (_, ww) => di.skip(ww)
                }
              case (8, 2) => lats = w.packedVarints().map(w.zigzag)
              case (9, 2) => lons = w.packedVarints().map(w.zigzag)
              case (10, 2) => keysVals = w.packedVarints()
              case (_, ww) => w.skip(ww)
            }
            var id = 0L; var lat = 0L; var lon = 0L
            var tsAcc = 0L; var csAcc = 0L; var uidAcc = 0L; var sidAcc = 0L
            var kv = 0
            var i = 0
            while (i < ids.length) {
              id += ids(i); lat += lats(i); lon += lons(i)
              val tags = if (kv < keysVals.length) {
                val tb = new ArrayBuffer[(String, String)]()
                while (kv < keysVals.length && keysVals(kv) != 0L) {
                  tb += ((st(keysVals(kv).toInt), st(keysVals(kv + 1).toInt)))
                  kv += 2
                }
                kv += 1 // the 0 terminator
                tb.toSeq
              } else Nil
              val info = if (dvVersion.nonEmpty) {
                tsAcc += (if (i < dvTs.length) dvTs(i) else 0L)
                csAcc += (if (i < dvCs.length) dvCs(i) else 0L)
                uidAcc += (if (i < dvUid.length) dvUid(i) else 0L)
                sidAcc += (if (i < dvUserSid.length) dvUserSid(i) else 0L)
                InfoVals(dvVersion(i).toInt, ts(tsAcc), csAcc, uidAcc.toInt,
                  if (dvUserSid.nonEmpty) st(sidAcc.toInt) else "")
              } else NoInfo
              out += Entity("node", id, deg(latOff, lat), deg(lonOff, lon), tags,
                EmptyLongs, EmptyStrs, EmptyLongs, EmptyStrs,
                info.version, info.timestamp, info.changeset, info.uid, info.user)
              i += 1
            }
          }
        case (3, 2) => // Way
          val w = pb.lenWindow()
          if (want("way")) {
            var id = 0L
            var keys = EmptyLongs; var vals = EmptyLongs; var refs = EmptyLongs
            var wlats = EmptyLongs; var wlons = EmptyLongs
            var info = NoInfo
            while (w.hasMore) w.tag() match {
              case (1, 0) => id = w.varint()
              case (2, 2) => keys = w.packedVarints()
              case (3, 2) => vals = w.packedVarints()
              case (4, 2) => info = decodeInfo(w.lenWindow(), st, ts)
              case (8, 2) =>
                val deltas = w.packedVarints().map(w.zigzag)
                var acc = 0L
                refs = deltas.map { d => acc += d; acc }
              case (9, 2) => // LocationsOnWays: delta-coded lat per ref
                val deltas = w.packedVarints().map(w.zigzag)
                var acc = 0L
                wlats = deltas.map { d => acc += d; acc }
              case (10, 2) =>
                val deltas = w.packedVarints().map(w.zigzag)
                var acc = 0L
                wlons = deltas.map { d => acc += d; acc }
              case (_, ww) => w.skip(ww)
            }
            out += Entity("way", id, Double.NaN, Double.NaN, tagsOf(keys, vals, st),
              refs, EmptyStrs, EmptyLongs, EmptyStrs,
              info.version, info.timestamp, info.changeset, info.uid, info.user,
              refLats = wlats.map(deg(latOff, _)), refLons = wlons.map(deg(lonOff, _)))
          }
        case (4, 2) => // Relation
          val w = pb.lenWindow()
          if (want("relation")) {
            var id = 0L
            var keys = EmptyLongs; var vals = EmptyLongs
            var roleSids = EmptyLongs; var memids = EmptyLongs; var types = EmptyLongs
            var info = NoInfo
            while (w.hasMore) w.tag() match {
              case (1, 0) => id = w.varint()
              case (2, 2) => keys = w.packedVarints()
              case (3, 2) => vals = w.packedVarints()
              case (4, 2) => info = decodeInfo(w.lenWindow(), st, ts)
              case (8, 2) => roleSids = w.packedVarints()
              case (9, 2) =>
                val deltas = w.packedVarints().map(w.zigzag)
                var acc = 0L
                memids = deltas.map { d => acc += d; acc }
              case (10, 2) => types = w.packedVarints()
              case (_, ww) => w.skip(ww)
            }
            val typeNames = types.map {
              case 0L => "node"
              case 1L => "way"
              case 2L => "relation"
              case other => s"unknown$other"
            }
            out += Entity("relation", id, Double.NaN, Double.NaN, tagsOf(keys, vals, st),
              EmptyLongs, typeNames, memids, roleSids.map(s => st(s.toInt)),
              info.version, info.timestamp, info.changeset, info.uid, info.user)
          }
        case (_, w) => pb.skip(w)
      }
    }
    out.iterator
  }
  // scalastyle:on method.length

  /** Decode every entity of an OSMData blob (already-read Blob bytes). */
  def decodeBlobEntities(blobBytes: Array[Byte], wantKinds: Set[String] = Set.empty): Iterator[Entity] =
    decodeBlock(inflateBlob(blobBytes), wantKinds)

  /** Convenience sequential read of a whole file (specs, small inputs). */
  def readAll(path: String, conf: Configuration, wantKinds: Set[String] = Set.empty): Iterator[Entity] =
    indexBlobs(path, conf).iterator.filterNot(_.isHeader).flatMap { ref =>
      decodeBlobEntities(readBlobBytes(ref, conf), wantKinds)
    }

  // ---------------------------------------------------------------------------
  // writer (fixtures + sink)
  // ---------------------------------------------------------------------------

  private def deflate(payload: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(payload); d.finish()
    val buf = new Array[Byte](payload.length + 64)
    val bos = new ByteArrayOutputStream()
    while (!d.finished()) {
      val n = d.deflate(buf)
      bos.write(buf, 0, n)
    }
    d.end()
    bos.toByteArray
  }

  private[sources] def writeFrame(out: DataOutputStream, typ: String, payload: Array[Byte],
                                  indexdata: String = ""): Unit = {
    val z = deflate(payload)
    val blob = new PbOut
    blob.int(2, payload.length.toLong)
    blob.bytes(3, z)
    val blobBytes = blob.result
    val header = new PbOut
    header.str(1, typ)
    // the spec's opaque indexdata field: graft records the block's
    // entity kind, letting its own scans skip non-matching blobs
    // WITHOUT inflating them (foreign readers ignore the field)
    if (indexdata.nonEmpty) header.str(2, indexdata)
    header.int(3, blobBytes.length.toLong)
    val hb = header.result
    out.writeInt(hb.length)
    out.write(hb)
    out.write(blobBytes)
  }

  private final class StringTable {
    private val idx = scala.collection.mutable.LinkedHashMap[String, Int]("" -> 0)
    def id(s: String): Int = idx.getOrElseUpdate(s, idx.size)
    def encode(): PbOut = {
      val m = new PbOut
      idx.keys.foreach(s => m.bytes(1, s.getBytes("UTF-8")))
      m
    }
  }

  private val Granularity = 100L

  /** Encode one homogeneous batch as a PrimitiveBlock payload. */
  private[sources] def encodeBlock(batch: Seq[Entity]): Array[Byte] = {
    val st = new StringTable
    val group = new PbOut
    batch.head.kind match {
      case "node" =>
        val dense = new PbOut
        val n = batch.length
        val ids = new Array[Long](n); val lats = new Array[Long](n); val lons = new Array[Long](n)
        val keysVals = ArrayBuffer[Long]()
        var i = 0
        batch.foreach { e =>
          ids(i) = e.id
          // round to the NEAREST granularity unit (truncating after a
          // nanodegree round would bias toward zero by up to a cell)
          lats(i) = math.round(e.lat * 1e9 / Granularity)
          lons(i) = math.round(e.lon * 1e9 / Granularity)
          e.tags.foreach { case (k, v) => keysVals += st.id(k).toLong; keysVals += st.id(v).toLong }
          keysVals += 0L
          i += 1
        }
        def delta(a: Array[Long]): Seq[Long] = {
          var prev = 0L
          a.toSeq.map { v => val d = v - prev; prev = v; d }
        }
        dense.packed(1, delta(ids), zz = true)
        // DenseInfo (field 5): versions plain, timestamps delta
        val di = new PbOut
        di.packed(1, batch.map(_.version.toLong), zz = false)
        di.packed(2, delta(batch.map(_.timestamp).toArray), zz = true)
        di.packed(3, delta(batch.map(_.changeset).toArray), zz = true)
        di.packed(4, delta(batch.map(_.uid.toLong).toArray), zz = true)
        di.packed(5, delta(batch.map(e => st.id(e.user).toLong).toArray), zz = true)
        dense.msg(5, di)
        dense.packed(8, delta(lats), zz = true)
        dense.packed(9, delta(lons), zz = true)
        dense.packed(10, keysVals, zz = false)
        group.msg(2, dense)
      case "way" =>
        batch.foreach { e =>
          val m = new PbOut
          m.int(1, e.id)
          m.packed(2, e.tags.map(t => st.id(t._1).toLong), zz = false)
          m.packed(3, e.tags.map(t => st.id(t._2).toLong), zz = false)
          val info = new PbOut
          info.int(1, e.version.toLong); info.int(2, e.timestamp)
          info.int(3, e.changeset); info.int(4, e.uid.toLong); info.int(5, st.id(e.user).toLong)
          m.msg(4, info)
          var prev = 0L
          m.packed(8, e.refs.toSeq.map { r => val d = r - prev; prev = r; d }, zz = true)
          if (e.refLats.nonEmpty) {
            require(e.refLats.length == e.refs.length && e.refLons.length == e.refs.length,
              s"way ${e.id}: LocationsOnWays arrays must match refs")
            def rawDeltas(vs: Array[Double]): Seq[Long] = {
              var p = 0L
              vs.toSeq.map { v =>
                val raw = math.round(v * 1e9 / Granularity)
                val d = raw - p; p = raw; d
              }
            }
            m.packed(9, rawDeltas(e.refLats), zz = true)
            m.packed(10, rawDeltas(e.refLons), zz = true)
          }
          group.msg(3, m)
        }
      case "relation" =>
        batch.foreach { e =>
          val m = new PbOut
          m.int(1, e.id)
          m.packed(2, e.tags.map(t => st.id(t._1).toLong), zz = false)
          m.packed(3, e.tags.map(t => st.id(t._2).toLong), zz = false)
          val info = new PbOut
          info.int(1, e.version.toLong); info.int(2, e.timestamp)
          info.int(3, e.changeset); info.int(4, e.uid.toLong); info.int(5, st.id(e.user).toLong)
          m.msg(4, info)
          m.packed(8, e.memberRoles.toSeq.map(r => st.id(r).toLong), zz = false)
          var prev = 0L
          m.packed(9, e.memberIds.toSeq.map { r => val d = r - prev; prev = r; d }, zz = true)
          m.packed(10, e.memberTypes.toSeq.map {
            case "node" => 0L
            case "way" => 1L
            case "relation" => 2L
            case other => throw new IllegalArgumentException(s"bad member type $other")
          }, zz = false)
          group.msg(4, m)
        }
      case other => throw new IllegalArgumentException(s"bad entity kind $other")
    }
    val block = new PbOut
    block.msg(1, st.encode())
    block.msg(2, group)
    block.int(17, Granularity)
    block.int(18, 1000L)
    block.result
  }

  /**
   * Write a PBF file: OSMHeader frame, then one OSMData frame per
   * `blockSize` run of same-kind entities (nodes must carry finite
   * lat/lon; timestamps in epoch seconds).
   */
  /** Writes the OSMHeader frame. */
  private[sources] def writeHeaderFrame(out: DataOutputStream,
      bbox: Option[(Double, Double, Double, Double)],
      locationsOnWays: Boolean = false): Unit = {
    val header = new PbOut
    bbox.foreach { case (left, bottom, right, top) =>
      val bb = new PbOut
      bb.sint(1, math.round(left * 1e9))
      bb.sint(2, math.round(right * 1e9))
      bb.sint(3, math.round(top * 1e9))
      bb.sint(4, math.round(bottom * 1e9))
      header.msg(1, bb)
    }
    header.str(4, "OsmSchema-V0.6")
    header.str(4, "DenseNodes")
    if (locationsOnWays) header.str(5, "LocationsOnWays")
    header.str(16, "graft")
    writeFrame(out, "OSMHeader", header.result)
  }

  /** Buffers same-kind runs and flushes each as one OSMData frame. */
  private[sources] final class BlockWriter(out: DataOutputStream, blockSize: Int = 8000) {
    private val buf = ArrayBuffer[Entity]()
    def add(e: Entity): Unit = {
      if (buf.nonEmpty && (buf.head.kind != e.kind || buf.length >= blockSize)) flush()
      buf += e
    }
    def flush(): Unit =
      if (buf.nonEmpty) {
        writeFrame(out, "OSMData", encodeBlock(buf.toSeq), indexdata = buf.head.kind)
        buf.clear()
      }
  }

  def write(path: String, conf: Configuration, entities: Iterator[Entity],
            bbox: Option[(Double, Double, Double, Double)] = None,
            blockSize: Int = 8000, locationsOnWays: Boolean = false): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val out = new DataOutputStream(new java.io.BufferedOutputStream(fs.create(p, true), 1 << 20))
    try {
      writeHeaderFrame(out, bbox, locationsOnWays)
      val bw = new BlockWriter(out, blockSize)
      entities.foreach(bw.add)
      bw.flush()
    } finally out.close()
  }
}
