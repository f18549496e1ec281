package graft.engine

import graft.model.TileBytes
import org.apache.spark.sql.Dataset
import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/**
 * PMTiles v3 archive — BYTE-COMPATIBLE with the published spec
 * (https://github.com/protomaps/PMTiles, spec/v3; reference writer:
 * `pmtiles/Pmtiles.java:29`, `pmtiles/WriteablePmtiles.java`), so the
 * output opens in standard tooling.
 *
 * Layout: `[header 127B][gzipped root dir][zeros to 16384][tile data]
 * [gzipped json metadata][gzipped leaf dirs]`.
 *
 * Spark shape: tiles arrive globally Hilbert-ordered from the range
 * shuffle (our tile id scheme — cumulative 4^z zoom offsets + the
 * rawrunprotected-variant Hilbert curve — is verified identical to the
 * PMTiles tileId addressing), so the drain is a sequential
 * `toLocalIterator` append: one writer, zero re-sort, `clustered=1`.
 * Identical consecutive tiles coalesce into run-length entries;
 * identical non-consecutive tiles (ocean fills) dedup via content hash.
 */
object PmtilesArchive {

  val HeaderLen = 127
  val InitSection = 16384
  val Magic = "PMTiles"

  /** Directory entry; `runLength` consecutive tile ids share one blob.
    * `runLength == 0` marks a root entry pointing at a leaf directory. */
  case class Entry(tileId: Long, offset: Long, length: Int, runLength: Int)

  case class Header(
      rootDirOffset: Long, rootDirLength: Long,
      jsonMetadataOffset: Long, jsonMetadataLength: Long,
      leafDirectoriesOffset: Long, leafDirectoriesLength: Long,
      tileDataOffset: Long, tileDataLength: Long,
      numAddressedTiles: Long, numTileEntries: Long, numTileContents: Long,
      clustered: Boolean,
      internalCompression: Byte, tileCompression: Byte, tileType: Byte,
      minZoom: Byte, maxZoom: Byte,
      minLonE7: Int, minLatE7: Int, maxLonE7: Int, maxLatE7: Int,
      centerZoom: Byte, centerLonE7: Int, centerLatE7: Int) {

    def toBytes: Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(HeaderLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put(Magic.getBytes("UTF-8")) // 7 bytes
      buf.put(3.toByte) // spec version
      buf.putLong(rootDirOffset).putLong(rootDirLength)
      buf.putLong(jsonMetadataOffset).putLong(jsonMetadataLength)
      buf.putLong(leafDirectoriesOffset).putLong(leafDirectoriesLength)
      buf.putLong(tileDataOffset).putLong(tileDataLength)
      buf.putLong(numAddressedTiles).putLong(numTileEntries).putLong(numTileContents)
      buf.put(if (clustered) 1.toByte else 0.toByte)
      buf.put(internalCompression).put(tileCompression).put(tileType)
      buf.put(minZoom).put(maxZoom)
      buf.putInt(minLonE7).putInt(minLatE7).putInt(maxLonE7).putInt(maxLatE7)
      buf.put(centerZoom).putInt(centerLonE7).putInt(centerLatE7)
      buf.array()
    }
  }

  object Header {
    def fromBytes(b: Array[Byte]): Header = {
      val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val magic = new Array[Byte](7)
      buf.get(magic)
      require(new String(magic, "UTF-8") == Magic, "not a PMTiles archive")
      val version = buf.get()
      require(version == 3, s"unsupported PMTiles version $version")
      Header(
        rootDirOffset = buf.getLong, rootDirLength = buf.getLong,
        jsonMetadataOffset = buf.getLong, jsonMetadataLength = buf.getLong,
        leafDirectoriesOffset = buf.getLong, leafDirectoriesLength = buf.getLong,
        tileDataOffset = buf.getLong, tileDataLength = buf.getLong,
        numAddressedTiles = buf.getLong, numTileEntries = buf.getLong,
        numTileContents = buf.getLong,
        clustered = buf.get() == 1,
        internalCompression = buf.get(), tileCompression = buf.get(), tileType = buf.get(),
        minZoom = buf.get(), maxZoom = buf.get(),
        minLonE7 = buf.getInt, minLatE7 = buf.getInt,
        maxLonE7 = buf.getInt, maxLatE7 = buf.getInt,
        centerZoom = buf.get(), centerLonE7 = buf.getInt, centerLatE7 = buf.getInt)
    }
  }

  // ---- directory codec (spec: count, delta ids, run lengths, lengths,
  // offsets with 0 = contiguous-with-previous, else offset+1) ----

  def directoryToBytes(entries: Seq[Entry]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(entries.length * 8 + 8)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    varint(entries.length.toLong)
    var lastId = 0L
    entries.foreach { e => varint(e.tileId - lastId); lastId = e.tileId }
    entries.foreach(e => varint(e.runLength.toLong))
    entries.foreach(e => varint(e.length.toLong))
    var last: Entry = null
    entries.foreach { e =>
      if (last != null && e.offset == last.offset + last.length) varint(0)
      else varint(e.offset + 1)
      last = e
    }
    out.toByteArray
  }

  def directoryFromBytes(bytes: Array[Byte]): Array[Entry] = {
    var pos = 0
    def varint(): Long = {
      var v = 0L; var shift = 0; var more = true
      while (more) {
        val x = bytes(pos) & 0xff; pos += 1
        v |= (x & 0x7fL) << shift; shift += 7; more = (x & 0x80) != 0
      }
      v
    }
    val n = varint().toInt
    val ids = new Array[Long](n)
    var acc = 0L
    for (i <- 0 until n) { acc += varint(); ids(i) = acc }
    val runs = Array.fill(n)(varint().toInt)
    val lens = Array.fill(n)(varint().toInt)
    val entries = new Array[Entry](n)
    var lastOffset = 0L
    var lastLen = 0
    for (i <- 0 until n) {
      val v = varint()
      val off = if (v == 0) lastOffset + lastLen else v - 1
      entries(i) = Entry(ids(i), off, lens(i), runs(i))
      lastOffset = off; lastLen = lens(i)
    }
    entries
  }

  /** Root-only if it fits the init section, else split into gzipped
    * leaves (same policy as the reference writer). */
  private[graft] def makeDirectories(entries: Seq[Entry]): (Array[Byte], Array[Byte]) = {
    if (entries.length < 16384) {
      val rootOnly = Mvt.gzip(directoryToBytes(entries))
      if (rootOnly.length < InitSection - HeaderLen) return (rootOnly, Array.emptyByteArray)
    }
    var leafSize = math.max(entries.length / 3500, 4096)
    while (true) {
      val rootEntries = ArrayBuffer.empty[Entry]
      val leaves = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < entries.length) {
        val end = math.min(i + leafSize, entries.length)
        val leafBytes = Mvt.gzip(directoryToBytes(entries.slice(i, end)))
        rootEntries += Entry(entries(i).tileId, leaves.size().toLong, leafBytes.length, 0)
        leaves.write(leafBytes)
        i = end
      }
      val root = Mvt.gzip(directoryToBytes(rootEntries.toSeq))
      if (root.length < InitSection - HeaderLen) return (root, leaves.toByteArray)
      leafSize = (leafSize * 1.2).toInt + 1
    }
    throw new IllegalStateException("unreachable")
  }

  /** Exact dedup verify: true iff the bytes already written at absolute
    * file position `pos` equal `bytes`. A (64-bit hash, length) match
    * alone would mis-dedup on a collision — the birthday bound makes
    * that a real event at planet tile counts — and the archive would
    * permanently serve the wrong tile. The read-back hits the page
    * cache (dedup candidates are the hot contents); restores the write
    * position to the data tail before returning. */
  private def sameBytes(raf: java.io.RandomAccessFile, pos: Long,
                        dataEnd: Long, bytes: Array[Byte]): Boolean = {
    val buf = new Array[Byte](bytes.length)
    raf.seek(pos)
    raf.readFully(buf)
    raf.seek(InitSection + dataEnd)
    java.util.Arrays.equals(buf, bytes)
  }

  /**
   * Ordered single-writer drain: requires Hilbert-ordered input (the
   * assembler's range shuffle provides it). Returns
   * (addressedTiles, tileEntries, tileContents).
   */
  def write(tiles: Dataset[TileBytes], path: String,
            metadataJson: String = """{"vector_layers":[]}""",
            minZoom: Int = 0, maxZoom: Int = 15,
            bounds: (Double, Double, Double, Double) = (-180, -85.05113, 180, 85.05113),
            tilesGzipped: Boolean = true): (Long, Long, Long) = {
    // one writer implementation: the ordered drain is a single shard
    val w = new ShardWriter(path, metadataJson, minZoom, maxZoom, tilesGzipped, bounds)
    try {
      tiles.toLocalIterator().forEachRemaining(w.add)
      w.finish()
      w.stats
    } catch { case e: Throwable => w.abort(); throw e }
  }

  /**
   * PARALLEL sharded sink: each range partition (already a contiguous,
   * sorted Hilbert id range after the assembler's shuffle) writes its
   * own fully valid PMTiles file — the scale path where a single
   * ordered drain would serialize a planet write. Emits
   * `part-NNNNN.pmtiles` per non-empty partition plus a `manifest.json`
   * with each shard's tile-id range, so a serving layer (or a final
   * concatenation pass) can route lookups by range.
   *
   * Returns (shards, tiles).
   */
  /** Streaming writer for ONE shard file: `add` tiles in ascending id
    * order, `finish` writes directories + header and returns
    * (minId, maxId, addressedTiles). Shared by [[writeSharded]] and
    * the DSv2 write path. */
  final class ShardWriter(path: String,
                          metadataJson: String = """{"vector_layers":[]}""",
                          minZoom: Int = 0, maxZoom: Int = 15,
                          tilesGzipped: Boolean = true,
                          bounds: (Double, Double, Double, Double) =
                            (-180, -85.05113, 180, 85.05113)) {
    private val raf = new java.io.RandomAccessFile(path, "rw")
    raf.setLength(0)
    raf.seek(InitSection.toLong)
    private val entries = ArrayBuffer.empty[Entry]
    private val byHash = mutable.HashMap.empty[Long, (Long, Int)]
    private var dataLen = 0L
    private var addressed = 0L
    private var contents = 0L
    private var lastId = Long.MinValue
    private var minId = Long.MaxValue

    def add(t: TileBytes): Unit = {
      require(t.tile_id > lastId, "shard input out of order")
      lastId = t.tile_id
      if (t.tile_id < minId) minId = t.tile_id
      addressed += 1
      val last = entries.lastOption.orNull
      byHash.get(t.content_hash) match {
        case Some((off, len)) if len == t.bytes.length &&
            sameBytes(raf, InitSection + off, dataLen, t.bytes) =>
          if (last != null && last.offset == off && last.tileId + last.runLength == t.tile_id)
            entries(entries.length - 1) = last.copy(runLength = last.runLength + 1)
          else entries += Entry(t.tile_id, off, len, 1)
        case _ =>
          raf.write(t.bytes)
          byHash(t.content_hash) = (dataLen, t.bytes.length)
          entries += Entry(t.tile_id, dataLen, t.bytes.length, 1)
          dataLen += t.bytes.length
          contents += 1
      }
    }

    def finish(): (Long, Long, Long) = {
      val (root, leaves) = makeDirectories(entries.toSeq)
      val json = Mvt.gzip(metadataJson.getBytes("UTF-8"))
      raf.write(json)
      raf.write(leaves)
      val header = Header(
        rootDirOffset = HeaderLen.toLong, rootDirLength = root.length.toLong,
        jsonMetadataOffset = InitSection + dataLen, jsonMetadataLength = json.length.toLong,
        leafDirectoriesOffset = InitSection + dataLen + json.length,
        leafDirectoriesLength = leaves.length.toLong,
        tileDataOffset = InitSection.toLong, tileDataLength = dataLen,
        numAddressedTiles = addressed, numTileEntries = entries.length.toLong,
        numTileContents = contents, clustered = true,
        internalCompression = 2, tileCompression = if (tilesGzipped) 2 else 1,
        tileType = 1, minZoom = minZoom.toByte, maxZoom = maxZoom.toByte,
        minLonE7 = (bounds._1 * 1e7).toInt, minLatE7 = (bounds._2 * 1e7).toInt,
        maxLonE7 = (bounds._3 * 1e7).toInt, maxLatE7 = (bounds._4 * 1e7).toInt,
        centerZoom = minZoom.toByte,
        centerLonE7 = (((bounds._1 + bounds._3) / 2) * 1e7).toInt,
        centerLatE7 = (((bounds._2 + bounds._4) / 2) * 1e7).toInt)
      raf.seek(0)
      raf.write(header.toBytes)
      raf.write(root)
      raf.close()
      (minId, lastId, addressed)
    }

    /** (addressedTiles, tileEntries, tileContents) — valid after
      * [[finish]]. */
    def stats: (Long, Long, Long) = (addressed, entries.length.toLong, contents)

    def abort(): Unit = {
      raf.close()
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))
    }
  }

  def writeSharded(tiles: Dataset[TileBytes], dir: String,
                   metadataJson: String = """{"vector_layers":[]}""",
                   minZoom: Int = 0, maxZoom: Int = 15,
                   tilesGzipped: Boolean = true): (Long, Long) = {
    val spark = tiles.sparkSession
    import spark.implicits._
    // every path goes THROUGH the Hadoop FileSystem: a driver-side
    // java.nio mkdir + executor-side RandomAccessFile would scatter
    // shards across executor-local disks on a real cluster. Shards
    // build in a local temp file (ShardWriter needs seekable output,
    // same staging as the DSv2 write path) and upload on finish.
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    dirPath.getFileSystem(conf.value).mkdirs(dirPath)
    val shards = tiles.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val local = java.io.File.createTempFile(f"pmtiles-shard-$pid%05d-", ".pmtiles")
        val w = new ShardWriter(local.getPath, metadataJson, minZoom, maxZoom, tilesGzipped)
        try {
          it.foreach(w.add)
          val (minId, lastId, addressed) = w.finish()
          val name = f"part-$pid%05d.pmtiles"
          val dst = new org.apache.hadoop.fs.Path(dir, name)
          dst.getFileSystem(conf.value).copyFromLocalFile(
            true /*delete local*/, true /*overwrite (task retry)*/,
            new org.apache.hadoop.fs.Path(local.getPath), dst)
          Iterator.single((pid, name, minId, lastId, addressed))
        } catch { case e: Throwable => w.abort(); local.delete(); throw e }
      }
    }.collect().sortBy(_._1)
    val manifest = shards.map { case (pid, name, lo, hi, n) =>
      s"""{"shard":$pid,"path":"$name","min_tile_id":$lo,"max_tile_id":$hi,"tiles":$n}"""
    }.mkString("[", ",", "]")
    val mf = new org.apache.hadoop.fs.Path(dir, "manifest.json")
    val out = mf.getFileSystem(conf.value).create(mf, true)
    try out.write(s"""{"shards":$manifest}""".getBytes("UTF-8")) finally out.close()
    (shards.length.toLong, shards.map(_._5).sum)
  }

  /**
   * Concatenate sharded archives (disjoint ascending tile-id ranges,
   * as produced by [[writeSharded]]) into ONE valid archive without
   * re-sorting: tile blobs stream shard by shard with offsets rebased;
   * directories rebuild from the shards' own directories. The
   * single-writer cost is a sequential byte copy — no decode, no
   * re-encode, no shuffle.
   *
   * IO goes through the Hadoop FileSystem API (any scheme), and the
   * output is written in TWO passes so every write is forward-only —
   * pass 1 reads just the shards' directories to size the header/root,
   * pass 2 streams `[header][root][zeros][tile data][json][leaves]`
   * sequentially — which is what lets this run against object stores
   * whose output streams cannot seek.
   */
  def concatenateShards(shardPaths: Seq[String], outPath: String,
                        metadataJson: String = """{"vector_layers":[]}""",
                        minZoom: Int = 0, maxZoom: Int = 15,
                        tilesGzipped: Boolean = true,
                        conf: org.apache.hadoop.conf.Configuration =
                          new org.apache.hadoop.conf.Configuration()): (Long, Long, Long) = {
    val entries = ArrayBuffer.empty[Entry]
    val shardHeaders = ArrayBuffer.empty[Header]
    var dataLen = 0L
    var addressed = 0L
    var contents = 0L
    var lastId = Long.MinValue
    // pass 1: directories only — rebase entries onto the merged data section
    shardPaths.foreach { sp =>
      val r = openReader(sp, conf)
      try {
        val h = r.header
        r.allEntries.foreach { e =>
          require(e.tileId > lastId, s"shard $sp overlaps previous range at ${e.tileId}")
          lastId = e.tileId + math.max(e.runLength - 1, 0)
          entries += e.copy(offset = e.offset + dataLen)
          addressed += math.max(e.runLength, 1)
        }
        contents += h.numTileContents
        dataLen += h.tileDataLength
        shardHeaders += h
      } finally r.close()
    }
    val (root, leaves) = makeDirectories(entries.toSeq)
    val json = Mvt.gzip(metadataJson.getBytes("UTF-8"))
    val header = Header(
      rootDirOffset = HeaderLen.toLong, rootDirLength = root.length.toLong,
      jsonMetadataOffset = InitSection + dataLen, jsonMetadataLength = json.length.toLong,
      leafDirectoriesOffset = InitSection + dataLen + json.length,
      leafDirectoriesLength = leaves.length.toLong,
      tileDataOffset = InitSection.toLong, tileDataLength = dataLen,
      numAddressedTiles = addressed, numTileEntries = entries.length.toLong,
      numTileContents = contents, clustered = true,
      internalCompression = 2, tileCompression = if (tilesGzipped) 2 else 1,
      tileType = 1, minZoom = minZoom.toByte, maxZoom = maxZoom.toByte,
      minLonE7 = -1800000000, minLatE7 = -850511300,
      maxLonE7 = 1800000000, maxLatE7 = 850511300,
      centerZoom = minZoom.toByte, centerLonE7 = 0, centerLatE7 = 0)
    // pass 2: forward-only sequential write
    val outP = new org.apache.hadoop.fs.Path(outPath)
    val fs = outP.getFileSystem(conf)
    val out = fs.create(outP, true)
    try {
      out.write(header.toBytes)
      out.write(root)
      out.write(new Array[Byte](InitSection - HeaderLen - root.length))
      val buf = new Array[Byte](1 << 20)
      shardPaths.zip(shardHeaders).foreach { case (sp, h) =>
        val spP = new org.apache.hadoop.fs.Path(sp)
        val in = spP.getFileSystem(conf).open(spP)
        try {
          in.seek(h.tileDataOffset)
          var remaining = h.tileDataLength
          while (remaining > 0) {
            val n = in.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
            require(n > 0, s"short read concatenating $sp")
            out.write(buf, 0, n)
            remaining -= n
          }
        } finally in.close()
      }
      out.write(json)
      out.write(leaves)
    } finally out.close()
    (addressed, entries.length.toLong, contents)
  }

  /** Positioned-read abstraction so the reader works over a local
    * file or any Hadoop FileSystem scheme. */
  trait RandomAccess extends AutoCloseable {
    def readAt(offset: Long, len: Int): Array[Byte]
  }

  final class FileAccess(path: String) extends RandomAccess {
    private val ch = java.nio.channels.FileChannel.open(java.nio.file.Paths.get(path))
    override def readAt(offset: Long, len: Int): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(len)
      var read = 0
      while (read < len) {
        val k = ch.read(buf, offset + read)
        require(k > 0, "short read")
        read += k
      }
      buf.array()
    }
    override def close(): Unit = ch.close()
  }

  final class HadoopAccess(in: org.apache.hadoop.fs.FSDataInputStream) extends RandomAccess {
    override def readAt(offset: Long, len: Int): Array[Byte] = {
      val buf = new Array[Byte](len)
      in.readFully(offset, buf, 0, len)
      buf
    }
    override def close(): Unit = in.close()
  }

  def openReader(path: String, conf: org.apache.hadoop.conf.Configuration): Reader = {
    val p = new org.apache.hadoop.fs.Path(path)
    new Reader(new HadoopAccess(p.getFileSystem(conf).open(p)))
  }

  /** Random-access reader over the v3 layout (root + optional leaves). */
  final class Reader(access: RandomAccess) extends AutoCloseable {
    def this(path: String) = this(new FileAccess(path))
    val header: Header = Header.fromBytes(readAt(0, HeaderLen))
    private val root: Array[Entry] =
      directoryFromBytes(Mvt.gunzip(readAt(header.rootDirOffset, header.rootDirLength.toInt)))

    private def readAt(offset: Long, len: Int): Array[Byte] = access.readAt(offset, len)

    def metadata: String =
      new String(Mvt.gunzip(readAt(header.jsonMetadataOffset, header.jsonMetadataLength.toInt)), "UTF-8")

    /** Every tile entry, leaves expanded (ascending tileId). */
    def allEntries: Seq[Entry] =
      if (header.leafDirectoriesLength == 0) root.toSeq
      else root.toSeq.flatMap { e =>
        if (e.runLength == 0)
          directoryFromBytes(Mvt.gunzip(
            readAt(header.leafDirectoriesOffset + e.offset, e.length))).toSeq
        else Seq(e)
      }

    /**
     * Entries whose id run intersects [lo, hi] — DIRECTORY-LEVEL
     * pruning: leaf directories whose root-entry range lies outside
     * the window are never even fetched, so a zoom-restricted scan of
     * a planet archive touches only that zoom's leaves.
     */
    def entriesInRange(lo: Long, hi: Long): Iterator[Entry] = {
      def overlaps(e: Entry): Boolean =
        e.tileId <= hi && e.tileId + math.max(e.runLength, 1) > lo
      if (header.leafDirectoriesLength == 0) root.iterator.filter(overlaps)
      else {
        // a leaf-pointer entry (runLength 0) covers [tileId, next root tileId)
        root.iterator.zipWithIndex.flatMap { case (e, i) =>
          if (e.runLength > 0) {
            if (overlaps(e)) Iterator.single(e) else Iterator.empty
          } else {
            val leafEnd = if (i + 1 < root.length) root(i + 1).tileId else Long.MaxValue
            if (e.tileId > hi || leafEnd <= lo) Iterator.empty
            else directoryFromBytes(Mvt.gunzip(
              readAt(header.leafDirectoriesOffset + e.offset, e.length)))
              .iterator.filter(overlaps)
          }
        }
      }
    }

    def tileData(e: Entry): Array[Byte] =
      readAt(header.tileDataOffset + e.offset, e.length)

    /**
     * Split [lo, hi] into up to `target` contiguous sub-ranges along
     * ROOT-DIRECTORY entry boundaries — leaf directories are the
     * natural parallel unit (each root leaf-pointer covers one leaf's
     * id span), so a planet archive scans with one task per group of
     * leaves instead of one task total. Only the ≤16 KB root is read
     * here; no leaf is fetched. Ranges cover [lo, hi] exactly and are
     * disjoint, so per-partition readers that clamp emitted ids to
     * their own range produce each tile exactly once even when a
     * run-length entry straddles a boundary.
     */
    def splitRanges(lo: Long, hi: Long, target: Int): Seq[(Long, Long)] = {
      if (lo > hi) return Seq.empty
      // root entries whose span can intersect the window; a leaf
      // pointer (runLength 0) covers [tileId, next root tileId)
      val starts = ArrayBuffer.empty[Long]
      var i = 0
      while (i < root.length) {
        val e = root(i)
        val endExcl =
          if (e.runLength > 0) e.tileId + e.runLength
          else if (i + 1 < root.length) root(i + 1).tileId
          else Long.MaxValue
        if (e.tileId <= hi && endExcl > lo) starts += math.max(e.tileId, lo)
        i += 1
      }
      if (starts.length <= 1 || target <= 1) return Seq((lo, hi))
      val n = math.min(target, starts.length)
      // boundaries at even root-entry strides; range k starts at the
      // stride-k entry's first in-window id
      val bounds = (1 until n).map(k => starts((k.toLong * starts.length / n).toInt)).distinct
      val los = lo +: bounds
      val his = bounds.map(_ - 1) :+ hi
      los.zip(his).filter { case (a, b) => a <= b }
    }

    /** Find the last entry with tileId <= id (spec search order). */
    private def find(entries: Array[Entry], id: Long): Option[Entry] = {
      var lo = 0
      var hi = entries.length - 1
      var best: Entry = null
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (entries(mid).tileId <= id) { best = entries(mid); lo = mid + 1 }
        else hi = mid - 1
      }
      Option(best)
    }

    def tile(id: Long): Option[Array[Byte]] =
      find(root, id).flatMap { e =>
        if (e.runLength == 0) { // leaf pointer
          val leaf = directoryFromBytes(
            Mvt.gunzip(readAt(header.leafDirectoriesOffset + e.offset, e.length)))
          find(leaf, id).filter(l => id < l.tileId + l.runLength)
            .map(l => readAt(header.tileDataOffset + l.offset, l.length))
        } else if (id < e.tileId + e.runLength) {
          Some(readAt(header.tileDataOffset + e.offset, e.length))
        } else None
      }

    override def close(): Unit = access.close()
  }
}
