package graft.engine

import graft.model.TileBytes
import org.apache.spark.sql.Dataset
import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/**
 * Single-file clustered tile archive — the ordered-drain sink
 * (pmtiles-style layout: reference `pmtiles/WriteablePmtiles.java`,
 * mbtiles-compact dedup: `mbtiles/Mbtiles.java:286-356`):
 *
 *   [header][tile data blobs, Hilbert order][directory][footer]
 *
 * - tiles arrive already globally ordered by Hilbert id (the range
 *   shuffle guarantees partition i < partition j => all keys in i <
 *   keys in j), so the drain is `toLocalIterator` — one writer, zero
 *   re-sort, exactly the reference's ordered single-archive constraint;
 * - content dedup: identical tile bytes (FNV-1a content hash — ocean
 *   fills, repeated edges) are stored once; directory entries of
 *   duplicates point at the same blob (mbtiles-compact analog);
 * - directory: delta-varint (tileId, offset, length) triples, gzipped.
 *
 * The encode work stays distributed (tiles arrive encoded+gzipped);
 * only the final sequential file append is single-threaded, same as
 * the reference.
 */
object ClusteredArchive {
  private val Magic = "GRFTARC1".getBytes("ASCII")

  case class Entry(tileId: Long, offset: Long, length: Int)

  /** Write the archive; returns (tiles written, unique blobs). */
  def write(tiles: Dataset[TileBytes], path: String,
            metadata: String = "{}"): (Long, Long) = {
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path), 1 << 20)
    var pos = 0L
    def emit(b: Array[Byte]): Unit = { out.write(b); pos += b.length }

    emit(Magic)
    val entries = ArrayBuffer.empty[Entry]
    val byHash = mutable.HashMap.empty[Long, Entry] // content dedup
    var lastId = Long.MinValue
    var n = 0L
    var unique = 0L

    // partition order == global hilbert order for range-sorted input
    tiles.toLocalIterator().forEachRemaining { t =>
      require(t.tile_id > lastId, s"archive drain out of order: ${t.tile_id} after $lastId")
      lastId = t.tile_id
      val e = byHash.get(t.content_hash) match {
        case Some(prev) if prev.length == t.bytes.length => // hash + length check
          Entry(t.tile_id, prev.offset, prev.length)
        case _ =>
          val fresh = Entry(t.tile_id, pos, t.bytes.length)
          emit(t.bytes)
          unique += 1
          byHash(t.content_hash) = fresh
          fresh
      }
      entries += e
      n += 1
    }

    // directory: delta varints, gzipped
    val dir = new java.io.ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { dir.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      dir.write(v.toInt)
    }
    varint(entries.length)
    var prevId = 0L
    entries.foreach { e =>
      varint(e.tileId - prevId)
      prevId = e.tileId
      varint(e.offset)
      varint(e.length)
    }
    val dirBytes = Mvt.gzip(dir.toByteArray)
    val dirOffset = pos
    emit(dirBytes)
    val metaBytes = metadata.getBytes("UTF-8")
    val metaOffset = pos
    emit(metaBytes)

    // footer: fixed 32 bytes (dirOffset, dirLen, metaOffset, metaLen)
    val bb = java.nio.ByteBuffer.allocate(32).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(dirOffset).putLong(dirBytes.length.toLong)
      .putLong(metaOffset).putLong(metaBytes.length.toLong)
    emit(bb.array())
    out.close()
    (n, unique)
  }

  final class Reader(path: String) extends AutoCloseable {
    private val ch = java.nio.channels.FileChannel.open(java.nio.file.Paths.get(path))
    private val (entries, metaJson) = {
      val size = ch.size()
      val footer = readAt(size - 32, 32)
      val bb = java.nio.ByteBuffer.wrap(footer).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val dirOffset = bb.getLong; val dirLen = bb.getLong
      val metaOffset = bb.getLong; val metaLen = bb.getLong
      val dir = Mvt.gunzip(readAt(dirOffset, dirLen.toInt))
      val r = new Mvt.ProtoReader(dir) // varint stream reader
      val count = r.readVarint().toInt
      val es = new Array[Entry](count)
      var prev = 0L
      var i = 0
      while (i < count) {
        prev += r.readVarint()
        es(i) = Entry(prev, r.readVarint(), r.readVarint().toInt)
        i += 1
      }
      (es, new String(readAt(metaOffset, metaLen.toInt), "UTF-8"))
    }

    private def readAt(offset: Long, len: Int): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(len)
      var read = 0
      while (read < len) {
        val k = ch.read(buf, offset + read)
        require(k > 0, "short read")
        read += k
      }
      buf.array()
    }

    def tileIds: Seq[Long] = entries.map(_.tileId).toSeq
    def tileCount: Int = entries.length
    def metadata: String = metaJson

    /** Binary-search a tile's bytes by id. */
    def tile(id: Long): Option[Array[Byte]] = {
      var lo = 0
      var hi = entries.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val e = entries(mid)
        if (e.tileId == id) return Some(readAt(e.offset, e.length))
        else if (e.tileId < id) lo = mid + 1
        else hi = mid - 1
      }
      None
    }
    override def close(): Unit = ch.close()
  }
}
