package graft.engine

import graft.model.TileBytes
import org.apache.spark.sql.Dataset

/**
 * Protobuf stream archive (reference
 * `stream/WriteableProtoStreamArchive.java` +
 * `proto/stream_archive_proto.proto`): length-delimited `Entry`
 * messages — one InitializationEntry, one TileEntry per tile in
 * archive order, and a FinishEntry carrying Metadata — the format the
 * reference emits for piping a build into another process. Wire
 * encoding hand-rolled on [[Mvt.ProtoWriter]] per the public proto
 * schema (no protobuf library in the sandbox).
 *
 * Scale shape: the stream is inherently sequential (it IS the ordered
 * drain), written through the Hadoop FileSystem so any scheme works;
 * memory is one entry at a time.
 */
object ProtoStreamArchive {

  /** Metadata subset (proto `Metadata`): name=1, format=6, min_zoom=9,
    * max_zoom=10, others=12 (map), tile_compression=13. */
  case class Meta(name: String = "", format: String = "pbf",
                  minZoom: Int = 0, maxZoom: Int = 0,
                  others: Map[String, String] = Map.empty,
                  gzipped: Boolean = false)

  private def writeDelimited(out: java.io.OutputStream, msg: Array[Byte]): Unit = {
    var v = msg.length.toLong
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
    out.write(msg)
  }

  private def tileEntry(t: TileBytes): Array[Byte] = {
    val te = new Mvt.ProtoWriter
    te.uint(1, t.x.toLong)
    te.uint(2, t.y.toLong)
    te.uint(3, t.z.toLong)
    te.bytes(4, t.bytes)
    val e = new Mvt.ProtoWriter
    e.bytes(1, te.toBytes)
    e.toBytes
  }

  private def initEntry: Array[Byte] = {
    val e = new Mvt.ProtoWriter
    e.bytes(2, Array.emptyByteArray) // empty InitializationEntry
    e.toBytes
  }

  private def finishEntry(meta: Meta): Array[Byte] = {
    val m = new Mvt.ProtoWriter
    if (meta.name.nonEmpty) m.str(1, meta.name)
    if (meta.format.nonEmpty) m.str(6, meta.format)
    if (meta.minZoom != 0) m.uint(9, meta.minZoom.toLong)
    if (meta.maxZoom != 0) m.uint(10, meta.maxZoom.toLong)
    meta.others.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val kv = new Mvt.ProtoWriter
      kv.str(1, k)
      kv.str(2, v)
      m.bytes(12, kv.toBytes)
    }
    m.uint(13, if (meta.gzipped) 1L else 2L) // GZIP / NONE
    val fe = new Mvt.ProtoWriter
    fe.bytes(1, m.toBytes)
    val e = new Mvt.ProtoWriter
    e.bytes(3, fe.toBytes)
    e.toBytes
  }

  /** Ordered drain -> one delimited proto stream; returns tile count. */
  def write(tiles: Dataset[TileBytes], path: String, meta: Meta = Meta()): Long = {
    val conf = tiles.sparkSession.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val out = new java.io.BufferedOutputStream(p.getFileSystem(conf).create(p, true), 1 << 20)
    try {
      writeDelimited(out, initEntry)
      var n = 0L
      var lastId = Long.MinValue
      tiles.toLocalIterator().forEachRemaining { t =>
        require(t.tile_id > lastId, s"archive drain out of order: ${t.tile_id} after $lastId")
        lastId = t.tile_id
        writeDelimited(out, tileEntry(t))
        n += 1
      }
      writeDelimited(out, finishEntry(meta))
      n
    } finally out.close()
  }

  sealed trait Entry
  case object Init extends Entry
  case class Tile(z: Int, x: Int, y: Int, bytes: Array[Byte]) extends Entry
  case class Finish(meta: Meta) extends Entry

  /** Sequential reader (the stream is a pipe format; ingestion at
    * scale goes through the random-access archives). */
  def read(path: String,
           conf: org.apache.hadoop.conf.Configuration = new org.apache.hadoop.conf.Configuration()): Seq[Entry] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val in = p.getFileSystem(conf).open(p)
    val all = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in) finally in.close()
    val r = new Mvt.ProtoReader(all)
    val out = scala.collection.mutable.ArrayBuffer.empty[Entry]
    while (r.hasMore) {
      val entry = new Mvt.ProtoReader(r.readBytes()) // delimited: len + Entry
      var parsed: Entry = null
      while (entry.hasMore) {
        val (field, wire) = entry.readKey()
        field match {
          case 1 =>
            val te = new Mvt.ProtoReader(entry.readBytes())
            var (x, y, z) = (0, 0, 0)
            var data = Array.emptyByteArray
            while (te.hasMore) {
              val (f, w) = te.readKey()
              f match {
                case 1 => x = te.readVarint().toInt
                case 2 => y = te.readVarint().toInt
                case 3 => z = te.readVarint().toInt
                case 4 => data = te.readBytes()
                case _ => te.skip(w)
              }
            }
            parsed = Tile(z, x, y, data)
          case 2 => entry.skip(wire); parsed = Init
          case 3 =>
            val fe = new Mvt.ProtoReader(entry.readBytes())
            var meta = Meta(format = "", gzipped = false)
            var compression = 2L
            while (fe.hasMore) {
              val (f, w) = fe.readKey()
              if (f == 1) {
                val m = new Mvt.ProtoReader(fe.readBytes())
                while (m.hasMore) {
                  val (mf, mw) = m.readKey()
                  mf match {
                    case 1 => meta = meta.copy(name = new String(m.readBytes(), "UTF-8"))
                    case 6 => meta = meta.copy(format = new String(m.readBytes(), "UTF-8"))
                    case 9 => meta = meta.copy(minZoom = m.readVarint().toInt)
                    case 10 => meta = meta.copy(maxZoom = m.readVarint().toInt)
                    case 12 =>
                      val kv = new Mvt.ProtoReader(m.readBytes())
                      var (k, v) = ("", "")
                      while (kv.hasMore) {
                        val (kf, kw) = kv.readKey()
                        kf match {
                          case 1 => k = new String(kv.readBytes(), "UTF-8")
                          case 2 => v = new String(kv.readBytes(), "UTF-8")
                          case _ => kv.skip(kw)
                        }
                      }
                      meta = meta.copy(others = meta.others + (k -> v))
                    case 13 => compression = m.readVarint()
                    case _ => m.skip(mw)
                  }
                }
              } else fe.skip(w)
            }
            parsed = Finish(meta.copy(gzipped = compression == 1L))
          case _ => entry.skip(wire)
        }
      }
      if (parsed != null) out += parsed
    }
    out.toSeq
  }
}
