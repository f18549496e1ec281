package graft.engine

import graft.model.TileBytes
import org.apache.spark.sql.Dataset

/**
 * MBTiles archive sink (reference `mbtiles/Mbtiles.java:74-105`,
 * compact dedup schema `:286-356`) written WITHOUT any SQLite library:
 * the from-scratch [[SqliteStreamWriter]] streams the database file per
 * the public format. Uses the reference's compact schema —
 * `map(zoom_level, tile_column, tile_row, tile_id)` pointing into
 * deduplicated `images(tile_id, tile_data)` — plus `metadata` and the
 * `tiles` compatibility VIEW in the catalog.
 *
 * Scale shape (the reference streams batched INSERTs,
 * `Mbtiles.java:597`): pages spill to disk as the ordered
 * `toLocalIterator` drain advances — retained driver state is one open
 * leaf page per table, the interior-page fringe, and the primitive
 * long-hash dedup set. A planet-size archive never buffers in memory.
 *
 * Tile rows use the MBTiles TMS convention (tile_row flipped).
 */
object MbtilesArchive {

  /** Write tiles + metadata; returns (tiles, uniqueBlobs). */
  def write(tiles: Dataset[TileBytes], path: String,
            metadata: Map[String, String] = Map.empty): (Long, Long) = {
    val (n, unique, _) = writeWithStats(tiles, path, metadata)
    (n, unique)
  }

  /** As [[write]], additionally returning the writer's buffered-bytes
    * high-water mark (the bounded-memory guarantee specs assert). */
  def writeWithStats(tiles: Dataset[TileBytes], path: String,
                     metadata: Map[String, String] = Map.empty): (Long, Long, Long) = {
    import scala.jdk.CollectionConverters._
    drainWithStats(tiles.toLocalIterator().asScala, path, metadata)
  }

  /** The ordered single-writer drain over any ascending-tile_id
    * iterator — shared by the Dataset sink above and the DSv2 write's
    * commit-time shard concatenation. */
  def drainWithStats(tiles: Iterator[TileBytes], path: String,
                     metadata: Map[String, String] = Map.empty): (Long, Long, Long) = {
    val w = new SqliteStreamWriter(path)
    val metaT = w.newTable()
    metadata.toSeq.sortBy(_._1).foreach { case (k, v) => metaT.addRow(Array[Any](k, v)) }
    val metaRoot = metaT.finish()

    // map + images fill CONCURRENTLY from the same ordered drain
    val mapT = w.newTable()
    val imgT = w.newTable()
    val seen = new LongHashSet(1 << 16)
    var n = 0L
    var unique = 0L
    var lastId = Long.MinValue
    tiles.foreach { t =>
      require(t.tile_id > lastId, s"archive drain out of order: ${t.tile_id} after $lastId")
      lastId = t.tile_id
      // dedup trusts the 64-bit content hash, matching the reference's
      // own compact-mbtiles dedup (Mbtiles.java:738-755 keys images by
      // tileDataIdByHash with no byte verify); the PMTiles writer, whose
      // data section is seekable mid-write, verifies bytes exactly
      val tileId = f"${t.content_hash}%016x"
      if (seen.add(t.content_hash)) {
        imgT.addRow(Array[Any](tileId, t.bytes))
        unique += 1
      }
      val tmsRow = ((1L << t.z) - 1 - t.y)
      mapT.addRow(Array[Any](t.z.toLong, t.x.toLong, tmsRow, tileId))
      n += 1
    }
    val mapRoot = mapT.finish()
    val imgRoot = imgT.finish()
    w.close(Seq(
      SqliteStreamWriter.Catalog("metadata",
        "CREATE TABLE metadata (name TEXT, value TEXT)", metaRoot),
      SqliteStreamWriter.Catalog("map",
        "CREATE TABLE map (zoom_level INTEGER, tile_column INTEGER, tile_row INTEGER, tile_id TEXT)",
        mapRoot),
      SqliteStreamWriter.Catalog("images",
        "CREATE TABLE images (tile_id TEXT, tile_data BLOB)", imgRoot),
      SqliteStreamWriter.Catalog("tiles",
        "CREATE VIEW tiles AS SELECT map.zoom_level AS zoom_level, map.tile_column AS tile_column, " +
          "map.tile_row AS tile_row, images.tile_data AS tile_data " +
          "FROM map JOIN images ON images.tile_id = map.tile_id",
        0, isView = true)))
    (n, unique, w.maxRetainedBytes)
  }
}
