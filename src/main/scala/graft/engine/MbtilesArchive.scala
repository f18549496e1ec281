package graft.engine

import graft.model.TileBytes
import org.apache.spark.sql.Dataset
import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/**
 * MBTiles archive sink (reference `mbtiles/Mbtiles.java:74-105`,
 * compact dedup schema `:286-356`) written WITHOUT any SQLite library:
 * the from-scratch [[SqliteWriter]] bulk-creates the database file per
 * the public format. Uses the reference's compact schema —
 * `map(zoom_level, tile_column, tile_row, tile_id)` pointing into
 * deduplicated `images(tile_id, tile_data)` — plus `metadata` and the
 * `tiles` compatibility VIEW definition in the catalog.
 *
 * Tile rows use the MBTiles TMS convention (tile_row flipped). The
 * drain is the same ordered `toLocalIterator` as the PMTiles sink.
 */
object MbtilesArchive {

  /** Write tiles + metadata; returns (tiles, uniqueBlobs). */
  def write(tiles: Dataset[TileBytes], path: String,
            metadata: Map[String, String] = Map.empty): (Long, Long) = {
    val mapRows = ArrayBuffer.empty[Array[Any]]
    val imageRows = ArrayBuffer.empty[Array[Any]]
    val seen = mutable.HashSet.empty[String]
    var n = 0L
    var lastId = Long.MinValue
    tiles.toLocalIterator().forEachRemaining { t =>
      require(t.tile_id > lastId, s"archive drain out of order: ${t.tile_id} after $lastId")
      lastId = t.tile_id
      val tileId = f"${t.content_hash}%016x"
      if (seen.add(tileId)) imageRows += Array[Any](tileId, t.bytes)
      val tmsRow = ((1L << t.z) - 1 - t.y)
      mapRows += Array[Any](t.z.toLong, t.x.toLong, tmsRow, tileId)
      n += 1
    }
    val metaRows = metadata.toSeq.sortBy(_._1)
      .map { case (k, v) => Array[Any](k, v) }
    SqliteWriter.write(path, Seq(
      SqliteWriter.Table("metadata",
        "CREATE TABLE metadata (name TEXT, value TEXT)", metaRows),
      SqliteWriter.Table("map",
        "CREATE TABLE map (zoom_level INTEGER, tile_column INTEGER, tile_row INTEGER, tile_id TEXT)",
        mapRows.toSeq),
      SqliteWriter.Table("images",
        "CREATE TABLE images (tile_id TEXT, tile_data BLOB)", imageRows.toSeq)))
    (n, imageRows.length.toLong)
  }
}
