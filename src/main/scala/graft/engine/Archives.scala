package graft.engine

import graft.model.TileBytes
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/**
 * Output-URI dispatch — the reference's `TileArchiveConfig` /
 * `TileArchives.newWriter` analog: one entry point that routes a tiles
 * dataset to the archive format implied by the destination, so a
 * profile run needs only an output string:
 *
 *   - `*.mbtiles`         streaming SQLite archive
 *   - `*.pmtiles`         byte-compatible PMTiles v3 (clustered)
 *   - `*.pb` / `*.proto`  length-delimited proto entry stream
 *   - `*.csv` / `*.json`  native Spark writes of (z, x, y, base64)
 *   - anything else       {z}/{x}/{y}.pbf files archive (the one
 *                         format with parallel writers)
 */
object Archives {

  /** Write `tiles` to `uri`; returns the tile count. */
  def write(tiles: Dataset[TileBytes], uri: String,
            metadata: Map[String, String] = Map.empty,
            tilesGzipped: Boolean = true): Long = {
    val lower = uri.toLowerCase
    if (lower.endsWith(".mbtiles")) {
      MbtilesArchive.write(tiles, uri, metadata)._1
    } else if (lower.endsWith(".pmtiles")) {
      // proper JSON serialization — metadata values may hold newlines,
      // backslashes, control chars
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = om.createObjectNode()
      metadata.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
      val metaJson = om.writeValueAsString(node)
      val (n, _, _) = PmtilesArchive.write(tiles, uri,
        metadataJson = metaJson, tilesGzipped = tilesGzipped)
      n
    } else if (lower.endsWith(".pb") || lower.endsWith(".proto")) {
      ProtoStreamArchive.write(tiles, uri, ProtoStreamArchive.Meta(
        name = metadata.getOrElse("name", ""),
        format = metadata.getOrElse("format", "pbf"),
        others = metadata -- Seq("name", "format"),
        gzipped = tilesGzipped))
    } else if (lower.endsWith(".csv") || lower.endsWith(".json")) {
      val df = tiles.select(col("z"), col("x"), col("y"),
        base64(col("bytes")).as("encoded_data"))
      if (lower.endsWith(".csv")) df.write.option("header", "true").csv(uri)
      else df.write.json(uri)
      tiles.sparkSession.read.format(if (lower.endsWith(".csv")) "csv" else "json")
        .option("header", "true").load(uri).count()
    } else {
      TileAssembler.writeFilesArchive(tiles, uri)
    }
  }
}
