package graft

import graft.engine.{Archives, Mvt}
import graft.model.TileBytes
import org.scalatest.funsuite.AnyFunSuite

/** Output-URI dispatch: one call writes whichever archive format the
  * destination implies (TileArchiveConfig analog). */
class ArchivesDispatchSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def tiles() = {
    import spark.implicits._
    (0 until 6).map { i =>
      TileBytes(i.toLong, 2, i % 3, i / 3, Array.tabulate(6)(j => (i + j).toByte), 1, i.toLong)
    }.toDS().coalesce(1).sortWithinPartitions("tile_id")
  }

  test("every extension routes to its archive and round-trips") {
    val root = java.nio.file.Files.createTempDirectory("graft_arch").toString
    assert(Archives.write(tiles(), s"$root/a.mbtiles", Map("name" -> "t", "format" -> "pbf")) == 6)
    assert(graft.sources.MbtilesReader.read(spark, s"$root/a.mbtiles").count() == 6)

    assert(Archives.write(tiles(), s"$root/a.pmtiles", tilesGzipped = false) == 6)
    assert(new java.io.File(s"$root/a.pmtiles").length() > 127)

    assert(Archives.write(tiles(), s"$root/a.pb", tilesGzipped = false) == 6)
    val entries = graft.engine.ProtoStreamArchive.read(s"$root/a.pb")
    assert(entries.count(_.isInstanceOf[graft.engine.ProtoStreamArchive.Tile]) == 6)

    assert(Archives.write(tiles(), s"$root/a.csv") == 6)
    assert(Archives.write(tiles(), s"$root/files_out") == 6)
    assert(new java.io.File(s"$root/files_out/2/0/0.pbf").exists())
  }
}
