package graft

import graft.engine.ProtoStreamArchive
import graft.model.TileBytes
import org.scalatest.funsuite.AnyFunSuite

/** Proto stream archive: wire framing verified against hand-computed
  * protobuf bytes, plus full round-trip (reference
  * stream/WriteableProtoStreamArchive.java + stream_archive_proto.proto). */
class ProtoStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("wire framing matches hand-computed protobuf bytes") {
    import spark.implicits._
    val ds = Seq(TileBytes(0L, 3, 1, 2, Array(0xAB.toByte), 1, 1L)).toDS().coalesce(1)
    val path = java.nio.file.Files.createTempDirectory("graft_ps").toString + "/t.pb"
    ProtoStreamArchive.write(ds, path, ProtoStreamArchive.Meta(name = "", format = ""))
    val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    // entry 1: len=2, Entry{initialization(field 2, len 0)} = 12 00
    assert((raw(0) & 0xff) == 2 && (raw(1) & 0xff) == 0x12 && raw(2) == 0)
    // entry 2: len=11, Entry{tile(field 1, len 9)}, TileEntry
    // {x=1:08 01, y=2:10 02, z=3:18 03, data:22 01 AB}
    val tile = raw.slice(3, 3 + 12).map(_ & 0xff)
    assert(tile.toSeq == Seq(11, 0x0a, 9, 0x08, 1, 0x10, 2, 0x18, 3, 0x22, 1, 0xab))
  }

  test("round-trip: init, ordered tiles, finish metadata") {
    import spark.implicits._
    val tiles = (0 until 20).map { i =>
      TileBytes(i.toLong, 5, i % 4, i / 4, Array.tabulate(8)(j => (i * 7 + j).toByte), 1, i.toLong)
    }
    val ds = tiles.toDS().coalesce(1).sortWithinPartitions("tile_id")
    val path = java.nio.file.Files.createTempDirectory("graft_ps2").toString + "/t.pb"
    val meta = ProtoStreamArchive.Meta(name = "graft", format = "pbf",
      minZoom = 0, maxZoom = 5, others = Map("k" -> "v", "a" -> "b"), gzipped = false)
    val n = ProtoStreamArchive.write(ds, path, meta)
    assert(n == 20)
    val entries = ProtoStreamArchive.read(path)
    assert(entries.head == ProtoStreamArchive.Init)
    val got = entries.collect { case t: ProtoStreamArchive.Tile => t }
    assert(got.size == 20)
    got.zip(tiles).foreach { case (g, w) =>
      assert(g.z == w.z && g.x == w.x && g.y == w.y && g.bytes.toSeq == w.bytes.toSeq)
    }
    val fin = entries.last.asInstanceOf[ProtoStreamArchive.Finish]
    assert(fin.meta.name == "graft" && fin.meta.format == "pbf")
    assert(fin.meta.maxZoom == 5 && !fin.meta.gzipped)
    assert(fin.meta.others == Map("k" -> "v", "a" -> "b"))
  }
}
