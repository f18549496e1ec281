package graft

import graft.engine._
import org.scalatest.funsuite.AnyFunSuite

/** PMTiles v3 byte-compatibility: the file is parsed here with
  * independent spec-constant assertions (magic/version/field offsets),
  * not just our own Reader. */
class PmtilesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def writeArchive(): (String, Array[graft.model.TileBytes]) = {
    val docs = Docs.docs(spark, "/root/testdata/sf0.001")
    val tiles = Pipeline.tiles(docs, new Pipeline.GraftProfile(4, 4, 4), 4, gzipTiles = true)
    val path = java.nio.file.Files.createTempDirectory("graft_pmtiles").toString + "/out.pmtiles"
    val (addressed, _, contents) = PmtilesArchive.write(tiles, path,
      metadataJson = """{"vector_layers":[{"id":"admin"},{"id":"lines"},{"id":"points"}]}""",
      minZoom = 0, maxZoom = 4)
    val collected = tiles.collect()
    assert(addressed == collected.length)
    assert(contents <= addressed)
    (path, collected)
  }

  test("header matches published spec constants at raw byte offsets") {
    val (path, _) = writeArchive()
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    // spec: magic "PMTiles" at 0..6, version byte 3 at 7
    assert(new String(bytes.slice(0, 7), "UTF-8") == "PMTiles")
    assert(bytes(7) == 3)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val rootDirOffset = bb.getLong(8)
    val rootDirLength = bb.getLong(16)
    val tileDataOffset = bb.getLong(56)
    assert(rootDirOffset == 127, "root dir follows the 127-byte header")
    assert(rootDirLength > 0 && rootDirLength < 16384 - 127)
    assert(tileDataOffset == 16384, "tile data starts at the init section")
    // spec: clustered flag at byte 96, compressions 97/98, type 99
    assert(bytes(96) == 1, "clustered")
    assert(bytes(97) == 2, "internal compression gzip")
    assert(bytes(98) == 2, "tile compression gzip")
    assert(bytes(99) == 1, "tile type MVT")
    // gzip magic at the root directory and at the first tile blob
    assert((bytes(127) & 0xff) == 0x1f && (bytes(128) & 0xff) == 0x8b)
    assert((bytes(16384) & 0xff) == 0x1f && (bytes(16385) & 0xff) == 0x8b)
  }

  test("every tile round-trips through the reader; ids match the spec addressing") {
    val (path, collected) = writeArchive()
    val r = new PmtilesArchive.Reader(path)
    try {
      collected.foreach { t =>
        val got = r.tile(t.tile_id)
        assert(got.isDefined, s"missing tile ${t.tile_id}")
        assert(java.util.Arrays.equals(got.get, t.bytes), s"bytes differ for ${t.tile_id}")
        // spec tileId: cumulative 4^z base + hilbert position
        val base = (0 until t.z).map(z => 1L << (2 * z)).sum
        assert(t.tile_id >= base && t.tile_id < base + (1L << (2 * t.z)))
      }
      assert(r.tile(Long.MaxValue / 2).isEmpty)
      assert(r.metadata.contains("vector_layers"))
    } finally r.close()
  }

  test("sharded parallel sink: disjoint ranges, every tile resolvable") {
    val docs = Docs.docs(spark, "/root/testdata/sf0.001")
    val tiles = Pipeline.tiles(docs, new Pipeline.GraftProfile(4, 4, 4), 4, gzipTiles = true)
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val (shards, total) = PmtilesArchive.writeSharded(tiles, dir)
    val collected = tiles.collect()
    assert(total == collected.length)
    assert(shards > 1, "expected multiple shards from 4 partitions")
    // manifest ranges are sorted and disjoint
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "manifest.json")), "UTF-8")
    val ranges = """"min_tile_id":(\d+),"max_tile_id":(\d+)""".r
      .findAllMatchIn(manifest).map(m => (m.group(1).toLong, m.group(2).toLong)).toSeq
    assert(ranges.length == shards)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi < lo2, "overlapping shard ranges")
      case _ =>
    }
    // every tile resolves through its shard (routed by range)
    val readers = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator()
    val shardFiles = new scala.collection.mutable.ArrayBuffer[PmtilesArchive.Reader]
    readers.forEachRemaining(p =>
      if (p.toString.endsWith(".pmtiles")) shardFiles += new PmtilesArchive.Reader(p.toString))
    try {
      collected.foreach { t =>
        val hit = shardFiles.flatMap(_.tile(t.tile_id)).headOption
        assert(hit.exists(java.util.Arrays.equals(_, t.bytes)), s"tile ${t.tile_id}")
      }
    } finally shardFiles.foreach(_.close())
  }

  test("shard concatenation produces one valid archive with every tile") {
    val docs = Docs.docs(spark, "/root/testdata/sf0.001")
    val tiles = Pipeline.tiles(docs, new Pipeline.GraftProfile(4, 4, 4), 4, gzipTiles = true)
    val dir = java.nio.file.Files.createTempDirectory("graft_concat").toString
    PmtilesArchive.writeSharded(tiles, dir)
    val shardPaths = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    val shards = new scala.collection.mutable.ArrayBuffer[String]
    shardPaths.forEachRemaining(p => if (p.toString.endsWith(".pmtiles")) shards += p.toString)
    val out = s"$dir/merged.pmtiles"
    val (addressed, _, _) = PmtilesArchive.concatenateShards(shards.sorted.toSeq, out)
    val collected = tiles.collect()
    assert(addressed == collected.length)
    val r = new PmtilesArchive.Reader(out)
    try {
      collected.foreach { t =>
        assert(r.tile(t.tile_id).exists(java.util.Arrays.equals(_, t.bytes)), s"tile ${t.tile_id}")
      }
      assert(r.header.clustered)
    } finally r.close()
  }

  test("identical tiles dedup: consecutive runs coalesce, gaps back-reference") {
    import spark.implicits._
    val blobA = Array[Byte](1, 2, 3)
    val blobB = Array[Byte](9, 8, 7, 6)
    def tb(id: Long, b: Array[Byte]) =
      graft.model.TileBytes(id, 0, 0, 0, b, 1, Mvt.fnv1a64(b))
    // ids 10,11,12 share blobA (run), 13 is B, 20 repeats A (back-ref)
    val ds = Seq(tb(10, blobA), tb(11, blobA), tb(12, blobA), tb(13, blobB), tb(20, blobA))
      .toDS().coalesce(1).sortWithinPartitions("tile_id")
    val path = java.nio.file.Files.createTempDirectory("graft_pm2").toString + "/d.pmtiles"
    val (addressed, entries, contents) = PmtilesArchive.write(ds, path, tilesGzipped = false)
    assert(addressed == 5 && contents == 2, "two unique blobs")
    assert(entries == 3, "run of 3 + B + back-reference = 3 entries")
    val r = new PmtilesArchive.Reader(path)
    try {
      Seq(10L, 11L, 12L, 20L).foreach(id =>
        assert(r.tile(id).exists(java.util.Arrays.equals(_, blobA)), s"id $id"))
      assert(r.tile(13L).exists(java.util.Arrays.equals(_, blobB)))
      assert(r.tile(14L).isEmpty && r.tile(9L).isEmpty && r.tile(21L).isEmpty)
    } finally r.close()
  }

  test("directory codec round-trips incl. run-length and contiguous-offset forms") {
    val entries = Seq(
      PmtilesArchive.Entry(0, 0, 10, 1),
      PmtilesArchive.Entry(1, 10, 20, 3), // run of 3 tiles sharing a blob
      PmtilesArchive.Entry(5, 30, 5, 1), // contiguous offset -> varint 0
      PmtilesArchive.Entry(9, 10, 20, 1)) // back-reference (dedup)
    val decoded = PmtilesArchive.directoryFromBytes(PmtilesArchive.directoryToBytes(entries))
    assert(decoded.toSeq == entries)
  }

  test("large directories split into leaves and still resolve") {
    // synthesize enough entries to overflow the init section
    val entries = (0 until 100000).map(i => PmtilesArchive.Entry(i.toLong, i.toLong * 7, 7, 1))
    val (root, leaves) = PmtilesArchive.makeDirectories(entries)
    assert(leaves.nonEmpty, "expected leaf split")
    assert(root.length < 16384 - 127)
    val rootEntries = PmtilesArchive.directoryFromBytes(Mvt.gunzip(root))
    assert(rootEntries.forall(_.runLength == 0), "root entries point at leaves")
    // resolve an arbitrary id through root -> leaf by hand
    val id = 54321L
    val re = rootEntries.reverse.find(_.tileId <= id).get
    val leafBytes = leaves.slice(re.offset.toInt, re.offset.toInt + re.length)
    val leaf = PmtilesArchive.directoryFromBytes(Mvt.gunzip(leafBytes))
    val e = leaf.reverse.find(_.tileId <= id).get
    assert(e.tileId == id && e.offset == id * 7)
  }
}
