package graft

import graft.engine._
import org.scalatest.funsuite.AnyFunSuite

/** MBTiles written by the from-scratch SqliteWriter must be a VALID
  * SQLite database: verified both with our independent reader AND by
  * shelling out to the real sqlite3 (python3 stdlib) — integrity check
  * + full content read-back. */
class MbtilesWriterSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def writeArchive(): (String, Array[graft.model.TileBytes]) = {
    val docs = Docs.docs(spark, "/root/testdata/sf0.001")
    val tiles = Pipeline.tiles(docs, new Pipeline.GraftProfile(4, 4, 4), 4, gzipTiles = false)
    val path = java.nio.file.Files.createTempDirectory("graft_mb").toString + "/out.mbtiles"
    val collected = tiles.collect()
    val (n, unique) = MbtilesArchive.write(tiles, path,
      Map("name" -> "graft", "format" -> "pbf"))
    assert(n == collected.length)
    assert(unique <= n)
    (path, collected)
  }

  test("round-trips through our independent sqlite reader") {
    val (path, collected) = writeArchive()
    val back = graft.sources.MbtilesReader.read(spark, path).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getAs[Array[Byte]]("bytes").toSeq)
      .toMap
    assert(back.size == collected.length)
    // the reader flips the stored TMS row back to XYZ: exact round trip
    collected.foreach { t =>
      assert(back((t.z, t.x, t.y)) == t.bytes.toSeq, s"tile ${t.z}/${t.x}/${t.y}")
    }
    assert(MbtilesReader.metadataOf(path) == Map("name" -> "graft", "format" -> "pbf"))
  }

  private object MbtilesReader {
    def metadataOf(path: String): Map[String, String] =
      graft.sources.MbtilesReader.metadata(path)
  }

  test("real sqlite3 accepts the file: integrity_check + content") {
    val (path, collected) = writeArchive()
    val py =
      s"""import sqlite3, sys
         |con = sqlite3.connect('$path')
         |ok = con.execute('PRAGMA integrity_check').fetchone()[0]
         |assert ok == 'ok', ok
         |n = con.execute('SELECT COUNT(*) FROM map').fetchone()[0]
         |u = con.execute('SELECT COUNT(*) FROM images').fetchone()[0]
         |m = dict(con.execute('SELECT name, value FROM metadata').fetchall())
         |total = con.execute('''SELECT COUNT(*), SUM(LENGTH(tile_data))
         |  FROM map JOIN images USING (tile_id)''').fetchone()
         |print(f"OK {n} {u} {m['name']} {total[0]} {total[1]}")
         |""".stripMargin
    val outBuf = new StringBuilder
    val code = scala.sys.process.Process(Seq("python3", "-c", py))
      .!(scala.sys.process.ProcessLogger(l => outBuf.append(l).append('\n'), l => outBuf.append(l).append('\n')))
    assert(code == 0, s"python sqlite3 failed: $outBuf")
    val parts = outBuf.toString.trim.split(' ')
    assert(parts(0) == "OK")
    assert(parts(1).toInt == collected.length)
    assert(parts(3) == "graft")
    assert(parts(4).toInt == collected.length)
    assert(parts(5).toLong == collected.map(_.bytes.length.toLong).sum)
  }

  test("streaming drain: 10^6 tiles with bounded retained memory (no full-archive buffering)") {
    import spark.implicits._
    val nTiles = 1000000
    // distinct content for 1 in 16 tiles -> real dedup traffic
    val ds = spark.range(nTiles).map { i =>
      val payload = Array.tabulate(24)(j => ((i % 16) * 31 + j).toByte)
      graft.model.TileBytes(i, 10, (i % 1024).toInt, (i / 1024).toInt,
        payload, 1, Mvt.fnv1a64(payload))
    }.coalesce(4).sortWithinPartitions("tile_id").repartitionByRange(4, $"tile_id")
      .sortWithinPartitions("tile_id")
    val path = java.nio.file.Files.createTempDirectory("graft_mb3").toString + "/big.mbtiles"
    val (n, unique, maxRetained) = MbtilesArchive.writeWithStats(ds, path,
      Map("name" -> "big"))
    assert(n == nTiles)
    assert(unique == 16)
    // the bounded-memory claim: open-leaf pages + interior fringe only.
    // a full buffer of 10^6 map rows alone would be tens of MB; the
    // writer's high-water mark must stay a few pages' worth.
    assert(maxRetained < 512 * 1024, s"retained $maxRetained bytes")
    // the 1M-row archive is a valid SQLite db per the real sqlite3,
    // including multi-level interior pages and the compat view
    val py =
      s"""import sqlite3
         |con = sqlite3.connect('$path')
         |assert con.execute('PRAGMA integrity_check').fetchone()[0] == 'ok'
         |n = con.execute('SELECT COUNT(*) FROM map').fetchone()[0]
         |u = con.execute('SELECT COUNT(*) FROM images').fetchone()[0]
         |v = con.execute('SELECT COUNT(*), SUM(LENGTH(tile_data)) FROM tiles').fetchone()
         |last = con.execute('SELECT tile_id FROM map WHERE zoom_level=10 AND tile_column=511 AND tile_row=1023-487').fetchone()
         |print('OK', n, u, v[0], v[1], last is not None)
         |""".stripMargin
    val outBuf = new StringBuilder
    val code = scala.sys.process.Process(Seq("python3", "-c", py))
      .!(scala.sys.process.ProcessLogger(l => outBuf.append(l).append('\n'), l => outBuf.append(l).append('\n')))
    assert(code == 0, s"python sqlite3 failed: $outBuf")
    val parts = outBuf.toString.trim.split(' ')
    assert(parts(1).toInt == nTiles)
    assert(parts(2).toInt == 16)
    assert(parts(3).toInt == nTiles, "tiles view join count")
    assert(parts(4).toLong == nTiles.toLong * 24, "tiles view payload bytes")
  }

  test("overflow: multi-page blobs survive the real sqlite3 read-back") {
    import spark.implicits._
    val big = Array.tabulate(20000)(i => (i * 31 % 251).toByte) // ~5 pages
    val ds = Seq(graft.model.TileBytes(1L, 0, 0, 0, big, 1, Mvt.fnv1a64(big)))
      .toDS().coalesce(1)
    val path = java.nio.file.Files.createTempDirectory("graft_mb2").toString + "/big.mbtiles"
    MbtilesArchive.write(ds, path)
    val py =
      s"""import sqlite3
         |con = sqlite3.connect('$path')
         |assert con.execute('PRAGMA integrity_check').fetchone()[0] == 'ok'
         |d = con.execute('SELECT tile_data FROM images').fetchone()[0]
         |import hashlib
         |print('OK', len(d), hashlib.md5(d).hexdigest())
         |""".stripMargin
    val outBuf = new StringBuilder
    val code = scala.sys.process.Process(Seq("python3", "-c", py))
      .!(scala.sys.process.ProcessLogger(l => outBuf.append(l).append('\n'), _ => ()))
    assert(code == 0, s"python sqlite3 failed: $outBuf")
    val parts = outBuf.toString.trim.split(' ')
    assert(parts(1).toInt == big.length)
    val md = java.security.MessageDigest.getInstance("MD5").digest(big)
    assert(parts(2) == md.map("%02x".format(_)).mkString)
  }
}
