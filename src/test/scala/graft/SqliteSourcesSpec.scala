package graft

import graft.sources._
import org.scalatest.funsuite.AnyFunSuite

/** From-scratch SQLite parser + GeoPackage / Natural Earth / MBTiles
  * readers, against real sqlite3-written fixture files (incl. an
  * overflow-page chain at 1K pages). */
class SqliteSourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private def res(name: String) = getClass.getResource("/" + name).getPath

  test("sqlite: master table, column names, typed values, overflow pages") {
    val db = Sqlite.open(res("fixture.gpkg"))
    assert(db.tableRoot("lakes").isDefined)
    assert(db.columnNames("lakes") == Seq("fid", "name", "area", "geom"))
    val rows = db.rows("lakes").toSeq
    assert(rows.length == 3)
    val byFid = rows.map { case (_, m) => m("fid").asInstanceOf[Long] -> m }.toMap
    assert(byFid(1L)("name") == "Alpha")
    assert(byFid(1L)("area") == 10.5)
    assert(byFid(2L)("area") == 20.0)
    // row 3 carries a 5000-char attr -> payload spans overflow pages
    assert(byFid(3L)("name").asInstanceOf[String] == "X" * 5000)
  }

  test("geopackage: GP blobs unwrap to WKB, envelope variants handled") {
    val rows = GeoPackage.read(spark, res("fixture.gpkg")).collect()
    assert(rows.length == 3)
    val byFid = rows.map(r => r.getAs[Long]("fid") ->
      (graft.geo.Geo.fromWkb(r.getAs[Array[Byte]]("geom")), r.getAs[Map[String, String]]("attrs"))).toMap
    assert(byFid(1L)._1.getCoordinate.x == 1.5 && byFid(1L)._1.getCoordinate.y == 2.5)
    // fid 2 has an XY envelope in the GP header — must be skipped
    assert(byFid(2L)._1.getCoordinate.x == -3.0 && byFid(2L)._1.getCoordinate.y == 4.0)
    assert(byFid(1L)._2("name") == "Alpha")
    assert(byFid(1L)._2("area") == "10.5")
    assert(!byFid(1L)._2.contains("geom"))
  }

  test("mbtiles: compact map+images schema joins tile ids to blobs") {
    val tiles = MbtilesReader.read(spark, res("fixture_compact.mbtiles")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getAs[Array[Byte]]("bytes").toSeq).toMap
    assert(tiles.size == 3)
    // y is XYZ: the fixture's stored TMS rows 0/0/1 flip to 0/1/0
    assert(tiles((0, 0, 0)) == Seq[Byte](1, 2, 3))
    assert(tiles((1, 0, 1)) == Seq[Byte](1, 2, 3), "deduped blob shared")
    assert(tiles((1, 1, 0)) == Seq[Byte](9, 8))
    assert(MbtilesReader.metadata(res("fixture_compact.mbtiles")) ==
      Map("name" -> "fixture", "format" -> "pbf"))
  }

  test("mbtiles: plain tiles table") {
    val tiles = MbtilesReader.read(spark, res("fixture_plain.mbtiles")).collect()
    assert(tiles.length == 1)
    val t = tiles.head
    // stored TMS row 3 at z=2 flips to XYZ y 0
    assert(t.getInt(0) == 2 && t.getInt(1) == 1 && t.getInt(2) == 0)
    assert(t.getAs[Array[Byte]]("bytes").toSeq == Seq[Byte](7, 7, 7, 7))
  }

  test("sqlite IO is executor-side and scheme-agnostic: file:// Hadoop path") {
    // the Db pages through the Hadoop FileSystem (positioned reads +
    // LRU page cache) — an explicit scheme'd URI must work, and the
    // overflow-chain row must survive the paged read path
    val db = Sqlite.open("file://" + res("fixture.gpkg"))
    try {
      val rows = db.rows("lakes").toSeq
      assert(rows.length == 3)
      assert(rows.map(_._2("name").asInstanceOf[String]).count(_ == "X" * 5000) == 1)
    } finally db.close()
    // and the distributed readers accept the scheme'd path too
    val gp = GeoPackage.read(spark, "file://" + res("fixture.gpkg")).collect()
    assert(gp.length == 3)
  }

  test("sqlite paged reads: tiny cache still scans correctly") {
    // a 2-page LRU forces constant eviction — every page refetches via
    // positioned reads; results must equal the default-cache scan
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(res("fixture.gpkg")))
    val db = new Sqlite.Db(new Sqlite.BytesSource(bytes), cachePages = 2)
    val rows = db.rows("lakes").toSeq
    assert(rows.length == 3)
    assert(rows.map(_._2("name").asInstanceOf[String]).count(_ == "X" * 5000) == 1)
  }

  test("DSv2: spark.read.format(mbtiles) with zoom-filter pushdown") {
    // the registered short name resolves via the service loader; z/x/y
    // comparison predicates are pushed into the reader
    val df = spark.read.format("mbtiles").load(res("fixture_compact.mbtiles"))
    assert(df.schema.fieldNames.toSeq == Seq("z", "x", "y", "bytes"))
    assert(df.count() == 3)
    val z1 = df.where(org.apache.spark.sql.functions.col("z") === 1)
    val scanDesc = z1.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan.description()
    }.getOrElse(fail("no BatchScanExec in plan"))
    assert(scanDesc.contains("EqualTo(z,1)"), s"z filter not pushed: $scanDesc")
    val rows = z1.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    // y is XYZ: stored TMS rows 0/1 at z=1 flip to 1/0
    assert(rows == Set((1, 0, 1), (1, 1, 0)))
    // plain tiles table through the same format
    val plain = spark.read.format("mbtiles").load(res("fixture_plain.mbtiles")).collect()
    assert(plain.length == 1 && plain.head.getInt(0) == 2)
  }

  test("DSv2 mbtiles parallel read: rowid split keys -> range partitions, exact row set") {
    import spark.implicits._
    import graft.model.TileBytes
    import graft.geo.TileCoord
    // a generated archive big enough for a multi-page b-tree (the
    // streaming writer emits the compact map+images schema)
    val n = 4000
    val tiles = (0 until n).map { i =>
      val z = 7; val x = i % 128; val y = i / 128
      val id = TileCoord.encodeHilbert(x, y, z)
      TileBytes(id, z, x, y,
        Array.fill(40)((i % 251).toByte) ++ Array((i >> 8).toByte, i.toByte), 1, id)
    }.sortBy(_.tile_id)
    val path = java.nio.file.Files.createTempDirectory("graft_mbpar").toString + "/big.mbtiles"
    graft.engine.MbtilesArchive.write(
      tiles.toDS().coalesce(1).sortWithinPartitions("tile_id"), path, Map("name" -> "par"))
    val par = spark.read.format("mbtiles").option("maxpartitions", "8").load(path)
    assert(par.rdd.getNumPartitions >= 4,
      s"expected >=4 rowid range partitions, got ${par.rdd.getNumPartitions}")
    val scanDesc = par.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan.description()
    }.getOrElse(fail("no BatchScanExec"))
    assert(scanDesc.contains("rangePartitions="), scanDesc)
    val single = spark.read.format("mbtiles").option("maxpartitions", "1").load(path)
    assert(single.rdd.getNumPartitions == 1)
    assert(par.count() == n.toLong && single.count() == n.toLong)
    assert(par.exceptAll(single).count() == 0 && single.exceptAll(par).count() == 0)
  }

  test("DSv2 mbtiles write: sorted shards drain through the stream writer; round-trips") {
    import spark.implicits._
    import graft.model.TileBytes
    import graft.geo.TileCoord
    val n = 1500
    val tiles = (0 until n).map { i =>
      val z = 6; val x = i % 64; val y = i / 64
      val id = TileCoord.encodeHilbert(x, y, z)
      // every third tile shares content -> exercises blob dedup
      TileBytes(id, z, x, y, Array((i % 3).toByte, 5, 6), 1, (i % 3).toLong)
    }
    val out = java.nio.file.Files.createTempDirectory("graft_mbw").toString + "/w.mbtiles"
    tiles.toDF().repartition(4).orderBy("tile_id")
      .write.format("mbtiles").mode("overwrite")
      .option("meta.name", "dsv2").option("meta.format", "pbf")
      .save(out)
    assert(new java.io.File(out).isFile)
    assert(!new java.io.File(out + ".shards").exists(), "shard staging cleaned up")
    // stock sqlite3 accepts the archive
    val py =
      s"""import sqlite3
         |con = sqlite3.connect('$out')
         |assert con.execute('PRAGMA integrity_check').fetchone()[0] == 'ok'
         |assert con.execute('SELECT COUNT(*) FROM map').fetchone()[0] == $n
         |assert con.execute('SELECT COUNT(*) FROM images').fetchone()[0] == 3
         |assert dict(con.execute('SELECT name, value FROM metadata'))['name'] == 'dsv2'
         |""".stripMargin
    val buf = new StringBuilder
    val code = scala.sys.process.Process(Seq("python3", "-c", py))
      .!(scala.sys.process.ProcessLogger(l => buf.append(l).append('\n'),
        l => buf.append(l).append('\n')))
    assert(code == 0, s"python sqlite3 failed: $buf")
    // round-trip through the DSv2 reader (y flips back to XYZ): exact
    val back = spark.read.format("mbtiles").load(out)
    assert(back.count() == n)
    val got = back.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getAs[Array[Byte]]("bytes").toSeq)).toSet
    assert(got == tiles.map(t => (t.z, t.x, t.y, t.bytes.toSeq)).toSet)
    val r = back.where(org.apache.spark.sql.functions.col("z") === 6 &&
      org.apache.spark.sql.functions.col("x") === 5).collect()
    assert(r.nonEmpty && r.forall(_.getAs[Array[Byte]]("bytes").length == 3))
    // unsorted input rejected
    val bad = intercept[Exception] {
      tiles.reverse.toDF().coalesce(1)
        .write.format("mbtiles").mode("overwrite").save(out + "2")
    }
    assert(bad.getMessage != null)
  }

  test("natural earth: theme table scan with WKB geometry") {
    val rows = NaturalEarth.read(spark, res("fixture_ne.sqlite"), "ne_110m_lakes").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("fid") == 7L)
    val g = graft.geo.Geo.fromWkb(r.getAs[Array[Byte]]("geom"))
    assert(g.getCoordinate.x == 10.0 && g.getCoordinate.y == 20.0)
    assert(r.getAs[Map[String, String]]("attrs")("name") == "Lake One")
    assert(r.getAs[Map[String, String]]("attrs")("scalerank") == "2")
  }

  test("geopackage writer: real sqlite3 integrity + reader round trip") {
    val path = java.nio.file.Files.createTempDirectory("graft_gpkg_w").resolve("w.gpkg").toString
    val rows = (0 until 40).map { k =>
      (k * 1.5 - 20.0, k * 0.5 - 10.0, Seq(k.toString, s"name_$k"))
    }
    GeoPackage.writePoints(path, "pts", Seq("key", "name"), rows)
    // stock sqlite3 must accept the page image and see the meta tables
    val py =
      s"""import sqlite3
         |con = sqlite3.connect('$path')
         |assert con.execute('PRAGMA integrity_check').fetchone()[0] == 'ok'
         |assert con.execute('SELECT COUNT(*) FROM pts').fetchone()[0] == 40
         |t, d = con.execute('SELECT table_name, data_type FROM gpkg_contents').fetchone()
         |assert (t, d) == ('pts', 'features'), (t, d)
         |g = con.execute('SELECT geom FROM pts LIMIT 1').fetchone()[0]
         |assert g[:2] == b'GP', g[:2]
         |print('OK')
         |""".stripMargin
    val outBuf = new StringBuilder
    val code = scala.sys.process.Process(Seq("python3", "-c", py))
      .!(scala.sys.process.ProcessLogger(l => outBuf.append(l).append('\n'), l => outBuf.append(l).append('\n')))
    assert(code == 0, s"python sqlite3 failed: $outBuf")
    // our own reader sees the same features with unwrapped WKB
    val back = GeoPackage.read(spark, path).collect()
    assert(back.length == 40)
    val byKey = back.map(r => r.getAs[Map[String, String]]("attrs")("key") -> r).toMap
    val g7 = graft.geo.Geo.fromWkb(byKey("7").getAs[Array[Byte]]("geom"))
    assert(g7.getCoordinate.x == 7 * 1.5 - 20.0 && g7.getCoordinate.y == 7 * 0.5 - 10.0)
    assert(byKey("7").getAs[Map[String, String]]("attrs")("name") == "name_7")
  }

  test("line + polygon-with-hole writers round-trip geometry-exactly") {
    val gf = graft.geo.Geo.factory
    def c(x: Double, y: Double) = new org.locationtech.jts.geom.Coordinate(x, y)
    val dir = java.nio.file.Files.createTempDirectory("graft_w_lines")

    // shapefile polylines (incl. a MultiLineString -> two parts)
    val l1 = gf.createLineString(Array(c(0, 0), c(2, 0), c(2, 3)))
    val l2 = gf.createMultiLineString(Array(
      gf.createLineString(Array(c(10, 10), c(11, 10))),
      gf.createLineString(Array(c(12, 12), c(13, 13), c(14, 12)))))
    val base = dir.resolve("roads").toString
    Shapefile.writeGeoms(base, 3,
      Seq(l1 -> Seq("a"), l2 -> Seq("b")), Seq(("NAME", 8)),
      spark.sparkContext.hadoopConfiguration)
    val linesBack = Shapefile.read(spark, base + ".shp").collect()
      .map(r => r.getAs[Map[String, String]]("attrs")("NAME") ->
        graft.geo.Geo.fromWkb(r.getAs[Array[Byte]]("geom"))).toMap
    assert(linesBack("a").equalsExact(l1), s"got ${linesBack("a")}")
    assert(linesBack("b").equalsExact(l2), s"got ${linesBack("b")}")

    // shapefile polygon with hole
    val shell = gf.createLinearRing(Array(c(0, 0), c(4, 0), c(4, 4), c(0, 4), c(0, 0)))
    val hole = gf.createLinearRing(Array(c(1, 1), c(2, 1), c(2, 2), c(1, 2), c(1, 1)))
    val poly = gf.createPolygon(shell, Array(hole))
    val pbase = dir.resolve("lakes").toString
    Shapefile.writeGeoms(pbase, 5, Seq((poly, Seq("lake"))), Seq(("NAME", 8)),
      spark.sparkContext.hadoopConfiguration)
    val polyBack = graft.geo.Geo.fromWkb(
      Shapefile.read(spark, pbase + ".shp").collect().head.getAs[Array[Byte]]("geom"))
      .asInstanceOf[org.locationtech.jts.geom.Polygon]
    assert(polyBack.getNumInteriorRing == 1)
    assert(polyBack.getArea == 16.0 - 1.0)
    assert(polyBack.norm().equalsExact(poly.norm()), s"got $polyBack")

    // geopackage polygon with hole through writeFeatures
    val gp = dir.resolve("w.gpkg").toString
    GeoPackage.writeFeatures(gp, "lakes", Seq("key"),
      Seq((graft.geo.Geo.toWkb(poly), Seq("7"))), geometryType = "POLYGON")
    val gpBack = GeoPackage.read(spark, gp).collect()
    assert(gpBack.length == 1)
    val gpPoly = graft.geo.Geo.fromWkb(gpBack.head.getAs[Array[Byte]]("geom"))
    assert(gpPoly.norm().equalsExact(poly.norm()))
    assert(gpBack.head.getAs[Map[String, String]]("attrs")("key") == "7")
  }

  test("dsv2 format(shapefile)/format(geopackage) match the library readers") {
    // shapefile fixture via the writer
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_vec")
    val base = dir.resolve("pts").toString
    val rows = (0 until 30).map(k => (k * 2.0 - 20.0, k * 1.0 - 10.0, Seq(s"n$k")))
    Shapefile.writePoints(base, rows, Seq(("NAME", 16)),
      spark.sparkContext.hadoopConfiguration)
    val viaFormat = spark.read.format("shapefile").load(base + ".shp").collect()
    val viaLib = Shapefile.read(spark, base + ".shp").collect()
    assert(viaFormat.length == 30 && viaLib.length == 30)
    val a = viaFormat.map(r => (r.getLong(r.fieldIndex("fid")),
      r.getAs[Map[String, String]]("attrs")("NAME"))).toSet
    val b = viaLib.map(r => (r.getInt(r.fieldIndex("record")).toLong,
      r.getAs[Map[String, String]]("attrs")("NAME"))).toSet
    assert(a == b)

    // geopackage fixture via the writer; option("table") restricts
    val gp = dir.resolve("x.gpkg").toString
    GeoPackage.writePoints(gp, "pts", Seq("key"),
      (0 until 12).map(k => (k * 1.0, k * 0.5, Seq(k.toString))))
    val g1 = spark.read.format("geopackage").load(gp)
    assert(g1.count() == 12)
    assert(g1.select("source").distinct().collect().map(_.getString(0)).toSeq == Seq("pts"))
    val none = spark.read.format("geopackage").option("table", "absent").load(gp)
    assert(none.count() == 0)
    val k7 = g1.collect().find(_.getAs[Map[String, String]]("attrs")("key") == "7").get
    val geom = graft.geo.Geo.fromWkb(k7.getAs[Array[Byte]]("geom"))
    assert(geom.getCoordinate.x == 7.0 && geom.getCoordinate.y == 3.5)
  }

  test("INTEGER PRIMARY KEY via table constraint is a rowid alias, not null") {
    // sqlite stores x as NULL in each record for BOTH declaration forms;
    // the reader must alias it back to the rowid for `PRIMARY KEY(x)` too
    val path = java.nio.file.Files.createTempDirectory("graft_ipk")
      .resolve("tc.db").toString
    val py =
      s"""import sqlite3
         |con = sqlite3.connect('$path')
         |con.execute("CREATE TABLE t(x INTEGER, y TEXT, PRIMARY KEY(x))")
         |con.execute("INSERT INTO t VALUES (5, 'a'), (9, 'b')")
         |con.commit(); con.close()
         |""".stripMargin
    assert(scala.sys.process.Process(Seq("python3", "-c", py)).! == 0)
    val db = Sqlite.open(path)
    assert(db.columns("t") == Seq(("x", true), ("y", false)))
    val got = db.rows("t").map(_._2).toSeq.sortBy(_("y").toString)
    assert(got.map(m => (m("x"), m("y"))) == Seq((5L, "a"), (9L, "b")))
  }

  test("columns named checksum/unique_id survive; table names case-insensitive") {
    // constraint-keyword PREFIXES must not be treated as table
    // constraints (dropping one would shift every later column), and
    // sqlite identifiers are case-insensitive (CREATE TABLE Tiles ==
    // lookup "tiles")
    val path = java.nio.file.Files.createTempDirectory("graft_colnames")
      .resolve("c.db").toString
    val py =
      s"""import sqlite3
         |con = sqlite3.connect('$path')
         |con.execute('''CREATE TABLE Tiles (
         |  fid INTEGER PRIMARY KEY,
         |  checksum TEXT,
         |  unique_id TEXT,
         |  constraint_level INTEGER,
         |  name TEXT,
         |  CHECK (constraint_level >= 0),
         |  UNIQUE (unique_id))''')
         |con.execute("INSERT INTO Tiles VALUES (1, 'abc', 'u1', 7, 'Alpha')")
         |con.commit(); con.close()
         |""".stripMargin
    assert(scala.sys.process.Process(Seq("python3", "-c", py)).! == 0)
    val db = Sqlite.open(path)
    assert(db.tableRoot("tiles").isDefined, "case-insensitive table lookup")
    assert(db.columnNames("tiles") ==
      Seq("fid", "checksum", "unique_id", "constraint_level", "name"))
    val row = db.rows("TILES").next()._2
    assert(row("checksum") == "abc" && row("unique_id") == "u1" &&
      row("constraint_level") == 7L && row("name") == "Alpha")
  }

  test("DSv2 mbtiles write: empty input commits a valid metadata-only archive") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_mbempty").toString + "/e.mbtiles"
    Seq.empty[graft.model.TileBytes].toDF()
      .write.format("mbtiles").mode("overwrite")
      .option("meta.name", "empty").save(out)
    assert(new java.io.File(out).isFile)
    assert(spark.read.format("mbtiles").load(out).count() == 0)
    assert(MbtilesReader.metadata(out)("name") == "empty")
  }
}
