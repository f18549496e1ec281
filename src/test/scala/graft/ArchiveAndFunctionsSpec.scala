package graft

import graft.engine._
import graft.functions.GeoFunctions
import graft.geo.{Mercator, TileCoord}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ArchiveAndFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("clustered archive: ordered drain, content dedup, random access read-back") {
    // polygon-only corpus: interior fill tiles of one admin rect share
    // identical bytes -> content dedup must kick in
    val docs = Docs.polygonDocs(spark, "/root/testdata/sf0.001")
    val profile = new Pipeline.GraftProfile(5, 5, 5)
    val tiles = Pipeline.tiles(docs, profile, numPartitions = 4, gzipTiles = true)
    val path = java.nio.file.Files.createTempDirectory("graft_arc").toString + "/t.grft"
    val meta = """{"name":"test"}"""
    val (n, unique) = ClusteredArchive.write(tiles, path, meta)
    assert(n == TileCoord.pyramidSize(5))
    assert(unique < n, "world-covering fills must dedup")
    val r = new ClusteredArchive.Reader(path)
    try {
      assert(r.tileCount == n)
      assert(r.metadata == meta)
      assert(r.tileIds == r.tileIds.sorted)
      // random access: decode a mid-pyramid tile
      val id = r.tileIds(r.tileCount / 2)
      val bytes = r.tile(id).get
      val dec = Mvt.decodeTile(Mvt.gunzip(bytes))
      assert(dec.nonEmpty)
      assert(r.tile(Long.MaxValue).isEmpty)
    } finally r.close()
  }

  test("tile stats: per-zoom aggregates, top-N, dedup ratio") {
    val docs = Docs.polygonDocs(spark, "/root/testdata/sf0.001")
    val tiles = Pipeline.tiles(docs, new Pipeline.GraftProfile(4, 4, 4), 4, gzipTiles = false)
      .cache()
    val perZoom = TileStats.perZoom(tiles).collect()
    assert(perZoom.length == 5)
    assert(perZoom.map(_.getAs[Long]("tiles")).sum == tiles.count())
    val top = TileStats.topBiggest(tiles, 3).collect()
    assert(top.length == 3)
    assert(top(0).getAs[Int]("bytes") >= top(1).getAs[Int]("bytes"))
    val dedup = TileStats.dedupStats(tiles).collect()
    assert(dedup.exists(r => r.getAs[Long]("unique") < r.getAs[Long]("tiles")))
    val meta = TileStats.metadataJson(tiles, "t", Seq("points", "lines", "admin"))
    assert(meta.contains("\"maxzoom\":4"))
    tiles.unpersist()
  }

  test("codegen'd geo expressions match pure-scala and register for SQL") {
    GeoFunctions.register(spark)
    val df = Seq((13.37, 43.7, 7), (-120.0, -45.0, 7), (0.0, 0.0, 3)).toDF("lon", "lat", "z")
    df.createOrReplaceTempView("pts")
    val viaSql = spark.sql(
      """SELECT world_x(lon) AS wx, world_y(lat) AS wy, tile_id(lon, lat, z) AS tid,
                meters_between(lon, lat, 0.0D, 0.0D) AS m
         FROM pts""").collect()
    val expected = Seq((13.37, 43.7, 7), (-120.0, -45.0, 7), (0.0, 0.0, 3)).map {
      case (lon, lat, z) =>
        (Mercator.worldX(lon), Mercator.worldY(lat), TileCoord.hilbertIdOf(lon, lat, z),
          Mercator.metersBetween(lon, lat, 0, 0))
    }
    viaSql.zip(expected).foreach { case (row, (wx, wy, tid, m)) =>
      assert(row.getDouble(0) == wx && row.getDouble(1) == wy)
      assert(row.getLong(2) == tid)
      assert(math.abs(row.getDouble(3) - m) < 1e-6)
    }
    // whole-stage codegen actually covers the projection (no fallback);
    // use a file-backed scan (a local Seq constant-folds to LocalTableScan)
    val fileDf = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(GeoFunctions.world_x(col("o_totalprice") % 360 - 180).as("wx"))
    val plan = fileDf.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan) // "*(n)" marks whole-stage codegen
    assert(fileDf.count() > 0)
  }

  test("st_ geometry expressions over WKB") {
    GeoFunctions.register(spark)
    val df = Seq(
      ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", 1),
      ("LINESTRING (0 0, 10 0)", 2)).toDF("wkt", "id")
    df.createOrReplaceTempView("geoms")
    val out = spark.sql(
      """SELECT id, st_centroid(st_geomfromtext(wkt)) AS c,
                st_length_meters(st_geomfromtext(wkt)) AS len,
                st_area_meters(st_geomfromtext(wkt)) AS area
         FROM geoms ORDER BY id""").collect()
    val c0 = graft.geo.Geo.fromWkb(out(0).getAs[Array[Byte]]("c"))
    assert(c0.getCoordinate.x == 2.0 && c0.getCoordinate.y == 2.0)
    assert(out(0).getAs[Double]("area") > 1e9) // 4x4 deg
    assert(math.abs(out(1).getAs[Double]("len") - 10 * 111195) < 5000)
  }

  test("lineage: per-partition row counts captured through assemble") {
    val docs = Docs.docs(spark, "/root/testdata/sf0.001")
    val acc = spark.sparkContext.collectionAccumulator[graft.model.PartitionLineage]("lin")
    val rendered = Pipeline.renderedFromDocs(docs, new Pipeline.GraftProfile(3, 3, 3), 4)
    val tiles = TileAssembler.assemble(rendered, new Pipeline.GraftProfile(3, 3, 3), 4,
      gzipTiles = false, lineage = Some(acc), persistBeforeShuffle = false)
    val total = tiles.count()
    val lin = acc.value
    assert(!lin.isEmpty)
    import scala.jdk.CollectionConverters._
    val rows = lin.asScala.map(_.row_count).sum
    assert(rows > 0)
    // every partition's key range is disjoint and ordered (range shuffle)
    val ranges = lin.asScala.filter(_.row_count > 0).toSeq.sortBy(_.partition_id)
    ranges.sliding(2).foreach {
      case Seq(a, b) => assert(a.max_key < b.min_key)
      case _ =>
    }
  }
}
