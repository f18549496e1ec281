package graft

import graft.dsl.ConfigProfile
import graft.engine.{Docs, Mvt, Pipeline, WaySplitter}
import graft.sources.GeoJson
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourcesAndConfigSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("geojson: all geometry types parse to JTS") {
    val cases = Seq(
      ("""{"type":"Point","coordinates":[1.5,2.5]}""", "Point"),
      ("""{"type":"MultiPoint","coordinates":[[1,2],[3,4]]}""", "MultiPoint"),
      ("""{"type":"LineString","coordinates":[[0,0],[1,1]]}""", "LineString"),
      ("""{"type":"MultiLineString","coordinates":[[[0,0],[1,1]],[[2,2],[3,3]]]}""", "MultiLineString"),
      ("""{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,4],[0,0]],[[1,1],[2,1],[2,2],[1,2],[1,1]]]}""", "Polygon"),
      ("""{"type":"MultiPolygon","coordinates":[[[[0,0],[1,0],[1,1],[0,0]]]]}""", "MultiPolygon"),
      ("""{"type":"GeometryCollection","geometries":[{"type":"Point","coordinates":[0,0]}]}""", "GeometryCollection"))
    cases.foreach { case (json, expected) =>
      val g = GeoJson.parseGeometryJson(json)
      assert(g.getGeometryType == expected, json)
    }
    val poly = GeoJson.parseGeometryJson(
      """{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,4],[0,0]],[[1,1],[2,1],[2,2],[1,2],[1,1]]]}""")
    assert(math.abs(poly.getArea - 15.0) < 1e-9) // 16 - 1 hole
  }

  test("geojson reader: features -> docs -> full pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gj").toString
    val lines = Seq(
      """{"type":"Feature","id":"a","geometry":{"type":"Point","coordinates":[10,20]},"properties":{"name":"alpha","kind":"poi"}}""",
      """{"type":"FeatureCollection","features":[{"type":"Feature","geometry":{"type":"LineString","coordinates":[[0,0],[5,5]]},"properties":{"kind":"road"}}]}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "in.jsonl"),
      lines.mkString("\n").getBytes)
    val docs = GeoJson.readFeatures(spark, s"$dir/in.jsonl")
    val collected = docs.collect()
    assert(collected.length == 2)
    val a = collected.find(_.doc_id == "gj_a").get
    assert(a.spans.exists(s => s.kind == "text" && s.text == "name=alpha"))
    assert(a.spans.last.kind == "geom" && a.spans.last.text.startsWith("POINT"))
    // run the standard pipeline over the geojson-sourced docs
    val tiles = Pipeline.tiles(docs.toDF(), new Pipeline.GraftProfile(2, 2, 2), 2, gzipTiles = false)
    assert(tiles.count() > 0)
  }

  test("config profile: filters, attr mappings, per-zoom attrs") {
    val config =
      """{
        "layers": [
          {"name": "pois", "geometry": "point", "minzoom": 2, "maxzoom": 6,
           "filter": {"matchAny": {"field": "kind", "values": ["poi", "%shop%"]}},
           "attrs": [{"key": "class", "tag": "kind"},
                     {"key": "nm", "tag": "name", "minzoom": 5},
                     {"key": "static", "value": "yes"}]},
          {"name": "rest", "geometry": "any", "minzoom": 0, "maxzoom": 3,
           "filter": {"not": {"matchField": "kind"}}}
        ]
      }"""
    val profile = ConfigProfile.compile(config)
    assert(profile.layers == Vector("pois", "rest"))

    import graft.model.{Doc, Span}
    val docs = Seq(
      Doc("d1", Seq(Span("text", "name=cafe", null, 0), Span("text", "kind=poi", null, 1),
        Span("geom", "POINT (10 10)", null, 2))),
      Doc("d2", Seq(Span("geom", "POINT (20 20)", null, 0)))).toDF("doc_id", "spans")

    // docs' tags come from the generic extraction (first text span), so
    // build SourceFeatures manually for the config semantics
    val sf1 = graft.model.SourceFeature("d1", "d",
      graft.geo.Geo.toWkb(graft.geo.Geo.point(10, 10)),
      Map("kind" -> "poi", "name" -> "cafe"), 1L)
    val sf2 = graft.model.SourceFeature("d2", "d",
      graft.geo.Geo.toWkb(graft.geo.Geo.point(20, 20)), Map.empty, 2L)

    val specs1 = profile.processFeature(sf1).toSeq
    assert(specs1.size == 1)
    assert(specs1.head.layer == "pois")
    assert(specs1.head.attrs == Map("class" -> "poi", "static" -> "yes"))
    assert(specs1.head.zoomAttrs == Seq((5, Map("nm" -> "cafe"))))
    val specs2 = profile.processFeature(sf2).toSeq
    assert(specs2.map(_.layer) == Seq("rest"))

    // per-zoom attrs materialize at the right zooms through render
    val rendered = graft.engine.Render.renderOne(specs1.head
      .copy(geom = graft.engine.Render.worldWkb(graft.geo.Geo.point(10, 10)))).toSeq
    val z4 = rendered.filter(r => graft.geo.TileCoord.decodeHilbert(r.tile_id)._3 == 4)
    val z5 = rendered.filter(r => graft.geo.TileCoord.decodeHilbert(r.tile_id)._3 == 5)
    assert(z4.forall(r => !graft.engine.Attrs.unpack(r.attrs).contains("nm")))
    assert(z5.forall(r => graft.engine.Attrs.unpack(r.attrs)("nm") == "cafe"))
  }

  test("inline scripts: parse, eval, null propagation, constant fold") {
    import graft.dsl.Script
    def ev(s: String, tags: Map[String, String] = Map.empty, id: Long = 7, src: String = "osm") =
      Script.compile(s).eval(tags, id, src)
    assert(ev("${ 8 * 24 - 2 }") == 190L)
    assert(ev("${ feature.tags.highway.replace('_link', '') }",
      Map("highway" -> "motorway_link")) == "motorway")
    assert(ev("${ feature.tags.missing }") == null)
    assert(ev("${ coalesce(feature.tags.a, feature.tags.b, 'dflt') }", Map("b" -> "x")) == "x")
    assert(ev("${ feature.id % 2 == 0 ? 'even' : 'odd' }", id = 4) == "even")
    assert(ev("${ double(feature.tags.voltage) > 1000 }", Map("voltage" -> "1500")) == true)
    assert(ev("${ feature.tags[\"weird key\"] }", Map("weird key" -> "v")) == "v")
    assert(ev("${ has(feature.tags.x) }", Map("x" -> "1")) == true)
    assert(ev("${ has(feature.tags.x) }") == false)
    assert(ev("${ feature.source + ':' + string(feature.id) }") == "osm:7")
    assert(ev("${ -3 + 2 * 5 }") == 7L)
    assert(ev("${ (1 + 2) * 3.5 }") == 10.5)
    // constant folding: node reduces to a literal at compile time
    assert(Script.compile("${ 'a' + 'b' + 'c' }").node == Script.Lit("abc"))
    assert(Script.compile("${ min(3, 1, 2) }").node == Script.Lit(1L))
    // malformed numeric tags yield null, never a task-killing
    // NumberFormatException (lanes="1;2" is routine OSM data)
    assert(ev("${ feature.tags.lanes > 2 }", Map("lanes" -> "1;2")) == null)
    assert(ev("${ min(feature.tags.lanes, 3) }", Map("lanes" -> "1;2")) == null)
    // escape sequences decode to control characters, not letters
    assert(ev("${ feature.tags.nm.replace('\\n', ' ') }",
      Map("nm" -> "a\nb")) == "a b")
  }

  test("config profile: computed attr scripts per feature") {
    val config =
      """{"layers": [
           {"name": "pts", "geometry": "point", "minzoom": 0, "maxzoom": 2,
            "filter": true,
            "attrs": [
              {"key": "norm", "value": "${ feature.tags.text.replace('order ', '') }"},
              {"key": "konst", "value": "${ 2 + 3 }"},
              {"key": "plain", "value": "static"}]}
         ]}"""
    val profile = ConfigProfile.compile(config)
    val docs = Seq(
      ("doc_1", Seq(graft.model.Span("text", "order F high", null, 0),
        graft.model.Span("geom", "POINT (1 1)", null, 1)))
    ).toDF("doc_id", "spans")
    val tiles = Pipeline.tiles(docs, profile, 2, gzipTiles = false).collect()
    val feats = tiles.flatMap(t => Mvt.decodeTile(t.bytes))
    assert(feats.nonEmpty)
    assert(feats.forall(_.attrs("norm") == "F high"))
    assert(feats.forall(_.attrs("konst") == "5"))
    assert(feats.forall(_.attrs("plain") == "static"))
  }

  test("shapefile reader: points, polylines, polygons with holes, dbf attrs") {
    import graft.sources.Shapefile
    import java.nio.{ByteBuffer, ByteOrder}

    // ---- build a tiny .shp by hand (spec: 100B header + records) ----
    def pointContent(x: Double, y: Double): Array[Byte] = {
      val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(1).putDouble(x).putDouble(y).array()
    }
    def polyContent(shapeType: Int, parts: Seq[Array[(Double, Double)]]): Array[Byte] = {
      val numPoints = parts.map(_.length).sum
      val b = ByteBuffer.allocate(44 + 4 * parts.length + 16 * numPoints)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(shapeType)
      b.putDouble(0).putDouble(0).putDouble(100).putDouble(100) // bbox (unused)
      b.putInt(parts.length).putInt(numPoints)
      var acc = 0
      parts.foreach { p => b.putInt(acc); acc += p.length }
      parts.foreach(_.foreach { case (x, y) => b.putDouble(x).putDouble(y) })
      b.array()
    }
    def shpBytes(shapeType: Int, contents: Seq[Array[Byte]]): Array[Byte] = {
      val total = 100 + contents.map(8 + _.length).sum
      val b = ByteBuffer.allocate(total)
      b.order(ByteOrder.BIG_ENDIAN).putInt(0, 9994)
      b.putInt(24, total / 2)
      b.order(ByteOrder.LITTLE_ENDIAN).putInt(28, 1000).putInt(32, shapeType)
      var pos = 100
      contents.zipWithIndex.foreach { case (c, i) =>
        b.order(ByteOrder.BIG_ENDIAN).putInt(pos, i + 1).putInt(pos + 4, c.length / 2)
        var j = 0
        while (j < c.length) { b.put(pos + 8 + j, c(j)); j += 1 }
        pos += 8 + c.length
      }
      b.array()
    }
    def dbfBytes(fields: Seq[(String, Int)], rows: Seq[Seq[String]]): Array[Byte] = {
      val recordSize = 1 + fields.map(_._2).sum
      val headerSize = 32 + 32 * fields.length + 1
      val b = ByteBuffer.allocate(headerSize + recordSize * rows.length + 1)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(0, 3.toByte)
      b.putInt(4, rows.length)
      b.putShort(8, headerSize.toShort)
      b.putShort(10, recordSize.toShort)
      fields.zipWithIndex.foreach { case ((name, len), i) =>
        val off = 32 + 32 * i
        name.getBytes("ISO-8859-1").take(10).zipWithIndex.foreach { case (c, j) => b.put(off + j, c) }
        b.put(off + 11, 'C'.toByte)
        b.put(off + 16, len.toByte)
      }
      b.put(headerSize - 1, 0x0d.toByte)
      rows.zipWithIndex.foreach { case (row, r) =>
        val off = headerSize + r * recordSize
        b.put(off, 0x20.toByte)
        var fo = off + 1
        fields.zip(row).foreach { case ((_, len), v) =>
          val padded = v.padTo(len, ' ').take(len)
          padded.getBytes("ISO-8859-1").zipWithIndex.foreach { case (c, j) => b.put(fo + j, c) }
          fo += len
        }
      }
      b.array()
    }

    val dir = java.nio.file.Files.createTempDirectory("graft_shp")
    // polygons: a 10x10 square with a 2x2 hole (shapefile: shell CW, hole CCW)
    val shell = Array((0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0))
    val hole = Array((4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0))
    java.nio.file.Files.write(dir.resolve("polys.shp"),
      shpBytes(5, Seq(polyContent(5, Seq(shell, hole)))))
    java.nio.file.Files.write(dir.resolve("polys.dbf"),
      dbfBytes(Seq(("name", 12)), Seq(Seq("big square"))))
    java.nio.file.Files.write(dir.resolve("pts.shp"),
      shpBytes(1, Seq(pointContent(1.5, 2.5), pointContent(-3.0, 4.0))))
    java.nio.file.Files.write(dir.resolve("pts.dbf"),
      dbfBytes(Seq(("kind", 8)), Seq(Seq("alpha"), Seq("beta"))))
    java.nio.file.Files.write(dir.resolve("lines.shp"),
      shpBytes(3, Seq(polyContent(3, Seq(Array((0.0, 0.0), (5.0, 5.0), (9.0, 5.0)))))))

    val df = Shapefile.read(spark, dir.toString).collect()
    assert(df.length == 4)
    val rows = df.map { r =>
      (r.getAs[String]("path").split('/').last,
        graft.geo.Geo.fromWkb(r.getAs[Array[Byte]]("geom")),
        r.getAs[Map[String, String]]("attrs"))
    }
    val poly = rows.find(_._1 == "polys.shp").get
    assert(poly._2.isInstanceOf[org.locationtech.jts.geom.Polygon])
    assert(math.abs(poly._2.getArea - (100 - 4)) < 1e-9, "hole subtracted")
    assert(poly._3("name") == "big square")
    val pts = rows.filter(_._1 == "pts.shp")
    assert(pts.map(_._3("kind")).toSet == Set("alpha", "beta"))
    assert(pts.exists(p => p._2.getCoordinate.x == 1.5 && p._2.getCoordinate.y == 2.5))
    val line = rows.find(_._1 == "lines.shp").get
    assert(line._2.isInstanceOf[org.locationtech.jts.geom.LineString])
    assert(line._2.getLength > 0)
  }

  test("shapefile CRS: 3857 .prj reprojects to lon/lat; unsupported CRS fails loudly") {
    import graft.sources.Shapefile
    import java.nio.{ByteBuffer, ByteOrder}
    def pointShp(x: Double, y: Double): Array[Byte] = {
      val content = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(1).putDouble(x).putDouble(y).array()
      val total = 100 + 8 + content.length
      val b = ByteBuffer.allocate(total)
      b.order(ByteOrder.BIG_ENDIAN).putInt(0, 9994)
      b.putInt(24, total / 2)
      b.order(ByteOrder.LITTLE_ENDIAN).putInt(28, 1000).putInt(32, 1)
      b.order(ByteOrder.BIG_ENDIAN).putInt(100, 1).putInt(104, content.length / 2)
      content.zipWithIndex.foreach { case (c, j) => b.put(108 + j, c) }
      b.array()
    }
    val mercWkt = """PROJCS["WGS_1984_Web_Mercator_Auxiliary_Sphere",GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]]],PROJECTION["Mercator_Auxiliary_Sphere"],AUTHORITY["EPSG",3857]]"""
    val bngWkt = """PROJCS["British_National_Grid",GEOGCS["GCS_OSGB_1936",DATUM["D_OSGB_1936",SPHEROID["Airy_1830",6377563.396,299.3249646],TOWGS84[446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894]],UNIT["Degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],PARAMETER["latitude_of_origin",49],PARAMETER["central_meridian",-2],PARAMETER["scale_factor",0.9996012717],PARAMETER["false_easting",400000],PARAMETER["false_northing",-100000],UNIT["Meter",1]]"""
    val sinuWkt = """PROJCS["World_Sinusoidal",GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]]],PROJECTION["Sinusoidal"],PARAMETER["central_meridian",0],UNIT["Meter",1]]"""
    // forward 3857 of (lon=30, lat=10)
    val r = graft.geo.Crs.EarthRadius
    val mx = r * math.toRadians(30.0)
    val my = r * math.log(math.tan(math.Pi / 4 + math.toRadians(10.0) / 2))

    val dir = java.nio.file.Files.createTempDirectory("graft_shpcrs")
    java.nio.file.Files.write(dir.resolve("merc.shp"), pointShp(mx, my))
    java.nio.file.Files.write(dir.resolve("merc.prj"), mercWkt.getBytes("UTF-8"))
    val got = Shapefile.read(spark, dir.resolve("merc.shp").toString).collect()
    val pt = graft.geo.Geo.fromWkb(got.head.getAs[Array[Byte]]("geom")).getCoordinate
    assert(math.abs(pt.x - 30.0) < 1e-9 && math.abs(pt.y - 10.0) < 1e-9,
      s"web mercator shapefile must decode to lon/lat, got (${pt.x}, ${pt.y})")

    // a TM national grid .prj now reprojects through Proj (absolute
    // vectors pinned in ProjSpec; here the plumbing must agree with
    // the library's own transform for EPSG:27700)
    java.nio.file.Files.write(dir.resolve("bng.shp"), pointShp(531473.0, 181763.0))
    java.nio.file.Files.write(dir.resolve("bng.prj"), bngWkt.getBytes("UTF-8"))
    val bngGot = Shapefile.read(spark, dir.resolve("bng.shp").toString).collect()
    val bngPt = graft.geo.Geo.fromWkb(bngGot.head.getAs[Array[Byte]]("geom")).getCoordinate
    val (wantLon, wantLat) = graft.geo.Proj.osgb36.toWgs84(531473.0, 181763.0)
    assert(math.abs(bngPt.x - wantLon) < 1e-9 && math.abs(bngPt.y - wantLat) < 1e-9,
      s"BNG shapefile must reproject via osgb36, got (${bngPt.x}, ${bngPt.y})")

    // an unsupported projection METHOD must still fail, not emit garbage
    java.nio.file.Files.write(dir.resolve("sinu.shp"), pointShp(1000.0, 2000.0))
    java.nio.file.Files.write(dir.resolve("sinu.prj"), sinuWkt.getBytes("UTF-8"))
    val err = intercept[org.apache.spark.SparkException] {
      Shapefile.read(spark, dir.resolve("sinu.shp").toString).collect()
    }
    assert(err.getMessage.contains("unsupported") ||
      Option(err.getCause).exists(_.getMessage.contains("unsupported")))

    // srs-id classification for the geopackage path
    assert(graft.geo.Crs.fromSrsId(4326) == graft.geo.Crs.Wgs84)
    assert(graft.geo.Crs.fromSrsId(3857) == graft.geo.Crs.WebMercator)
    assert(graft.geo.Crs.fromSrsId(900913) == graft.geo.Crs.WebMercator)
    // known projected ids resolve without consulting the definition
    assert(graft.geo.Crs.fromSrsId(27700) == graft.geo.Crs.Projected(graft.geo.Proj.osgb36))
    assert(graft.geo.Crs.fromSrsId(27700, Some(mercWkt)) ==
      graft.geo.Crs.Projected(graft.geo.Proj.osgb36))
    // unknown id with a parseable TM definition resolves through it
    assert(graft.geo.Crs.fromSrsId(999901, Some(bngWkt)).isInstanceOf[graft.geo.Crs.Projected])
    // unknown id with an unsupported method still fails loudly
    intercept[IllegalArgumentException] { graft.geo.Crs.fromSrsId(999902, Some(sinuWkt)) }
    intercept[IllegalArgumentException] { graft.geo.Crs.fromSrsId(999903) }
  }

  test("way splitter: splits at shared interior nodes only") {
    val ways = Seq(
      (1L, Seq(10L, 11L, 12L, 13L)), // 12 shared with way 2 (interior)
      (2L, Seq(20L, 12L, 21L)),
      (3L, Seq(10L, 30L, 31L))) // 10 shared but only as ENDPOINT of 1 & 3
      .toDF("way_id", "nodes")
    val segs = WaySplitter.splitAtSharedNodes(ways)
      .as[(Long, Int, Seq[Long])].collect().groupBy(_._1)
    // way 1: split at node 12 -> [10,11,12], [12,13]
    assert(segs(1L).map(_._3).toSeq == Seq(Seq(10L, 11L, 12L), Seq(12L, 13L)))
    // way 2: split at its interior node 12 -> [20,12],[12,21]
    assert(segs(2L).map(_._3).toSeq == Seq(Seq(20L, 12L), Seq(12L, 21L)))
    // way 3: node 10 is an endpoint -> no split
    assert(segs(3L).map(_._3).toSeq == Seq(Seq(10L, 30L, 31L)))
  }

  test("way splitter is fully distributed: 500k shared nodes, no driver set") {
    // overlapping 3-node chains: way i = [i, i+1, i+2] — every node is
    // referenced by up to 3 ways, so ~N interior nodes are cuts; the
    // splitter must handle an intersection set this large as a JOIN
    // (the old driver collect().toSet would be the thing that breaks
    // at planet scale)
    val n = 500000L
    val ways = spark.range(n).select(col("id").as("way_id"),
      array(col("id"), col("id") + 1, col("id") + 2).as("nodes"))
    val segs = WaySplitter.splitAtSharedNodes(ways)
    // every way's single interior node (i+1) is shared (by ways i, i+1,
    // i+2) except at the chain ends -> 2 segments per way, 1 for the
    // edge ways whose interior node is shared anyway (i+1 shared for
    // all i in [0, n-1] since referenced by >=2 ways while n >= 2)
    assert(segs.count() == 2 * n)
    val w7 = segs.where(col("way_id") === 7)
      .orderBy("seg_idx").as[(Long, Int, Seq[Long])].collect()
    assert(w7.map(_._3).toSeq == Seq(Seq(7L, 8L), Seq(8L, 9L)))
    // and the physical plan has no broadcast-of-collected-set stage: the
    // cut markers arrive via a join on the node column
    val plan = segs.queryExecution.optimizedPlan.toString
    assert(plan.toLowerCase.contains("join"), s"expected a join-based plan:\n$plan")
  }
}
