package graft

import graft.engine.Osm
import graft.sources.OsmPbf
import org.apache.hadoop.conf.Configuration
import org.locationtech.jts.geom.{LineString, Point, Polygon}
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end `.osm.pbf` → SourceFeatures → tiles: the reference's
  * two-pass OSM reader re-expressed as distributed joins. */
class OsmPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val conf = new Configuration()

  private def n(id: Long, lon: Double, lat: Double,
                tags: (String, String)*): OsmPbf.Entity =
    OsmPbf.Entity("node", id, lat, lon, tags.toSeq, Array.empty,
      Array.empty, Array.empty, Array.empty, 1, 1600000000L, 1L, 1, "t")

  private def w(id: Long, refs: Seq[Long], tags: (String, String)*): OsmPbf.Entity =
    OsmPbf.Entity("way", id, Double.NaN, Double.NaN, tags.toSeq, refs.toArray,
      Array.empty, Array.empty, Array.empty, 1, 1600000000L, 1L, 1, "t")

  // world: a POI node, an open highway, a closed building, a closed
  // area=no highway loop, and a multipolygon park (outer minus hole)
  // whose member ways are untagged
  private val entities: Seq[OsmPbf.Entity] = {
    val poi = n(1, 10.001, 50.001, "amenity" -> "cafe", "name" -> "Cafe A")
    val roadNodes = Seq(n(10, 10.0, 50.0), n(11, 10.01, 50.0), n(12, 10.02, 50.005))
    val bldNodes = Seq(n(20, 10.1, 50.1), n(21, 10.102, 50.1),
      n(22, 10.102, 50.102), n(23, 10.1, 50.102))
    val loopNodes = Seq(n(30, 10.2, 50.2), n(31, 10.202, 50.2),
      n(32, 10.202, 50.202), n(33, 10.2, 50.202))
    val outerNodes = Seq(n(40, 10.3, 50.3), n(41, 10.31, 50.3),
      n(42, 10.31, 50.31), n(43, 10.3, 50.31))
    val holeNodes = Seq(n(50, 10.303, 50.303), n(51, 10.307, 50.303),
      n(52, 10.307, 50.307), n(53, 10.303, 50.307))
    val road = w(100, Seq(10L, 11L, 12L), "highway" -> "residential", "name" -> "R1")
    val building = w(101, Seq(20L, 21L, 22L, 23L, 20L), "building" -> "yes")
    val loop = w(102, Seq(30L, 31L, 32L, 33L, 30L), "highway" -> "service", "area" -> "no")
    val outer = w(103, Seq(40L, 41L, 42L, 43L, 40L))
    val hole = w(104, Seq(50L, 51L, 52L, 53L, 50L))
    val rel = OsmPbf.Entity("relation", 200, Double.NaN, Double.NaN,
      Seq("type" -> "multipolygon", "landuse" -> "park", "name" -> "Park P"),
      Array.empty, Array("way", "way"), Array(103L, 104L), Array("outer", "inner"),
      1, 1600000000L, 1L, 1, "t")
    (Seq(poi) ++ roadNodes ++ bldNodes ++ loopNodes ++ outerNodes ++ holeNodes) ++
      Seq(road, building, loop, outer, hole, rel)
  }

  private lazy val pbfPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_osm_e2e")
    val p = dir.resolve("world.osm.pbf").toString
    OsmPbf.write(p, conf, entities.iterator, bbox = Some((9.0, 49.0, 11.0, 51.0)))
    p
  }

  private lazy val features =
    Osm.sourceFeatures(spark.read.format("osmpbf").load(pbfPath)).collect()
      .map(f => f.doc_id -> f).toMap

  test("tagged node becomes a point feature") {
    val f = features("node/1")
    val g = graft.geo.Geo.fromWkb(f.geom)
    assert(g.isInstanceOf[Point])
    assert(g.getCoordinate.x == 10.001 && g.getCoordinate.y == 50.001)
    assert(f.tags("name") == "Cafe A")
  }

  test("open way becomes a line, closed building a polygon, area=no loop a line") {
    assert(graft.geo.Geo.fromWkb(features("way/100").geom).isInstanceOf[LineString])
    val bld = graft.geo.Geo.fromWkb(features("way/101").geom)
    assert(bld.isInstanceOf[Polygon], s"building was ${bld.getGeometryType}")
    assert(math.abs(bld.getArea - 0.002 * 0.002) < 1e-12)
    val loop = graft.geo.Geo.fromWkb(features("way/102").geom)
    assert(loop.isInstanceOf[LineString], "area=no keeps a closed highway a line")
    assert(loop.getCoordinates.length == 5)
  }

  test("multipolygon relation assembles outer ring with hole; member ways suppressed") {
    val park = graft.geo.Geo.fromWkb(features("relation/200").geom)
    val poly = park match {
      case p: Polygon => p
      case mp: org.locationtech.jts.geom.MultiPolygon =>
        mp.getGeometryN(0).asInstanceOf[Polygon]
      case other => fail(s"unexpected ${other.getGeometryType}")
    }
    assert(poly.getNumInteriorRing == 1, "park should carry its hole")
    val expected = 0.01 * 0.01 - 0.004 * 0.004
    assert(math.abs(poly.getArea - expected) < 1e-10)
    assert(features("relation/200").tags("landuse") == "park")
    assert(!features.contains("way/103") && !features.contains("way/104"),
      "untagged member ways must not emit standalone features")
  }

  test("incomplete way (missing node) drops; feature count is exact") {
    // entities plus a way referencing an absent node
    val broken = entities :+ w(105, Seq(10L, 999L), "highway" -> "path")
    val dir = java.nio.file.Files.createTempDirectory("graft_osm_broken")
    val p = dir.resolve("b.osm.pbf").toString
    OsmPbf.write(p, conf, broken.iterator)
    val fs = Osm.sourceFeatures(spark.read.format("osmpbf").load(p)).collect()
    assert(fs.map(_.doc_id).sorted.toSeq ==
      Seq("node/1", "relation/200", "way/100", "way/101", "way/102"))
  }

  test("LocationsOnWays: padded file yields identical features with NO node join") {
    val nodeLoc = entities.filter(_.kind == "node").map(n => n.id -> (n.lat, n.lon)).toMap
    val padded = entities.map { e =>
      if (e.kind != "way") e
      else e.copy(
        refLats = e.refs.map(r => nodeLoc(r)._1),
        refLons = e.refs.map(r => nodeLoc(r)._2))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_osm_low")
    val p = dir.resolve("padded.osm.pbf").toString
    OsmPbf.write(p, conf, padded.iterator, locationsOnWays = true)
    // decode round trip keeps the per-ref coords
    val backWay = OsmPbf.readAll(p, conf).find(e => e.kind == "way" && e.id == 100).get
    assert(backWay.refLats.toSeq == Seq(50.0, 50.0, 50.005))
    assert(backWay.refLons.toSeq == Seq(10.0, 10.01, 10.02))
    // identical features, and the padded branch carries every way (the
    // join branch input is empty)
    val df = spark.read.format("osmpbf").load(p)
    val fs = Osm.sourceFeatures(df).collect().map(f => f.doc_id -> f.geom.toSeq).toMap
    val want = features.map { case (k, f) => k -> f.geom.toSeq }
    assert(fs == want, "padded pipeline must reproduce the joined pipeline exactly")
    val wc = Osm.wayCoords(df)
    assert(wc.count() == 5)
    // all ways resolve through the no-join branch: dropping every node
    // row must change nothing
    val noNodes = Osm.wayCoords(df.where(org.apache.spark.sql.functions.col("kind") =!= "node"))
    assert(noNodes.count() == 5)
  }

  test("pbf -> tiles end-to-end") {
    val tiles = Osm.tiles(spark, pbfPath, numPartitions = 4).collect()
    assert(tiles.nonEmpty)
    assert(tiles.forall(_.bytes.nonEmpty))
    // the world is in one z4 tile; zoom 0 must have exactly one tile
    assert(tiles.count(_.z == 0) == 1)
  }
}
