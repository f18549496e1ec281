package graft

import graft.engine.Osm
import graft.sources.OsmPbf
import org.apache.hadoop.conf.Configuration
import org.locationtech.jts.geom.{LineString, Polygon}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Relation info on member ways + boundary-relation assembly + way
 * splitting (reference `OsmReader.java:87-94,563-607,683-701,922-962`,
 * `Profile.java:56-81`): route-relation tags must reach every member
 * way (including through super-relations), `type=boundary` relations
 * must ring-assemble like multipolygons, and `splitWays=true` must
 * split line ways at shared interior nodes end-to-end.
 */
class OsmRelationInfoSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val conf = new Configuration()

  private def n(id: Long, lon: Double, lat: Double,
                tags: (String, String)*): OsmPbf.Entity =
    OsmPbf.Entity("node", id, lat, lon, tags.toSeq, Array.empty,
      Array.empty, Array.empty, Array.empty, 1, 1600000000L, 1L, 1, "t")

  private def w(id: Long, refs: Seq[Long], tags: (String, String)*): OsmPbf.Entity =
    OsmPbf.Entity("way", id, Double.NaN, Double.NaN, tags.toSeq, refs.toArray,
      Array.empty, Array.empty, Array.empty, 1, 1600000000L, 1L, 1, "t")

  private def r(id: Long, members: Seq[(String, Long, String)],
                tags: (String, String)*): OsmPbf.Entity =
    OsmPbf.Entity("relation", id, Double.NaN, Double.NaN, tags.toSeq, Array.empty,
      members.map(_._1).toArray, members.map(_._2).toArray, members.map(_._3).toArray,
      1, 1600000000L, 1L, 1, "t")

  private def writePbf(entities: Seq[OsmPbf.Entity]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_relinfo")
    val p = dir.resolve("t.osm.pbf").toString
    OsmPbf.write(p, conf, entities.iterator)
    p
  }

  // world: two bus-route ways (one shared in both directions), a
  // super-relation over one route, and an admin boundary made of two
  // untagged ways forming a square
  private val entities: Seq[OsmPbf.Entity] = {
    val ns = Seq(
      n(1, 10.00, 50.00), n(2, 10.01, 50.00), n(3, 10.02, 50.00),
      n(4, 10.02, 50.01),
      // boundary square
      n(10, 11.0, 51.0), n(11, 11.01, 51.0), n(12, 11.01, 51.01), n(13, 11.0, 51.01))
    val w100 = w(100, Seq(1L, 2L, 3L), "highway" -> "primary", "name" -> "Main")
    val w101 = w(101, Seq(3L, 4L), "highway" -> "secondary")
    val w102 = w(102, Seq(10L, 11L, 12L)) // untagged boundary half
    val w103 = w(103, Seq(12L, 13L, 10L)) // untagged boundary half
    val route1 = r(500, Seq(("way", 100L, "forward"), ("way", 101L, "")),
      "type" -> "route", "route" -> "bus", "ref" -> "R1")
    val route2 = r(501, Seq(("way", 100L, "backward")),
      "type" -> "route", "route" -> "bus", "ref" -> "R2")
    val superRel = r(600, Seq(("relation", 500L, "")),
      "type" -> "route", "route" -> "bus", "ref" -> "SR")
    val boundary = r(700, Seq(("way", 102L, "outer"), ("way", 103L, "outer")),
      "type" -> "boundary", "boundary" -> "administrative", "admin_level" -> "4",
      "name" -> "State S")
    ns ++ Seq(w100, w101, w102, w103, route1, route2, superRel, boundary)
  }

  private lazy val features =
    Osm.sourceFeatures(spark.read.format("osmpbf").load(writePbf(entities)))
      .collect().map(f => f.doc_id -> f).toMap

  test("route relation info attaches to member ways with roles") {
    val f = features("way/101")
    assert(f.relations.map(m => (m.rel_id, m.role)) == Seq((500L, ""), (600L, "")))
    assert(f.relations.head.rel_tags("ref") == "R1")
  }

  test("way in two routes carries both memberships, sorted by (rel_id, role)") {
    val f = features("way/100")
    assert(f.relations.map(m => (m.rel_id, m.role)) ==
      Seq((500L, "forward"), (501L, "backward"), (600L, "")))
    assert(f.relations.map(_.rel_tags("ref")) == Seq("R1", "R2", "SR"))
  }

  test("super-relation membership resolves transitively with the entering-edge role") {
    assert(features("way/101").relations.exists(m =>
      m.rel_id == 600L && m.rel_tags("ref") == "SR"))
    // way 100 is NOT a member of SR via route2 (501 has no parent)
    assert(features("way/100").relations.count(_.rel_id == 600L) == 1)
  }

  test("type=boundary relation ring-assembles; untagged member ways suppressed") {
    val b = features("relation/700")
    val g = graft.geo.Geo.fromWkb(b.geom)
    val poly = g match {
      case p: Polygon => p
      case mp: org.locationtech.jts.geom.MultiPolygon => mp.getGeometryN(0).asInstanceOf[Polygon]
      case other => fail(s"unexpected ${other.getGeometryType}")
    }
    assert(math.abs(poly.getArea - 0.01 * 0.01) < 1e-10)
    assert(b.tags("boundary") == "administrative" && b.tags("admin_level") == "4")
    assert(!features.contains("way/102") && !features.contains("way/103"))
  }

  test("non-route relations are not stored by the default predicate") {
    // boundary rel 700 must not appear in any way's relations
    assert(features.values.forall(_.relations.forall(_.rel_id != 700L)))
  }

  test("splitWays: crossing line ways split at the shared interior node only") {
    // two ways crossing at node 3 (interior of A, interior of B)
    val cross = Seq(
      n(1, 10.00, 50.00), n(2, 10.01, 50.00), n(3, 10.02, 50.00), n(4, 10.03, 50.00),
      n(5, 10.02, 49.99), n(6, 10.02, 50.01),
      w(200, Seq(1L, 2L, 3L, 4L), "highway" -> "primary"),
      w(201, Seq(5L, 3L, 6L), "highway" -> "secondary"))
    val fs = Osm.sourceFeatures(
      spark.read.format("osmpbf").load(writePbf(cross)), splitWays = true)
      .collect().map(f => f.doc_id -> f).toMap
    assert(fs.keySet == Set("way/200/0", "way/200/1", "way/201/0", "way/201/1"))
    val seg0 = graft.geo.Geo.fromWkb(fs("way/200/0").geom).asInstanceOf[LineString]
    val seg1 = graft.geo.Geo.fromWkb(fs("way/200/1").geom).asInstanceOf[LineString]
    // cut node duplicated as both segment endpoints
    assert(seg0.getCoordinateN(seg0.getNumPoints - 1).x == 10.02)
    assert(seg1.getCoordinateN(0).x == 10.02)
    assert(fs.values.forall(f => f.tags.contains("highway")))
    // span_sig stays the source way id on every segment
    assert(fs("way/200/0").span_sig == 200L && fs("way/200/1").span_sig == 200L)
  }

  test("splitWays: untouched ways and polygons pass through unsplit; tiles render") {
    val world = Seq(
      n(1, 10.00, 50.00), n(2, 10.01, 50.00), n(3, 10.02, 50.00),
      n(20, 10.1, 50.1), n(21, 10.102, 50.1), n(22, 10.102, 50.102), n(23, 10.1, 50.102),
      w(300, Seq(1L, 2L, 3L), "highway" -> "primary"),
      w(301, Seq(20L, 21L, 22L, 23L, 20L), "building" -> "yes"))
    val p = writePbf(world)
    val fs = Osm.sourceFeatures(spark.read.format("osmpbf").load(p), splitWays = true)
      .collect().map(f => f.doc_id -> f).toMap
    assert(fs.keySet == Set("way/300", "way/301"))
    assert(graft.geo.Geo.fromWkb(fs("way/301").geom).isInstanceOf[Polygon])
    // end-to-end: crossing ways render split segments through Osm.tiles
    val tiles = Osm.tiles(spark, p, numPartitions = 4, splitWays = true).collect()
    assert(tiles.nonEmpty && tiles.forall(_.bytes.nonEmpty))
  }

  test("giant relations are skipped loudly past MaxRelationMembers") {
    val prev = Osm.MaxRelationMembers
    try {
      Osm.MaxRelationMembers = 1L
      val fs = Osm.sourceFeatures(
        spark.read.format("osmpbf").load(writePbf(entities))).collect()
      assert(!fs.exists(_.doc_id == "relation/700"),
        "2-member boundary must be skipped under cap=1")
    } finally Osm.MaxRelationMembers = prev
  }

  test("direct + inherited membership of the same relation resolves to ONE entry, direct role wins") {
    // way 100 is a DIRECT member of R (role 'main') and also reaches R
    // through X (X member of R with entering role 'alternate')
    val ents = Seq(
      n(1, 10.0, 50.0), n(2, 10.01, 50.0),
      w(100, Seq(1L, 2L), "highway" -> "primary"),
      r(800, Seq(("way", 100L, "via_x")),
        "type" -> "route", "route" -> "bus", "ref" -> "X"),
      r(801, Seq(("way", 100L, "main"), ("relation", 800L, "alternate")),
        "type" -> "route", "route" -> "bus", "ref" -> "R"))
    val fs = Osm.sourceFeatures(spark.read.format("osmpbf").load(writePbf(ents)))
      .collect().map(f => f.doc_id -> f).toMap
    val rels = fs("way/100").relations.filter(_.rel_id == 801L)
    assert(rels.size == 1, s"one entry per (way, relation): $rels")
    assert(rels.head.role == "main", "the direct membership's role wins")
  }

  test("bremen trams: route refs reach member ways on a REAL extract") {
    // the reference repo's own bremen-trams extract: 51 relations, all
    // type=route route=tram, 882 distinct member ways — the exact use
    // case Profile.preprocessOsmRelation exists for. Pins are
    // deterministic (one fixed input file, one deterministic pipeline).
    val p = "/root/reference/planetiler-core/src/test/resources/bremen-trams.osm.pbf"
    assume(new java.io.File(p).canRead)
    import org.apache.spark.sql.functions._
    val feats = Osm.sourceFeatures(spark.read.format("osmpbf").load(p)).toDF()
    val ways = feats.where(col("doc_id").startsWith("way/")).cache()
    assert(ways.count() == 1208, "every way in the extract is tagged and complete")
    val withRel = ways.where(size(col("relations")) > 0)
    assert(withRel.count() == 844,
      "tagged member ways with located coords carry relation info")
    assert(withRel.agg(sum(size(col("relations")))).collect()(0).getLong(0) == 3459)
    // per-route membership histogram, exact (ref -> member-way entries)
    val hist = withRel.select(explode(col("relations")).as("m"))
      .select(col("m.rel_tags").getItem("ref").as("ref"))
      .groupBy("ref").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hist == Map(
      "1" -> 345L, "2" -> 150L, "3" -> 120L, "4" -> 612L, "5" -> 88L,
      "6" -> 570L, "8" -> 327L, "10" -> 150L, "14" -> 266L,
      "N1" -> 368L, "N4" -> 313L, "N10" -> 150L))
    ways.unpersist()
  }
}
