package graft

import graft.engine.{Docs, SpatialJoin}
import graft.geo.Geo
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Big-big point-in-polygon: the grid-cell equi-join path must
  * reproduce the broadcast STRtree path exactly (including the
  * smallest-id tie-break on overlaps) — the scale route once the
  * polygon side exceeds the broadcast cap. */
class SpatialJoinPartitionedSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("partitioned PIP equals the broadcast path on the admin fixture") {
    import spark.implicits._
    val sf = Docs.pointFeatures(spark, "/root/testdata/sf0.001")
    val pts = sf.map { f =>
      val c = Geo.fromWkb(f.geom).getCoordinate
      (f.doc_id, c.x, c.y)
    }.toDF("doc_id", "lon", "lat")
    val polysDf = Docs.sourceFeatures(Docs.polygonDocs(spark, "/root/testdata/sf0.001")).toDF()

    val broadcastOut = SpatialJoin.pointInPolygon(
        pts, SpatialJoin.collectPolys(polysDf), left = true)
      .select(col("doc_id"), col("poly_id")).collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    val partitionedOut = SpatialJoin.pointInPolygonPartitioned(
        pts, polysDf, gridZoom = 5, left = true)
      .select(col("doc_id"), col("poly_id")).collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(partitionedOut == broadcastOut)
    assert(partitionedOut.values.flatten.toSet.nonEmpty)

    // inner variant drops the unmatched probes in both paths
    val inner = SpatialJoin.pointInPolygonPartitioned(pts, polysDf, gridZoom = 5)
      .count()
    assert(inner == broadcastOut.values.flatten.size)
  }

  test("overlapping polygons: smallest id wins in both paths") {
    import spark.implicits._
    val big = Geo.toWkb(Geo.fromWktOrNull("POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0))"))
    val small = Geo.toWkb(Geo.fromWktOrNull("POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"))
    // adm_2 is the LARGER polygon with the smaller id -> it must win
    val polys = Seq(("adm_10", small, Map.empty[String, String]),
      ("adm_2", big, Map.empty[String, String])).toDF("doc_id", "geom", "tags")
    val pts = Seq(("p1", 10.0, 10.0), ("p2", 1.0, 1.0), ("p3", 50.0, 50.0))
      .toDF("doc_id", "lon", "lat")
    val part = SpatialJoin.pointInPolygonPartitioned(pts, polys, gridZoom = 4, left = true)
      .collect().map(r => r.getString(0) -> Option(r.getString(3))).toMap
    assert(part("p1").contains("adm_2"))
    assert(part("p2").contains("adm_2"))
    assert(part("p3").isEmpty)
    val bc = SpatialJoin.pointInPolygon(pts,
      polys.collect().map(r => SpatialJoin.Poly(r.getString(0),
        r.getAs[Array[Byte]](1), Map.empty)), left = true)
      .collect().map(r => r.getString(0) -> Option(r.getString(3))).toMap
    assert(bc == part)
  }

  test("world-spanning polygon: bounded fan-out via adaptive zoom + covered cells") {
    import spark.implicits._
    // a world-covering polygon at gridZoom 10 would naively fan to
    // 2^20 cell rows; chooseZoom must pick a coarse zoom that keeps it
    // within the fan-out budget
    val world = Geo.fromWktOrNull(
      "POLYGON ((-180 -90, 180 -90, 180 90, -180 90, -180 -90))")
    val env = world.getEnvelopeInternal
    val z = SpatialJoin.chooseZoom(env, gridZoom = 10, maxCells = 1024)
    val (x0, x1, y0, y1) = SpatialJoin.envWindow(env, z)
    assert((x1 - x0 + 1).toLong * (y1 - y0 + 1) <= 1024,
      s"world polygon fan-out must stay within budget (z=$z)")

    // the join itself completes at gridZoom 10 and matches broadcast —
    // including a high-latitude point (edge cells reach the poles) and
    // a small polygon that should win by id over the world polygon
    val small = Geo.toWkb(Geo.fromWktOrNull("POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"))
    val polys = Seq(("adm_9", Geo.toWkb(world), Map.empty[String, String]),
      ("adm_3", small, Map.empty[String, String])).toDF("doc_id", "geom", "tags")
    val pts = Seq(("p1", 10.0, 10.0), ("p2", -120.0, 88.5), ("p3", 170.0, -45.0))
      .toDF("doc_id", "lon", "lat")
    val part = SpatialJoin.pointInPolygonPartitioned(pts, polys, gridZoom = 10, left = true)
      .collect().map(r => r.getString(0) -> Option(r.getString(3))).toMap
    val bc = SpatialJoin.pointInPolygon(pts,
      polys.collect().map(r => SpatialJoin.Poly(r.getString(0),
        r.getAs[Array[Byte]](1), Map.empty)), left = true)
      .collect().map(r => r.getString(0) -> Option(r.getString(3))).toMap
    assert(part == bc)
    assert(part("p1").contains("adm_3"), "small polygon wins by id")
    assert(part("p2").contains("adm_9"), "polar point matches via edge cell")
    assert(part("p3").contains("adm_9"))
  }

  test("attachContainingPolygonTag: ambiguous (doc_id, lon) concatenations stay distinct") {
    import spark.implicits._
    // "way/1" @ lon 23.5 and "way/12" @ lon 3.5 concatenate to the
    // same string without a separator — each must still get ITS OWN
    // polygon, not a swapped/arbitrary assignment via a collided
    // join-back key
    val west = Geo.toWkb(Geo.fromWktOrNull("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"))
    val east = Geo.toWkb(Geo.fromWktOrNull("POLYGON ((20 0, 30 0, 30 10, 20 10, 20 0))"))
    val polys = Seq(("adm_west", west, Map.empty[String, String]),
      ("adm_east", east, Map.empty[String, String])).toDF("doc_id", "geom", "tags")
    def pt(id: String, lon: Double, lat: Double) =
      graft.model.SourceFeature(id, "osm",
        Geo.toWkb(Geo.factory.createPoint(new org.locationtech.jts.geom.Coordinate(lon, lat))),
        Map.empty, 0L)
    val feats = Seq(pt("way/1", 23.5, 5.0), pt("way/12", 3.5, 5.0)).toDS()
    val out = SpatialJoin.attachContainingPolygonTag(feats, polys, tagKey = "adm", gridZoom = 4)
      .collect().map(f => f.doc_id -> f.tags.get("adm")).toMap
    assert(out("way/1").contains("adm_east"))
    assert(out("way/12").contains("adm_west"))
  }

  test("stale input tags under the reserved PIP key are stripped, never emitted as assignments") {
    import spark.implicits._
    val west = Geo.toWkb(Geo.fromWktOrNull("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"))
    val polys = Seq(("adm_west", west, Map.empty[String, String])).toDF("doc_id", "geom", "tags")
    def pt(id: String, lon: Double, lat: Double, tags: Map[String, String]) =
      graft.model.SourceFeature(id, "osm",
        Geo.toWkb(Geo.factory.createPoint(new org.locationtech.jts.geom.Coordinate(lon, lat))),
        tags, 0L)
    val bogus = Map(SpatialJoin.PipTagKey -> "adm_spoofed")
    val feats = Seq(
      pt("inside", 5.0, 5.0, bogus),   // contained: real assignment must replace the spoof
      pt("outside", 50.0, 50.0, bogus) // uncontained: the spoof must be stripped, not kept
    ).toDS()
    val out = SpatialJoin.attachContainingPolygonTag(feats, polys, gridZoom = 4)
      .collect().map(f => f.doc_id -> f.tags.get(SpatialJoin.PipTagKey)).toMap
    assert(out("inside").contains("adm_west"))
    assert(out("outside").isEmpty)
  }
}
