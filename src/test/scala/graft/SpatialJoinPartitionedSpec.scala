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
}
