package graft

import graft.engine.{FeatureMerge, Mvt, TileGeom}
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's FeatureMergeTest cases (connected lines
  * same/different attrs, nearby polygons, min sizes). */
class FeatureMergeSpec extends AnyFunSuite {

  private def line(id: Long, attrs: Map[String, String], pts: (Int, Int)*) =
    Mvt.LayerFeature.of(id, 2, Mvt.encodeLines(Seq(pts.toArray)), attrs)

  private def poly(id: Long, attrs: Map[String, String], ring: (Int, Int)*) =
    Mvt.LayerFeature.of(id, 3, Mvt.encodeRings(Seq(ring.toArray)), attrs)

  private def point(id: Long, attrs: Map[String, String], pts: (Int, Int)*) =
    Mvt.LayerFeature.of(id, 1, Mvt.encodePoints(pts.toArray), attrs)

  private def decodedLines(f: Mvt.LayerFeature): Seq[Seq[(Int, Int)]] =
    Mvt.decodeCommands(2, f.commands).map(_._2.toSeq)

  test("merge connected linestrings with same attrs") {
    val a = Map("k" -> "v")
    val out = FeatureMerge.mergeLineStrings(Seq(
      line(1, a, (0, 0), (100, 0)),
      line(2, a, (100, 0), (200, 0), (200, 100))))
    assert(out.size == 1)
    // join point (100,0) retained without simplification
    assert(decodedLines(out.head) == Seq(Seq((0, 0), (100, 0), (200, 0), (200, 100))))
  }

  test("don't merge connected linestrings with different attrs") {
    val out = FeatureMerge.mergeLineStrings(Seq(
      line(1, Map("k" -> "v1"), (0, 0), (100, 0)),
      line(2, Map("k" -> "v2"), (100, 0), (200, 0))))
    assert(out.size == 2)
  }

  test("don't merge at junctions of three lines") {
    val a = Map("k" -> "v")
    val out = FeatureMerge.mergeLineStrings(Seq(
      line(1, a, (0, 0), (100, 100)),
      line(2, a, (100, 100), (200, 0)),
      line(3, a, (100, 100), (200, 200))))
    // junction degree 3: no join; single feature with 3 parts
    assert(out.size == 1)
    assert(decodedLines(out.head).size == 3)
  }

  test("opt-in stroke merging joins the straightest pair at a junction") {
    val a = Map("k" -> "v")
    val out = FeatureMerge.mergeLineStrings(Seq(
      line(1, a, (0, 100), (100, 100)), // west arm
      line(2, a, (100, 100), (200, 100)), // east arm (straight continuation)
      line(3, a, (100, 100), (100, 0))), // south arm (perpendicular)
      mergeStrokes = true)
    val parts = decodedLines(out.head)
    assert(parts.size == 2)
    assert(parts.exists(p => p == Seq((0, 100), (100, 100), (200, 100)) ||
      p == Seq((200, 100), (100, 100), (0, 100))), s"got $parts")
  }

  test("simplification happens after merge (collinear join point dropped)") {
    val a = Map("k" -> "v")
    val out = FeatureMerge.mergeLineStrings(Seq(
      line(1, a, (0, 0), (100, 0)),
      line(2, a, (100, 0), (200, 0))), tolerancePx = 1.0)
    assert(decodedLines(out.head) == Seq(Seq((0, 0), (200, 0))))
  }

  test("min length drops short merged strokes") {
    val a = Map("k" -> "v")
    val out = FeatureMerge.mergeLineStrings(Seq(
      line(1, a, (0, 0), (8, 0)), // 8 units = 0.5px
      line(2, a, (1000, 0), (2000, 0))), minLengthPx = 1.0)
    assert(decodedLines(out.head) == Seq(Seq((1000, 0), (2000, 0))))
  }

  test("merge points with same attrs into multipoint") {
    val a = Map("k" -> "v")
    val out = FeatureMerge.mergeMultiPoint(Seq(
      point(1, a, (10, 10)), point(2, a, (20, 20)), point(3, Map("k" -> "w"), (30, 30))))
    assert(out.size == 2)
    val merged = out.find(_.attrsMap == a).get
    assert(Mvt.decodeCommands(1, merged.commands).flatMap(_._2).toSet == Set((10, 10), (20, 20)))
  }

  test("merge overlapping polygons with same attrs") {
    val a = Map("k" -> "v")
    val out = FeatureMerge.mergeNearbyPolygons(Seq(
      poly(1, a, (0, 0), (100, 0), (100, 100), (0, 100), (0, 0)),
      poly(2, a, (50, 0), (150, 0), (150, 100), (50, 100), (50, 0))))
    assert(out.size == 1)
    val g = TileGeom.toJts(3, out.head.commands)
    assert(math.abs(g.getArea - 150 * 100) < 1)
  }

  test("merge nearby but not touching polygons when within min dist") {
    val a = Map("k" -> "v")
    val twoApart = Seq(
      poly(1, a, (0, 0), (100, 0), (100, 100), (0, 100), (0, 0)),
      poly(2, a, (116, 0), (216, 0), (216, 100), (116, 100), (116, 0))) // 1px gap
    val kept = FeatureMerge.mergeNearbyPolygons(twoApart, minDistPx = 0)
    assert(TileGeom.toJts(3, kept.head.commands).getNumGeometries == 2)
    val merged = FeatureMerge.mergeNearbyPolygons(twoApart, minDistPx = 2.0)
    val g = TileGeom.toJts(3, merged.head.commands)
    assert(g.getNumGeometries == 1, s"expected single merged polygon, got $g")
  }

  test("min area filter drops small polygons") {
    val a = Map("k" -> "v")
    val out = FeatureMerge.mergeNearbyPolygons(Seq(
      poly(1, a, (0, 0), (8, 0), (8, 8), (0, 8), (0, 0)), // 0.25 px^2
      poly(2, a, (1000, 1000), (1500, 1000), (1500, 1500), (1000, 1500), (1000, 1000))),
      minAreaPx2 = 1.0)
    val g = TileGeom.toJts(3, out.head.commands)
    assert(g.getNumGeometries == 1)
    assert(g.getArea > 100 * 100)
  }

  test("polygon/line roundtrip through TileGeom") {
    val g = TileGeom.toJts(3, Mvt.encodeRings(Seq(
      Array((0, 0), (100, 0), (100, 100), (0, 100), (0, 0)),
      Array((25, 25), (25, 75), (75, 75), (75, 25), (25, 25))))) // hole (negative area)
    val p = g.asInstanceOf[org.locationtech.jts.geom.Polygon]
    assert(p.getNumInteriorRing == 1)
    assert(math.abs(p.getArea - (10000 - 2500)) < 1e-9)
    val (gt, cmds) = TileGeom.fromJts(p).get
    assert(gt == 3)
    val back = TileGeom.toJts(3, cmds).asInstanceOf[org.locationtech.jts.geom.Polygon]
    assert(back.getNumInteriorRing == 1 && math.abs(back.getArea - p.getArea) < 1e-9)
  }

  test("same attrs but different extra-precision scales never merge into one coordinate space") {
    val a = Map("k" -> "v")
    // endpoint (100,0)@scale0 and (200,0)@scale1 are the SAME tile
    // position (scale-1 coords are 2x) — but the coordinate spaces
    // differ, so they must stay separate features at their own scales
    val s0 = line(1, a, (0, 0), (100, 0))
    val s1 = Mvt.LayerFeature(2, 2,
      Mvt.encodeLines(Seq(Array((200, 0), (400, 0)))), s0.attrs, scale = 1)
    val out = FeatureMerge.mergeLineStrings(Seq(s0, s1))
    assert(out.size == 2)
    assert(out.map(_.scale).sorted == Seq(0, 1))
    // and the scale survives onto each merged output feature
    assert(out.find(_.scale == 1).get.commands.toSeq ==
      Mvt.encodeLines(Seq(Array((200, 0), (400, 0)))).toSeq)
  }

  test("merged groups keep first-occurrence (draw) order, not hash or id order") {
    val out = FeatureMerge.mergeLineStrings(Seq(
      line(0, Map("class" -> "primary"), (0, 0), (10, 0)),
      line(0, Map("class" -> "secondary"), (0, 5), (10, 5)),
      line(0, Map("class" -> "primary"), (10, 0), (20, 0))))
    assert(out.map(_.attrsMap("class")) == Seq("primary", "secondary"))
  }
}
