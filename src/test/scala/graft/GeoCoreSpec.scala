package graft

import graft.geo._
import org.locationtech.jts.geom.Coordinate
import org.scalatest.funsuite.AnyFunSuite

class GeoCoreSpec extends AnyFunSuite {

  test("snapAndFixPolygon: valid input snaps and orients, stays valid") {
    val g = Geo.fromWktOrNull(
      "POLYGON ((0 0, 10.0001 0.00004, 10 10, 0 10.00003, 0 0))")
    val fixed = PolygonFixer.snapAndFix(g, new org.locationtech.jts.geom.PrecisionModel(16.0))
    assert(fixed.isValid)
    assert(math.abs(fixed.getArea - 100.0) < 0.5)
    // all coords on the 1/16 grid
    assert(fixed.getCoordinates.forall(c =>
      c.x * 16 == math.rint(c.x * 16) && c.y * 16 == math.rint(c.y * 16)))
  }

  test("snapAndFixPolygon: bowtie self-intersection becomes valid") {
    // classic figure-eight: buffer(0) keeps the winding-consistent lobe
    // (area 25) — same semantic as the reference's fixPolygon
    val bowtie = Geo.fromWktOrNull("POLYGON ((0 0, 10 10, 10 0, 0 10, 0 0))")
    assert(!bowtie.isValid)
    val fixed = PolygonFixer.snapAndFix(bowtie)
    assert(fixed.isValid)
    assert(math.abs(fixed.getArea - 25.0) < 1.0)
  }

  test("snapAndFixPolygon: duplicate/near-duplicate points collapse") {
    val g = Geo.fromWktOrNull(
      "POLYGON ((0 0, 0.001 0.001, 10 0, 10 10, 10 10, 0 10, 0 0))")
    val fixed = PolygonFixer.snapAndFix(g, new org.locationtech.jts.geom.PrecisionModel(16.0))
    assert(fixed.isValid)
    val cs = fixed.getCoordinates
    assert(cs.sliding(2).forall(p => p.length < 2 || !p(0).equals2D(p(1))))
  }

  test("snapAndFixPolygon: spike that collapses under snapping is repaired") {
    // a sliver spike thinner than the grid: naive snap makes it
    // degenerate, the reducer path must still produce a valid polygon
    val g = Geo.fromWktOrNull(
      "POLYGON ((0 0, 10 0, 10 10, 5.00001 10, 5 30, 4.99999 10, 0 10, 0 0))")
    val fixed = PolygonFixer.snapAndFix(g, new org.locationtech.jts.geom.PrecisionModel(0.1))
    assert(fixed.isValid)
    assert(fixed.getArea > 50)
  }

  test("mercator world coords roundtrip") {
    for (lon <- Seq(-179.9, -42.0, 0.0, 13.37, 179.9); lat <- Seq(-84.0, -45.0, 0.0, 43.7, 84.0)) {
      assert(math.abs(Mercator.lon(Mercator.worldX(lon)) - lon) < 1e-9)
      assert(math.abs(Mercator.lat(Mercator.worldY(lat)) - lat) < 1e-9)
    }
    assert(Mercator.worldX(0) == 0.5)
    assert(Mercator.worldY(0) == 0.5)
    assert(Mercator.worldY(Mercator.MaxLat) < 1e-9)
  }

  test("hilbert curve: known order-1 walk and roundtrip") {
    assert(Hilbert.xyToIndex(1, 0, 0) == 0)
    assert(Hilbert.xyToIndex(1, 0, 1) == 1)
    assert(Hilbert.xyToIndex(1, 1, 1) == 2)
    assert(Hilbert.xyToIndex(1, 1, 0) == 3)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val order = 1 + rnd.nextInt(15)
      val x = rnd.nextInt(1 << order)
      val y = rnd.nextInt(1 << order)
      val d = Hilbert.xyToIndex(order, x, y)
      assert(d >= 0 && d < (1L << (2 * order)))
      assert(Hilbert.indexToXY(order, d) == ((x, y)))
    }
  }

  test("hilbert locality: consecutive indices are adjacent tiles") {
    val order = 6
    var prev = Hilbert.indexToXY(order, 0)
    for (d <- 1L until (1L << (2 * order))) {
      val cur = Hilbert.indexToXY(order, d)
      assert(math.abs(cur._1 - prev._1) + math.abs(cur._2 - prev._2) == 1,
        s"jump at $d: $prev -> $cur")
      prev = cur
    }
  }

  test("tile id encode: zoom-major, order-preserving, roundtrip") {
    val ids = for (z <- 0 to 6; x <- 0 until (1 << z); y <- 0 until (1 << z))
      yield TileCoord.encodeHilbert(x, y, z)
    assert(ids.distinct.size == ids.size)
    for (z <- 0 to 6) {
      val zIds = for (x <- 0 until (1 << z); y <- 0 until (1 << z)) yield TileCoord.encodeHilbert(x, y, z)
      assert(zIds.min == TileCoord.zoomOffset(z))
      assert(zIds.max == TileCoord.zoomOffset(z) + (1L << (2 * z)) - 1)
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val z = rnd.nextInt(15)
      val x = rnd.nextInt(1 << z)
      val y = rnd.nextInt(1 << z)
      assert(TileCoord.decodeHilbert(TileCoord.encodeHilbert(x, y, z)) == ((x, y, z)))
      assert(TileCoord.decodeRow(TileCoord.encodeRow(x, y, z)) == ((x, y, z)))
    }
  }

  test("douglas-peucker: drops collinear, keeps endpoints, ring floor of 4") {
    val line = Array(
      new Coordinate(0, 0), new Coordinate(1, 0.001), new Coordinate(2, 0),
      new Coordinate(3, 5), new Coordinate(4, 0))
    val simp = Simplify.douglasPeucker(line, 0.01, ring = false)
    assert(simp.head.equals2D(line.head) && simp.last.equals2D(line.last))
    assert(simp.length == 4) // collinear-ish middle point dropped, spike kept
    assert(simp.exists(c => c.x == 3 && c.y == 5))

    // a tiny diamond ring: would collapse to 2 points without the floor
    val ring = Array(
      new Coordinate(0, 0), new Coordinate(0.001, 0.001), new Coordinate(0, 0.002),
      new Coordinate(-0.001, 0.001), new Coordinate(0, 0))
    val simpRing = Simplify.douglasPeucker(ring, 10.0, ring = true)
    assert(simpRing.length >= 4)
  }

  test("douglas-peucker on geometry: polygon stays valid-shaped") {
    val poly = Geo.fromWkt("POLYGON ((0 0, 10 0.01, 20 0, 20 20, 0 20, 0 0))")
    val simp = Simplify.dp(poly, 0.1)
    assert(simp.getGeometryType == "Polygon")
    assert(simp.getNumPoints == 5) // near-collinear vertex dropped
    assert(math.abs(simp.getArea - poly.getArea) < 2)
  }

  test("visvalingam-whyatt reduces points and preserves endpoints") {
    val line = Array.tabulate(100)(i => new Coordinate(i, math.sin(i * 0.1) * 0.01))
    val simp = Simplify.visvalingamWhyatt(line, 0.5, 0.0, ring = false)
    assert(simp.length < line.length)
    assert(simp.head.equals2D(line.head) && simp.last.equals2D(line.last))
  }

  test("clip line to rect") {
    val xs = Array(-1.0, 3.0)
    val ys = Array(0.5, 0.5)
    val out = Clip.clipLine(xs, ys, 0, 0, 1, 1)
    assert(out.size == 1)
    assert(out.head._1.toSeq == Seq(0.0, 1.0))
    // fully outside
    assert(Clip.clipLine(Array(5.0, 6.0), Array(5.0, 5.0), 0, 0, 1, 1).isEmpty)
  }

  test("clip ring to rect: corner cut") {
    val (xs, ys) = Clip.clipRing(
      Array(0.5, 2.0, 2.0, 0.5, 0.5), Array(0.5, 0.5, 2.0, 2.0, 0.5),
      0, 0, 1, 1)
    // clipped square corner: (0.5,0.5)-(1,0.5)-(1,1)-(0.5,1)
    assert(xs.length == 5)
    assert(math.abs(math.abs(Clip.signedArea2(xs, ys)) / 2 - 0.25) < 1e-12)
  }

  test("point in ring") {
    val xs = Array(0.0, 10.0, 10.0, 0.0, 0.0)
    val ys = Array(0.0, 0.0, 10.0, 10.0, 0.0)
    assert(Clip.pointInRing(5, 5, xs, ys))
    assert(!Clip.pointInRing(15, 5, xs, ys))
    assert(!Clip.pointInRing(-0.1, 5, xs, ys))
  }

  test("wkbIsPoint: 5-byte kind peek agrees with the full parse") {
    val geoms = Seq(
      "POINT (3 4)",
      "LINESTRING (0 0, 1 1)",
      "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
      "MULTIPOINT ((1 1), (2 2))",
      "GEOMETRYCOLLECTION (POINT (1 1))").map(Geo.fromWktOrNull)
    for (g <- geoms) {
      val wkb = Geo.toWkb(g)
      assert(Geo.wkbIsPoint(wkb) ==
        g.isInstanceOf[org.locationtech.jts.geom.Point], g.getGeometryType)
    }
    // big-endian point (byte order 0) and a Z point (type 1001)
    val be = Array[Byte](0, 0, 0, 0, 1) ++ new Array[Byte](16)
    assert(Geo.wkbIsPoint(be))
    val z = {
      val w = new org.locationtech.jts.io.WKBWriter(3)
      w.write(Geo.factory.createPoint(
        new org.locationtech.jts.geom.Coordinate(1, 2, 3)))
    }
    assert(Geo.wkbIsPoint(z))
    // EWKB flag forms (PostGIS): M flag, SRID flag, and Z|M|SRID combined
    def le(t: Long) = Array[Byte](1, (t & 0xff).toByte, ((t >> 8) & 0xff).toByte,
      ((t >> 16) & 0xff).toByte, ((t >> 24) & 0xff).toByte) ++ new Array[Byte](24)
    assert(Geo.wkbIsPoint(le(0x40000001L)), "EWKB M point")
    assert(Geo.wkbIsPoint(le(0x20000001L)), "EWKB SRID point")
    assert(Geo.wkbIsPoint(le(0xE0000001L)), "EWKB ZM+SRID point")
    assert(!Geo.wkbIsPoint(le(0x20000002L)), "EWKB SRID linestring")
    assert(!Geo.wkbIsPoint(null))
    assert(!Geo.wkbIsPoint(Array[Byte](1, 1)))
  }
}
