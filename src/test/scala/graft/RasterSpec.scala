package graft

import graft.raster.Raster
import org.locationtech.jts.geom.{MultiPolygon, Polygon}
import org.scalatest.funsuite.AnyFunSuite

/** Horn hillshade + marching-squares vectorization (the raster→vector
  * north-star extension). */
class RasterSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def binaryField(bits: (Int, Int) => Boolean, w: Int, h: Int): Array[Float] = {
    val f = new Array[Float](w * h)
    for (j <- 0 until h; i <- 0 until w) f(j * w + i) = if (bits(i, j)) 100f else 0f
    f
  }

  test("horn hillshade: analytic plane gives the closed-form shade everywhere") {
    val w = 9; val h = 9; val p = 0.3; val q = -0.2; val cell = 1.0
    val elev = new Array[Float](w * h)
    for (j <- 0 until h; i <- 0 until w) elev(j * w + i) = (p * i + q * j).toFloat
    val shade = Raster.hillshade(elev, w, h, cell)
    // independent evaluation of the published formula
    val zenith = math.toRadians(45.0)
    val azimuth = math.toRadians(360.0 - 315.0 + 90.0)
    val slope = math.atan(math.sqrt(p * p + q * q))
    val as0 = math.atan2(q, -p)
    val aspect = if (as0 < 0) as0 + 2 * math.Pi else as0
    val expect = 255.0 * math.max(0.0,
      math.cos(zenith) * math.cos(slope) +
        math.sin(zenith) * math.sin(slope) * math.cos(azimuth - aspect))
    // interior cells see the exact plane gradient (floats round the
    // inputs, so compare at float precision)
    for (j <- 1 until h - 1; i <- 1 until w - 1)
      assert(math.abs(shade(j * w + i) - expect) < 1e-3,
        s"cell $i,$j: ${shade(j * w + i)} vs $expect")
  }

  test("marching squares: single high point becomes the half-cell diamond") {
    val g = Raster.marchingSquares(Array(100f), 1, 1, 50.0)
    assert(g.isInstanceOf[Polygon])
    assert(g.getArea == 0.5)
    assert(g.getCoordinates.length == 5) // 4 crossings + closure
  }

  test("marching squares: saddle keeps diagonal corners separate") {
    val f = binaryField((i, j) => i == j, 2, 2) // tl + br high
    val g = Raster.marchingSquares(f, 2, 2, 50.0)
    assert(g.getNumGeometries == 2, s"expected 2 parts, got $g")
    assert(g.getArea == Raster.binaryCaseAreaX8((i, j) => i == j, 2, 2) / 8.0)
  }

  test("marching squares: shoelace area equals the case-table sum on random binary grids") {
    for (seed <- 1 to 8) {
      val bits = (i: Int, j: Int) => (seed * 7 + i * 13 + j * 31) % 5 < 2
      val f = binaryField(bits, 9, 9)
      val g = Raster.marchingSquares(f, 9, 9, 50.0)
      val want = Raster.binaryCaseAreaX8(bits, 9, 9) / 8.0
      assert(g.getArea == want, s"seed $seed: ${g.getArea} vs $want")
      assert(g.isValid, s"seed $seed produced invalid geometry")
    }
  }

  test("marching squares: annulus vectorizes to a polygon with a hole") {
    val w = 25; val h = 25
    val bits = (i: Int, j: Int) => {
      val d = math.hypot(i - 12.0, j - 12.0); d >= 4 && d <= 9
    }
    val g = Raster.marchingSquares(binaryField(bits, w, h), w, h, 50.0)
    val poly = g match {
      case p: Polygon => p
      case mp: MultiPolygon =>
        (0 until mp.getNumGeometries).map(mp.getGeometryN(_).asInstanceOf[Polygon])
          .maxBy(_.getArea)
    }
    assert(poly.getNumInteriorRing == 1, s"annulus must carry its hole: $g")
    assert(g.getArea == Raster.binaryCaseAreaX8(bits, w, h) / 8.0)
  }

  test("marching squares: smooth dome iso-area approximates the disc") {
    val w = 65; val h = 65
    val f = new Array[Float](w * h)
    for (j <- 0 until h; i <- 0 until w) {
      val d2 = (i - 32.0) * (i - 32.0) + (j - 32.0) * (j - 32.0)
      f(j * w + i) = (200.0 - 0.2 * d2).toFloat
    }
    // threshold 120 -> d^2 = 400 -> radius 20
    val g = Raster.marchingSquares(f, w, h, 120.0)
    val want = math.Pi * 400.0
    assert(math.abs(g.getArea - want) / want < 0.01, s"${g.getArea} vs $want")
    assert(g.getNumGeometries == 1)
  }

  test("hillshadeFeatures: docs with media refs emit placed polygon features") {
    val docs = graft.engine.Docs.docs(spark, "/root/testdata/sf0.001")
    val feats = Raster.hillshadeFeatures(docs).collect()
    assert(feats.nonEmpty)
    feats.take(20).foreach { f =>
      val g = graft.geo.Geo.fromWkb(f.geom)
      assert(g.getArea > 0)
      assert(f.tags("layer") == "hillshade")
      assert(f.doc_id.endsWith("#shade"))
      // envelope within the 0.05-degree raster span (+ the half-cell
      // padding ring) of some anchor
      assert(g.getEnvelopeInternal.getWidth <= 0.053)
    }
    // determinism
    val again = Raster.hillshadeFeatures(docs).collect()
    assert(feats.map(f => (f.doc_id, f.geom.toSeq)).sortBy(_._1).toSeq ==
      again.map(f => (f.doc_id, f.geom.toSeq)).sortBy(_._1).toSeq)
  }

  test("hillshade polygons ride the tile pipeline as a polygon layer") {
    val docs = graft.engine.Docs.docs(spark, "/root/testdata/sf0.001").limit(200)
    val feats = Raster.hillshadeFeatures(docs)
    val tiles = graft.engine.Pipeline.tilesFromFeatures(
      feats, new graft.engine.Pipeline.GraftProfile(), numPartitions = 4).collect()
    assert(tiles.nonEmpty)
    // 0.05-degree shade patches are sub-pixel at world zooms — the
    // min-pixel gate correctly culls them there; they appear once
    // they reach drawable size and persist to the layer max zoom
    assert(tiles.map(_.z).max == 7)
    assert(tiles.count(_.z == 7) > tiles.count(_.z == 4))
    // the shade bands land in their own MVT layer with the band attr
    val z7 = tiles.filter(_.z == 7).maxBy(_.bytes.length)
    val decoded = graft.engine.Mvt.decodeTile(graft.engine.Mvt.gunzip(z7.bytes))
    val shade = decoded.filter(_.layer == "hillshade")
    assert(shade.nonEmpty, "hillshade layer missing from the densest z7 tile")
    assert(shade.head.attrs("band") == "160")
  }

  test("same-band shade patches merge per tile via mergeNearbyPolygons") {
    import graft.engine.Mvt
    def square(id: Long, x0: Int, y0: Int, s: Int): Mvt.LayerFeature = {
      val g = graft.engine.TileGeom.factory.createPolygon(Array(
        new org.locationtech.jts.geom.Coordinate(x0, y0),
        new org.locationtech.jts.geom.Coordinate(x0 + s, y0),
        new org.locationtech.jts.geom.Coordinate(x0 + s, y0 + s),
        new org.locationtech.jts.geom.Coordinate(x0, y0 + s),
        new org.locationtech.jts.geom.Coordinate(x0, y0)))
      val (gt, cmds) = graft.engine.TileGeom.fromJts(g).head
      Mvt.LayerFeature.of(id, gt, cmds, Map("band" -> "160"))
    }
    val profile = new graft.engine.Pipeline.GraftProfile()
    // two ADJACENT squares (within half a pixel) + one far square
    val merged = profile.postProcessLayer("hillshade", 7,
      Seq(square(1, 0, 0, 100), square(2, 100, 0, 100), square(3, 2000, 2000, 100)))
    assert(merged.length < 3, s"adjacent same-band squares must union: $merged")
    val areas = merged.map(f => graft.engine.TileGeom.toJts(f.geomType, f.commands).getArea)
    assert(math.abs(areas.sum - 3 * 100 * 100) < 200, s"area preserved: $areas")
    // the admin layer is untouched by the hook
    val same = profile.postProcessLayer("admin", 7, Seq(square(1, 0, 0, 100)))
    assert(same.length == 1)
  }
}
