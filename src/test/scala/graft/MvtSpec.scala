package graft

import graft.engine.Mvt
import org.scalatest.funsuite.AnyFunSuite

class MvtSpec extends AnyFunSuite {

  test("zigzag roundtrip") {
    for (v <- Seq(0, 1, -1, 2, -2, 4095, -4096, Int.MaxValue / 2, Int.MinValue / 2)) {
      assert(Mvt.unzigzag(Mvt.zigzag(v)) == v)
    }
  }

  test("point commands roundtrip") {
    val pts = Array((100, 200), (300, 50), (0, 4096))
    val parts = Mvt.decodeCommands(1, Mvt.encodePoints(pts))
    assert(parts.flatMap(_._2).toSeq == pts.toSeq)
  }

  test("line commands roundtrip, consecutive dups dropped") {
    val lines = Seq(Array((0, 0), (10, 10), (10, 10), (20, 5)), Array((5, 5), (6, 6)))
    val parts = Mvt.decodeCommands(2, Mvt.encodeLines(lines))
    assert(parts.size == 2)
    assert(parts(0)._2.toSeq == Seq((0, 0), (10, 10), (20, 5)))
    assert(parts(1)._2.toSeq == Seq((5, 5), (6, 6)))
  }

  test("ring commands roundtrip with close path") {
    val ring = Array((0, 0), (100, 0), (100, 100), (0, 100), (0, 0))
    val parts = Mvt.decodeCommands(3, Mvt.encodeRings(Seq(ring)))
    assert(parts.size == 1)
    assert(parts.head._1) // closed
    assert(parts.head._2.toSeq == ring.dropRight(1).toSeq)
  }

  test("full tile encode/decode with typed attrs") {
    val feats = Seq(
      Mvt.LayerFeature.of(7, 1, Mvt.encodePoints(Array((10, 20))),
        Map("name" -> "x", "rank" -> "42", "ratio" -> "0.5", "flag" -> "true")),
      Mvt.LayerFeature.of(8, 3, Mvt.encodeRings(Seq(Array((0, 0), (10, 0), (10, 10), (0, 0)))),
        Map("name" -> "y")))
    val bytes = Mvt.encodeTile(Seq("mylayer" -> feats))
    val dec = Mvt.decodeTile(bytes)
    assert(dec.size == 2)
    val p = dec.find(_.id == 7).get
    assert(p.layer == "mylayer")
    assert(p.geomType == 1)
    assert(p.attrs == Map("name" -> "x", "rank" -> "42", "ratio" -> "0.5", "flag" -> "true"))
    assert(p.parts.head._2.head == ((10, 20)))
    val poly = dec.find(_.id == 8).get
    assert(poly.geomType == 3 && poly.parts.head._1)
  }

  test("gzip roundtrip and fnv1a stability") {
    val data = "hello tile".getBytes
    assert(Mvt.gunzip(Mvt.gzip(data)).toSeq == data.toSeq)
    // FNV-1a 64 known vector: empty input = offset basis
    assert(Mvt.fnv1a64(Array.empty) == 0xcbf29ce484222325L)
    assert(Mvt.fnv1a64("a".getBytes) == 0xaf63dc4c8601ec8cL)
  }

  test("unscale keeps triangles: decoded ClosePath rings are open (3 points is valid)") {
    // triangle at 2x precision -> unscale(1) must keep the 3-point ring
    val tri = Mvt.encodeRings(Seq(Array((0, 0), (200, 0), (200, 200))))
    val down = Mvt.unscale(3, tri, 1)
    val rings = Mvt.decodeCommands(3, down)
    assert(rings.size == 1 && rings.head._2.toSeq == Seq((0, 0), (100, 0), (100, 100)))
    // a quad that collapses to a triangle after downscale also survives
    val quad = Mvt.encodeRings(Seq(Array((0, 0), (200, 0), (200, 200), (199, 200))))
    val downQ = Mvt.decodeCommands(3, Mvt.unscale(3, quad, 1))
    assert(downQ.size == 1 && downQ.head._2.length == 3)
  }
}
