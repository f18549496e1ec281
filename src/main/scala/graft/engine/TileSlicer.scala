package graft.engine

import graft.geo.Clip
import org.locationtech.jts.geom._
import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/**
 * Slices one geometry (in world coordinates, [0,1] x [0,1]) into every
 * tile it touches at a zoom level, clipping to each tile's buffered
 * extent and quantizing to MVT extent-4096 integer coordinates.
 *
 * This is the engine's fan-out "join" against the implicit tile grid —
 * the Spark analog of the reference's stripe-clip renderer
 * (planetiler `render/TiledGeometry.java:198-699`): geometry is first
 * clipped into column stripes, then each stripe is clipped into rows,
 * and for polygons the rows an edge never enters are resolved by
 * centerline crossing parity — interior ("fill") tiles cost O(log n)
 * and share one canonical fill square. That fill short-cut is the
 * ocean-skew killer: a world-sized polygon costs O(boundary tiles), not
 * O(area tiles), per stripe.
 *
 * Runs as a pure function inside a typed `flatMap`, so Catalyst treats
 * the surrounding stages declaratively and the fan-out parallelizes
 * per input row.
 */
object TileSlicer {
  val Extent: Int = Mvt.Extent

  /** One geometry clipped into one tile. `fill` marks a canonical
    * full-tile polygon (content-identical across tiles — dedup-able). */
  case class Sliced(x: Int, y: Int, geomType: Int, commands: Array[Int], fill: Boolean)

  private val FillCommands: Array[Int] = {
    // canonical full-tile square, slightly overlapping the buffer like
    // the reference's fill geometry (covers extent plus buffer).
    val b = -128
    val t = Extent + 128
    Mvt.encodeRings(Seq(Array((b, b), (t, b), (t, t), (b, t), (b, b))))
  }

  /** Slice any WKB/JTS geometry at `z` with `bufferPx` (256px-tile px).
    * `extentScale` quantizes at 2^scale × extent resolution (the
    * extra-precision line path — coordinates unscale at tile write). */
  def slice(geom: Geometry, z: Int, bufferPx: Double, extentScale: Int = 0): Iterator[Sliced] = {
    val savedExtent = extentScale // threaded through the closures below
    sliceScaled(geom, z, bufferPx, savedExtent)
  }

  private def sliceScaled(geom: Geometry, z: Int, bufferPx: Double, extentScale: Int): Iterator[Sliced] = {
    val n = 1 << z
    val scaledExtent = Extent << extentScale
    val buf = bufferPx / 256.0 // fraction of a tile
    // fast path: geometry strictly inside one tile's unbuffered core
    // (by far the common case at high zoom) -> no stripe machinery,
    // no hash maps, one direct encode
    if (!geom.isInstanceOf[GeometryCollection] || geom.isInstanceOf[MultiPoint] ||
        geom.isInstanceOf[MultiLineString] || geom.isInstanceOf[MultiPolygon]) {
      val env = geom.getEnvelopeInternal
      val txMin = math.floor(env.getMinX * n - buf).toInt
      val txMax = math.floor(env.getMaxX * n + buf).toInt
      val tyMin = math.floor(env.getMinY * n - buf).toInt
      val tyMax = math.floor(env.getMaxY * n + buf).toInt
      if (txMin == txMax && tyMin == tyMax && txMin >= 0 && txMin < n && tyMin >= 0 && tyMin < n) {
        return sliceSingleTile(geom, n, txMin, tyMin, scaledExtent)
      }
    }
    geom match {
      case p: Point => slicePoints(Array(p.getCoordinate), n, buf, scaledExtent)
      case mp: MultiPoint => slicePoints(mp.getCoordinates, n, buf, scaledExtent)
      case l: LineString => sliceLines(Seq(l.getCoordinates), n, buf, scaledExtent)
      case ml: MultiLineString =>
        sliceLines((0 until ml.getNumGeometries).map(ml.getGeometryN(_).getCoordinates), n, buf, scaledExtent)
      case poly: Polygon => slicePolygons(Seq(poly), n, buf, scaledExtent)
      case mpoly: MultiPolygon =>
        slicePolygons((0 until mpoly.getNumGeometries).map(mpoly.getGeometryN(_).asInstanceOf[Polygon]), n, buf, scaledExtent)
      case gc: GeometryCollection =>
        (0 until gc.getNumGeometries).iterator.flatMap(i => sliceScaled(gc.getGeometryN(i), z, bufferPx, extentScale))
      case _ => Iterator.empty
    }
  }

  @inline private def localInt(v: Double, tile: Int, extent: Int): Int =
    math.round((v - tile) * extent).toInt

  /** No-clip encode of a geometry known to fit inside tile (tx, ty). */
  private def sliceSingleTile(geom: Geometry, n: Int, tx: Int, ty: Int, extent: Int): Iterator[Sliced] = {
    @inline def px(c: Coordinate) = (localInt(c.x * n, tx, extent), localInt(c.y * n, ty, extent))
    geom match {
      case p: Point =>
        Iterator.single(Sliced(tx, ty, 1, Mvt.encodePoints(Array(px(p.getCoordinate))), fill = false))
      case mp: MultiPoint =>
        Iterator.single(Sliced(tx, ty, 1, Mvt.encodePoints(mp.getCoordinates.map(px)), fill = false))
      case l: LineString =>
        val cmds = Mvt.encodeLines(Seq(l.getCoordinates.map(px)))
        if (cmds.isEmpty) Iterator.empty
        else Iterator.single(Sliced(tx, ty, 2, cmds, fill = false))
      case ml: MultiLineString =>
        val cmds = Mvt.encodeLines((0 until ml.getNumGeometries)
          .map(ml.getGeometryN(_).getCoordinates.map(px)))
        if (cmds.isEmpty) Iterator.empty
        else Iterator.single(Sliced(tx, ty, 2, cmds, fill = false))
      case _ => // polygon / multipolygon: orient rings, encode
        val polys: Seq[Polygon] = geom match {
          case p: Polygon => Seq(p)
          case mp: MultiPolygon =>
            (0 until mp.getNumGeometries).map(mp.getGeometryN(_).asInstanceOf[Polygon])
          case _ => Seq.empty
        }
        val rings = polys.flatMap { poly =>
          val shell = orientRing(poly.getExteriorRing.getCoordinates.map(px), positive = true)
          val holes = (0 until poly.getNumInteriorRing)
            .map(i => orientRing(poly.getInteriorRingN(i).getCoordinates.map(px), positive = false))
          shell +: holes
        }.filter(r => ringArea2(r) != 0)
        val cmds = Mvt.encodeRings(rings)
        if (cmds.isEmpty) Iterator.empty
        else Iterator.single(Sliced(tx, ty, 3, cmds, fill = false))
    }
  }

  private def orientRing(pts: Array[(Int, Int)], positive: Boolean): Array[(Int, Int)] = {
    val a = ringArea2(pts)
    if ((a > 0) != positive && a != 0) pts.reverse else pts
  }

  private def slicePoints(coords: Array[Coordinate], n: Int, buf: Double, extent: Int): Iterator[Sliced] = {
    // group points by tile; a point lands in every tile whose buffered
    // extent contains it (usually 1, up to 4 near corners).
    val byTile = mutable.HashMap.empty[(Int, Int), ArrayBuffer[(Int, Int)]]
    coords.foreach { c =>
      val wx = c.x * n
      val wy = c.y * n
      var tx = math.floor(wx - buf).toInt
      while (tx <= math.floor(wx + buf).toInt) {
        var ty = math.floor(wy - buf).toInt
        while (ty <= math.floor(wy + buf).toInt) {
          if (ty >= 0 && ty < n) {
            val wrapX = ((tx % n) + n) % n // world x wrap-around
            byTile.getOrElseUpdate((wrapX, ty), ArrayBuffer.empty) +=
              ((localInt(wx, tx, extent), localInt(wy, ty, extent)))
          }
          ty += 1
        }
        tx += 1
      }
    }
    byTile.iterator.map { case ((x, y), pts) =>
      Sliced(x, y, 1, Mvt.encodePoints(pts.toArray), fill = false)
    }
  }

  private def sliceLines(lines: Seq[Array[Coordinate]], n: Int, buf: Double, extent: Int): Iterator[Sliced] = {
    val byTile = mutable.HashMap.empty[(Int, Int), ArrayBuffer[Array[(Int, Int)]]]
    lines.foreach { coords =>
      if (coords.length >= 2) {
        val xs = coords.map(_.x * n)
        val ys = coords.map(_.y * n)
        var minX = Double.MaxValue; var maxX = Double.MinValue
        xs.foreach { v => if (v < minX) minX = v; if (v > maxX) maxX = v }
        var tx = math.floor(minX - buf).toInt
        val txMax = math.floor(maxX + buf).toInt
        while (tx <= txMax) {
          // column stripe clip first (cheap second-pass rows)
          val stripe = Clip.clipLine(xs, ys, tx - buf, Double.NegativeInfinity, tx + 1 + buf, Double.PositiveInfinity)
          stripe.foreach { case (sx, sy) =>
            var minY = Double.MaxValue; var maxY = Double.MinValue
            sy.foreach { v => if (v < minY) minY = v; if (v > maxY) maxY = v }
            var ty = math.max(0, math.floor(minY - buf).toInt)
            val tyMax = math.min(n - 1, math.floor(maxY + buf).toInt)
            while (ty <= tyMax) {
              Clip.clipLine(sx, sy, tx - buf, ty - buf, tx + 1 + buf, ty + 1 + buf).foreach {
                case (cx, cy) =>
                  val pts = Array.tabulate(cx.length)(i => (localInt(cx(i), tx, extent), localInt(cy(i), ty, extent)))
                  val wrapX = ((tx % n) + n) % n
                  byTile.getOrElseUpdate((wrapX, ty), ArrayBuffer.empty) += pts
              }
              ty += 1
            }
          }
          tx += 1
        }
      }
    }
    byTile.iterator.flatMap { case ((x, y), parts) =>
      val cmds = Mvt.encodeLines(parts.toSeq)
      if (cmds.isEmpty) None else Some(Sliced(x, y, 2, cmds, fill = false))
    }
  }

  private def slicePolygons(polys: Seq[Polygon], n: Int, buf: Double, extent: Int): Iterator[Sliced] = {
    // per tile: collected rings (already tile-local ints)
    val byTile = mutable.HashMap.empty[(Int, Int), ArrayBuffer[Array[(Int, Int)]]]
    val fillTiles = mutable.HashSet.empty[(Int, Int)]

    polys.foreach { poly =>
      // orient: shell positive area (y-down screen space), holes negative
      val rings: Seq[(Array[Double], Array[Double])] = {
        val shell = ringCoords(poly.getExteriorRing, n, wantPositive = true)
        val holes = (0 until poly.getNumInteriorRing)
          .map(i => ringCoords(poly.getInteriorRingN(i), n, wantPositive = false))
        shell +: holes
      }
      var minX = Double.MaxValue; var maxX = Double.MinValue
      rings.foreach(_._1.foreach { v => if (v < minX) minX = v; if (v > maxX) maxX = v })

      var tx = math.floor(minX - buf).toInt
      val txMax = math.floor(maxX + buf).toInt
      while (tx <= txMax) {
        val x0 = tx - buf; val x1 = tx + 1 + buf
        // rings overlapping this stripe (cheap x-envelope test)
        val stripeRings = rings.filter { case (xs, _) =>
          var lo = Double.MaxValue; var hi = Double.MinValue
          xs.foreach { v => if (v < lo) lo = v; if (v > hi) hi = v }
          hi >= x0 && lo <= x1
        }
        if (stripeRings.nonEmpty) {
          // edge y-intervals within this stripe: rows they touch need a
          // real clip; everything else is decided by centerline parity.
          val touchedRows = mutable.HashSet.empty[Int]
          var minY = Double.MaxValue; var maxY = Double.MinValue
          stripeRings.foreach { case (xs, ys) =>
            var i = 0
            while (i < xs.length - 1) {
              val ex0 = math.min(xs(i), xs(i + 1)); val ex1 = math.max(xs(i), xs(i + 1))
              if (ex1 >= x0 && ex0 <= x1) {
                val ey0 = math.min(ys(i), ys(i + 1)); val ey1 = math.max(ys(i), ys(i + 1))
                if (ey0 < minY) minY = ey0
                if (ey1 > maxY) maxY = ey1
                var r = math.max(0, math.floor(ey0 - buf).toInt)
                val rMax = math.min(n - 1, math.floor(ey1 + buf).toInt)
                while (r <= rMax) { touchedRows += r; r += 1 }
              }
              i += 1
            }
          }
          // centerline crossings (for fill parity): x = tx + 0.5
          val cx = tx + 0.5
          val crossings = ArrayBuffer.empty[Double]
          rings.foreach { case (xs, ys) =>
            var i = 0
            while (i < xs.length - 1) {
              val a = xs(i); val b = xs(i + 1)
              if ((a <= cx && b > cx) || (b <= cx && a > cx)) {
                crossings += ys(i) + (ys(i + 1) - ys(i)) * (cx - a) / (b - a)
              }
              i += 1
            }
          }
          val sorted = crossings.sorted.toArray

          // rows with geometry: clip. Interior rows between minY..maxY
          // with odd parity: canonical fill.
          if (minY != Double.MaxValue) {
            var ty = math.max(0, math.floor(minY - buf).toInt)
            val tyMax = math.min(n - 1, math.floor(maxY + buf).toInt)
            while (ty <= tyMax) {
              val wrapX = ((tx % n) + n) % n
              if (touchedRows.contains(ty)) {
                val y0 = ty - buf; val y1 = ty + 1 + buf
                stripeRings.foreach { case (xs, ys) =>
                  val (rx, ry) = Clip.clipRing(xs, ys, x0, y0, x1, y1)
                  if (rx.length >= 4) {
                    var pts = Array.tabulate(rx.length)(i => (localInt(rx(i), tx, extent), localInt(ry(i), ty, extent)))
                    // integer quantization can FLIP a sliver ring's
                    // winding; MVT winding decides shell vs hole, so
                    // restore the world-space orientation when it does
                    val worldSign = math.signum(Clip.signedArea2(rx, ry))
                    val qArea = ringArea2(pts)
                    if (qArea != 0 && worldSign != 0 && math.signum(qArea.toDouble) != worldSign)
                      pts = pts.reverse
                    byTile.getOrElseUpdate((wrapX, ty), ArrayBuffer.empty) += pts
                  }
                }
              } else {
                // no edges near this row: inside iff odd crossings above
                val cy = ty + 0.5
                var cnt = 0
                var i = 0
                while (i < sorted.length && sorted(i) < cy) { cnt += 1; i += 1 }
                if ((cnt & 1) == 1) fillTiles += ((wrapX, ty))
              }
              ty += 1
            }
          }
        }
        tx += 1
      }
    }

    // Fills WIN over edge rings on the same tile: a parity fill means
    // some part of this (multi)polygon covers the whole buffered tile
    // square, which subsumes any other part's clip rings there — the
    // previous filterNot(byTile.contains) dropped the fill and rendered
    // a hole where a sibling part fully covers the tile.
    val edgeTiles = byTile.iterator
      .filter { case (k, _) => !fillTiles.contains(k) }
      .flatMap { case ((x, y), rings) =>
        // drop degenerate rings (zero area after quantization)
        val kept = rings.filter(r => ringArea2(r) != 0)
        if (kept.isEmpty) None
        else Some(Sliced(x, y, 3, Mvt.encodeRings(kept.toSeq), fill = false))
      }
    val fills = fillTiles.iterator
      .map { case (x, y) => Sliced(x, y, 3, FillCommands, fill = true) }
    edgeTiles ++ fills
  }

  private def ringCoords(ring: LineString, n: Int, wantPositive: Boolean): (Array[Double], Array[Double]) = {
    val cs = ring.getCoordinates
    val xs = cs.map(_.x * n)
    val ys = cs.map(_.y * n)
    val area = Clip.signedArea2(xs, ys)
    if ((area > 0) != wantPositive) (xs.reverse, ys.reverse) else (xs, ys)
  }

  private def ringArea2(pts: Array[(Int, Int)]): Long = {
    var a = 0L
    var i = 0
    while (i < pts.length - 1) {
      a += pts(i)._1.toLong * pts(i + 1)._2 - pts(i + 1)._1.toLong * pts(i)._2
      i += 1
    }
    a
  }
}
