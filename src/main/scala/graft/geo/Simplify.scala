package graft.geo

import org.locationtech.jts.geom._
import scala.collection.mutable.ArrayBuffer

/**
 * Geometry simplification used when rendering a feature into a zoom
 * level's tile resolution.
 *
 * `douglasPeucker` matches the reference engine's behavior (planetiler
 * `geo/DouglasPeuckerSimplifier.java:122-204`): squared-distance
 * point-to-segment tests, no validity repair, endpoints always kept, and
 * for rings at least 4 points are force-retained (the `numForcedPoints`
 * trick) so small polygons shrink instead of collapsing — the later
 * min-area filter drops them more accurately.
 *
 * `visvalingamWhyatt` is the effective-area alternative (planetiler
 * `geo/VWSimplifier.java`): drop the point whose triangle with its
 * neighbors has the smallest area until all remaining areas exceed the
 * tolerance; `weight` sharpens corners like the reference's
 * weighted-area variant.
 */
object Simplify {

  /** Squared distance from (px,py) to segment (x1,y1)-(x2,y2). */
  @inline def sqSegDist(px: Double, py: Double,
                        x1: Double, y1: Double, x2: Double, y2: Double): Double = {
    var x = x1
    var y = y1
    var dx = x2 - x
    var dy = y2 - y
    if (dx != 0d || dy != 0d) {
      val t = ((px - x) * dx + (py - y) * dy) / (dx * dx + dy * dy)
      if (t > 1) { x = x2; y = y2 }
      else if (t > 0) { x += dx * t; y += dy * t }
    }
    dx = px - x
    dy = py - y
    dx * dx + dy * dy
  }

  /**
   * DP-simplify a coordinate array. `ring=true` keeps >= 4 points.
   * Input/output: flat Array of Coordinates (JTS).
   */
  def douglasPeucker(coords: Array[Coordinate], tolerance: Double, ring: Boolean): Array[Coordinate] = {
    val minPoints = if (ring) 4 else 2
    if (coords.length <= minPoints || tolerance < 0) return coords
    val sqTolerance = tolerance * math.abs(tolerance)
    val out = new ArrayBuffer[Coordinate](coords.length / 2 max 4)
    out += coords(0)

    def sub(first: Int, last: Int, numForced: Int): Unit = {
      val force = numForced > 0
      var maxSqDist = if (force) -1.0 else sqTolerance
      var index = -1
      val x1 = coords(first).x; val y1 = coords(first).y
      val x2 = coords(last).x; val y2 = coords(last).y
      var i = first + 1
      while (i < last) {
        val d = sqSegDist(coords(i).x, coords(i).y, x1, y1, x2, y2)
        if (d > maxSqDist) { index = i; maxSqDist = d }
        i += 1
      }
      if (force || maxSqDist > sqTolerance) {
        if (index - first > 1) sub(first, index, numForced - 1)
        out += coords(index)
        if (last - index > 1) sub(index, last, numForced - 2)
      }
    }

    sub(0, coords.length - 1, minPoints - 2)
    out += coords(coords.length - 1)
    out.toArray
  }

  /** Triangle area * 2 (abs cross product). */
  @inline private def triArea2(ax: Double, ay: Double, bx: Double, by: Double,
                               cx: Double, cy: Double): Double =
    math.abs((bx - ax) * (cy - ay) - (cx - ax) * (by - ay))

  /**
   * Visvalingam-Whyatt with corner weighting. `tolerance` is a linear
   * distance like DP; internally compared against sqrt(2 * effective
   * area) so DP and VW tolerances are roughly interchangeable.
   */
  def visvalingamWhyatt(coords: Array[Coordinate], tolerance: Double,
                        weight: Double, ring: Boolean): Array[Coordinate] = {
    val minPoints = if (ring) 4 else 2
    val n = coords.length
    if (n <= minPoints || tolerance < 0) return coords
    val areaTolerance = tolerance * tolerance / 2
    // doubly-linked list over indices
    val prev = Array.tabulate(n)(_ - 1)
    val next = Array.tabulate(n)(_ + 1)
    val alive = Array.fill(n)(true)
    var count = n

    def effArea(i: Int): Double = {
      val p = prev(i); val q = next(i)
      if (p < 0 || q >= n) Double.PositiveInfinity
      else {
        val a = triArea2(coords(p).x, coords(p).y, coords(i).x, coords(i).y,
          coords(q).x, coords(q).y) / 2
        // weighted variant: sharp corners get a boosted area so they survive
        if (weight == 0) a
        else {
          val cos = {
            val ux = coords(p).x - coords(i).x; val uy = coords(p).y - coords(i).y
            val vx = coords(q).x - coords(i).x; val vy = coords(q).y - coords(i).y
            val d = math.sqrt((ux * ux + uy * uy) * (vx * vx + vy * vy))
            if (d == 0) 1.0 else (ux * vx + uy * vy) / d
          }
          a * (1 + weight * cos)
        }
      }
    }

    var changed = true
    while (changed && count > minPoints) {
      changed = false
      // find min-area alive interior point
      var minI = -1
      var minA = Double.PositiveInfinity
      var i = next(0)
      while (i < n - 1) {
        if (alive(i)) {
          val a = effArea(i)
          if (a < minA) { minA = a; minI = i }
        }
        i = next(i)
      }
      if (minI >= 0 && minA < areaTolerance) {
        alive(minI) = false
        next(prev(minI)) = next(minI)
        prev(next(minI)) = prev(minI)
        count -= 1
        changed = true
      }
    }
    coords.zipWithIndex.collect { case (c, i) if alive(i) => c }
  }

  private def transform(geom: Geometry, f: (Array[Coordinate], Boolean) => Array[Coordinate]): Geometry = {
    val gf = geom.getFactory
    geom match {
      case p: Point => p.copy()
      case mp: MultiPoint => mp.copy()
      case l: LineString =>
        val c = f(l.getCoordinates, false)
        if (c.length >= 2) gf.createLineString(c) else gf.createLineString(Array.empty[Coordinate])
      case p: Polygon =>
        val shell = f(p.getExteriorRing.getCoordinates, true)
        if (shell.length < 4 || !shell.head.equals2D(shell.last)) gf.createPolygon()
        else {
          val holes = (0 until p.getNumInteriorRing).flatMap { i =>
            val h = f(p.getInteriorRingN(i).getCoordinates, true)
            if (h.length >= 4 && h.head.equals2D(h.last)) Some(gf.createLinearRing(h)) else None
          }
          gf.createPolygon(gf.createLinearRing(shell), holes.toArray)
        }
      case gc: GeometryCollection =>
        val parts = (0 until gc.getNumGeometries).map(i => transform(gc.getGeometryN(i), f))
          .filter(g => g != null && !g.isEmpty)
        gf.buildGeometry(java.util.Arrays.asList(parts: _*))
      case other => other.copy()
    }
  }

  /** DP-simplify any geometry; rings keep >=4 points, degenerates drop. */
  def dp(geom: Geometry, tolerance: Double): Geometry =
    if (geom == null || geom.isEmpty || tolerance < 0) geom
    else transform(geom, (c, ring) => douglasPeucker(c, tolerance, ring))

  /** VW-simplify any geometry. */
  def vw(geom: Geometry, tolerance: Double, weight: Double = 0.7): Geometry =
    if (geom == null || geom.isEmpty || tolerance < 0) geom
    else transform(geom, (c, ring) => visvalingamWhyatt(c, tolerance, weight, ring))

  /**
   * Dual-midpoint (Chaikin) smoothing — reference
   * `geo/DualMidpointSmoother.java:24-64`: each vertex is "cut" by
   * replacing the segments around it with points at ratios `a` and `b`
   * along each segment (0.25/0.75 = classic Chaikin corner cutting),
   * repeated `iters` times. Rings stay closed; open lines keep their
   * endpoints. `minOffset` stops early once no remaining vertex
   * deviates more than that distance from the line between its
   * neighbors (the chaikinToTolerance variant).
   */
  def dualMidpointSmooth(coords: Array[Coordinate], iters: Int,
                         a: Double = 0.25, b: Double = 0.75,
                         minOffset: Double = 0.0): Array[Coordinate] = {
    var cur = coords
    val minSq = minOffset * minOffset
    var it = 0
    var done = false
    while (it < iters && !done && cur.length > 2) {
      val closed = cur.head.equals2D(cur.last)
      val last = cur.length - 1
      val out = new ArrayBuffer[Coordinate](cur.length * 2)
      // each interior VERTEX is "squashed" into the b-point of the
      // incoming segment + the a-point of the outgoing one (unless it
      // is already within the tolerance); endpoints stay (lines) or the
      // closing vertex squashes too (rings)
      def squash(p: Coordinate, v: Coordinate, n: Coordinate): Unit = {
        if (minOffset > 0 && offsetSq(p, v, n) < minSq) out += v
        else {
          out += new Coordinate(p.x + (v.x - p.x) * b, p.y + (v.y - p.y) * b)
          out += new Coordinate(v.x + (n.x - v.x) * a, v.y + (n.y - v.y) * a)
        }
      }
      out += cur(0) // placeholder for rings, real start for lines
      var i = 1
      while (i < last) { squash(cur(i - 1), cur(i), cur(i + 1)); i += 1 }
      if (closed) {
        squash(cur(last - 1), cur(0), cur(1))
        out(0) = out.last
      } else out += cur(last)
      if (out.length == cur.length) done = true // nothing squashed
      cur = out.toArray
      it += 1
    }
    cur
  }

  def chaikin(geom: Geometry, iters: Int): Geometry =
    transform(geom, (c, _) => dualMidpointSmooth(c, iters))

  /** squared distance of b from segment a-c. */
  private def offsetSq(a: Coordinate, b: Coordinate, c: Coordinate): Double = {
    val dx = c.x - a.x; val dy = c.y - a.y
    val len2 = dx * dx + dy * dy
    if (len2 == 0) { val ex = b.x - a.x; val ey = b.y - a.y; ex * ex + ey * ey }
    else {
      val cross = (b.x - a.x) * dy - (b.y - a.y) * dx
      cross * cross / len2
    }
  }

  /**
   * Midpoint smoothing (planetiler `geo/MidpointSmoother.java`): replace
   * each segment with its midpoint, iteratively.
   */
  def midpointSmooth(coords: Array[Coordinate], iters: Int): Array[Coordinate] = {
    var cur = coords
    var it = 0
    while (it < iters && cur.length > 2) {
      val closed = cur.head.equals2D(cur.last)
      val out = new ArrayBuffer[Coordinate](cur.length)
      if (!closed) out += cur.head
      var i = 0
      while (i < cur.length - 1) {
        out += new Coordinate((cur(i).x + cur(i + 1).x) / 2, (cur(i).y + cur(i + 1).y) / 2)
        i += 1
      }
      if (!closed) out += cur.last else out += out.head
      cur = out.toArray
      it += 1
    }
    cur
  }
}
