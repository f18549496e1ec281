package graft.geo

import org.locationtech.jts.geom._
import org.locationtech.jts.algorithm.construct.MaximumInscribedCircle
import org.locationtech.jts.algorithm.Orientation

/**
 * Geometry-derivation operators a profile can apply to a source
 * feature (reference `FeatureCollector.java:96-325` /
 * `geo/WithGeometry.java:122-254`): centroid, point-on-surface,
 * innermost point, centroid-if-convex, line midpoint / interpolation /
 * sub-ranges, plus spherical measures.
 */
object GeomOps {

  def centroid(g: Geometry): Point = g.getCentroid

  def pointOnSurface(g: Geometry): Point = g.getInteriorPoint

  /** Center of the maximum inscribed circle (the visually-centered
    * label point for concave polygons); `tolerancePct` of sqrt(area)
    * like the reference's default. */
  def innermostPoint(g: Geometry, tolerancePct: Double = 0.1): Point = g match {
    case p: Polygon =>
      val tol = math.sqrt(p.getArea) * tolerancePct
      MaximumInscribedCircle.getCenter(p, math.max(tol, 1e-12)) match {
        case pt: Point => pt
        case _ => p.getInteriorPoint
      }
    case mp: MultiPolygon if !mp.isEmpty =>
      // largest part wins, like the reference
      val largest = (0 until mp.getNumGeometries).map(mp.getGeometryN(_).asInstanceOf[Polygon])
        .maxBy(_.getArea)
      innermostPoint(largest, tolerancePct)
    case other => other.getInteriorPoint
  }

  /** Convexity test with slack (reference `GeoUtils.java:497-563`):
    * all turns the same sign, allowing tiny opposite-sign wobble. */
  def isConvex(ring: LinearRing, slack: Double = 1e-3): Boolean = {
    val cs = ring.getCoordinates
    if (cs.length < 4) return false
    var pos = 0.0
    var neg = 0.0
    var i = 0
    while (i < cs.length - 1) {
      val a = cs(i)
      val b = cs((i + 1) % (cs.length - 1))
      val c = cs((i + 2) % (cs.length - 1))
      val cross = (b.x - a.x) * (c.y - b.y) - (b.y - a.y) * (c.x - b.x)
      if (cross > 0) pos += cross else neg -= cross
      i += 1
    }
    val total = pos + neg
    total > 0 && (math.min(pos, neg) / total) <= slack
  }

  def centroidIfConvex(g: Geometry): Point = g match {
    case p: Polygon if p.getNumInteriorRing == 0 &&
      isConvex(p.getExteriorRing.asInstanceOf[LinearRing]) => p.getCentroid
    case other => pointOnSurface(other)
  }

  /** Point at `ratio` (0..1) along a line's length. */
  def pointAlongLine(line: LineString, ratio: Double): Point = {
    val s = new LineSplitter(line)
    s.pointAt(math.min(1.0, math.max(0.0, ratio)))
  }

  def lineMidpoint(line: LineString): Point = pointAlongLine(line, 0.5)

  /** Sub-line covering length range [a, b] (0..1). */
  def partialLine(line: LineString, a: Double, b: Double): LineString =
    new LineSplitter(line).slice(a, b)

  /** Spherical ring area (m^2) via the classic spherical-excess
    * formula (reference `GeoUtils.java:676-717`). */
  def areaMeters(g: Geometry): Double = g match {
    case p: Polygon =>
      val shell = ringAreaMeters(p.getExteriorRing.getCoordinates)
      val holes = (0 until p.getNumInteriorRing)
        .map(i => ringAreaMeters(p.getInteriorRingN(i).getCoordinates)).sum
      shell - holes
    case mp: MultiPolygon =>
      (0 until mp.getNumGeometries).map(i => areaMeters(mp.getGeometryN(i))).sum
    case _ => 0.0
  }

  private val EarthRadius = Mercator.EarthRadiusMeters // one copy of the sphere radius

  def ringAreaMeters(cs: Array[Coordinate]): Double = {
    if (cs.length < 3) return 0.0
    var total = 0.0
    var i = 0
    val n = cs.length - 1 // closed ring
    while (i < n) {
      val p1 = cs(i)
      val p2 = cs((i + 1) % n)
      total += math.toRadians(p2.x - p1.x) *
        (2 + math.sin(math.toRadians(p1.y)) + math.sin(math.toRadians(p2.y)))
      i += 1
    }
    math.abs(total * EarthRadius * EarthRadius / 2.0)
  }

  def lineLengthMeters(line: LineString): Double = {
    val cs = line.getCoordinates
    var total = 0.0
    var i = 0
    while (i < cs.length - 1) {
      total += Mercator.metersBetween(cs(i).x, cs(i).y, cs(i + 1).x, cs(i + 1).y)
      i += 1
    }
    total
  }
}

/**
 * Cached cumulative-length line accessor (reference
 * `geo/LineSplitter.java:20-60`): O(n) once, then O(log n) per query.
 */
final class LineSplitter(line: LineString) {
  private val cs = line.getCoordinates
  private val cum: Array[Double] = {
    val a = new Array[Double](cs.length)
    var i = 1
    while (i < cs.length) {
      a(i) = a(i - 1) + cs(i).distance(cs(i - 1))
      i += 1
    }
    a
  }
  private val total = cum.last

  private def locate(ratio: Double): (Int, Double, Double) = {
    val target = ratio * total
    var idx = java.util.Arrays.binarySearch(cum, target)
    if (idx < 0) idx = -idx - 2
    idx = math.min(math.max(idx, 0), cs.length - 2)
    val segLen = cum(idx + 1) - cum(idx)
    val frac = if (segLen == 0) 0.0 else (target - cum(idx)) / segLen
    (idx, frac, target)
  }

  def pointAt(ratio: Double): Point = {
    val (i, f, _) = locate(ratio)
    line.getFactory.createPoint(new Coordinate(
      cs(i).x + (cs(i + 1).x - cs(i).x) * f,
      cs(i).y + (cs(i + 1).y - cs(i).y) * f))
  }

  /** Sub-line for the length range [a, b] in 0..1. */
  def slice(a0: Double, b0: Double): LineString = {
    val a = math.max(0.0, math.min(a0, b0))
    val b = math.min(1.0, math.max(a0, b0))
    val (ia, fa, _) = locate(a)
    val (ib, fb, _) = locate(b)
    val out = scala.collection.mutable.ArrayBuffer.empty[Coordinate]
    out += new Coordinate(
      cs(ia).x + (cs(ia + 1).x - cs(ia).x) * fa,
      cs(ia).y + (cs(ia + 1).y - cs(ia).y) * fa)
    var i = ia + 1
    while (i <= ib) {
      if (!out.last.equals2D(cs(i))) out += cs(i).copy()
      i += 1
    }
    val end = new Coordinate(
      cs(ib).x + (cs(ib + 1).x - cs(ib).x) * fb,
      cs(ib).y + (cs(ib + 1).y - cs(ib).y) * fb)
    if (!out.last.equals2D(end)) out += end
    if (out.length < 2) out += out.head.copy()
    line.getFactory.createLineString(out.toArray)
  }
}

/**
 * Minimal disjoint interval map for linear-range attrs (reference
 * `util/MergingRangeMap.java` + `FeatureCollector.java:1103-1176`):
 * later puts override overlapping sub-ranges; `spans` returns merged
 * (start, end, value) runs with equal adjacent values coalesced.
 */
final class RangeMap[T](initial: T) {
  // sorted boundary -> value-from-that-boundary
  private val bounds = scala.collection.mutable.TreeMap[Double, T](0.0 -> initial)

  def put(a: Double, b: Double, value: T): Unit = {
    if (b <= a) return
    val endValue = valueAt(b)
    // remove boundaries strictly inside (a, b)
    bounds.rangeFrom(a).takeWhile(_._1 < b).map(_._1).toList.foreach(bounds.remove)
    bounds(a) = value
    if (b < 1.0) bounds(b) = endValue
  }

  def valueAt(x: Double): T =
    bounds.rangeTo(x).lastOption.map(_._2).getOrElse(initial)

  def spans: Seq[(Double, Double, T)] = {
    val bs = bounds.toSeq
    val raw = bs.zipWithIndex.map { case ((start, v), i) =>
      val end = if (i + 1 < bs.length) bs(i + 1)._1 else 1.0
      (start, end, v)
    }.filter { case (s, e, _) => e > s }
    // coalesce equal adjacent values
    raw.foldLeft(Vector.empty[(Double, Double, T)]) {
      case (acc, (s, e, v)) if acc.nonEmpty && acc.last._3 == v && acc.last._2 == s =>
        acc.init :+ ((acc.last._1, e, v))
      case (acc, span) => acc :+ span
    }
  }
}
