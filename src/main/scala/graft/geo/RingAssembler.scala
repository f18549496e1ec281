package graft.geo

import org.locationtech.jts.geom._
import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/**
 * Multipolygon assembly from unordered, possibly-reversed line
 * segments (the reference's relation->rings step,
 * `reader/osm/OsmMultipolygon.java:97-199`): stitch segments that
 * share endpoints into closed rings, then nest rings by containment —
 * outermost = shells, odd-depth = holes. Runs per relation inside a
 * `mapGroups` after the member-way join; pure function, so the join
 * stays declarative.
 */
object RingAssembler {

  /** Stitch segments into closed rings; unclosable chains dropped
    * (returned count lets callers surface data-quality metrics). */
  def assembleRings(segments: Seq[Array[Coordinate]]): (Seq[Array[Coordinate]], Int) = {
    val open = ArrayBuffer.empty[ArrayBuffer[Coordinate]]
    segments.foreach { s => if (s.length >= 2) open += ArrayBuffer(s: _*) }
    val rings = ArrayBuffer.empty[Array[Coordinate]]
    var dropped = 0

    // index endpoints -> chain; repeatedly join chains sharing endpoints
    var progress = true
    while (open.nonEmpty && progress) {
      progress = false
      // pull closed chains out
      var i = 0
      while (i < open.length) {
        val c = open(i)
        if (c.length >= 4 && c.head.equals2D(c.last)) {
          rings += c.toArray
          open.remove(i)
          progress = true
        } else i += 1
      }
      // try to join one pair
      var joined = false
      var a = 0
      while (a < open.length && !joined) {
        var b = a + 1
        while (b < open.length && !joined) {
          val ca = open(a)
          val cb = open(b)
          val merged: ArrayBuffer[Coordinate] =
            if (ca.last.equals2D(cb.head)) { ca ++= cb.drop(1); ca }
            else if (ca.last.equals2D(cb.last)) { ca ++= cb.reverse.drop(1); ca }
            else if (ca.head.equals2D(cb.last)) { cb ++= ca.drop(1); open(a) = cb; cb }
            else if (ca.head.equals2D(cb.head)) {
              val r = ca.reverse; r ++= cb.drop(1); open(a) = r; r
            } else null
          if (merged != null) {
            open.remove(b)
            joined = true
            progress = true
          } else b += 1
        }
        a += 1
      }
    }
    dropped = open.length
    (rings.toSeq, dropped)
  }

  /**
   * Nest closed rings by containment depth and build (multi)polygon:
   * even depth = shell, odd = hole of its immediate parent.
   */
  def polygonize(rings: Seq[Array[Coordinate]], gf: GeometryFactory = Geo.factory): Geometry = {
    if (rings.isEmpty) return gf.createPolygon()
    case class R(ring: LinearRing, area: Double, poly: Polygon)
    val rs = rings.flatMap { cs =>
      try {
        val r = gf.createLinearRing(cs)
        val p = gf.createPolygon(r)
        Some(R(r, p.getArea, p))
      } catch { case _: Exception => None }
    }.sortBy(-_.area) // largest first
    if (rs.isEmpty) return gf.createPolygon()

    val parent = Array.fill(rs.length)(-1)
    for (i <- rs.indices; j <- 0 until i) {
      // smallest enclosing ring that is larger: rings sorted desc, so
      // the LAST enclosing j (smallest area > rs(i)) wins
      if (parent(i) == -1 || rs(j).area < rs(parent(i)).area) {
        if (rs(j).poly.contains(rs(i).poly.getInteriorPoint)) parent(i) = j
      }
    }
    def depth(i: Int): Int = {
      var d = 0
      var p = parent(i)
      while (p != -1) { d += 1; p = parent(p) }
      d
    }
    val shells = rs.indices.filter(i => depth(i) % 2 == 0)
    val polys = shells.map { s =>
      val holes = rs.indices.filter(i => parent(i) == s && depth(i) % 2 == 1)
        .map(i => rs(i).ring)
      gf.createPolygon(rs(s).ring, holes.toArray)
    }
    if (polys.size == 1) polys.head
    else gf.createMultiPolygon(polys.toArray)
  }

  /** segments -> (multi)polygon in one call. */
  def assemble(segments: Seq[Array[Coordinate]]): Geometry = {
    val (rings, _) = assembleRings(segments)
    polygonize(rings)
  }
}
