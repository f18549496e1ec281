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
    * (returned count lets callers surface data-quality metrics).
    *
    * Endpoint-indexed worklist, O(n) merges total (the reference's
    * `OsmMultipolygon` uses the same endpoint-map idea): each merge is
    * found via a hash lookup on the chain's endpoints, never a pair
    * scan — a 10^5-member coastline relation assembles in one linear
    * pass instead of the O(n^3) a scan-per-merge would cost. Merging
    * never creates NEW endpoint values (only consumes shared ones), so
    * a chain that finds no partner when processed is inert forever and
    * is dropped without revisiting. */
  def assembleRings(segments: Seq[Array[Coordinate]]): (Seq[Array[Coordinate]], Int) = {
    // normalize -0.0 so the hash key agrees with equals2D
    def k(c: Coordinate): (Double, Double) = (c.x + 0.0, c.y + 0.0)
    val rings = ArrayBuffer.empty[Array[Coordinate]]
    val chains = mutable.HashMap.empty[Int, ArrayBuffer[Coordinate]]
    // LinkedHashSet: deterministic partner pick (insertion order)
    val byEnd = mutable.HashMap.empty[(Double, Double), mutable.LinkedHashSet[Int]]
    val work = mutable.Queue.empty[Int]
    var nextId = 0
    def add(ch: ArrayBuffer[Coordinate]): Unit = {
      if (ch.length >= 4 && ch.head.equals2D(ch.last)) { rings += ch.toArray; return }
      val id = nextId; nextId += 1
      chains(id) = ch
      byEnd.getOrElseUpdate(k(ch.head), mutable.LinkedHashSet.empty) += id
      byEnd.getOrElseUpdate(k(ch.last), mutable.LinkedHashSet.empty) += id
      work += id
    }
    def remove(id: Int): ArrayBuffer[Coordinate] = {
      val ch = chains.remove(id).get
      Seq(k(ch.head), k(ch.last)).foreach { key =>
        byEnd.get(key).foreach { s => s -= id; if (s.isEmpty) byEnd.remove(key) }
      }
      ch
    }
    segments.foreach { s => if (s.length >= 2) add(ArrayBuffer(s: _*)) }
    while (work.nonEmpty) {
      val id = work.dequeue()
      if (chains.contains(id)) {
        val ch = chains(id)
        val partner = byEnd.get(k(ch.last)).flatMap(_.find(_ != id))
          .orElse(byEnd.get(k(ch.head)).flatMap(_.find(_ != id)))
        partner.foreach { pid =>
          val a = remove(id)
          val b = remove(pid)
          val merged: ArrayBuffer[Coordinate] =
            if (a.last.equals2D(b.head)) { a ++= b.drop(1); a }
            else if (a.last.equals2D(b.last)) { a ++= b.reverse.drop(1); a }
            else if (a.head.equals2D(b.last)) { b ++= a.drop(1); b }
            else { val r = a.reverse; r ++= b.drop(1); r } // head == head
          add(merged)
        }
      }
    }
    (rings.toSeq, chains.size)
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

    // nesting probes must not kill the task on an invalid (e.g.
    // figure-eight) ring: getInteriorPoint/contains can throw
    // TopologyException there — degrade to centroid / non-containment
    val probe = rs.map { r =>
      try r.poly.getInteriorPoint
      catch { case _: Exception => gf.createPoint(r.ring.getCoordinate) }
    }
    val parent = Array.fill(rs.length)(-1)
    for (i <- rs.indices; j <- 0 until i) {
      // smallest enclosing ring that is larger: rings sorted desc, so
      // the LAST enclosing j (smallest area > rs(i)) wins
      if (parent(i) == -1 || rs(j).area < rs(parent(i)).area) {
        val contains = try rs(j).poly.contains(probe(i)) catch { case _: Exception => false }
        if (contains) parent(i) = j
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
