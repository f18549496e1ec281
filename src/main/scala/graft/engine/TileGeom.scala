package graft.engine

import org.locationtech.jts.geom._
import scala.collection.mutable.ArrayBuffer

/**
 * Converters between MVT geometry commands (tile-local extent-4096
 * integer space) and JTS geometries, used by the per-tile post-process
 * operators (FeatureMerge). Coordinates stay in tile units.
 */
object TileGeom {
  private val gf = new GeometryFactory(new PrecisionModel(), 0)

  def factory: GeometryFactory = gf

  /** commands -> JTS geometry in tile-local coords. */
  def toJts(geomType: Int, commands: Array[Int]): Geometry = {
    val parts = Mvt.decodeCommands(geomType, commands)
    geomType match {
      case 1 =>
        val pts = parts.flatMap(_._2).map { case (x, y) => new Coordinate(x, y) }
        if (pts.size == 1) gf.createPoint(pts.head)
        else gf.createMultiPointFromCoords(pts.toArray)
      case 2 =>
        val lines = parts.map(_._2).filter(_.length >= 2)
          .map(p => gf.createLineString(p.map { case (x, y) => new Coordinate(x.toDouble, y.toDouble) }))
        if (lines.size == 1) lines.head else gf.createMultiLineString(lines.toArray)
      case 3 =>
        // rings in order: positive area (surveyor, y-down) = shell,
        // negative = hole of the preceding shell
        val polys = ArrayBuffer.empty[Polygon]
        var shell: Array[Coordinate] = null
        var holes = ArrayBuffer.empty[LinearRing]
        def closeRing(p: Array[(Int, Int)]): Array[Coordinate] = {
          val c = p.map { case (x, y) => new Coordinate(x.toDouble, y.toDouble) }
          if (c.length >= 3 && !c.head.equals2D(c.last)) c :+ c.head.copy() else c
        }
        def flush(): Unit = if (shell != null) {
          polys += gf.createPolygon(gf.createLinearRing(shell), holes.toArray)
          shell = null
          holes = ArrayBuffer.empty
        }
        parts.foreach { case (_, pts) =>
          val ring = closeRing(pts)
          if (ring.length >= 4) {
            val area = signedArea(ring)
            if (area >= 0) { flush(); shell = ring }
            else if (shell != null) holes += gf.createLinearRing(ring)
          }
        }
        flush()
        if (polys.size == 1) polys.head else gf.createMultiPolygon(polys.toArray)
      case _ => gf.createGeometryCollection()
    }
  }

  private def signedArea(c: Array[Coordinate]): Double = {
    var a = 0.0
    var i = 0
    while (i < c.length - 1) {
      a += c(i).x * c(i + 1).y - c(i + 1).x * c(i).y
      i += 1
    }
    a
  }

  /** JTS geometry (tile-local coords) -> (geomType, commands); rounds
    * to ints, drops degenerates. */
  def fromJts(g: Geometry): Option[(Int, Array[Int])] = {
    def pts(cs: Array[Coordinate]): Array[(Int, Int)] =
      cs.map(c => (math.round(c.x).toInt, math.round(c.y).toInt))
    g match {
      case p: Point =>
        Some((1, Mvt.encodePoints(Array((math.round(p.getX).toInt, math.round(p.getY).toInt)))))
      case mp: MultiPoint =>
        Some((1, Mvt.encodePoints(pts(mp.getCoordinates))))
      case l: LineString =>
        val c = Mvt.encodeLines(Seq(pts(l.getCoordinates)))
        if (c.isEmpty) None else Some((2, c))
      case ml: MultiLineString =>
        val lines = (0 until ml.getNumGeometries).map(i => pts(ml.getGeometryN(i).getCoordinates))
        val c = Mvt.encodeLines(lines)
        if (c.isEmpty) None else Some((2, c))
      case poly: Polygon => fromPolys(Seq(poly))
      case mp: MultiPolygon =>
        fromPolys((0 until mp.getNumGeometries).map(mp.getGeometryN(_).asInstanceOf[Polygon]))
      case gc: GeometryCollection =>
        // keep ALL polygonal members (recursively) and encode them
        // together — returning just the first MultiPolygon member would
        // silently drop sibling Polygons after overlay ops
        def collectPolys(g: Geometry): Seq[Polygon] = g match {
          case p: Polygon => Seq(p)
          case mp: MultiPolygon =>
            (0 until mp.getNumGeometries).map(mp.getGeometryN(_).asInstanceOf[Polygon])
          case c: GeometryCollection =>
            (0 until c.getNumGeometries).flatMap(i => collectPolys(c.getGeometryN(i)))
          case _ => Seq.empty
        }
        val polys = collectPolys(gc)
        if (polys.nonEmpty) fromPolys(polys) else None
      case _ => None
    }
  }

  private def fromPolys(polys: Seq[Polygon]): Option[(Int, Array[Int])] = {
    def ringPts(r: LineString, positive: Boolean): Array[(Int, Int)] = {
      val cs = r.getCoordinates.map(c => (math.round(c.x).toInt, math.round(c.y).toInt))
      var a = 0L
      var i = 0
      while (i < cs.length - 1) {
        a += cs(i)._1.toLong * cs(i + 1)._2 - cs(i + 1)._1.toLong * cs(i)._2
        i += 1
      }
      if ((a > 0) != positive && a != 0) cs.reverse else cs
    }
    val rings = polys.flatMap { p =>
      val shell = ringPts(p.getExteriorRing, positive = true)
      val holes = (0 until p.getNumInteriorRing).map(i => ringPts(p.getInteriorRingN(i), positive = false))
      shell +: holes
    }
    val c = Mvt.encodeRings(rings)
    if (c.isEmpty) None else Some((3, c))
  }
}
