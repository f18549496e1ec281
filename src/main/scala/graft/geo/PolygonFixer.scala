package graft.geo

import org.locationtech.jts.geom._
import org.locationtech.jts.geom.util.GeometryTransformer
import org.locationtech.jts.geom.impl.CoordinateArraySequence
import org.locationtech.jts.algorithm.Orientation
import org.locationtech.jts.precision.GeometryPrecisionReducer
import org.locationtech.jts.geom.util.GeometryFixer

/**
 * snapAndFixPolygon — snap polygon coordinates to a precision grid and
 * repair any self-intersections/overlaps the snapping (or the source
 * data) introduced. Mirrors the reference's escalation chain
 * (`geo/GeoUtils.java:315-399`):
 *
 *   1. pointwise round (duplicate points collapsed, short rings
 *      dropped); if the result is valid, just normalize ring
 *      orientation (shells JTS-CW, holes JTS-CCW — the reference's
 *      `OrientationFixer` rule at `geo/GeoUtils.java:319-330`; the
 *      MVT encoder re-orients to spec winding after quantization,
 *      so only consistency matters here, not the absolute sense);
 *   2. otherwise buffer(0)-fix the input if invalid, then run the
 *      topology-preserving `GeometryPrecisionReducer`;
 *   3. on robustness failure: `GeometryFixer`, reduce again;
 *   4. last resort: expand-contract by half a grid cell, reduce again.
 */
object PolygonFixer {

  /** 4096 MVT units per 256px tile = 16 units per px (the reference's
    * TILE_PRECISION). */
  val TilePrecision = new PrecisionModel(4096.0 / 256.0)

  def snapAndFix(geom: Geometry): Geometry = snapAndFix(geom, TilePrecision)

  def snapAndFix(geom0: Geometry, precision: PrecisionModel): Geometry = {
    var geom = geom0
    try {
      val snapped = new PointwiseRounder(precision).transform(geom)
      if (snapped.isValid) return new OrientationFixer().transform(snapped)
      if (!geom.isValid) geom = geom.buffer(0)
      GeometryPrecisionReducer.reduce(geom, precision)
    } catch {
      case _: TopologyException | _: IllegalArgumentException =>
        geom = GeometryFixer.fix(geom)
        try GeometryPrecisionReducer.reduce(geom, precision)
        catch {
          case _: TopologyException | _: IllegalArgumentException =>
            val buf = (1.0 / precision.getScale) / 2
            geom = geom.buffer(buf).buffer(-buf)
            GeometryPrecisionReducer.reduce(geom, precision) // throws = unrecoverable
        }
    }
  }

  /** Round each coordinate to the grid, collapsing duplicates; rings
    * that fall under 4 points vanish. */
  private final class PointwiseRounder(pm: PrecisionModel) extends GeometryTransformer {
    override protected def transformCoordinates(cs: CoordinateSequence, parent: Geometry): CoordinateSequence = {
      if (cs.size() < 4) return null
      val out = new java.util.ArrayList[Coordinate](cs.size())
      var lastX = Double.NaN
      var lastY = Double.NaN
      var i = 0
      while (i < cs.size()) {
        val x = pm.makePrecise(cs.getX(i))
        val y = pm.makePrecise(cs.getY(i))
        if (x != lastX || y != lastY) out.add(new Coordinate(x, y))
        lastX = x; lastY = y
        i += 1
      }
      if (out.size() < 4) null
      else new CoordinateArraySequence(out.toArray(new Array[Coordinate](0)))
    }
  }

  /** Normalize ring orientation — reference-identical rule
    * (`GeoUtils.java:319-330`): shells end up JTS-CW (isCCW false),
    * holes JTS-CCW. The transformer visits a polygon's shell first,
    * so `parent` changes exactly at each shell. */
  private final class OrientationFixer extends GeometryTransformer {
    private var lastPolygon: Geometry = _
    override protected def transformLinearRing(ring: LinearRing, parent: Geometry): Geometry = {
      val isOuter = lastPolygon ne parent
      lastPolygon = parent
      if (Orientation.isCCW(ring.getCoordinateSequence) == isOuter) ring.reverse() else ring
    }
  }
}
