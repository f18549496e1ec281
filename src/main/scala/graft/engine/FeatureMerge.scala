package graft.engine

import org.locationtech.jts.geom._
import org.locationtech.jts.operation.buffer.BufferOp
import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/**
 * Per-tile feature merge operators (reference: `FeatureMerge.java`):
 * run inside the tile assembler's `mapGroups` on one tile's features —
 * the whole tile is small, so these are pure list-in/list-out
 * functions; distribution comes from the tile-level parallelism.
 *
 * - mergeMultiPoint: same-attrs points -> one multipoint
 *   (`FeatureMerge.java:116-118`)
 * - mergeLineStrings: same-attrs lines -> merged strokes via the noded
 *   edge graph in [[LineMerger]] (midpoint noding, degree-2 joins,
 *   loop breaking, stub stripping, pinned-junction simplify, stroke
 *   merge, min-length drop — full `util/LoopLineMerger.java` behavior)
 * - mergeNearbyPolygons: same-attrs polygons -> buffer(+d) ∪ union ∪
 *   buffer(-d) with JTS-failure fallbacks, min-area / min-hole-area
 *   filters (`FeatureMerge.java:291-513`)
 */
object FeatureMerge {

  /** Group features by identical (packed) attrs + coordinate scale and
    * geometry type. Scale participates in the key because two features
    * at different extra-precision scales live in different integer
    * coordinate spaces — merging them as one group would stitch
    * mismatched grids and unscale half the group by the wrong power of
    * two. Groups come back in FIRST-OCCURRENCE order of the input (the
    * sorted-run draw order the meta-sort established), not hash order. */
  private def groupByAttrs(feats: Seq[Mvt.LayerFeature], geomType: Int):
      (Seq[(Array[Byte], Seq[Mvt.LayerFeature])], Seq[Mvt.LayerFeature]) = {
    val (target, rest) = feats.partition(_.geomType == geomType)
    val grouped = target.zipWithIndex
      .groupBy { case (f, _) =>
        (scala.collection.immutable.ArraySeq.unsafeWrapArray(f.attrs), f.scale)
      }
      .toSeq.map { case (_, fs) => (fs.head._2, (fs.head._1.attrs, fs.map(_._1))) }
      .sortBy(_._1).map(_._2)
    (grouped, rest)
  }

  def mergeMultiPoint(feats: Seq[Mvt.LayerFeature]): Seq[Mvt.LayerFeature] = {
    val (groups, rest) = groupByAttrs(feats, 1)
    rest ++ groups.map { case (attrs, fs) =>
      val pts = fs.flatMap(f => Mvt.decodeCommands(1, f.commands).flatMap(_._2))
      Mvt.LayerFeature(fs.head.id, 1, Mvt.encodePoints(pts.toArray), attrs)
    }
  }

  /**
   * Stitch connected same-attrs linestrings through the graph merger
   * (noding at midpoint intersections, degree-2 chain merge, loop
   * breaking, stub removal, pinned-junction simplify, optional stroke
   * merge — the LoopLineMerger semantics).
   *
   * @param minLengthPx   drop merged strokes shorter than this (px)
   * @param tolerancePx   DP simplify tolerance after merge (px); < 0 off
   * @param stubMinPx     strip dangling stubs shorter than this (px)
   * @param loopMinPx     break loops shorter than this, keeping the
   *                      shortest path between the loop endpoints (px)
   */
  def mergeLineStrings(feats: Seq[Mvt.LayerFeature],
                       minLengthPx: Double = 0.0,
                       tolerancePx: Double = -1,
                       stubMinPx: Double = 0.0,
                       loopMinPx: Double = 0.0,
                       mergeStrokes: Boolean = false): Seq[Mvt.LayerFeature] = {
    val (groups, rest) = groupByAttrs(feats, 2)
    rest ++ groups.flatMap { case (attrs, fs) =>
      // px thresholds convert at the group's (possibly extra-precision)
      // coordinate resolution
      val scale = fs.head.scale
      val pxToLocal = (Mvt.Extent << scale) / 256.0
      val params = LineMerger.Params(
        minLength = minLengthPx * pxToLocal,
        loopMinLength = loopMinPx * pxToLocal,
        stubMinLength = stubMinPx * pxToLocal,
        tolerance = if (tolerancePx < 0) -1 else tolerancePx * pxToLocal,
        mergeStrokes = mergeStrokes)
      val lines = fs.flatMap(f => Mvt.decodeCommands(2, f.commands).map(_._2))
        .filter(_.length >= 2)
      val merged = LineMerger.merge(lines, params).filter(_.length >= 2)
      if (merged.isEmpty) None
      else Some(Mvt.LayerFeature(fs.head.id, 2, Mvt.encodeLines(merged), attrs, scale))
    }
  }

  /**
   * Drop points farther than `maxBufferPx` outside the tile clip box —
   * the reference's `maxPointBuffer` option (`FeatureMerge.java:678-695`,
   * applied `FeatureGroup.java:422-442`): buffered copies of labels are
   * kept for cross-tile rendering, but only within the renderer's real
   * buffer need. Multipoints keep their surviving points; features with
   * none left vanish.
   */
  def removePointsOutsideBuffer(feats: Seq[Mvt.LayerFeature],
                                maxBufferPx: Double): Seq[Mvt.LayerFeature] = {
    if (maxBufferPx < 0) return feats
    val buf = maxBufferPx * (Mvt.Extent / 256.0)
    val lo = -buf
    val hi = Mvt.Extent + buf
    feats.flatMap { f =>
      if (f.geomType != 1) Some(f)
      else {
        val pts = Mvt.decodeCommands(1, f.commands).flatMap(_._2)
          .filter { case (x, y) => x >= lo && x <= hi && y >= lo && y <= hi }
        if (pts.isEmpty) None
        else Some(f.copy(commands = Mvt.encodePoints(pts.toArray)))
      }
    }
  }

  /**
   * Merge overlapping/nearby same-attrs polygons.
   *
   * @param minDistPx     polygons closer than this merge (buffer +d/-d)
   * @param minAreaPx2    drop result polygons smaller than this (px^2)
   * @param minHoleAreaPx2 drop holes smaller than this (px^2)
   */
  def mergeNearbyPolygons(feats: Seq[Mvt.LayerFeature],
                          minDistPx: Double = 0.0,
                          minAreaPx2: Double = 0.0,
                          minHoleAreaPx2: Double = 0.0): Seq[Mvt.LayerFeature] = {
    val px = Mvt.Extent / 256.0
    val px2 = px * px
    val (groups, rest) = groupByAttrs(feats, 3)
    rest ++ groups.flatMap { case (attrs, fs) =>
      val geoms = fs.map(f => TileGeom.toJts(3, f.commands)).filter(g => !g.isEmpty)
      if (geoms.isEmpty) None
      else {
        val d = minDistPx * px / 2
        val merged: Geometry =
          try {
            val u =
              if (d > 0) {
                val buffered = geoms.map(g => BufferOp.bufferOp(g, d, 1))
                union(buffered)
              } else union(geoms)
            val shrunk = if (d > 0) BufferOp.bufferOp(u, -d, 1) else u
            shrunk
          } catch {
            case _: Exception =>
              // escalation chain like the reference: snapAndFix each
              // input (buffer(0) -> precision reduce -> GeometryFixer),
              // then union; final fallback keeps the biggest input
              try union(geoms.map(g => graft.geo.PolygonFixer.snapAndFix(g)))
              catch { case _: Exception => geoms.maxBy(_.getArea) }
          }
        val polys = extractPolygons(merged)
          .filter(p => minAreaPx2 <= 0 || p.getArea >= minAreaPx2 * px2)
          .map(p => dropSmallHoles(p, minHoleAreaPx2 * px2))
        if (polys.isEmpty) None
        else TileGeom.fromJts(
          if (polys.size == 1) polys.head
          else TileGeom.factory.createMultiPolygon(polys.toArray))
          .map { case (gt, cmds) => Mvt.LayerFeature(fs.head.id, gt, cmds, attrs) }
      }
    }
  }

  private def union(gs: Seq[Geometry]): Geometry =
    if (gs.size == 1) gs.head
    else org.locationtech.jts.operation.union.UnaryUnionOp.union(
      java.util.Arrays.asList(gs: _*))

  private def extractPolygons(g: Geometry): Seq[Polygon] = g match {
    case p: Polygon => Seq(p)
    case mp: MultiPolygon => (0 until mp.getNumGeometries).map(mp.getGeometryN(_).asInstanceOf[Polygon])
    case gc: GeometryCollection =>
      (0 until gc.getNumGeometries).flatMap(i => extractPolygons(gc.getGeometryN(i)))
    case _ => Seq.empty
  }

  private def dropSmallHoles(p: Polygon, minHoleArea: Double): Polygon = {
    if (minHoleArea <= 0 || p.getNumInteriorRing == 0) p
    else {
      val keep = (0 until p.getNumInteriorRing).map(p.getInteriorRingN)
        .filter(r => math.abs(org.locationtech.jts.algorithm.Area.ofRingSigned(r.getCoordinates)) >= minHoleArea)
      TileGeom.factory.createPolygon(p.getExteriorRing, keep.toArray)
    }
  }
}
