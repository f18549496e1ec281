package graft.engine

import graft.geo.Simplify
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
 * - mergeLineStrings: same-attrs lines -> stitched strokes via an
 *   endpoint-node graph (grid snap, degree-2 joins, stub stripping,
 *   min-length drop, DP simplify) — the LoopLineMerger behavior
 *   (`util/LoopLineMerger.java`) minus loop-breaking, which only
 *   affects degenerate ring roads at low zoom
 * - mergeNearbyPolygons: same-attrs polygons -> buffer(+d) ∪ union ∪
 *   buffer(-d) with JTS-failure fallbacks, min-area / min-hole-area
 *   filters (`FeatureMerge.java:291-513`)
 */
object FeatureMerge {

  /** Group features by identical (packed) attrs and geometry type. */
  private def groupByAttrs(feats: Seq[Mvt.LayerFeature], geomType: Int):
      (Seq[(Array[Byte], Seq[Mvt.LayerFeature])], Seq[Mvt.LayerFeature]) = {
    val (target, rest) = feats.partition(_.geomType == geomType)
    val grouped = target.groupBy(f => scala.collection.immutable.ArraySeq.unsafeWrapArray(f.attrs))
      .toSeq.map { case (_, fs) => (fs.head.attrs, fs) }.sortBy(_._2.head.id)
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
   * Stitch connected same-attrs linestrings.
   *
   * @param minLengthPx   drop merged strokes shorter than this (px)
   * @param tolerancePx   DP simplify tolerance after merge (px)
   * @param stubMinPx     strip dangling stubs shorter than this (px)
   */
  def mergeLineStrings(feats: Seq[Mvt.LayerFeature],
                       minLengthPx: Double = 0.0,
                       tolerancePx: Double = -1,
                       stubMinPx: Double = 0.0,
                       mergeStrokes: Boolean = false): Seq[Mvt.LayerFeature] = {
    val pxToLocal = Mvt.Extent / 256.0 // 1 px = 16 extent units
    val (groups, rest) = groupByAttrs(feats, 2)
    rest ++ groups.flatMap { case (attrs, fs) =>
      val lines = fs.flatMap(f => Mvt.decodeCommands(2, f.commands).map(_._2))
        .filter(_.length >= 2)
      val merged = stitch(lines, stubMinPx * pxToLocal, mergeStrokes)
        .filter(l => minLengthPx <= 0 || lineLength(l) >= minLengthPx * pxToLocal)
        .map { l =>
          if (tolerancePx < 0) l
          else {
            val cs = l.map { case (x, y) => new Coordinate(x.toDouble, y.toDouble) }
            Simplify.douglasPeucker(cs, tolerancePx * pxToLocal, ring = false)
              .map(c => (math.round(c.x).toInt, math.round(c.y).toInt))
          }
        }
        .filter(_.length >= 2)
      if (merged.isEmpty) None
      else Some(Mvt.LayerFeature(fs.head.id, 2, Mvt.encodeLines(merged), attrs))
    }
  }

  private def lineLength(pts: Array[(Int, Int)]): Double = {
    var len = 0.0
    var i = 0
    while (i < pts.length - 1) {
      val dx = (pts(i + 1)._1 - pts(i)._1).toDouble
      val dy = (pts(i + 1)._2 - pts(i)._2).toDouble
      len += math.sqrt(dx * dx + dy * dy)
      i += 1
    }
    len
  }

  /** Endpoint-graph stitching: join lines at shared endpoints where
    * exactly two lines meet; then strip short stubs and re-join; with
    * `mergeStrokes`, additionally connect the straightest pairs at
    * 3+-way junctions, largest angle first (reference
    * `util/LoopLineMerger.java:121-225`, opt-in there too). */
  private def stitch(lines0: Seq[Array[(Int, Int)]], stubMin: Double,
                     mergeStrokes: Boolean = false): Seq[Array[(Int, Int)]] = {
    var lines = lines0.map(_.clone).toBuffer
    var changed = true
    def endpoints(l: Array[(Int, Int)]) = (l.head, l.last)

    def joinPass(): Unit = {
      changed = true
      while (changed) {
        changed = false
        val byEnd = mutable.HashMap.empty[(Int, Int), ArrayBuffer[Int]]
        lines.indices.foreach { i =>
          val (a, b) = endpoints(lines(i))
          byEnd.getOrElseUpdate(a, ArrayBuffer.empty) += i
          if (b != a) byEnd.getOrElseUpdate(b, ArrayBuffer.empty) += i
        }
        val dead = mutable.HashSet.empty[Int]
        byEnd.foreach { case (node, idxs0) =>
          val idxs = idxs0.filterNot(dead)
          if (idxs.length == 2 && idxs(0) != idxs(1)) {
            val i = idxs(0); val j = idxs(1)
            var a = lines(i); var b = lines(j)
            // orient a to END at node, b to START at node
            if (a.head == node) a = a.reverse
            if (b.last == node) b = b.reverse
            if (a.last == node && b.head == node) {
              lines(i) = a ++ b.drop(1)
              dead += j
              changed = true
            }
          }
        }
        if (dead.nonEmpty) {
          lines = lines.indices.filterNot(dead).map(lines).toBuffer
        }
      }
    }

    joinPass()
    if (stubMin > 0) {
      // strip short dangling stubs (free endpoint on a short line) and
      // re-join — mirrors the reference's stub removal iteration
      val degree = mutable.HashMap.empty[(Int, Int), Int]
      lines.foreach { l =>
        degree(l.head) = degree.getOrElse(l.head, 0) + 1
        degree(l.last) = degree.getOrElse(l.last, 0) + 1
      }
      val kept = lines.filterNot { l =>
        lineLength(l) < stubMin &&
          (degree(l.head) == 1 || degree(l.last) == 1)
      }
      if (kept.length != lines.length) {
        lines = kept
        joinPass()
      }
    }
    if (mergeStrokes) {
      // straightest-continuation pairs at 3+-degree junctions: compute
      // the angle between each incident pair, sort descending (closest
      // to a straight line first), greedily join disjoint pairs
      var changedStrokes = true
      while (changedStrokes) {
        changedStrokes = false
        val byEnd = mutable.HashMap.empty[(Int, Int), ArrayBuffer[Int]]
        lines.indices.foreach { i =>
          val l = lines(i)
          byEnd.getOrElseUpdate(l.head, ArrayBuffer.empty) += i
          if (l.last != l.head) byEnd.getOrElseUpdate(l.last, ArrayBuffer.empty) += i
        }
        val dead = mutable.HashSet.empty[Int]
        byEnd.toSeq.filter(_._2.length >= 3).foreach { case (node, idxs0) =>
          val idxs = idxs0.filterNot(dead).distinct
          if (idxs.length >= 3) {
            def dirInto(i: Int): Double = {
              val l = lines(i)
              val (a, b) = if (l.head == node) (l(1), l(0)) else (l(l.length - 2), l(l.length - 1))
              math.atan2((b._2 - a._2).toDouble, (b._1 - a._1).toDouble)
            }
            val pairs = for {
              ii <- idxs.indices; jj <- (ii + 1) until idxs.length
            } yield {
              val turn = math.abs(normAngle(dirInto(idxs(ii)) - dirInto(idxs(jj)) - math.Pi))
              (idxs(ii), idxs(jj), turn)
            }
            val taken = mutable.HashSet.empty[Int]
            pairs.sortBy(_._3).foreach { case (i, j, _) =>
              if (!taken(i) && !taken(j) && !dead(i) && !dead(j) && i != j) {
                var a = lines(i); var b = lines(j)
                if (a.head == node) a = a.reverse
                if (b.last == node) b = b.reverse
                if (a.last == node && b.head == node) {
                  lines(i) = a ++ b.drop(1)
                  dead += j
                  taken += i; taken += j
                  changedStrokes = true
                }
              }
            }
          }
        }
        if (dead.nonEmpty) lines = lines.indices.filterNot(dead).map(lines).toBuffer
        if (changedStrokes) joinPass()
      }
    }
    lines.toSeq
  }

  @inline private def normAngle(a0: Double): Double = {
    var a = a0
    while (a > math.Pi) a -= 2 * math.Pi
    while (a < -math.Pi) a += 2 * math.Pi
    a
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
              // JTS failure fallback chain like the reference: buffer(0)
              try union(geoms.map(_.buffer(0)))
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
