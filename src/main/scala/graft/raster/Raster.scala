package graft.raster

import graft.geo.{Geo, RingAssembler}
import graft.model.SourceFeature
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, Geometry}

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/**
 * Raster → vector: the north-star extension (SURVEY §7.6, no
 * reference analog). `media_ref` spans act as raster DEM tile refs;
 * the DEM is hillshaded with the standard Horn kernel and the shaded
 * (or raw) field is vectorized to polygons via marching squares, so
 * shade bands enter the tile pipeline as just another polygon layer
 * (FeatureSpec → render → merge — the engine core stays unaware).
 *
 * Everything is per-raster-tile local work inside `mapPartitions`:
 * no shuffle is added by the raster stage itself; distribution comes
 * from the docs scan like every other feature source. At 100 TB the
 * DEM tiles are just more rows.
 */
object Raster {

  // -------------------------------------------------------------------------
  // synthetic DEM (deterministic; no external data in the sandbox)
  // -------------------------------------------------------------------------

  /** Deterministic smooth-ish field seeded from the media ref: a sum
    * of three integer-frequency cosines, elevations in [0, 200]. */
  def synthDem(ref: String, w: Int, h: Int): Array[Float] = {
    val seed = scala.util.hashing.MurmurHash3.stringHash(ref)
    val f1 = 1 + (seed & 3); val f2 = 1 + ((seed >> 2) & 3); val p = (seed >> 4) & 7
    val out = new Array[Float](w * h)
    var j = 0
    while (j < h) {
      var i = 0
      while (i < w) {
        val x = i.toDouble / (w - 1); val y = j.toDouble / (h - 1)
        val v = 100.0 + 50.0 * math.cos(2 * math.Pi * (f1 * x + p / 8.0)) +
          30.0 * math.cos(2 * math.Pi * f2 * y) +
          20.0 * math.cos(2 * math.Pi * (x + y))
        out(j * w + i) = v.toFloat
        i += 1
      }
      j += 1
    }
    out
  }

  // -------------------------------------------------------------------------
  // Horn hillshade
  // -------------------------------------------------------------------------

  /**
   * Standard Horn (1981) 3×3 slope/aspect hillshade, the GDAL/Esri
   * formula: shade = cos(zenith)·cos(slope) +
   * sin(zenith)·sin(slope)·cos(azimuth − aspect), scaled to [0, 255]
   * and clamped at 0. Border cells replicate their neighbors
   * (clamped indexing), so the output grid has the input's size.
   */
  def hillshade(elev: Array[Float], w: Int, h: Int, cellSize: Double,
                azimuthDeg: Double = 315.0, altitudeDeg: Double = 45.0): Array[Float] = {
    val zenith = math.toRadians(90.0 - altitudeDeg)
    val azimuth = math.toRadians(360.0 - azimuthDeg + 90.0) // to math convention
    val cosZ = math.cos(zenith); val sinZ = math.sin(zenith)
    val out = new Array[Float](w * h)
    @inline def e(i: Int, j: Int): Double =
      elev(math.min(h - 1, math.max(0, j)) * w + math.min(w - 1, math.max(0, i))).toDouble
    var j = 0
    while (j < h) {
      var i = 0
      while (i < w) {
        val a = e(i - 1, j - 1); val b = e(i, j - 1); val c = e(i + 1, j - 1)
        val d = e(i - 1, j); val f = e(i + 1, j)
        val g = e(i - 1, j + 1); val hh = e(i, j + 1); val ii = e(i + 1, j + 1)
        val dzdx = ((c + 2 * f + ii) - (a + 2 * d + g)) / (8.0 * cellSize)
        val dzdy = ((g + 2 * hh + ii) - (a + 2 * b + c)) / (8.0 * cellSize)
        val slope = math.atan(math.sqrt(dzdx * dzdx + dzdy * dzdy))
        val aspect =
          if (dzdx != 0.0) {
            val as = math.atan2(dzdy, -dzdx)
            if (as < 0) as + 2 * math.Pi else as
          } else if (dzdy > 0) math.Pi / 2
          else if (dzdy < 0) 3 * math.Pi / 2
          else 0.0
        val shade = cosZ * math.cos(slope) + sinZ * math.sin(slope) * math.cos(azimuth - aspect)
        out(j * w + i) = (255.0 * math.max(0.0, shade)).toFloat
        i += 1
      }
      j += 1
    }
    out
  }

  // -------------------------------------------------------------------------
  // marching squares
  // -------------------------------------------------------------------------

  /**
   * Vectorize `field >= threshold` to (multi)polygons via marching
   * squares with linear edge interpolation. Segments are emitted
   * ORIENTED (region on the left), stitched with an O(n) hash walk
   * (crossing coordinates are computed identically from both adjacent
   * cells, so endpoint equality is bitwise), and nested into
   * shells/holes by [[RingAssembler.polygonize]].
   *
   * The grid is implicitly padded with a `padValue` border (must be
   * below the threshold), so regions touching the raster edge still
   * close — with 0/full binary fields and a mid threshold, border
   * crossings land exactly mid-edge like every interior crossing.
   * Coordinates are in
   * grid units: corner (i, j) at (i, j), interpolated crossings in
   * between; callers scale/translate afterwards.
   *
   * The ambiguous saddle cases (5/10) connect such that the two
   * above-threshold corners stay SEPARATE (the standard "no diagonal
   * bridge" resolution); total area is the same either way.
   */
  def marchingSquares(field: Array[Float], w: Int, h: Int, threshold: Double,
                      padValue: Double = 0.0): Geometry = {
    require(threshold > padValue,
      s"marchingSquares: threshold $threshold must exceed padValue $padValue")
    @inline def v(i: Int, j: Int): Double =
      if (i < 0 || j < 0 || i >= w || j >= h) padValue else field(j * w + i).toDouble
    // interpolated crossing on the segment a->b (value va -> vb)
    @inline def lerp(a: Double, va: Double, b: Double, vb: Double): Double =
      a + (threshold - va) / (vb - va) * (b - a)

    val segs = ArrayBuffer[(Coordinate, Coordinate)]()
    var j = -1
    while (j < h) {
      var i = -1
      while (i < w) {
        // cell corners: tl=(i,j) tr=(i+1,j) br=(i+1,j+1) bl=(i,j+1)
        val tl = v(i, j); val tr = v(i + 1, j); val br = v(i + 1, j + 1); val bl = v(i, j + 1)
        var cse = 0
        if (tl >= threshold) cse |= 8
        if (tr >= threshold) cse |= 4
        if (br >= threshold) cse |= 2
        if (bl >= threshold) cse |= 1
        // edge crossing points (only defined when the edge crosses)
        def top = new Coordinate(lerp(i, tl, i + 1, tr), j)
        def right = new Coordinate(i + 1, lerp(j, tr, j + 1, br))
        def bottom = new Coordinate(lerp(i, bl, i + 1, br), j + 1)
        def left = new Coordinate(i, lerp(j, tl, j + 1, bl))
        // oriented so the >= region is on the LEFT of each segment
        cse match {
          case 0 | 15 => ()
          case 8 => segs += ((left, top))
          case 4 => segs += ((top, right))
          case 2 => segs += ((right, bottom))
          case 1 => segs += ((bottom, left))
          case 12 => segs += ((left, right))
          case 6 => segs += ((top, bottom))
          case 3 => segs += ((right, left))
          case 9 => segs += ((bottom, top))
          case 14 => segs += ((left, bottom))
          case 13 => segs += ((bottom, right))
          case 11 => segs += ((right, top))
          case 7 => segs += ((top, left))
          case 10 => // tl+br high: keep corners separate
            segs += ((left, top)); segs += ((right, bottom))
          case 5 => // tr+bl high: keep corners separate
            segs += ((top, right)); segs += ((bottom, left))
          case _ => ()
        }
        i += 1
      }
      j += 1
    }
    if (segs.isEmpty) return Geo.factory.createPolygon()

    // O(n) stitch: walk start-point -> segment
    val byStart = new mutable.HashMap[(Double, Double), mutable.Queue[Int]]()
    segs.indices.foreach { k =>
      byStart.getOrElseUpdate((segs(k)._1.x, segs(k)._1.y), mutable.Queue.empty) += k
    }
    val used = new Array[Boolean](segs.length)
    val rings = ArrayBuffer[Array[Coordinate]]()
    segs.indices.foreach { k0 =>
      if (!used(k0)) {
        val ring = ArrayBuffer[Coordinate](segs(k0)._1)
        var k = k0
        var ok = true
        while (ok && !used(k)) {
          used(k) = true
          val end = segs(k)._2
          ring += end
          if (end.equals2D(ring.head)) ok = false // closed
          else byStart.get((end.x, end.y)).flatMap(q => q.dequeueFirst(!used(_))) match {
            case Some(nk) => k = nk
            case None => ok = false; ring.clear() // dangling (shouldn't happen)
          }
        }
        if (ring.length >= 4) rings += ring.toArray
      }
    }
    RingAssembler.polygonize(rings.toSeq)
  }

  /** Exact area (in grid cells) of `field >= threshold` under
    * midpoint-free marching squares — the per-cell case sum the gate
    * oracle mirrors in SQL. Only valid for BINARY fields (every value
    * far from the threshold on one side), where interpolation lands
    * mid-edge and each case area is a fixed multiple of 1/8. */
  def binaryCaseAreaX8(bits: (Int, Int) => Boolean, w: Int, h: Int): Long = {
    var area = 0L
    var j = -1
    while (j < h) {
      var i = -1
      while (i < w) {
        @inline def b(ii: Int, jj: Int): Boolean =
          ii >= 0 && jj >= 0 && ii < w && jj < h && bits(ii, jj)
        val n = (if (b(i, j)) 1 else 0) + (if (b(i + 1, j)) 1 else 0) +
          (if (b(i + 1, j + 1)) 1 else 0) + (if (b(i, j + 1)) 1 else 0)
        area += (n match {
          case 0 => 0L
          case 1 => 1L
          case 3 => 7L
          case 4 => 8L
          case 2 =>
            val diagonal = (b(i, j) && b(i + 1, j + 1)) || (b(i + 1, j) && b(i, j + 1))
            if (diagonal) 2L else 4L
        })
        i += 1
      }
      j += 1
    }
    area
  }

  // -------------------------------------------------------------------------
  // pipeline integration
  // -------------------------------------------------------------------------

  /**
   * docs → hillshade-band polygon SourceFeatures: every doc with a
   * media span gets a synthetic DEM anchored at its geometry point,
   * hillshaded, vectorized at `threshold`, and emitted as a polygon
   * feature in layer `hillshade` (tags carry the band). Pure per-row
   * work — the stage adds no shuffle.
   */
  def hillshadeFeatures(docs: DataFrame, gridSize: Int = 33, threshold: Double = 160.0,
                        spanDeg: Double = 0.05): Dataset[SourceFeature] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"),
        try_element_at(filter(col("spans"), s => s.getField("kind") === "media"), lit(1))
          .getField("media_ref").as("ref"),
        try_element_at(filter(col("spans"), s => s.getField("kind") === "geom"), lit(1))
          .getField("text").as("wkt"))
      .where(col("ref").isNotNull && col("wkt").isNotNull)
      .as[(String, String, String)]
      .flatMap { case (docId, ref, wkt) =>
        val anchor = Geo.fromWktOrNull(wkt)
        if (anchor == null) Iterator.empty
        else {
          val c = anchor.getCoordinate
          val dem = synthDem(ref, gridSize, gridSize)
          val shade = hillshade(dem, gridSize, gridSize, cellSize = 30.0)
          val g = marchingSquares(shade, gridSize, gridSize, threshold)
          if (g.isEmpty) Iterator.empty
          else {
            // grid units -> lon/lat: scale to spanDeg, footprint CENTERED
            // on the doc point in both axes. Raster row j increases
            // DOWNWARD (north-up convention), so the y axis flips (-s)
            // with the anchor at the top edge — a real DEM tile shades
            // with the correct azimuth orientation
            val s = spanDeg / (gridSize - 1)
            val t = org.locationtech.jts.geom.util.AffineTransformation.scaleInstance(s, -s)
            t.translate(c.x - spanDeg / 2, c.y + spanDeg / 2)
            val placed = t.transform(g)
            Iterator.single(SourceFeature(docId + "#shade", "raster", Geo.toWkb(placed),
              Map("layer" -> "hillshade", "band" -> threshold.toInt.toString),
              docId.hashCode.toLong))
          }
        }
      }
  }
}
