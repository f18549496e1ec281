package graft.geo

import scala.collection.mutable.ArrayBuffer

/**
 * Rectangle clipping primitives used by the tile slicer: axis-aligned
 * rectangle vs line / polygon, on raw coordinate arrays (interleaved
 * x,y) — no JTS overlay in the hot path.
 *
 * The reference clips features into tiles with a hand-rolled stripe
 * algorithm (planetiler `render/TiledGeometry.java:332-699`); we get the
 * same results from two classic primitives:
 *  - lines:    Cohen–Sutherland-style per-segment clip, stitching
 *              consecutive inside segments into runs;
 *  - polygons: Sutherland–Hodgman against each rectangle edge.
 */
object Clip {

  /**
   * Clip a polyline to rect [xmin,xmax]x[ymin,ymax]. Returns a list of
   * clipped sub-lines (each an array of interleaved x,y with >= 2
   * points).
   */
  def clipLine(xs: Array[Double], ys: Array[Double],
               xmin: Double, ymin: Double, xmax: Double, ymax: Double): Seq[(Array[Double], Array[Double])] = {
    val out = ArrayBuffer.empty[(Array[Double], Array[Double])]
    var curX = ArrayBuffer.empty[Double]
    var curY = ArrayBuffer.empty[Double]
    def flush(): Unit = {
      if (curX.length >= 2) out += ((curX.toArray, curY.toArray))
      curX = ArrayBuffer.empty[Double]
      curY = ArrayBuffer.empty[Double]
    }
    var i = 0
    val n = xs.length
    while (i < n - 1) {
      // clip segment (x0,y0)-(x1,y1) via Liang-Barsky
      val x0 = xs(i); val y0 = ys(i); val x1 = xs(i + 1); val y1 = ys(i + 1)
      val dx = x1 - x0; val dy = y1 - y0
      var t0 = 0.0; var t1 = 1.0
      var ok = true
      def edge(p: Double, q: Double): Unit = {
        if (ok) {
          if (p == 0) { if (q < 0) ok = false }
          else {
            val r = q / p
            if (p < 0) { if (r > t1) ok = false else if (r > t0) t0 = r }
            else { if (r < t0) ok = false else if (r < t1) t1 = r }
          }
        }
      }
      edge(-dx, x0 - xmin); edge(dx, xmax - x0)
      edge(-dy, y0 - ymin); edge(dy, ymax - y0)
      if (ok && t0 < t1) {
        val cx0 = x0 + t0 * dx; val cy0 = y0 + t0 * dy
        val cx1 = x0 + t1 * dx; val cy1 = y0 + t1 * dy
        if (curX.isEmpty || curX.last != cx0 || curY.last != cy0) {
          flush()
          curX += cx0; curY += cy0
        }
        curX += cx1; curY += cy1
      } else flush()
      i += 1
    }
    flush()
    out.toSeq
  }

  /**
   * Sutherland–Hodgman: clip a ring (closed, interleaved coords) to the
   * rectangle. Returns the clipped ring (closed) or empty.
   */
  def clipRing(xs: Array[Double], ys: Array[Double],
               xmin: Double, ymin: Double, xmax: Double, ymax: Double): (Array[Double], Array[Double]) = {
    // 4 passes: left, right, bottom, top
    var inX = xs
    var inY = ys
    var pass = 0
    while (pass < 4 && inX.length > 0) {
      val outX = new ArrayBuffer[Double](inX.length + 4)
      val outY = new ArrayBuffer[Double](inX.length + 4)
      @inline def inside(x: Double, y: Double): Boolean = pass match {
        case 0 => x >= xmin
        case 1 => x <= xmax
        case 2 => y >= ymin
        case _ => y <= ymax
      }
      @inline def intersect(x0: Double, y0: Double, x1: Double, y1: Double): (Double, Double) = pass match {
        case 0 => (xmin, y0 + (y1 - y0) * (xmin - x0) / (x1 - x0))
        case 1 => (xmax, y0 + (y1 - y0) * (xmax - x0) / (x1 - x0))
        case 2 => (x0 + (x1 - x0) * (ymin - y0) / (y1 - y0), ymin)
        case _ => (x0 + (x1 - x0) * (ymax - y0) / (y1 - y0), ymax)
      }
      val n = if (inX.head == inX.last && inY.head == inY.last) inX.length - 1 else inX.length
      var i = 0
      while (i < n) {
        val j = (i + 1) % n
        val x0 = inX(i); val y0 = inY(i); val x1 = inX(j); val y1 = inY(j)
        val in0 = inside(x0, y0); val in1 = inside(x1, y1)
        if (in0) {
          outX += x0; outY += y0
          if (!in1) { val (ix, iy) = intersect(x0, y0, x1, y1); outX += ix; outY += iy }
        } else if (in1) {
          val (ix, iy) = intersect(x0, y0, x1, y1); outX += ix; outY += iy
        }
        i += 1
      }
      inX = outX.toArray
      inY = outY.toArray
      pass += 1
    }
    if (inX.length < 3) (Array.empty, Array.empty)
    else {
      // close the ring
      if (inX.head != inX.last || inY.head != inY.last) {
        ((inX :+ inX.head), (inY :+ inY.head))
      } else (inX, inY)
    }
  }

  /** Signed area *2 of a ring (positive = counter-clockwise in y-up). */
  def signedArea2(xs: Array[Double], ys: Array[Double]): Double = {
    var a = 0.0
    var i = 0
    val n = xs.length
    while (i < n - 1) {
      a += xs(i) * ys(i + 1) - xs(i + 1) * ys(i)
      i += 1
    }
    a
  }

  /** Ray-casting point-in-ring test (odd-crossings). */
  def pointInRing(px: Double, py: Double, xs: Array[Double], ys: Array[Double]): Boolean = {
    var inside = false
    var i = 0
    var j = xs.length - 1
    while (i < xs.length) {
      if (((ys(i) > py) != (ys(j) > py)) &&
        (px < (xs(j) - xs(i)) * (py - ys(i)) / (ys(j) - ys(i)) + xs(i))) {
        inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }
}
