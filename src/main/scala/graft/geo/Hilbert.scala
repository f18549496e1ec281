package graft.geo

/**
 * Hilbert curve index on a 2^order x 2^order grid (order <= 15 keeps the
 * index in 30 bits, so (zoom, hilbertIndex) packs into a long).
 *
 * The reference engine orders tiles on a Hilbert curve so that adjacent
 * tiles land near each other in the output archive (planetiler
 * `util/Hilbert.java`, `geo/TileCoord.java:157-161`). We use the same
 * curve as the *range-partitioning key*: range-partitioning on a Hilbert
 * tile id gives every Spark partition a spatially-compact set of tiles,
 * which keeps tile post-processing (merges touch only one tile) and the
 * ordered archive drain sequential.
 *
 * Implementation: classic iterative rotate/flip walk (public-domain
 * Hilbert curve construction, cf. Hamilton's compact Hilbert indices).
 * Pure integer math -> safe in codegen and deterministic everywhere.
 */
object Hilbert {
  /** (x, y) on a 2^order grid -> Hilbert distance. */
  def xyToIndex(order: Int, x0: Int, y0: Int): Long = {
    var rx = 0
    var ry = 0
    var x = x0
    var y = y0
    var d = 0L
    var s = 1 << (order - 1)
    while (s > 0) {
      rx = if ((x & s) > 0) 1 else 0
      ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s.toLong * ((3 * rx) ^ ry)
      // rotate
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Hilbert distance -> (x, y) on a 2^order grid, packed as (x << 32 | y). */
  def indexToXY(order: Int, index: Long): (Int, Int) = {
    var rx = 0L
    var ry = 0L
    var t = index
    var x = 0L
    var y = 0L
    var s = 1L
    val n = 1L << order
    while (s < n) {
      rx = 1L & (t / 2)
      ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (x.toInt, y.toInt)
  }
}
