package graft.geo

/**
 * Tile coordinate (x, y, zoom) and its encodings into a single sortable
 * long id.
 *
 * Two orders (mirroring the reference's TMS vs Hilbert archive orders,
 * planetiler `geo/TileCoord.java:157-175`):
 *
 *  - ROW:     zoom-major, then row-major (y, x). Simple, locality-poor.
 *  - HILBERT: zoom-major, then Hilbert distance. This is the order we
 *             range-partition + sort on ("Hilbert-ordered tile id"):
 *             spatial locality => compact partitions, sequential archive
 *             writes, and better tile-content-dedup runs (ocean tiles
 *             cluster on the curve).
 *
 * Encoding layout (fits any zoom <= 15 in 36 bits, leaving the top of
 * the long free for layer/sortKey bits in the feature sort key):
 *   id = zoomOffset(z) + positionInZoom   where zoomOffset accumulates
 *   4^z tiles per zoom, so ids of different zooms never collide and
 *   sort order is (zoom asc, curve position asc).
 */
object TileCoord {
  val MaxZoom = 15

  /** Cumulative number of tiles in all zooms below z: sum_{i<z} 4^i. */
  private val zoomOffsets: Array[Long] = {
    val a = new Array[Long](MaxZoom + 2)
    var z = 0
    var acc = 0L
    while (z <= MaxZoom + 1) {
      a(z) = acc
      if (z <= MaxZoom) acc += (1L << z) * (1L << z)
      z += 1
    }
    a
  }

  @inline def zoomOffset(z: Int): Long = zoomOffsets(z)

  /** Total number of tiles in zooms 0..maxZoom inclusive. */
  def pyramidSize(maxZoom: Int): Long = zoomOffsets(maxZoom + 1)

  def encodeRow(x: Int, y: Int, z: Int): Long =
    zoomOffsets(z) + y.toLong * (1L << z) + x

  def encodeHilbert(x: Int, y: Int, z: Int): Long =
    if (z == 0) 0L else zoomOffsets(z) + Hilbert.xyToIndex(z, x, y)

  /** Decode a row-ordered id back to (x, y, z). */
  def decodeRow(id: Long): (Int, Int, Int) = {
    val z = zoomOf(id)
    val pos = id - zoomOffsets(z)
    val n = 1L << z
    ((pos % n).toInt, (pos / n).toInt, z)
  }

  /** Decode a hilbert-ordered id back to (x, y, z). */
  def decodeHilbert(id: Long): (Int, Int, Int) = {
    val z = zoomOf(id)
    if (z == 0) (0, 0, 0)
    else {
      val (x, y) = Hilbert.indexToXY(z, id - zoomOffsets(z))
      (x, y, z)
    }
  }

  def zoomOf(id: Long): Int = {
    var z = MaxZoom
    while (z > 0 && id < zoomOffsets(z)) z -= 1
    z
  }

  /** Tile id (either order) for a lon/lat point at zoom z. */
  def hilbertIdOf(lon: Double, lat: Double, z: Int): Long = {
    val x = Mercator.tileIndex(Mercator.worldX(lon), z)
    val y = Mercator.tileIndex(Mercator.worldY(lat), z)
    encodeHilbert(x, y, z)
  }

  def rowIdOf(lon: Double, lat: Double, z: Int): Long = {
    val x = Mercator.tileIndex(Mercator.worldX(lon), z)
    val y = Mercator.tileIndex(Mercator.worldY(lat), z)
    encodeRow(x, y, z)
  }
}
