package graft.geo

/**
 * Web-mercator "world coordinate" math: lon/lat <-> unit square where
 * (0,0) is the NW corner and (1,1) the SE corner at zoom 0.
 *
 * Semantics follow the reference engine's coordinate model
 * (planetiler `geo/GeoUtils.java:164-254`) but are re-derived from the
 * standard web-mercator formulas; everything here is a pure function so
 * it can run inside whole-stage-codegen'd Catalyst expressions or plain
 * column arithmetic.
 */
object Mercator {
  /** Web-mercator latitude clamp: beyond this the projection diverges. */
  val MaxLat: Double = 85.05112877980659
  val MinLat: Double = -MaxLat

  @inline def clampLat(lat: Double): Double =
    math.min(MaxLat, math.max(MinLat, lat))

  /** lon (deg) -> world x in [0,1]. */
  @inline def worldX(lon: Double): Double = (lon + 180.0) / 360.0

  /** lat (deg) -> world y in [0,1] (0 = north pole side). */
  @inline def worldY(lat: Double): Double = {
    val l = clampLat(lat)
    val sin = math.sin(math.toRadians(l))
    0.5 - 0.25 * math.log((1 + sin) / (1 - sin)) / math.Pi
  }

  /** world x in [0,1] -> lon (deg). */
  @inline def lon(worldX: Double): Double = worldX * 360.0 - 180.0

  /** world y in [0,1] -> lat (deg). */
  @inline def lat(worldY: Double): Double =
    math.toDegrees(math.atan(math.sinh(math.Pi * (1 - 2 * worldY))))

  /** Number of tiles along one axis at zoom z. */
  @inline def tilesAtZoom(z: Int): Int = 1 << z

  /** world coord -> integer tile index at zoom z, clamped into range. */
  @inline def tileIndex(world: Double, z: Int): Int = {
    val n = tilesAtZoom(z)
    val i = math.floor(world * n).toInt
    if (i < 0) 0 else if (i >= n) n - 1 else i
  }

  /** Meters per pixel at the equator for a zoom (256px tiles). */
  @inline def metersPerPixelAtEquator(zoom: Int): Double =
    40075016.686 / (256L << zoom).toDouble

  val EarthRadiusMeters = 6371008.8

  /** Haversine distance in meters between two lon/lat points. */
  def metersBetween(lon0: Double, lat0: Double, lon1: Double, lat1: Double): Double = {
    val dLat = math.toRadians(lat1 - lat0)
    val dLon = math.toRadians(lon1 - lon0)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat0)) * math.cos(math.toRadians(lat1)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * EarthRadiusMeters * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /**
   * Pack a lon/lat into one long at 2x31-bit quantization over the
   * valid range (the reference packs node locations the same way to fit
   * its long->long node store; we keep it as a compact, shuffle-friendly
   * key encoding).
   */
  def encodeLoc(lon: Double, lat: Double): Long = {
    val x = ((lon + 180.0) / 360.0 * ((1L << 31) - 1)).toLong & 0x7fffffffL
    val y = ((lat + 90.0) / 180.0 * ((1L << 31) - 1)).toLong & 0x7fffffffL
    (x << 31) | y
  }

  def decodeLon(loc: Long): Double =
    ((loc >>> 31) & 0x7fffffffL).toDouble / ((1L << 31) - 1) * 360.0 - 180.0

  def decodeLat(loc: Long): Double =
    (loc & 0x7fffffffL).toDouble / ((1L << 31) - 1) * 180.0 - 90.0
}
