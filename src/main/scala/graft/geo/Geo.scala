package graft.geo

import org.locationtech.jts.geom._
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader, WKTWriter}

/**
 * JTS interop: thread-local WKT/WKB codecs (JTS readers are not
 * thread-safe) and lon/lat <-> world-coordinate geometry transforms.
 * Geometries travel between Spark stages as WKB `BINARY` columns —
 * compact, Tungsten-friendly, and column-prunable.
 */
object Geo {
  val factory = new GeometryFactory(new PrecisionModel(), 4326)

  private val wktReader = ThreadLocal.withInitial[WKTReader](() => new WKTReader(factory))
  private val wkbReader = ThreadLocal.withInitial[WKBReader](() => new WKBReader(factory))
  private val wkbWriter = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter())
  private val wktWriter = ThreadLocal.withInitial[WKTWriter](() => new WKTWriter())

  def fromWkt(wkt: String): Geometry = wktReader.get().read(wkt)
  def fromWkb(wkb: Array[Byte]): Geometry = wkbReader.get().read(wkb)
  def toWkb(g: Geometry): Array[Byte] = wkbWriter.get().write(g)
  def toWkt(g: Geometry): String = wktWriter.get().write(g)

  /** True iff the WKB encodes a (2D/Z/M/ZM) Point — a 5-byte header
    * peek, no geometry parse. Used where a stream is split point vs
    * non-point and only the point branch needs the full decode. */
  def wkbIsPoint(wkb: Array[Byte]): Boolean = {
    if (wkb == null || wkb.length < 5) return false
    val t =
      if (wkb(0) == 1) // little-endian
        (wkb(1) & 0xff) | ((wkb(2) & 0xff) << 8) | ((wkb(3) & 0xff) << 16) | ((wkb(4) & 0xff) << 24)
      else
        (wkb(4) & 0xff) | ((wkb(3) & 0xff) << 8) | ((wkb(2) & 0xff) << 16) | ((wkb(1) & 0xff) << 24)
    // 1 = Point; 1001/2001/3001 = ISO Z/M/ZM; EWKB sets flag bits
    // instead: Z=0x80000000, M=0x40000000, SRID=0x20000000 — mask all
    // three so a PostGIS-dumped point is still recognized (missing the
    // M/SRID flags here would route the same feature down BOTH branches
    // of a point/non-point stream split and duplicate it)
    (t & 0x1fffffff) % 1000 == 1
  }

  def fromWktOrNull(wkt: String): Geometry =
    try { if (wkt == null) null else fromWkt(wkt) } catch { case _: Exception => null }

  /** lon/lat geometry -> world coordinates ([0,1] unit square). */
  def latLonToWorld(g: Geometry): Geometry = {
    val out = g.copy()
    out.apply(new CoordinateFilter {
      override def filter(c: Coordinate): Unit = {
        c.x = Mercator.worldX(c.x)
        c.y = Mercator.worldY(c.y)
      }
    })
    out.geometryChanged()
    out
  }

  /** world-coordinate geometry -> lon/lat. */
  def worldToLatLon(g: Geometry): Geometry = {
    val out = g.copy()
    out.apply(new CoordinateFilter {
      override def filter(c: Coordinate): Unit = {
        val lon = Mercator.lon(c.x)
        val lat = Mercator.lat(c.y)
        c.x = lon
        c.y = lat
      }
    })
    out.geometryChanged()
    out
  }

  def point(lon: Double, lat: Double): Point =
    factory.createPoint(new Coordinate(lon, lat))

  /** Axis-aligned rectangle polygon. */
  def rect(xmin: Double, ymin: Double, xmax: Double, ymax: Double): Polygon =
    factory.createPolygon(Array(
      new Coordinate(xmin, ymin), new Coordinate(xmax, ymin),
      new Coordinate(xmax, ymax), new Coordinate(xmin, ymax),
      new Coordinate(xmin, ymin)))
}
