package graft.geo

import org.locationtech.jts.geom.{Coordinate, CoordinateFilter, Geometry}

/**
 * Input-CRS handling for the file sources (reference
 * `reader/ShapefileReader.java:44,132` and
 * `reader/GeoPackageReader.java`, which reproject any input CRS to
 * WGS84 via GeoTools). The sandbox ships no GeoTools, so this
 * implements the cases that cover nearly all open-data inputs —
 * WGS84 lon/lat (identity), EPSG:3857 spherical web mercator
 * (closed-form inverse), and the two projected families of [[Proj]]:
 * ellipsoidal Transverse Mercator (every UTM zone, OSGB/EPSG:27700,
 * Gauss-Krüger grids) and Lambert Conformal Conic (Lambert-93, state
 * planes), with `TOWGS84` Helmert datum shifts — and HARD-FAILS
 * loudly on any other projection method instead of silently emitting
 * garbage coordinates.
 */
object Crs {

  sealed trait Srs
  case object Wgs84 extends Srs
  case object WebMercator extends Srs
  /** A TM/LCC projected CRS parsed from WKT or a known EPSG id. */
  final case class Projected(crs: Proj.ProjectedCrs) extends Srs

  /** Spherical mercator radius (EPSG:3857 uses the WGS84 semi-major
    * axis as a sphere). */
  val EarthRadius = 6378137.0

  /**
   * Classify a WKT CRS definition (.prj file content, or a
   * `gpkg_spatial_ref_sys.definition`). Empty/absent input means the
   * dataset carries no CRS declaration — treated as WGS84 lon/lat,
   * the historical assumption of this reader.
   */
  def parseWkt(wkt: String): Srs = {
    val w = Option(wkt).getOrElse("").toUpperCase
    if (w.trim.isEmpty) Wgs84
    else if (w.contains("PROJCS") || w.contains("PROJCRS")) {
      // projected CRS: web mercator is the one supported projection.
      // (Its WKT also names WGS_1984 as the datum, so the projected
      // check must run before the geographic one.)
      if (w.contains("3857") || w.contains("900913") ||
          w.contains("PSEUDO-MERCATOR") || w.contains("PSEUDO_MERCATOR") ||
          w.contains("WEB_MERCATOR") || w.contains("WEB MERCATOR")) WebMercator
      else Proj.parseProjcsWkt(wkt).map(Projected.apply).getOrElse(
        throw new IllegalArgumentException(
          "unsupported projected CRS (supported: WGS84 lon/lat, EPSG:3857 web mercator, " +
            "Transverse Mercator/UTM, Lambert Conformal Conic): " + wkt.take(200)))
    } else if (w.contains("WGS_1984") || w.contains("WGS 84") ||
               w.contains("WGS84") || w.contains("4326")) Wgs84
    else throw new IllegalArgumentException(
      "unsupported CRS (supported: WGS84 lon/lat, EPSG:3857 web mercator): " + wkt.take(200))
  }

  /** Classify a GeoPackage srs_id; `definition` (the WKT from
    * `gpkg_spatial_ref_sys`) resolves non-standard ids. */
  def fromSrsId(id: Long, definition: => Option[String] = None): Srs = id match {
    case 4326 | 0 | -1 => Wgs84 // 0/-1 = gpkg "undefined" srs
    case 3857 | 900913 => WebMercator
    // well-known projected ids resolvable without a definition:
    case z if z >= 32601 && z <= 32660 => Projected(Proj.utm((z - 32600).toInt, north = true))
    case z if z >= 32701 && z <= 32760 => Projected(Proj.utm((z - 32700).toInt, north = false))
    case 27700 => Projected(Proj.osgb36)
    case 2154 => Projected(Proj.lambert93)
    case _ => parseWkt(definition.getOrElse(throw new IllegalArgumentException(
      s"unsupported srs_id $id and no gpkg_spatial_ref_sys definition to classify it")))
  }

  /** EPSG:3857 -> EPSG:4326, closed form. */
  def mercatorToLon(x: Double): Double = x / EarthRadius * (180.0 / math.Pi)
  def mercatorToLat(y: Double): Double =
    (2.0 * math.atan(math.exp(y / EarthRadius)) - math.Pi / 2.0) * (180.0 / math.Pi)

  /** Reproject a geometry to WGS84 in place (identity for Wgs84). */
  def toWgs84(g: Geometry, srs: Srs): Geometry = srs match {
    case Wgs84 => g
    case WebMercator =>
      g.apply(new CoordinateFilter {
        override def filter(c: Coordinate): Unit = {
          val lon = mercatorToLon(c.x)
          val lat = mercatorToLat(c.y)
          c.x = lon
          c.y = lat
        }
      })
      g.geometryChanged()
      g
    case Projected(crs) =>
      g.apply(new CoordinateFilter {
        override def filter(c: Coordinate): Unit = {
          val (lon, lat) = crs.toWgs84(c.x, c.y)
          c.x = lon
          c.y = lat
        }
      })
      g.geometryChanged()
      g
  }
}
