package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.{Crs, Proj}
import graft.geo.Proj._

/**
 * Projection math pinned against independently published worked
 * examples: the Ordnance Survey's "A guide to coordinate systems in
 * Great Britain" Annex worked example for EPSG:27700, and Snyder
 * (USGS PP 1395, 1987) numerical examples for ellipsoidal Transverse
 * Mercator and Lambert Conformal Conic — plus a closed-form spherical
 * cross-check and dense round-trip grids.
 */
class ProjSpec extends AnyFunSuite {

  // OS worked example ("Caister water tower"), OSGB36 datum coords
  private val CaisterLat = 52 + 39.0 / 60 + 27.2531 / 3600
  private val CaisterLon = 1 + 43.0 / 60 + 4.5177 / 3600
  private val CaisterE = 651409.903
  private val CaisterN = 313177.270

  test("OSGB36 TM forward matches the OS worked example to the mm") {
    val (e, n) = osgb36.proj.forward(CaisterLon, CaisterLat)
    assert(math.abs(e - CaisterE) < 0.002, s"easting $e")
    assert(math.abs(n - CaisterN) < 0.002, s"northing $n")
  }

  test("OSGB36 TM inverse recovers the worked-example lat/lon") {
    val (lon, lat) = osgb36.proj.inverse(CaisterE, CaisterN)
    assert(math.abs(lon - CaisterLon) < 1e-7, s"lon $lon")
    assert(math.abs(lat - CaisterLat) < 1e-7, s"lat $lat")
  }

  test("Snyder PP 1395 TM numerical example (Clarke 1866, zone-18 parameters)") {
    // p.269: lat 40d30'N lon 73d30'W, lon0 = -75, k0 = 0.9996, no false offsets
    val tm = TransverseMercator(Ellipsoid.Clarke1866, 0, -75, 0.9996, 0, 0)
    val (x, y) = tm.forward(-73.5, 40.5)
    assert(math.abs(x - 127106.5) < 0.3, s"x $x")
    assert(math.abs(y - 4484124.4) < 0.3, s"y $y")
    val (lon, lat) = tm.inverse(127106.5, 4484124.4)
    assert(math.abs(lon - (-73.5)) < 1e-6 && math.abs(lat - 40.5) < 1e-6)
  }

  test("Snyder PP 1395 LCC numerical example (Clarke 1866, 2SP 33/45)") {
    // p.296: lat0 23, lon0 -96, point 35N 75W
    val lcc = LambertConformalConic(Ellipsoid.Clarke1866, 23, -96, 33, 45, 1.0, 0, 0)
    val (x, y) = lcc.forward(-75, 35)
    assert(math.abs(x - 1894410.9) < 0.3, s"x $x")
    assert(math.abs(y - 1564649.5) < 0.3, s"y $y")
    val (lon, lat) = lcc.inverse(1894410.9, 1564649.5)
    assert(math.abs(lon - (-75)) < 1e-6 && math.abs(lat - 35) < 1e-6)
  }

  test("natural-origin identities: UTM north/south, Lambert-93") {
    val (e33, n33) = utm(33, north = true).proj.forward(15.0, 0.0)
    assert(math.abs(e33 - 500000.0) < 1e-6 && math.abs(n33) < 1e-6)
    val (eS, nS) = utm(33, north = false).proj.forward(15.0, 0.0)
    assert(math.abs(eS - 500000.0) < 1e-6 && math.abs(nS - 10000000.0) < 1e-6)
    val (eF, nF) = lambert93.proj.forward(3.0, 46.5)
    assert(math.abs(eF - 700000.0) < 1e-4 && math.abs(nF - 6600000.0) < 1e-4)
  }

  test("series TM agrees with the exact spherical closed form on a sphere") {
    val r = 6370997.0
    val sph = TransverseMercator(Ellipsoid(r, 0), 0, 0, 1.0, 0, 0)
    for (lonD <- Seq(-3.0, -1.5, 0.7, 2.9); latD <- Seq(-75.0, -40.0, 0.0, 12.0, 60.0, 80.0)) {
      val (xs, ys) = sph.forward(lonD, latD)
      val b = math.cos(math.toRadians(latD)) * math.sin(math.toRadians(lonD))
      val xe = r * 0.5 * math.log((1 + b) / (1 - b))
      val ye = r * math.atan(math.tan(math.toRadians(latD)) / math.cos(math.toRadians(lonD)))
      assert(math.abs(xs - xe) < 0.01 && math.abs(ys - ye) < 0.01,
        s"($lonD,$latD): series ($xs,$ys) vs exact ($xe,$ye)")
    }
  }

  test("round-trip grids: forward then inverse is identity to ~1e-8 deg") {
    def roundTrip(p: Projection, lons: Seq[Double], lats: Seq[Double]): Unit =
      for (lon <- lons; lat <- lats) {
        val (e, n) = p.forward(lon, lat)
        val (lon2, lat2) = p.inverse(e, n)
        assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7,
          s"${p.getClass.getSimpleName} ($lon,$lat) -> ($lon2,$lat2)")
      }
    roundTrip(utm(33, north = true).proj,
      Seq(12.0, 15.0, 17.9), Seq(-79.0, -30.0, 0.0, 45.5, 71.0))
    // 6 deg off the central meridian at high latitude (out of zone):
    // series truncation grows but stays in the mm class
    val far = utm(33, north = true).proj
    val (fe2, fn2) = far.forward(9.0, -79.0)
    val (flon, flat) = far.inverse(fe2, fn2)
    assert(math.abs(flon - 9.0) < 1e-5 && math.abs(flat - -79.0) < 1e-5)
    roundTrip(utm(19, north = false).proj,
      Seq(-71.0, -69.0, -66.1), Seq(-55.0, -33.0, -1.0))
    roundTrip(osgb36.proj, Seq(-5.7, -2.0, 1.7), Seq(49.9, 54.0, 60.8))
    roundTrip(lambert93.proj, Seq(-4.8, 3.0, 9.5), Seq(41.3, 46.5, 51.1))
  }

  test("geodetic <-> ECEF round trip is exact") {
    for (lon <- Seq(-179.0, -60.0, 0.0, 120.0); lat <- Seq(-85.0, -20.0, 0.0, 45.0, 85.0)) {
      val (x, y, z) = geodeticToEcef(lon, lat, Ellipsoid.Wgs84)
      val (lon2, lat2) = ecefToGeodetic(x, y, z, Ellipsoid.Wgs84)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9)
    }
  }

  test("helmert: identity short-circuit, OSGB datum shift magnitude") {
    val (lon0, lat0) = datumToWgs84(-2.0, 52.0, Ellipsoid.Wgs84, Helmert.Identity)
    assert(lon0 == -2.0 && lat0 == 52.0)
    // OSGB36 -> WGS84 over England is famously a ~50-150 m horizontal shift
    val (lonW, latW) = datumToWgs84(-2.0, 52.0, Ellipsoid.Airy1830, osgb36.toWgs84Shift)
    val dMetres = math.hypot((lonW - -2.0) * 111320.0 * math.cos(math.toRadians(52)),
      (latW - 52.0) * 111132.0)
    assert(dMetres > 50 && dMetres < 150, s"shift $dMetres m")
  }

  test("WKT1 PROJCS for EPSG:27700 parses to the osgb36 constants") {
    val wkt = """PROJCS["OSGB 1936 / British National Grid",GEOGCS["OSGB 1936",""" +
      """DATUM["OSGB_1936",SPHEROID["Airy 1830",6377563.396,299.3249646],""" +
      """TOWGS84[446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894]],""" +
      """PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],""" +
      """PROJECTION["Transverse_Mercator"],PARAMETER["latitude_of_origin",49],""" +
      """PARAMETER["central_meridian",-2],PARAMETER["scale_factor",0.9996012717],""" +
      """PARAMETER["false_easting",400000],PARAMETER["false_northing",-100000],""" +
      """UNIT["metre",1]]"""
    val crs = parseProjcsWkt(wkt).get
    val (e, n) = crs.proj.forward(CaisterLon, CaisterLat)
    assert(math.abs(e - CaisterE) < 0.002 && math.abs(n - CaisterN) < 0.002)
    assert(math.abs(crs.toWgs84Shift.dx - 446.448) < 1e-9)
    assert(math.abs(crs.toWgs84Shift.dsPpm - -20.4894) < 1e-9)
  }

  test("WKT2 PROJCRS for a UTM zone parses (METHOD + long parameter names)") {
    val wkt = """PROJCRS["WGS 84 / UTM zone 33N",BASEGEOGCRS["WGS 84",""" +
      """DATUM["World Geodetic System 1984",ELLIPSOID["WGS 84",6378137,298.257223563,""" +
      """LENGTHUNIT["metre",1]]]],CONVERSION["UTM zone 33N",""" +
      """METHOD["Transverse Mercator",ID["EPSG",9807]],""" +
      """PARAMETER["Latitude of natural origin",0,ANGLEUNIT["degree",0.0174532925199433]],""" +
      """PARAMETER["Longitude of natural origin",15,ANGLEUNIT["degree",0.0174532925199433]],""" +
      """PARAMETER["Scale factor at natural origin",0.9996,SCALEUNIT["unity",1]],""" +
      """PARAMETER["False easting",500000,LENGTHUNIT["metre",1]],""" +
      """PARAMETER["False northing",0,LENGTHUNIT["metre",1]]],""" +
      """CS[Cartesian,2],AXIS["(E)",east],AXIS["(N)",north],LENGTHUNIT["metre",1]]"""
    val crs = parseProjcsWkt(wkt).get
    val want = utm(33, north = true)
    for (lon <- Seq(12.3, 15.0, 17.8); lat <- Seq(-40.0, 0.0, 58.2)) {
      val (e1, n1) = crs.proj.forward(lon, lat)
      val (e2, n2) = want.proj.forward(lon, lat)
      assert(math.abs(e1 - e2) < 1e-6 && math.abs(n1 - n2) < 1e-6)
    }
  }

  test("foreign linear unit (US survey foot) scales easting/northing") {
    // a Texas-style LCC state plane declared in US survey feet
    val ftPerM = 0.30480060960121924
    val wkt = """PROJCS["NAD83 / Texas North Central (ftUS)",GEOGCS["NAD83",""" +
      """DATUM["North_American_Datum_1983",SPHEROID["GRS 1980",6378137,298.257222101]],""" +
      """UNIT["degree",0.0174532925199433]],PROJECTION["Lambert_Conformal_Conic_2SP"],""" +
      """PARAMETER["standard_parallel_1",32.13333333333333],""" +
      """PARAMETER["standard_parallel_2",33.96666666666667],""" +
      """PARAMETER["latitude_of_origin",31.66666666666667],""" +
      """PARAMETER["central_meridian",-98.5],""" +
      """PARAMETER["false_easting",1968500],PARAMETER["false_northing",6561666.666666666],""" +
      """UNIT["US survey foot",0.3048006096012192]]"""
    val crs = parseProjcsWkt(wkt).get
    val metric = LambertConformalConic(Ellipsoid.Grs80, 31.66666666666667, -98.5,
      32.13333333333333, 33.96666666666667, 1.0,
      1968500 * ftPerM, 6561666.666666666 * ftPerM)
    // inverse of FEET easting/northing must equal the metric inverse of metres
    val eFt = 2300000.0; val nFt = 7000000.0
    val (lon1, lat1) = crs.proj.inverse(eFt, nFt)
    val (lon2, lat2) = metric.inverse(eFt * ftPerM, nFt * ftPerM)
    assert(math.abs(lon1 - lon2) < 1e-9 && math.abs(lat1 - lat2) < 1e-9,
      s"($lon1,$lat1) vs ($lon2,$lat2)")
  }

  test("unsupported projection methods are refused, not defaulted") {
    val sinu = """PROJCS["World_Sinusoidal",GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",""" +
      """SPHEROID["WGS_1984",6378137.0,298.257223563]]],PROJECTION["Sinusoidal"],""" +
      """PARAMETER["central_meridian",0],UNIT["Meter",1]]"""
    assert(parseProjcsWkt(sinu).isEmpty)
    val e = intercept[IllegalArgumentException] { Crs.parseWkt(sinu) }
    assert(e.getMessage.contains("unsupported"))
  }

  test("srs_id shortcuts: UTM zone bands, 27700, 2154") {
    val z33 = Crs.fromSrsId(32633).asInstanceOf[Crs.Projected].crs
    val (e, n) = z33.proj.forward(15.0, 0.0)
    assert(math.abs(e - 500000.0) < 1e-6 && math.abs(n) < 1e-6)
    val z19s = Crs.fromSrsId(32719).asInstanceOf[Crs.Projected].crs
    val (lonS, latS) = z19s.proj.inverse(500000.0, 10000000.0)
    assert(math.abs(lonS - -69.0) < 1e-9 && math.abs(latS) < 1e-9)
    assert(Crs.fromSrsId(27700) == Crs.Projected(osgb36))
    assert(Crs.fromSrsId(2154) == Crs.Projected(lambert93))
  }

  test("Crs.toWgs84 applies the projected path to whole geometries") {
    val gf = graft.geo.Geo.factory
    val (e1, n1) = utm(33, north = true).proj.forward(14.2, 47.1)
    val (e2, n2) = utm(33, north = true).proj.forward(15.6, 48.3)
    val line = gf.createLineString(Array(
      new org.locationtech.jts.geom.Coordinate(e1, n1),
      new org.locationtech.jts.geom.Coordinate(e2, n2)))
    val out = Crs.toWgs84(line, Crs.Projected(utm(33, north = true)))
    val cs = out.getCoordinates
    assert(math.abs(cs(0).x - 14.2) < 1e-7 && math.abs(cs(0).y - 47.1) < 1e-7)
    assert(math.abs(cs(1).x - 15.6) < 1e-7 && math.abs(cs(1).y - 48.3) < 1e-7)
  }
}
