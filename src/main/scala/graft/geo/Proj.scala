package graft.geo

/**
 * General projected-CRS support for the file sources: ellipsoidal
 * Transverse Mercator (UTM zones, national grids like EPSG:27700)
 * and Lambert Conformal Conic (Lambert-93, US state planes), plus
 * 7-parameter Helmert datum shifts (the `TOWGS84[...]` convention).
 *
 * The reference delegates this to GeoTools at read time
 * (`reader/ShapefileReader.java:44,132`); the sandbox ships no
 * GeoTools, so the two projection families that cover the vast
 * majority of projected open data are implemented from the published
 * closed forms (USGS Professional Paper 1395, Snyder 1987: TM eq.
 * 8-9..8-25, LCC eq. 15-1..15-11; Helmert per EPSG method 9606,
 * position-vector convention). Accuracy: the TM series is sub-mm
 * within a UTM-width zone; a 7-parameter shift is the standard
 * few-metre approximation of grid-based datum transforms — the same
 * accuracy class GeoTools gives without grid files.
 *
 * Everything here is pure math on doubles — safe to call from
 * executors inside source-reader tasks with no shared state.
 */
object Proj {

  /** Reference ellipsoid: semi-major axis (m) + inverse flattening. */
  final case class Ellipsoid(a: Double, invF: Double) {
    val f: Double = if (invF == 0) 0.0 else 1.0 / invF
    val e2: Double = f * (2.0 - f)
    val e: Double = math.sqrt(e2)
    /** second eccentricity squared */
    val ep2: Double = e2 / (1.0 - e2)
  }

  object Ellipsoid {
    val Wgs84 = Ellipsoid(6378137.0, 298.257223563)
    val Grs80 = Ellipsoid(6378137.0, 298.257222101)
    val Airy1830 = Ellipsoid(6377563.396, 299.3249646)
    val Intl1924 = Ellipsoid(6378388.0, 297.0)
    val Clarke1866 = Ellipsoid(6378206.4, 294.978698214)
    val Bessel1841 = Ellipsoid(6377397.155, 299.1528128)
  }

  private val D2R = math.Pi / 180.0
  private val R2D = 180.0 / math.Pi
  private val Arcsec2Rad = math.Pi / (180.0 * 3600.0)

  /**
   * 7-parameter Helmert transform, position-vector rotation
   * convention — exactly the `TOWGS84[dx,dy,dz,rx,ry,rz,ds]` tuple:
   * translations in metres, rotations in arc-seconds, scale in ppm.
   * Transforms source-datum ECEF coordinates to WGS84 ECEF.
   */
  final case class Helmert(dx: Double, dy: Double, dz: Double,
                           rx: Double, ry: Double, rz: Double,
                           dsPpm: Double) {
    def isIdentity: Boolean =
      dx == 0 && dy == 0 && dz == 0 && rx == 0 && ry == 0 && rz == 0 && dsPpm == 0

    def apply(x: Double, y: Double, z: Double): (Double, Double, Double) = {
      val s = 1.0 + dsPpm * 1e-6
      val rX = rx * Arcsec2Rad; val rY = ry * Arcsec2Rad; val rZ = rz * Arcsec2Rad
      (dx + s * (x - rZ * y + rY * z),
       dy + s * (rZ * x + y - rX * z),
       dz + s * (-rY * x + rX * y + z))
    }
  }

  object Helmert { val Identity = Helmert(0, 0, 0, 0, 0, 0, 0) }

  /** Geodetic (degrees, height 0 on `ell`) -> ECEF metres. */
  def geodeticToEcef(lonDeg: Double, latDeg: Double, ell: Ellipsoid): (Double, Double, Double) = {
    val lat = latDeg * D2R; val lon = lonDeg * D2R
    val sinLat = math.sin(lat); val cosLat = math.cos(lat)
    val n = ell.a / math.sqrt(1.0 - ell.e2 * sinLat * sinLat)
    (n * cosLat * math.cos(lon), n * cosLat * math.sin(lon), n * (1.0 - ell.e2) * sinLat)
  }

  /** ECEF metres -> geodetic lon/lat degrees on `ell` (iterative;
    * converges to <1e-12 rad in <=6 rounds at any terrestrial point). */
  def ecefToGeodetic(x: Double, y: Double, z: Double, ell: Ellipsoid): (Double, Double) = {
    val lon = math.atan2(y, x)
    val p = math.hypot(x, y)
    // exactly at a pole the h = p/cos(lat) - n form is 0/0 and the
    // iteration NaNs; the closed answer is lat = ±90
    if (p < 1e-9) return (0.0, if (z >= 0) 90.0 else -90.0)
    var lat = math.atan2(z, p * (1.0 - ell.e2))
    var i = 0
    while (i < 8) {
      val sinLat = math.sin(lat)
      val n = ell.a / math.sqrt(1.0 - ell.e2 * sinLat * sinLat)
      val h = p / math.cos(lat) - n
      val next = math.atan2(z, p * (1.0 - ell.e2 * n / (n + h)))
      if (math.abs(next - lat) < 1e-13) { lat = next; i = 8 } else { lat = next; i += 1 }
    }
    (lon * R2D, lat * R2D)
  }

  /** Shift geodetic coordinates from `ell`'s datum to WGS84 via `h`. */
  def datumToWgs84(lonDeg: Double, latDeg: Double, ell: Ellipsoid, h: Helmert): (Double, Double) = {
    if (h.isIdentity && ell == Ellipsoid.Wgs84) (lonDeg, latDeg)
    else {
      val (x, y, z) = geodeticToEcef(lonDeg, latDeg, ell)
      val (x2, y2, z2) = h(x, y, z)
      ecefToGeodetic(x2, y2, z2, Ellipsoid.Wgs84)
    }
  }

  /** A map projection on a source ellipsoid. `forward` takes lon/lat
    * degrees to easting/northing metres; `inverse` is exact to the
    * series accuracy (sub-mm in-zone for TM, exact-to-iteration for
    * LCC). Both are on the SOURCE datum — apply [[datumToWgs84]]
    * after inverting if the datum is not WGS84. */
  sealed trait Projection extends Serializable {
    def ell: Ellipsoid
    def forward(lonDeg: Double, latDeg: Double): (Double, Double)
    def inverse(e: Double, n: Double): (Double, Double)
  }

  /** Meridian arc length M(phi) — Snyder eq. 3-21. */
  private def meridianArc(ell: Ellipsoid, lat: Double): Double = {
    val e2 = ell.e2; val e4 = e2 * e2; val e6 = e4 * e2
    ell.a * ((1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * lat
      - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * lat)
      + (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * lat)
      - (35 * e6 / 3072) * math.sin(6 * lat))
  }

  /**
   * Ellipsoidal Transverse Mercator (Gauss-Krüger), Snyder eq.
   * 8-9..8-25. Covers every UTM zone plus national grids (OSGB,
   * NZTM, Gauss-Krüger zones, ...).
   */
  final case class TransverseMercator(ell: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
                                      k0: Double, fe: Double, fn: Double) extends Projection {
    private val lat0 = lat0Deg * D2R
    private val lon0 = lon0Deg * D2R
    private val m0 = meridianArc(ell, lat0)
    private val e2 = ell.e2
    private val ep2 = ell.ep2
    private val a = ell.a

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val lat = latDeg * D2R; val lon = lonDeg * D2R
      val sinLat = math.sin(lat); val cosLat = math.cos(lat); val tanLat = math.tan(lat)
      val nu = a / math.sqrt(1 - e2 * sinLat * sinLat)
      val t = tanLat * tanLat
      val c = ep2 * cosLat * cosLat
      val bigA = (lon - lon0) * cosLat
      val a2 = bigA * bigA; val a3 = a2 * bigA; val a4 = a3 * bigA; val a5 = a4 * bigA; val a6 = a5 * bigA
      val m = meridianArc(ell, lat)
      val x = k0 * nu * (bigA + (1 - t + c) * a3 / 6 +
        (5 - 18 * t + t * t + 72 * c - 58 * ep2) * a5 / 120) + fe
      val y = k0 * (m - m0 + nu * tanLat * (a2 / 2 +
        (5 - t + 9 * c + 4 * c * c) * a4 / 24 +
        (61 - 58 * t + t * t + 600 * c - 330 * ep2) * a6 / 720)) + fn
      (x, y)
    }

    def inverse(e: Double, n: Double): (Double, Double) = {
      val m = m0 + (n - fn) / k0
      val e4 = e2 * e2; val e6 = e4 * e2
      val mu = m / (a * (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256))
      val sq = math.sqrt(1 - e2)
      val e1 = (1 - sq) / (1 + sq)
      val e1_2 = e1 * e1; val e1_3 = e1_2 * e1; val e1_4 = e1_3 * e1
      val lat1 = mu + (3 * e1 / 2 - 27 * e1_3 / 32) * math.sin(2 * mu) +
        (21 * e1_2 / 16 - 55 * e1_4 / 32) * math.sin(4 * mu) +
        (151 * e1_3 / 96) * math.sin(6 * mu) +
        (1097 * e1_4 / 512) * math.sin(8 * mu)
      val sin1 = math.sin(lat1); val cos1 = math.cos(lat1); val tan1 = math.tan(lat1)
      val c1 = ep2 * cos1 * cos1
      val t1 = tan1 * tan1
      val oneMinus = 1 - e2 * sin1 * sin1
      val n1 = a / math.sqrt(oneMinus)
      val r1 = a * (1 - e2) / (oneMinus * math.sqrt(oneMinus))
      val d = (e - fe) / (n1 * k0)
      val d2 = d * d; val d3 = d2 * d; val d4 = d3 * d; val d5 = d4 * d; val d6 = d5 * d
      val lat = lat1 - (n1 * tan1 / r1) * (d2 / 2 -
        (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * d4 / 24 +
        (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1) * d6 / 720)
      val lon = lon0 + (d - (1 + 2 * t1 + c1) * d3 / 6 +
        (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1) * d5 / 120) / cos1
      (lon * R2D, lat * R2D)
    }
  }

  /**
   * Lambert Conformal Conic (1SP or 2SP), Snyder eq. 15-1..15-11.
   * 2SP passes both standard parallels; 1SP passes sp1 == sp2 ==
   * lat0 with a scale factor.
   */
  final case class LambertConformalConic(ell: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
                                         sp1Deg: Double, sp2Deg: Double, k0: Double,
                                         fe: Double, fn: Double) extends Projection {
    private val e = ell.e
    private val a = ell.a
    private val lon0 = lon0Deg * D2R

    private def mOf(lat: Double): Double = {
      val s = math.sin(lat)
      math.cos(lat) / math.sqrt(1 - ell.e2 * s * s)
    }
    private def tOf(lat: Double): Double = {
      val s = math.sin(lat)
      math.tan(math.Pi / 4 - lat / 2) / math.pow((1 - e * s) / (1 + e * s), e / 2)
    }

    private val sp1 = sp1Deg * D2R
    private val sp2 = sp2Deg * D2R
    private val lat0 = lat0Deg * D2R
    private val nCone: Double =
      if (math.abs(sp1 - sp2) < 1e-12) math.sin(sp1)
      else (math.log(mOf(sp1)) - math.log(mOf(sp2))) / (math.log(tOf(sp1)) - math.log(tOf(sp2)))
    private val bigF = mOf(sp1) / (nCone * math.pow(tOf(sp1), nCone))
    private val rho0 = a * k0 * bigF * math.pow(tOf(lat0), nCone)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val lat = latDeg * D2R; val lon = lonDeg * D2R
      val rho = a * k0 * bigF * math.pow(tOf(lat), nCone)
      val theta = nCone * (lon - lon0)
      (fe + rho * math.sin(theta), fn + rho0 - rho * math.cos(theta))
    }

    def inverse(east: Double, north: Double): (Double, Double) = {
      val dx = east - fe
      val dy = rho0 - (north - fn)
      val sign = if (nCone < 0) -1.0 else 1.0
      val rho = sign * math.hypot(dx, dy)
      val theta = math.atan2(sign * dx, sign * dy)
      val lon = theta / nCone + lon0
      val tPrime = math.pow(rho / (a * k0 * bigF), 1.0 / nCone)
      // iterate phi = pi/2 - 2 atan(t' ((1 - e sin phi)/(1 + e sin phi))^(e/2))
      var lat = math.Pi / 2 - 2 * math.atan(tPrime)
      var i = 0
      while (i < 10) {
        val s = math.sin(lat)
        val next = math.Pi / 2 - 2 * math.atan(
          tPrime * math.pow((1 - e * s) / (1 + e * s), e / 2))
        if (math.abs(next - lat) < 1e-13) { lat = next; i = 10 } else { lat = next; i += 1 }
      }
      (lon * R2D, lat * R2D)
    }
  }

  /** A fully-specified projected CRS: projection + datum shift. */
  final case class ProjectedCrs(proj: Projection, toWgs84Shift: Helmert) extends Serializable {
    /** easting/northing (metres, after unit scaling) -> WGS84 lon/lat degrees. */
    def toWgs84(e: Double, n: Double): (Double, Double) = {
      val (lon, lat) = proj.inverse(e, n)
      datumToWgs84(lon, lat, proj.ell, toWgs84Shift)
    }
  }

  /** WGS84 UTM zone (EPSG:326zz north / 327zz south). */
  def utm(zone: Int, north: Boolean): ProjectedCrs = {
    require(zone >= 1 && zone <= 60, s"UTM zone out of range: $zone")
    ProjectedCrs(
      TransverseMercator(Ellipsoid.Wgs84, 0.0, -183.0 + 6.0 * zone, 0.9996,
        500000.0, if (north) 0.0 else 10000000.0),
      Helmert.Identity)
  }

  /** OSGB 1936 / British National Grid (EPSG:27700): Airy 1830 +
    * the standard 7-parameter shift (~2 m accuracy class). */
  def osgb36: ProjectedCrs = ProjectedCrs(
    TransverseMercator(Ellipsoid.Airy1830, 49.0, -2.0, 0.9996012717, 400000.0, -100000.0),
    Helmert(446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894))

  /** RGF93 / Lambert-93 (EPSG:2154); RGF93 is WGS84-equivalent. */
  def lambert93: ProjectedCrs = ProjectedCrs(
    LambertConformalConic(Ellipsoid.Grs80, 46.5, 3.0, 49.0, 44.0, 1.0, 700000.0, 6600000.0),
    Helmert.Identity)

  // ---------------------------------------------------------------- WKT

  private val NumRe = """[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?""".r

  /** Normalize a WKT keyword/parameter name for matching: lowercase,
    * letters+digits only. Handles WKT1 (`central_meridian`) and WKT2
    * (`Longitude of natural origin`) spellings uniformly. */
  private def norm(s: String): String = s.toLowerCase.replaceAll("[^a-z0-9]", "")

  /** Extract `KEYWORD["name", num, num, ...]` occurrences (non-nested
    * capture of the quoted name + leading numeric args). */
  private def kwArgs(wkt: String, keyword: String): Seq[(String, Seq[Double])] = {
    val re = (keyword + """\s*\[\s*"([^"]*)"\s*((?:,\s*""" + NumRe.regex + """\s*)*)""").r
    re.findAllMatchIn(wkt).map { m =>
      (m.group(1), NumRe.findAllIn(m.group(2)).map(_.toDouble).toSeq)
    }.toSeq
  }

  /**
   * Parse a PROJCS/PROJCRS WKT (1 or 2) into a [[ProjectedCrs]] when
   * the projection method is Transverse Mercator or Lambert Conformal
   * Conic; None when the method is something else (caller decides how
   * loudly to fail). Honors `TOWGS84[...]` when present and scales
   * for a non-metre linear UNIT (e.g. US survey foot state planes).
   */
  def parseProjcsWkt(wkt: String): Option[ProjectedCrs] = {
    val methodName: Option[String] =
      (kwArgs(wkt, "(?i)PROJECTION") ++ kwArgs(wkt, "(?i)METHOD")).headOption.map(x => norm(x._1))
    val method = methodName.getOrElse(return None)

    val isTm = method.contains("transversemercator") || method.contains("gausskruger")
    val isLcc = method.contains("lambertconformal") || method.contains("lambertconicconformal")
    if (!isTm && !isLcc) return None

    val sph = (kwArgs(wkt, "(?i)SPHEROID") ++ kwArgs(wkt, "(?i)ELLIPSOID")).headOption
      .getOrElse(throw new IllegalArgumentException(
        "projected CRS WKT lacks a SPHEROID/ELLIPSOID: " + wkt.take(200)))
    require(sph._2.size >= 2, "SPHEROID needs (a, 1/f): " + sph)
    val ell = Ellipsoid(sph._2(0), sph._2(1))

    val params: Map[String, Double] =
      kwArgs(wkt, "(?i)PARAMETER").collect { case (k, vs) if vs.nonEmpty => norm(k) -> vs.head }.toMap
    def p(default: Double, keys: String*): Double =
      keys.collectFirst { case k if params.contains(k) => params(k) }.getOrElse(default)

    // Linear unit: WKT1 puts the CRS unit last; factors < 0.1 are
    // angular (degree ~ 0.01745) and skipped. Easting/northing and
    // false origins are expressed in this unit.
    val unitFactor: Double = kwArgs(wkt, "(?i)(?:LENGTH)?UNIT").map(_._2.headOption.getOrElse(1.0))
      .filter(f => f > 0.1) // metres-per-unit; degree/grad factors are < 0.1
      .lastOption.getOrElse(1.0)

    val lat0 = p(0.0, "latitudeofnaturalorigin", "latitudeoforigin", "latitudeoffalseorigin", "latitudeofcenter")
    val lon0 = p(0.0, "longitudeofnaturalorigin", "centralmeridian", "longitudeoffalseorigin", "longitudeofcenter", "longitudeoforigin")
    val k0 = p(1.0, "scalefactoratnaturalorigin", "scalefactor")
    val fe = p(0.0, "falseeasting", "eastingatfalseorigin") * unitFactor
    val fn = p(0.0, "falsenorthing", "northingatfalseorigin") * unitFactor

    val proj: Projection =
      if (isTm) TransverseMercator(ell, lat0, lon0, k0, fe, fn)
      else {
        val sp1 = p(lat0, "standardparallel1", "latitudeof1ststandardparallel")
        val sp2 = p(sp1, "standardparallel2", "latitudeof2ndstandardparallel")
        LambertConformalConic(ell, lat0, lon0, sp1, sp2, k0, fe, fn)
      }

    val shift: Helmert = {
      val re = ("""(?i)TOWGS84\s*\[\s*(""" + NumRe.regex + """(?:\s*,\s*""" + NumRe.regex + """)*)\s*\]""").r
      re.findFirstMatchIn(wkt).map { m =>
        val v = NumRe.findAllIn(m.group(1)).map(_.toDouble).toArray.padTo(7, 0.0)
        Helmert(v(0), v(1), v(2), v(3), v(4), v(5), v(6))
      }.getOrElse(Helmert.Identity)
    }

    val base = ProjectedCrs(proj, shift)
    Some(if (unitFactor == 1.0) base else ScaledCrs(base, unitFactor).asProjected)
  }

  /** Wraps a metre-based CRS so inverse input in a foreign linear
    * unit (e.g. feet) is scaled to metres first. */
  private final case class ScaledCrs(inner: ProjectedCrs, metresPerUnit: Double) {
    def asProjected: ProjectedCrs = {
      val scaled = new Projection {
        def ell: Ellipsoid = inner.proj.ell
        def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
          val (e, n) = inner.proj.forward(lonDeg, latDeg)
          (e / metresPerUnit, n / metresPerUnit)
        }
        def inverse(e: Double, n: Double): (Double, Double) =
          inner.proj.inverse(e * metresPerUnit, n * metresPerUnit)
      }
      ProjectedCrs(scaled, inner.toWgs84Shift)
    }
  }
}
