package graft.spatial

/** General CRS reprojection for ST_Transform (reference
  * spatial/src/function/st_transform.rs:18-120, which delegates to
  * proj4rs over the EPSG registry). Spark has no native CRS support, so
  * this ships the standard Snyder (USGS Professional Paper 1395)
  * formulas for the projection families behind the commonly used EPSG
  * codes — Transverse Mercator (every UTM zone), Lambert Conformal
  * Conic 2SP, Albers Equal Area, spherical Web Mercator — plus a
  * parameter registry for those codes.
  *
  * Datum handling: WGS84/GRS80-family frames (WGS84, NAD83, ETRS89)
  * share a geographic intermediate with NO shift (their mutual offsets
  * are below coordinate noise at analytics precision). Frames that
  * genuinely differ — OSGB36 (4277/27700) and NAD27 (4267) — carry
  * published towgs84 Helmert parameters and transform through the
  * geocentric pipeline ([[DatumShift]]): geodetic -> XYZ -> 7-param
  * position-vector Helmert -> WGS84 -> inverse -> target geodetic,
  * matching proj4rs' +towgs84 behavior (reference st_transform.rs:
  * 18-120).
  */
object Projections {

  final case class Ellipsoid(a: Double, invF: Double) {
    val f: Double = 1.0 / invF
    val e2: Double = 2 * f - f * f
    val e: Double = math.sqrt(e2)
    val ep2: Double = e2 / (1 - e2)
  }
  val Wgs84: Ellipsoid = Ellipsoid(6378137.0, 298.257223563)
  val Grs80: Ellipsoid = Ellipsoid(6378137.0, 298.257222101)
  val Airy1830: Ellipsoid = Ellipsoid(6377563.396, 299.3249646)
  val Clarke1866: Ellipsoid = Ellipsoid(6378206.4, 294.978698214)

  /** A map projection: degrees lon/lat <-> projected x/y (meters). */
  trait Projection extends Serializable {
    def forward(lonDeg: Double, latDeg: Double): (Double, Double)
    def inverse(x: Double, y: Double): (Double, Double)
  }

  /** Geographic CRS: coordinates ARE lon/lat degrees. */
  object Geographic extends Projection {
    def forward(lon: Double, lat: Double): (Double, Double) = (lon, lat)
    def inverse(x: Double, y: Double): (Double, Double) = (x, y)
  }

  /** Spherical web mercator (EPSG:3857) — the tile-web formulas the
    * engine already used for the 4326<->3857 pair. */
  object WebMercator extends Projection {
    private val R = 6378137.0
    def forward(lon: Double, lat: Double): (Double, Double) = (
      lon * math.Pi / 180.0 * R,
      math.log(math.tan(math.Pi / 4 + lat * math.Pi / 360.0)) * R)
    def inverse(x: Double, y: Double): (Double, Double) = (
      x / R * 180.0 / math.Pi,
      (2 * math.atan(math.exp(y / R)) - math.Pi / 2) * 180.0 / math.Pi)
  }

  /** Ellipsoidal Transverse Mercator (EPSG method 9807; Snyder 1987
    * eq. 8-9..8-25, the USGS series good to sub-mm inside a UTM-width
    * zone). Parametrizes every UTM zone and most national TM grids. */
  final case class TransverseMercator(ell: Ellipsoid,
      lat0Deg: Double, lon0Deg: Double, k0: Double,
      falseEasting: Double, falseNorthing: Double) extends Projection {
    import ell.{a, e2, ep2}
    private val lat0 = math.toRadians(lat0Deg)
    private val lon0 = math.toRadians(lon0Deg)
    private val e4 = e2 * e2
    private val e6 = e4 * e2

    /** Meridian arc length from the equator (Snyder 3-21). */
    private def mArc(phi: Double): Double =
      a * ((1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi -
        (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi) +
        (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi) -
        (35 * e6 / 3072) * math.sin(6 * phi))
    private val m0 = mArc(lat0)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val sinP = math.sin(phi)
      val cosP = math.cos(phi)
      val tanP = math.tan(phi)
      val n = a / math.sqrt(1 - e2 * sinP * sinP)
      val t = tanP * tanP
      val c = ep2 * cosP * cosP
      val bigA = (math.toRadians(lonDeg) - lon0) * cosP
      val a2 = bigA * bigA
      val a3 = a2 * bigA
      val x = falseEasting + k0 * n * (bigA + (1 - t + c) * a3 / 6 +
        (5 - 18 * t + t * t + 72 * c - 58 * ep2) * a3 * a2 / 120)
      val y = falseNorthing + k0 * (mArc(phi) - m0 + n * tanP * (a2 / 2 +
        (5 - t + 9 * c + 4 * c * c) * a2 * a2 / 24 +
        (61 - 58 * t + t * t + 600 * c - 330 * ep2) * a3 * a3 / 720))
      (x, y)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val m = m0 + (y - falseNorthing) / k0
      val mu = m / (a * (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256))
      val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
      val e1_2 = e1 * e1
      val e1_3 = e1_2 * e1
      val e1_4 = e1_3 * e1
      val phi1 = mu + (3 * e1 / 2 - 27 * e1_3 / 32) * math.sin(2 * mu) +
        (21 * e1_2 / 16 - 55 * e1_4 / 32) * math.sin(4 * mu) +
        (151 * e1_3 / 96) * math.sin(6 * mu) +
        (1097 * e1_4 / 512) * math.sin(8 * mu)
      val sinP1 = math.sin(phi1)
      val cosP1 = math.cos(phi1)
      val tanP1 = math.tan(phi1)
      val c1 = ep2 * cosP1 * cosP1
      val t1 = tanP1 * tanP1
      val oneMinus = 1 - e2 * sinP1 * sinP1
      val n1 = a / math.sqrt(oneMinus)
      val r1 = a * (1 - e2) / (oneMinus * math.sqrt(oneMinus))
      val d = (x - falseEasting) / (n1 * k0)
      val d2 = d * d
      val d3 = d2 * d
      val phi = phi1 - (n1 * tanP1 / r1) * (d2 / 2 -
        (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * d2 * d2 / 24 +
        (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1) * d3 * d3 / 720)
      val lon = lon0 + (d - (1 + 2 * t1 + c1) * d3 / 6 +
        (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1) * d3 * d2 / 120) / cosP1
      (math.toDegrees(lon), math.toDegrees(phi))
    }
  }

  /** UTM zone shortcut: lat0=0, lon0 = zone central meridian,
    * k0=0.9996, FE=500km, FN=0 (north) / 10000km (south). */
  def utm(ell: Ellipsoid, zone: Int, south: Boolean): TransverseMercator =
    TransverseMercator(ell, 0.0, -183.0 + 6.0 * zone, 0.9996,
      500000.0, if (south) 10000000.0 else 0.0)

  /** Albers Equal Area conic (EPSG method 9822; Snyder eq. 14-1..14-21
    * with the series inverse 3-18), e.g. EPSG:5070 NAD83 CONUS. */
  final case class AlbersEqualArea(ell: Ellipsoid,
      lat0Deg: Double, lon0Deg: Double, lat1Deg: Double, lat2Deg: Double,
      falseEasting: Double, falseNorthing: Double) extends Projection {
    import ell.{a, e2, e}
    private val lon0 = math.toRadians(lon0Deg)

    private def q(phi: Double): Double = {
      val s = math.sin(phi)
      (1 - e2) * (s / (1 - e2 * s * s) -
        (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
    }
    private def mr(phi: Double): Double =
      math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))

    private val lat1 = math.toRadians(lat1Deg)
    private val lat2 = math.toRadians(lat2Deg)
    private val m1 = mr(lat1)
    private val m2 = mr(lat2)
    private val q1 = q(lat1)
    private val q2 = q(lat2)
    private val n = (m1 * m1 - m2 * m2) / (q2 - q1)
    private val bigC = m1 * m1 + n * q1
    private val rho0 = a * math.sqrt(bigC - n * q(math.toRadians(lat0Deg))) / n

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val rho = a * math.sqrt(bigC - n * q(phi)) / n
      val theta = n * (math.toRadians(lonDeg) - lon0)
      (falseEasting + rho * math.sin(theta),
        falseNorthing + rho0 - rho * math.cos(theta))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - falseEasting
      val dy = rho0 - (y - falseNorthing)
      val rho = math.sqrt(dx * dx + dy * dy)
      val theta = math.atan2(dx, dy)
      val qv = (bigC - (rho * n / a) * (rho * n / a)) / n
      // authalic latitude -> geodetic (Snyder 3-18 series)
      val beta = math.asin(qv / (1 - ((1 - e2) / (2 * e)) *
        math.log((1 - e) / (1 + e))))
      val e4 = e2 * e2
      val e6 = e4 * e2
      val phi = beta +
        (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * math.sin(2 * beta) +
        (23 * e4 / 360 + 251 * e6 / 3780) * math.sin(4 * beta) +
        (761 * e6 / 45360) * math.sin(6 * beta)
      (math.toDegrees(theta / n + lon0), math.toDegrees(phi))
    }
  }

  /** Adapter over the existing [[Lcc]] (EPSG method 9802). */
  final case class LccProjection(lcc: Lcc) extends Projection {
    def forward(lon: Double, lat: Double): (Double, Double) = lcc.forward(lon, lat)
    def inverse(x: Double, y: Double): (Double, Double) = lcc.inverse(x, y)
  }

  /** Polar Stereographic variant B (EPSG method 9829; Snyder
    * eq. 21-33..21-41 with the conformal-latitude iteration), standard
    * parallel `latTsDeg`, `south` flips the aspect — EPSG 3413/3995
    * (Arctic) and 3031 (Antarctic). */
  final case class PolarStereographic(ell: Ellipsoid,
      latTsDeg: Double, lon0Deg: Double,
      falseEasting: Double, falseNorthing: Double, south: Boolean)
      extends Projection {
    import ell.{a, e, e2}
    private val lon0 = math.toRadians(lon0Deg)

    private def tOf(phi: Double): Double =
      math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1 - e * math.sin(phi)) / (1 + e * math.sin(phi)), e / 2)
    private val latTs = math.toRadians(math.abs(latTsDeg))
    private val mc = math.cos(latTs) / math.sqrt(1 - e2 * math.sin(latTs) * math.sin(latTs))
    private val tc = tOf(latTs)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      // south aspect: mirror through the equator and negate outputs
      val phi = math.toRadians(if (south) -latDeg else latDeg)
      val dLon = math.toRadians(lonDeg) - (if (south) -lon0 else lon0)
      val sgn = if (south) -1.0 else 1.0
      val rho = a * mc * tOf(phi) / tc
      (falseEasting + sgn * rho * math.sin(sgn * dLon),
        falseNorthing - sgn * rho * math.cos(sgn * dLon))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val sgn = if (south) -1.0 else 1.0
      val dx = sgn * (x - falseEasting)
      val dy = sgn * (y - falseNorthing)
      val rho = math.sqrt(dx * dx + dy * dy)
      val t = rho * tc / (a * mc)
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 15) {
        val next = math.Pi / 2 - 2 * math.atan(
          t * math.pow((1 - e * math.sin(phi)) / (1 + e * math.sin(phi)), e / 2))
        if (math.abs(next - phi) < 1e-12) i = 15 else i += 1
        phi = next
      }
      val lon = (if (south) -lon0 else lon0) + math.atan2(dx, -dy)
      (math.toDegrees(sgn * lon), math.toDegrees(sgn * phi))
    }
  }

  /** Lambert Azimuthal Equal Area, ellipsoidal (EPSG method 9820;
    * Snyder eq. 24-2..24-16 + the authalic-latitude series 3-18) —
    * EPSG 3035 ETRS89-LAEA Europe. */
  final case class LambertAzimuthalEqualArea(ell: Ellipsoid,
      lat0Deg: Double, lon0Deg: Double,
      falseEasting: Double, falseNorthing: Double) extends Projection {
    import ell.{a, e, e2}
    private val lon0 = math.toRadians(lon0Deg)
    private val lat0 = math.toRadians(lat0Deg)

    private def q(phi: Double): Double = {
      val s = math.sin(phi)
      (1 - e2) * (s / (1 - e2 * s * s) -
        (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
    }
    private val qp = q(math.Pi / 2)
    private val beta0 = math.asin(q(lat0) / qp)
    private val rq = a * math.sqrt(qp / 2)
    private val m0 = math.cos(lat0) / math.sqrt(1 - e2 * math.sin(lat0) * math.sin(lat0))
    private val bigD = a * m0 / (rq * math.cos(beta0))

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val dLon = math.toRadians(lonDeg) - lon0
      val beta = math.asin(q(phi) / qp)
      val b = rq * math.sqrt(2 / (1 + math.sin(beta0) * math.sin(beta) +
        math.cos(beta0) * math.cos(beta) * math.cos(dLon)))
      (falseEasting + b * bigD * math.cos(beta) * math.sin(dLon),
        falseNorthing + (b / bigD) * (math.cos(beta0) * math.sin(beta) -
          math.sin(beta0) * math.cos(beta) * math.cos(dLon)))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = (x - falseEasting) / bigD
      val dy = (y - falseNorthing) * bigD
      val rho = math.sqrt(dx * dx + dy * dy)
      if (rho < 1e-12) return (math.toDegrees(lon0), math.toDegrees(lat0))
      val ce = 2 * math.asin(rho / (2 * rq))
      val betaP = math.asin(math.cos(ce) * math.sin(beta0) +
        dy * math.sin(ce) * math.cos(beta0) / rho)
      val lon = lon0 + math.atan2(dx * math.sin(ce),
        rho * math.cos(beta0) * math.cos(ce) - dy * math.sin(beta0) * math.sin(ce))
      val e4 = e2 * e2
      val e6 = e4 * e2
      val phi = betaP +
        (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * math.sin(2 * betaP) +
        (23 * e4 / 360 + 251 * e6 / 3780) * math.sin(4 * betaP) +
        (761 * e6 / 45360) * math.sin(6 * betaP)
      (math.toDegrees(lon), math.toDegrees(phi))
    }
  }

  /** 7-parameter Helmert datum shift to/from WGS84 (EPSG method 9606,
    * position-vector convention — the convention proj's +towgs84 uses):
    * translations in meters, rotations in arc-seconds, scale in ppm.
    * The inverse is the exact algebraic inverse of the forward's
    * (1+s)·R matrix (closed-form 3×3 inversion), so round trips are
    * bit-stable to machine precision. */
  final case class Helmert(dx: Double, dy: Double, dz: Double,
      rxSec: Double, rySec: Double, rzSec: Double, dsPpm: Double) {
    val isZero: Boolean =
      dx == 0 && dy == 0 && dz == 0 && rxSec == 0 && rySec == 0 &&
        rzSec == 0 && dsPpm == 0
    private val sec = math.Pi / (180.0 * 3600.0)
    private val rx = rxSec * sec
    private val ry = rySec * sec
    private val rz = rzSec * sec
    private val s = 1.0 + dsPpm * 1e-6
    // M = (1+s) * [[1,-rz,ry],[rz,1,-rx],[-ry,rx,1]]
    private val m = Array(
      Array(s, -s * rz, s * ry),
      Array(s * rz, s, -s * rx),
      Array(-s * ry, s * rx, s))
    private val mInv = { // closed-form inverse of the 3x3
      val det =
        m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
        m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
        m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))
      Array(
        Array((m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) / det,
          (m(0)(2) * m(2)(1) - m(0)(1) * m(2)(2)) / det,
          (m(0)(1) * m(1)(2) - m(0)(2) * m(1)(1)) / det),
        Array((m(1)(2) * m(2)(0) - m(1)(0) * m(2)(2)) / det,
          (m(0)(0) * m(2)(2) - m(0)(2) * m(2)(0)) / det,
          (m(0)(2) * m(1)(0) - m(0)(0) * m(1)(2)) / det),
        Array((m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0)) / det,
          (m(0)(1) * m(2)(0) - m(0)(0) * m(2)(1)) / det,
          (m(0)(0) * m(1)(1) - m(0)(1) * m(1)(0)) / det))
    }
    /** source frame -> WGS84 */
    def forward(x: Double, y: Double, z: Double): (Double, Double, Double) = (
      dx + m(0)(0) * x + m(0)(1) * y + m(0)(2) * z,
      dy + m(1)(0) * x + m(1)(1) * y + m(1)(2) * z,
      dz + m(2)(0) * x + m(2)(1) * y + m(2)(2) * z)
    /** WGS84 -> source frame (exact inverse) */
    def inverse(x: Double, y: Double, z: Double): (Double, Double, Double) = {
      val (u, v, w) = (x - dx, y - dy, z - dz)
      (mInv(0)(0) * u + mInv(0)(1) * v + mInv(0)(2) * w,
        mInv(1)(0) * u + mInv(1)(1) * v + mInv(1)(2) * w,
        mInv(2)(0) * u + mInv(2)(1) * v + mInv(2)(2) * w)
    }
  }
  val NoShift: Helmert = Helmert(0, 0, 0, 0, 0, 0, 0)

  /** Geodetic (lon/lat on `ell`, h=0) <-> geocentric XYZ. */
  object DatumShift {
    def toGeocentric(ell: Ellipsoid, lonDeg: Double, latDeg: Double):
        (Double, Double, Double) = {
      val lon = math.toRadians(lonDeg)
      val lat = math.toRadians(latDeg)
      val n = ell.a / math.sqrt(1 - ell.e2 * math.sin(lat) * math.sin(lat))
      (n * math.cos(lat) * math.cos(lon),
        n * math.cos(lat) * math.sin(lon),
        n * (1 - ell.e2) * math.sin(lat))
    }
    def toGeodetic(ell: Ellipsoid, x: Double, y: Double, z: Double):
        (Double, Double) = {
      val p = math.hypot(x, y)
      val lon = math.atan2(y, x)
      var lat = math.atan2(z, p * (1 - ell.e2))
      var i = 0
      while (i < 16) { // converges quadratically; 1e-15 rad ≈ 10 nm
        val sinLat = math.sin(lat)
        val n = ell.a / math.sqrt(1 - ell.e2 * sinLat * sinLat)
        val h = p / math.cos(lat) - n
        val next = math.atan2(z, p * (1 - ell.e2 * n / (n + h)))
        if (math.abs(next - lat) < 1e-15) i = 16 else i += 1
        lat = next
      }
      (math.toDegrees(lon), math.toDegrees(lat))
    }
  }

  /** A complete CRS: projection + geodetic datum (ellipsoid + Helmert
    * to WGS84). Zero-Helmert entries skip the geocentric leg. */
  final case class Crs(proj: Projection, ell: Ellipsoid, shift: Helmert)

  /** Published towgs84 parameter sets (EPSG / proj registry values). */
  private val Osgb36Shift = // EPSG 1314 (OSGB36 -> WGS84, ~2 m accuracy)
    Helmert(446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)
  private val Nad27Shift = // CONUS 3-param approximation (proj registry)
    Helmert(-8.0, 160.0, 176.0, 0, 0, 0, 0)

  /** Registry including datum: every [[forSrid]] code (zero shift —
    * WGS84/GRS80 family) plus the datum-shifted frames. */
  def crsFor(srid: Int): Option[Crs] = srid match {
    case 4277  => Some(Crs(Geographic, Airy1830, Osgb36Shift))
    case 27700 => Some(Crs(TransverseMercator(Airy1830, 49.0, -2.0,
      0.9996012717, 400000.0, -100000.0), Airy1830, Osgb36Shift))
    case 4267  => Some(Crs(Geographic, Clarke1866, Nad27Shift))
    case s     => forSrid(s).map(p => Crs(p, Wgs84, NoShift))
  }

  /** EPSG parameter registry (public EPSG dataset values) for the
    * WGS84/GRS80-family codes this engine reprojects between. */
  def forSrid(srid: Int): Option[Projection] = srid match {
    // geographic CRSs of the WGS84/GRS80 family (no datum shift applied)
    case 4326 | 4269 | 4258 => Some(Geographic)
    case 3857 | 900913      => Some(WebMercator)
    // UTM: WGS84 north / south
    case z if z >= 32601 && z <= 32660 => Some(utm(Wgs84, z - 32600, south = false))
    case z if z >= 32701 && z <= 32760 => Some(utm(Wgs84, z - 32700, south = true))
    // UTM: NAD83 (GRS80) zones 1-23N, ETRS89 (GRS80) zones 28-38N
    case z if z >= 26901 && z <= 26923 => Some(utm(Grs80, z - 26900, south = false))
    case z if z >= 25828 && z <= 25838 => Some(utm(Grs80, z - 25800, south = false))
    // RGF93 / Lambert-93 (France)
    case 2154 => Some(LccProjection(Lcc(
      a = Grs80.a, invF = Grs80.invF,
      lat0Deg = 46.5, lon0Deg = 3.0, lat1Deg = 49.0, lat2Deg = 44.0,
      falseEasting = 700000.0, falseNorthing = 6600000.0)))
    // NAD83 / Michigan Central (the pre-existing LCC zone)
    case 3587 => Some(LccProjection(Lcc.Epsg3587))
    // NAD83 / Conus Albers
    case 5070 => Some(AlbersEqualArea(Grs80,
      lat0Deg = 23.0, lon0Deg = -96.0, lat1Deg = 29.5, lat2Deg = 45.5,
      falseEasting = 0.0, falseNorthing = 0.0))
    // WGS84 polar stereographic: NSIDC sea-ice North, Antarctic, Arctic
    case 3413 => Some(PolarStereographic(Wgs84, 70.0, -45.0, 0.0, 0.0, south = false))
    case 3995 => Some(PolarStereographic(Wgs84, 71.0, 0.0, 0.0, 0.0, south = false))
    case 3031 => Some(PolarStereographic(Wgs84, -71.0, 0.0, 0.0, 0.0, south = true))
    // ETRS89-extended / LAEA Europe
    case 3035 => Some(LambertAzimuthalEqualArea(Grs80,
      lat0Deg = 52.0, lon0Deg = 10.0,
      falseEasting = 4321000.0, falseNorthing = 3210000.0))
    case _ => None
  }
}
