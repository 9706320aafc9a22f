package graft.spatial

/** Lambert Conformal Conic (2SP, EPSG method 9802) — standard Snyder
  * formulas, used for the projected CRS pairs ST_Transform supports
  * beyond web mercator. Parameters come from the public EPSG registry.
  */
final case class Lcc(
    a: Double, invF: Double,
    lat0Deg: Double, lon0Deg: Double,
    lat1Deg: Double, lat2Deg: Double,
    falseEasting: Double, falseNorthing: Double) extends Serializable {

  private val f = 1.0 / invF
  private val e2 = 2 * f - f * f
  private val e = math.sqrt(e2)
  private val lat0 = math.toRadians(lat0Deg)
  private val lon0 = math.toRadians(lon0Deg)

  private def m(p: Double): Double =
    math.cos(p) / math.sqrt(1 - e2 * math.sin(p) * math.sin(p))
  private def t(p: Double): Double =
    math.tan(math.Pi / 4 - p / 2) /
      math.pow((1 - e * math.sin(p)) / (1 + e * math.sin(p)), e / 2)

  private val lat1 = math.toRadians(lat1Deg)
  private val lat2 = math.toRadians(lat2Deg)
  private val n =
    (math.log(m(lat1)) - math.log(m(lat2))) / (math.log(t(lat1)) - math.log(t(lat2)))
  private val bigF = m(lat1) / (n * math.pow(t(lat1), n))
  private val rho0 = a * bigF * math.pow(t(lat0), n)

  /** (lonDeg, latDeg) -> (easting, northing). */
  def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
    val phi = math.toRadians(latDeg)
    val rho = a * bigF * math.pow(t(phi), n)
    val th = n * (math.toRadians(lonDeg) - lon0)
    (falseEasting + rho * math.sin(th),
      falseNorthing + rho0 - rho * math.cos(th))
  }

  /** (easting, northing) -> (lonDeg, latDeg); iterative latitude. */
  def inverse(x: Double, y: Double): (Double, Double) = {
    val dx = x - falseEasting
    val dy = rho0 - (y - falseNorthing)
    val rho = math.signum(n) * math.sqrt(dx * dx + dy * dy)
    val theta = math.atan2(dx, dy)
    val tp = math.pow(rho / (a * bigF), 1 / n)
    var phi = math.Pi / 2 - 2 * math.atan(tp)
    var i = 0
    while (i < 15) {
      val next = math.Pi / 2 - 2 * math.atan(
        tp * math.pow((1 - e * math.sin(phi)) / (1 + e * math.sin(phi)), e / 2))
      if (math.abs(next - phi) < 1e-12) i = 15 else i += 1
      phi = next
    }
    (math.toDegrees(theta / n + lon0), math.toDegrees(phi))
  }
}

object Lcc {
  /** EPSG:3587 — NAD83 / Michigan Central, GRS80. */
  val Epsg3587: Lcc = Lcc(
    a = 6378137.0, invF = 298.257222101,
    lat0Deg = 43.0 + 19.0 / 60, lon0Deg = -(84.0 + 22.0 / 60),
    lat1Deg = 44.0 + 11.0 / 60, lat2Deg = 45.0 + 42.0 / 60,
    falseEasting = 6000000.0, falseNorthing = 0.0)
}
