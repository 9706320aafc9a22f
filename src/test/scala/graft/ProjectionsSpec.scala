package graft

import graft.spatial.Projections._
import graft.spatial.{Geo, Projections}

/** CRS math validation: the published EPSG worked example for
  * Transverse Mercator, exact anchor points (UTM central meridian,
  * Albers projection origin), and forward∘inverse round-trips across
  * the whole registry.
  */
class ProjectionsSpec extends GraftSuite {

  test("TM matches the EPSG Guidance Note 7-2 worked example (Airy 1830)") {
    // OSGB36 / British National Grid projection parameters; test point
    // 50°30'00"N 00°30'00"E -> E 577274.99 N 69740.50 (published)
    val bng = TransverseMercator(Airy1830,
      lat0Deg = 49.0, lon0Deg = -2.0, k0 = 0.9996012717,
      falseEasting = 400000.0, falseNorthing = -100000.0)
    val (e, n) = bng.forward(0.5, 50.5)
    assert(math.abs(e - 577274.99) < 0.05, s"easting $e")
    assert(math.abs(n - 69740.50) < 0.05, s"northing $n")
    // inverse of the published grid coords recovers the point
    val (lon, lat) = bng.inverse(577274.99, 69740.50)
    assert(math.abs(lon - 0.5) < 1e-7 && math.abs(lat - 50.5) < 1e-7)
  }

  test("UTM anchors: central meridian is exact, south zone false northing") {
    val z33 = utm(Wgs84, 33, south = false)
    val (x0, y0) = z33.forward(15.0, 0.0)
    assert(x0 == 500000.0 && y0 == 0.0)
    // on the central meridian, easting is exactly FE at any latitude
    assert(z33.forward(15.0, 52.0)._1 == 500000.0)
    val (xs, ys) = utm(Wgs84, 33, south = true).forward(15.0, 0.0)
    assert(xs == 500000.0 && ys == 10000000.0)
    // one degree north of the equator is ~110.6 km of meridian arc * k0
    val yOneDeg = z33.forward(15.0, 1.0)._2
    assert(math.abs(yOneDeg - 110574.0 * 0.9996) < 200.0, s"arc $yOneDeg")
  }

  test("Albers 5070: projection origin maps to (0,0)") {
    val alb = Projections.forSrid(5070).get
    val (x, y) = alb.forward(-96.0, 23.0)
    assert(math.abs(x) < 1e-6 && math.abs(y) < 1e-6, s"origin ($x,$y)")
  }

  test("forward-inverse round-trips across the registry") {
    // (srid, in-domain lon/lat sample grid)
    val cases: Seq[(Int, Seq[(Double, Double)])] = Seq(
      32633 -> Seq((15.0, 0.0), (13.4, 52.5), (16.9, -0.5), (12.1, 71.0)),
      32733 -> Seq((15.0, -33.9), (17.5, -12.0)),
      26910 -> Seq((-123.1, 49.3), (-121.5, 37.8)),
      25832 -> Seq((9.0, 48.8), (11.6, 55.7)),
      2154  -> Seq((2.35, 48.86), (5.37, 43.30), (-1.55, 47.22)),
      3587  -> Seq((-84.5, 44.0), (-85.6, 44.8)),
      5070  -> Seq((-96.0, 23.0), (-122.3, 47.6), (-71.1, 42.4)),
      3857  -> Seq((0.0, 0.0), (139.7, 35.7), (-58.4, -34.6)),
      4269  -> Seq((-100.0, 40.0)))
    for ((srid, pts) <- cases; (lon, lat) <- pts) {
      val p = Projections.forSrid(srid).get
      val (x, y) = p.forward(lon, lat)
      val (lon2, lat2) = p.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7,
        s"srid $srid round-trip ($lon,$lat) -> ($x,$y) -> ($lon2,$lat2)")
    }
  }

  test("polar stereographic: poles map to the projection origin") {
    val north = Projections.forSrid(3413).get
    val (nx, ny) = north.forward(123.0, 90.0)
    assert(math.abs(nx) < 1e-6 && math.abs(ny) < 1e-6)
    val south = Projections.forSrid(3031).get
    val (sx, sy) = south.forward(-37.0, -90.0)
    assert(math.abs(sx) < 1e-6 && math.abs(sy) < 1e-6)
  }

  test("LAEA 3035 matches the EPSG worked example and its origin") {
    val laea = Projections.forSrid(3035).get
    val (x0, y0) = laea.forward(10.0, 52.0)
    assert(math.abs(x0 - 4321000.0) < 1e-6 && math.abs(y0 - 3210000.0) < 1e-6)
    // EPSG Guidance Note 7-2 LAEA example: 50°N 5°E
    val (x, y) = laea.forward(5.0, 50.0)
    assert(math.abs(x - 3962799.45) < 0.1, s"easting $x")
    assert(math.abs(y - 2999718.85) < 0.1, s"northing $y")
  }

  test("polar + LAEA round-trips") {
    val cases: Seq[(Int, Seq[(Double, Double)])] = Seq(
      3413 -> Seq((-45.0, 90.0), (-150.0, 72.5), (20.0, 61.0)),
      3995 -> Seq((10.0, 85.0), (-170.0, 66.6)),
      3031 -> Seq((0.0, -90.0), (166.7, -77.8), (-60.0, -65.0)),
      3035 -> Seq((10.0, 52.0), (5.0, 50.0), (-9.1, 38.7), (31.0, 69.0)))
    for ((srid, pts) <- cases; (lon, lat) <- pts) {
      val p = Projections.forSrid(srid).get
      val (x, y) = p.forward(lon, lat)
      val (lon2, lat2) = p.inverse(x, y)
      val lonErr =
        if (math.abs(lat) == 90.0) 0.0 // longitude undefined at the pole
        else math.abs(lon2 - lon)
      assert(lonErr < 1e-7 && math.abs(lat2 - lat) < 1e-7,
        s"srid $srid round-trip ($lon,$lat) -> ($x,$y) -> ($lon2,$lat2)")
    }
  }

  test("Lambert-93 places Paris in the published neighborhood") {
    val (x, y) = Projections.forSrid(2154).get.forward(2.3522, 48.8566)
    assert(x > 600000 && x < 700000, s"easting $x")
    assert(y > 6820000 && y < 6900000, s"northing $y")
  }

  test("Helmert matches the EPSG GN7-2 position-vector worked example") {
    // EPSG Guidance Note 7-2, method 9606 (WGS72 -> WGS84): dz=4.5 m,
    // rz=0.554", ds=0.219 ppm; published input/output geocentric XYZ
    val h = Helmert(0, 0, 4.5, 0, 0, 0.554, 0.219)
    val (x, y, z) = h.forward(3657660.66, 255768.55, 5201382.11)
    assert(math.abs(x - 3657660.78) < 0.01, s"X $x")
    assert(math.abs(y - 255778.43) < 0.01, s"Y $y")
    assert(math.abs(z - 5201387.75) < 0.01, s"Z $z")
    // the inverse is the exact algebraic inverse, not the negated-
    // parameter approximation: round trip to sub-mm
    val (xi, yi, zi) = h.inverse(x, y, z)
    assert(math.abs(xi - 3657660.66) < 1e-4 &&
      math.abs(yi - 255768.55) < 1e-4 && math.abs(zi - 5201382.11) < 1e-4)
  }

  test("OSGB36 27700 -> 4326 lands on the OS guide station (datum shift)") {
    // OS 'A guide to coordinate systems in Great Britain' station
    // (Caister water tower): OSGB36 E 651409.903 N 313177.270;
    // ETRS89 (≈WGS84) 52°39'28.8282"N 1°42'57.8663"E. The single
    // 7-param Helmert (EPSG 1314) is documented ±2 m vs the OSTN grid,
    // so assert within 3e-5 deg (~3 m) — a sign/convention error in the
    // datum leg would miss by the full ~100 m OSGB36-WGS84 offset.
    val g = Geo.fromWkt("POINT (651409.903 313177.270)")
    g.setSRID(27700)
    val out = Geo.transform(g, 4326).getCoordinate
    val expLat = 52.0 + 39.0 / 60 + 28.8282 / 3600
    val expLon = 1.0 + 42.0 / 60 + 57.8663 / 3600
    assert(math.abs(out.y - expLat) < 3e-5, s"lat ${out.y} vs $expLat")
    assert(math.abs(out.x - expLon) < 3e-5, s"lon ${out.x} vs $expLon")
    // without the datum leg the error would be the full frame offset
    assert(math.abs(out.x - expLon) * 111320.0 < 3.0)
    // round trip back to the grid: the 2D pipeline drops ellipsoidal
    // height at each geodetic leg (~50 m Airy/WGS84 separation), which
    // costs a few mm of latitude — assert within 1 cm
    val back = Geo.transform(Geo.transform(g, 4326), 27700).getCoordinate
    assert(math.abs(back.x - 651409.903) < 0.01 &&
      math.abs(back.y - 313177.270) < 0.01)
  }

  test("NAD27 4267 -> 4326: CONUS shift applied, exact round trip") {
    // the 3-param CONUS approximation moves a mid-CONUS point by
    // roughly 10-100 m; a missing or double-applied shift falls
    // outside that band
    val g = Geo.fromWkt("POINT (-98.0 39.0)")
    g.setSRID(4267)
    val out = Geo.transform(g, 4326).getCoordinate
    val dMeters = math.hypot((out.x - (-98.0)) * 111320.0 * math.cos(math.toRadians(39.0)),
      (out.y - 39.0) * 110540.0)
    assert(dMeters > 10 && dMeters < 300, s"NAD27 shift $dMeters m")
    // height is dropped at each geodetic leg, so the round trip is
    // ~1e-9 deg (sub-mm), not bit-exact
    val back = Geo.transform(Geo.transform(g, 4326), 4267).getCoordinate
    assert(math.abs(back.x - (-98.0)) < 1e-8 && math.abs(back.y - 39.0) < 1e-8)
    // WGS84-family pairs still skip the datum leg entirely (identity)
    val w = Geo.fromWkt("POINT (-98.0 39.0)")
    w.setSRID(4269)
    val nad83 = Geo.transform(w, 4326).getCoordinate
    assert(nad83.x == -98.0 && nad83.y == 39.0)
  }

  test("ST_Transform composes arbitrary registry pairs and keeps SRID") {
    import org.apache.spark.sql.functions.expr
    graft.spatial.SpatialFunctions.registerAll(spark)
    // projected -> projected goes through the geographic intermediate
    val row = spark.sql(
      """SELECT st_srid(t) AS srid, st_x(t) AS x, st_y(t) AS y FROM (
        |  SELECT st_transform(
        |    st_transform(st_setsrid(st_makepoint(13.4, 52.5), 4326), 3857),
        |    32633) AS t)""".stripMargin).collect()(0)
    assert(row.getInt(0) == 32633)
    val direct = utm(Wgs84, 33, south = false).forward(13.4, 52.5)
    // 3857 is spherical so the composed trip must still land within the
    // web-mercator round-trip error (exact: inverse is its exact inverse)
    assert(math.abs(row.getDouble(1) - direct._1) < 1e-6)
    assert(math.abs(row.getDouble(2) - direct._2) < 1e-6)
    // unknown SRID names the offender (27700 graduated to the registry
    // in round 4 — datum-shifted OSGB36 — so probe a truly absent code)
    val e = intercept[Exception](spark.sql(
      "SELECT st_transform(st_setsrid(st_makepoint(0,0), 29900), 4326)").collect())
    assert(e.getMessage.contains("29900") || e.getCause.getMessage.contains("29900"))
  }
}
