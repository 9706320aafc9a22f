package graft.spatial

import org.locationtech.jts.geom._
import org.locationtech.jts.geom.util.{AffineTransformation, GeometryFixer}
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader, WKTWriter}

/** Geometry codec + math core for the spatial extension.
  *
  * Geometry travels through Spark as EWKB bytes in a plain BinaryType
  * column (SRID embedded, like the reference's Arrow `BinaryView` +
  * "Geometry" extension tag — /root/reference/src/datafusion-extra/
  * spatial/src/extension.rs:1-9). JTS is the single geometry backend
  * (vs the reference's pluggable geo/geos/tg — option.rs:40).
  *
  * JTS readers/writers are not thread-safe → ThreadLocal instances
  * (executor threads reuse them across rows; no per-row allocation).
  */
object Geo extends Serializable {

  // @transient: UDF closures capture this module; executor-side class
  // init rebuilds these (ThreadLocal/GeometryFactory are not
  // java-serializable and never need to travel).
  @transient lazy val gf = new GeometryFactory()

  @transient private lazy val wktReader =
    ThreadLocal.withInitial[WKTReader](() => new WKTReader(gf))
  @transient private lazy val wkbReader =
    ThreadLocal.withInitial[WKBReader](() => new WKBReader(gf))

  /** Coordinate dimension actually present (2, 3 or 4). */
  def dims(g: Geometry): Int = {
    var d = 2
    g.apply(new CoordinateSequenceFilter {
      override def filter(seq: CoordinateSequence, i: Int): Unit = {
        val sd = seq.getDimension
        if (sd > d) d = math.min(sd, 4)
      }
      override def isDone: Boolean = true // first sequence is enough
      override def isGeometryChanged: Boolean = false
    })
    d
  }

  def toWkb(g: Geometry): Array[Byte] =
    if (g == null) null
    else new WKBWriter(dims(g), g.getSRID != 0).write(g)

  def fromWkb(b: Array[Byte]): Geometry =
    if (b == null) null else wkbReader.get.read(b)

  private val XyzmPoint = "(?i)(POINT)\\s*\\(\\s*([-0-9.eE]+\\s+[-0-9.eE]+\\s+[-0-9.eE]+\\s+[-0-9.eE]+)\\s*\\)".r

  def fromWkt(s: String): Geometry =
    if (s == null) null
    else {
      // JTS needs the ZM tag for 4-ordinate points; PostGIS (and the
      // reference) accept bare `POINT(x y z m)`.
      val fixed = XyzmPoint.replaceAllIn(s, m => s"${m.group(1)} ZM (${m.group(2)})")
      wktReader.get.read(fixed)
    }

  private val SridPrefix = "(?is)^\\s*srid\\s*=\\s*(\\d+)\\s*;(.*)$".r

  /** EWKT: optional `SRID=n;` prefix (case/spacing tolerant) + WKT. */
  def fromEwkt(s: String): Geometry = s match {
    case null => null
    case SridPrefix(srid, wkt) =>
      val g = fromWkt(wkt)
      g.setSRID(srid.toInt)
      g
    case _ => fromWkt(s)
  }

  /** WKT in the reference's output shape — space after the type tag,
    * ", " between coordinates ("LINESTRING (1 2, 3 4)"), which is JTS
    * WKTWriter's native format (matches spatial_udf.slt expectations). */
  def toWkt(g: Geometry): String =
    if (g == null) null else new WKTWriter(dims(g)).write(g)

  def toEwkt(g: Geometry): String =
    if (g == null) null
    else if (g.getSRID != 0) s"SRID=${g.getSRID};${toWkt(g)}" else toWkt(g)

  /** Keep SRID through constructive operations. */
  def keepSrid(out: Geometry, in: Geometry): Geometry = {
    if (out != null && out.getSRID == 0 && in != null) out.setSRID(in.getSRID)
    out
  }

  /** geos-MakeValid "linework" semantics (what the reference exposes):
    * polygonal input → node all ring linework, polygonize, keep faces
    * covered by an odd number of rings (even-odd rule), as a (multi)
    * polygon of separate faces. Degenerate zero-length lines collapse
    * to points. Other inputs → JTS GeometryFixer.
    */
  def makeValid(g: Geometry): Geometry = {
    if (g == null) return null
    val out = g match {
      case _ if g.isValid && g.getDimension < 2 => g.copy()
      case l: LineString if l.getLength == 0 && !l.isEmpty =>
        gf.createPoint(l.getCoordinate)
      case _ if g.getDimension == 2 && !g.isValid =>
        val rings = collectRings(g)
        if (rings.isEmpty) GeometryFixer.fix(g)
        else {
          val noded = org.locationtech.jts.operation.union.UnaryUnionOp.union(
            java.util.Arrays.asList(rings: _*))
          val p = new org.locationtech.jts.operation.polygonize.Polygonizer(false)
          p.add(noded)
          val faces = p.getPolygons.toArray(new Array[Geometry](0))
          val kept = faces.filter { f =>
            val pt = f.getInteriorPoint.getCoordinate
            val cnt = rings.count(r =>
              org.locationtech.jts.algorithm.PointLocation.isInRing(
                pt, r.getCoordinates))
            cnt % 2 == 1
          }
          if (kept.isEmpty) GeometryFixer.fix(g)
          else if (kept.length == 1) kept.head
          else gf.createMultiPolygon(kept.map(_.asInstanceOf[Polygon]))
        }
      case _ => GeometryFixer.fix(g)
    }
    keepSrid(out, g)
  }

  private def collectRings(g: Geometry): Array[Geometry] = {
    val rings = scala.collection.mutable.Buffer[Geometry]()
    for (i <- 0 until g.getNumGeometries) g.getGeometryN(i) match {
      case p: Polygon =>
        rings += gf.createLineString(p.getExteriorRing.getCoordinates)
        (0 until p.getNumInteriorRing).foreach(j =>
          rings += gf.createLineString(p.getInteriorRingN(j).getCoordinates))
      case sub: GeometryCollection => rings ++= collectRings(sub)
      case _ =>
    }
    rings.toArray
  }

  /** OGC-orientation envelope (CCW exterior starting at min corner) —
    * the output shape the reference's ST_Envelope produces; JTS's
    * `getEnvelope` emits the ring in the opposite order. */
  def envelopeCcw(g: Geometry): Geometry = {
    if (g.isEmpty) return g.copy()
    val e = g.getEnvelopeInternal
    if (e.getWidth == 0 || e.getHeight == 0) g.getEnvelope
    else gf.createPolygon(Array(
      new Coordinate(e.getMinX, e.getMinY), new Coordinate(e.getMaxX, e.getMinY),
      new Coordinate(e.getMaxX, e.getMaxY), new Coordinate(e.getMinX, e.getMaxY),
      new Coordinate(e.getMinX, e.getMinY)))
  }

  /** PostGIS ST_Split for (multi)line inputs split by a point: split
    * every component at the blade point when it lies on that component,
    * flattening the pieces in input order. */
  def splitLinesByPoint(g: Geometry, pt: Point): Geometry = {
    val parts = scala.collection.mutable.Buffer[Geometry]()
    for (i <- 0 until g.getNumGeometries) g.getGeometryN(i) match {
      case line: LineString =>
        val lil = new org.locationtech.jts.linearref.LengthIndexedLine(line)
        val idx = lil.indexOf(pt.getCoordinate)
        val onLine = line.distance(pt) < 1e-9
        if (!onLine || idx <= 0 || idx >= lil.getEndIndex) parts += line.copy()
        else {
          parts += lil.extractLine(0, idx)
          parts += lil.extractLine(idx, lil.getEndIndex)
        }
      case other => parts += other.copy()
    }
    gf.createGeometryCollection(parts.toArray)
  }

  /** Type name in the reference's shape: plain "LineString" /
    * "MultiPolygon" (spatial_udf.slt: ST_GeometryType → "LineString"). */
  def st_typeName(g: Geometry): String = g.getGeometryType

  def translate(g: Geometry, dx: Double, dy: Double): Geometry =
    keepSrid(AffineTransformation.translationInstance(dx, dy).transform(g), g)

  // ---- Web-mercator tile math (public formulas; EPSG:3857) ----

  /** Half world extent in EPSG:3857 meters (the reference's tile-math
    * constant — 6-decimal form, udfs.rs TileEnvelope). */
  val MercExtent: Double = 20037508.342789

  def tileEnvelope(z: Int, x: Int, y: Int): Geometry = {
    val n = 1L << z
    require(x >= 0 && x < n && y >= 0 && y < n, s"tile ($x,$y) out of range for zoom $z")
    val size = 2 * MercExtent / n
    val minX = -MercExtent + x * size
    val maxY = MercExtent - y * size
    val env = gf.toGeometry(new Envelope(minX, minX + size, maxY - size, maxY))
    env.setSRID(3857)
    env
  }

  // ---- CRS transform over the EPSG parameter registry ----

  /** Reproject between any two registry SRIDs via a shared geographic
    * intermediate (from.inverse -> lon/lat -> to.forward); identity if
    * same SRID; SRID is preserved on the output. The reference uses
    * proj4rs over the full EPSG registry (st_transform.rs:18-120); this
    * engine ships the Snyder projection families + parameter table in
    * [[Projections]]. WGS84/GRS80-family pairs skip the datum leg;
    * datum-shifted frames (OSGB36 4277/27700, NAD27 4267) additionally
    * route lon/lat through the geocentric 7-param Helmert pipeline
    * ([[Projections.DatumShift]]), matching proj's +towgs84. */
  def transform(g: Geometry, toSrid: Int): Geometry = {
    val from = if (g.getSRID == 0) 4326 else g.getSRID
    val out =
      if (from == toSrid) g.copy()
      else (Projections.crsFor(from), Projections.crsFor(toSrid)) match {
        case (Some(fc), Some(tc)) =>
          mapCoords(g, (x, y) => {
            val (lon, lat) = fc.proj.inverse(x, y)
            val (lonW, latW) =
              if (fc.shift.isZero && tc.shift.isZero) (lon, lat)
              else {
                // geodetic -> geocentric -> (to WGS84) -> (to target
                // frame) -> geodetic; each zero shift is skipped
                var xyz = Projections.DatumShift.toGeocentric(fc.ell, lon, lat)
                if (!fc.shift.isZero)
                  xyz = fc.shift.forward(xyz._1, xyz._2, xyz._3)
                if (!tc.shift.isZero)
                  xyz = tc.shift.inverse(xyz._1, xyz._2, xyz._3)
                Projections.DatumShift.toGeodetic(tc.ell, xyz._1, xyz._2, xyz._3)
              }
            tc.proj.forward(lonW, latW)
          })
        case (fc, tc) =>
          val unknown = Seq(from -> fc, toSrid -> tc)
            .collect { case (s, None) => s }.mkString(", ")
          throw new IllegalArgumentException(
            s"ST_Transform: SRID(s) not in the EPSG registry: $unknown " +
              "(supported: 4326/4269/4258/4267/4277, 3857, 27700, " +
              "UTM 326xx/327xx/269xx/258xx, 2154, 3587, 5070, " +
              "3413/3995/3031, 3035)")
      }
    out.setSRID(toSrid)
    out
  }

  private def mapCoords(g: Geometry, f: (Double, Double) => (Double, Double)): Geometry = {
    val out = g.copy()
    out.apply(new CoordinateFilter {
      override def filter(c: Coordinate): Unit = {
        val (nx, ny) = f(c.x, c.y)
        c.x = nx; c.y = ny
      }
    })
    out.geometryChanged()
    out
  }

  // ---- MVT geometry (PostGIS ST_AsMVTGeom semantics) ----

  /** Transform into integer tile coordinates (y grows downward), clip to
    * the buffered tile square. bounds = (xmin, ymin, xmax, ymax). */
  def asMvtGeom(g: Geometry, bounds: (Double, Double, Double, Double),
      extent: Int, buffer: Int, clip: Boolean): Geometry = {
    val (xmin, ymin, xmax, ymax) = bounds
    val sx = extent / (xmax - xmin)
    val sy = extent / (ymax - ymin)
    val t = new AffineTransformation(sx, 0, -xmin * sx, 0, -sy, ymax * sy)
    var out = t.transform(g)
    // snap to integer grid
    out = mapCoords(out, (x, y) => (math.round(x).toDouble, math.round(y).toDouble))
    if (clip) {
      val box = gf.toGeometry(new Envelope(-buffer, extent + buffer, -buffer, extent + buffer))
      out = out.intersection(box)
    }
    if (out == null || out.isEmpty) null else out
  }

  // ---- Minimal GeoJSON (RFC 7946) codec over Jackson (ships w/ Spark) ----

  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
  import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

  @transient private lazy val mapper = new ObjectMapper()

  def toGeoJson(g: Geometry): String = {
    if (g == null) return null
    val node = geomToNode(g)
    mapper.writeValueAsString(node)
  }

  private def coordArr(c: Coordinate): ArrayNode = {
    val a = mapper.createArrayNode()
    a.add(c.x); a.add(c.y)
    if (!c.getZ.isNaN) a.add(c.getZ)
    a
  }

  private def ringArr(cs: Array[Coordinate]): ArrayNode = {
    val a = mapper.createArrayNode()
    cs.foreach(c => a.add(coordArr(c)))
    a
  }

  private def polyArr(p: Polygon): ArrayNode = {
    val a = mapper.createArrayNode()
    a.add(ringArr(p.getExteriorRing.getCoordinates))
    (0 until p.getNumInteriorRing).foreach(i =>
      a.add(ringArr(p.getInteriorRingN(i).getCoordinates)))
    a
  }

  private def geomToNode(g: Geometry): ObjectNode = {
    val o = mapper.createObjectNode()
    g match {
      case p: Point =>
        o.put("type", "Point"); o.set[ObjectNode]("coordinates", coordArr(p.getCoordinate))
      case l: LineString =>
        o.put("type", "LineString"); o.set[ObjectNode]("coordinates", ringArr(l.getCoordinates))
      case p: Polygon =>
        o.put("type", "Polygon"); o.set[ObjectNode]("coordinates", polyArr(p))
      case m: MultiPoint =>
        o.put("type", "MultiPoint")
        val a = mapper.createArrayNode()
        (0 until m.getNumGeometries).foreach(i =>
          a.add(coordArr(m.getGeometryN(i).getCoordinate)))
        o.set[ObjectNode]("coordinates", a)
      case m: MultiLineString =>
        o.put("type", "MultiLineString")
        val a = mapper.createArrayNode()
        (0 until m.getNumGeometries).foreach(i =>
          a.add(ringArr(m.getGeometryN(i).getCoordinates)))
        o.set[ObjectNode]("coordinates", a)
      case m: MultiPolygon =>
        o.put("type", "MultiPolygon")
        val a = mapper.createArrayNode()
        (0 until m.getNumGeometries).foreach(i =>
          a.add(polyArr(m.getGeometryN(i).asInstanceOf[Polygon])))
        o.set[ObjectNode]("coordinates", a)
      case c: GeometryCollection =>
        o.put("type", "GeometryCollection")
        val a = mapper.createArrayNode()
        (0 until c.getNumGeometries).foreach(i => a.add(geomToNode(c.getGeometryN(i))))
        o.set[ObjectNode]("geometries", a)
    }
    o
  }

  def fromGeoJson(s: String): Geometry =
    if (s == null) null else nodeToGeom(mapper.readTree(s))

  private def coordOf(n: JsonNode): Coordinate =
    if (n.size() > 2) new Coordinate(n.get(0).asDouble, n.get(1).asDouble, n.get(2).asDouble)
    else new Coordinate(n.get(0).asDouble, n.get(1).asDouble)

  private def coordsOf(n: JsonNode): Array[Coordinate] = {
    Array.tabulate(n.size())(i => coordOf(n.get(i)))
  }

  private def polyOf(n: JsonNode): Polygon = {
    val shell = gf.createLinearRing(coordsOf(n.get(0)))
    val holes = Array.tabulate(n.size() - 1)(i => gf.createLinearRing(coordsOf(n.get(i + 1))))
    gf.createPolygon(shell, holes)
  }

  private def nodeToGeom(n: JsonNode): Geometry = n.get("type").asText() match {
    case "Point"      => gf.createPoint(coordOf(n.get("coordinates")))
    case "LineString" => gf.createLineString(coordsOf(n.get("coordinates")))
    case "Polygon"    => polyOf(n.get("coordinates"))
    case "MultiPoint" =>
      gf.createMultiPoint(coordsOf(n.get("coordinates")).map(gf.createPoint))
    case "MultiLineString" =>
      val c = n.get("coordinates")
      gf.createMultiLineString(Array.tabulate(c.size())(i => gf.createLineString(coordsOf(c.get(i)))))
    case "MultiPolygon" =>
      val c = n.get("coordinates")
      gf.createMultiPolygon(Array.tabulate(c.size())(i => polyOf(c.get(i))))
    case "GeometryCollection" =>
      val g = n.get("geometries")
      gf.createGeometryCollection(Array.tabulate(g.size())(i => nodeToGeom(g.get(i))))
    case t => throw new IllegalArgumentException(s"GeoJSON type $t not supported")
  }
}
