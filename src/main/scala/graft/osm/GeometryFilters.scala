package graft.osm

import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory}
import org.locationtech.jts.io.WKTReader

/** Geometry-filter parsers (the reference CLI's input surface,
  * cli.py:66-188): bbox, WKT, GeoJSON geometry, and geohash — all producing
  * a JTS geometry whose WKT feeds [[OsmPipeline.Options.geometryWkt]].
  * Driver-side utilities; no engine involvement (SURVEY §2.9).
  */
object GeometryFilters {

  private val gf = new GeometryFactory()

  /** `minx,miny,maxx,maxy` (lon/lat order, cli.py:66-84). */
  def bbox(minx: Double, miny: Double, maxx: Double, maxy: Double): Geometry =
    gf.createPolygon(Array(
      new Coordinate(minx, miny), new Coordinate(maxx, miny),
      new Coordinate(maxx, maxy), new Coordinate(minx, maxy),
      new Coordinate(minx, miny)))

  def parseBbox(s: String): Geometry = {
    val p = s.split(",").map(_.trim.toDouble)
    require(p.length == 4, s"bbox needs 4 numbers, got: $s")
    bbox(p(0), p(1), p(2), p(3))
  }

  def parseWkt(s: String): Geometry = new WKTReader(gf).read(s)

  /** The geometry's envelope as the (xmin, ymin, xmax, ymax) tuple the
    * spatial-sort extent uses — the ONE derivation shared by the CLI
    * (clamping the sort frame to the geometry filter) and
    * [[graft.osm.ResultCache]] (recognizing that clamp as the default
    * extent), so the two can never drift apart. */
  def envelopeOf(g: Geometry): (Double, Double, Double, Double) = {
    val e = g.getEnvelopeInternal
    (e.getMinX, e.getMinY, e.getMaxX, e.getMaxY)
  }

  /** Minimal GeoJSON geometry parser (Polygon / MultiPolygon / Point /
    * bbox-bearing Feature), enough for the reference's geo-file filter
    * inputs (cli.py:103-142). Uses Spark's bundled Jackson. */
  def parseGeoJson(json: String): Geometry = {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    val m = new ObjectMapper()
    val root = m.readTree(json)
    def geomNode(n: JsonNode): JsonNode =
      if (n.has("geometry")) n.get("geometry")
      else if (n.has("features")) n.get("features").get(0).get("geometry")
      else n
    def ring(arr: JsonNode): Array[Coordinate] = {
      val out = new Array[Coordinate](arr.size())
      var i = 0
      while (i < arr.size()) {
        out(i) = new Coordinate(arr.get(i).get(0).asDouble(),
          arr.get(i).get(1).asDouble())
        i += 1
      }
      out
    }
    def polygon(coords: JsonNode): Geometry = {
      val shell = gf.createLinearRing(ring(coords.get(0)))
      val holes = (1 until coords.size()).map(i =>
        gf.createLinearRing(ring(coords.get(i)))).toArray
      gf.createPolygon(shell, holes)
    }
    val g = geomNode(root)
    val parsed = g.get("type").asText() match {
      case "Polygon" => polygon(g.get("coordinates"))
      case "MultiPolygon" =>
        val polys = (0 until g.get("coordinates").size())
          .map(i => polygon(g.get("coordinates").get(i)))
        gf.createGeometryCollection(polys.toArray).union()
      case "Point" =>
        val c = g.get("coordinates")
        gf.createPoint(new Coordinate(c.get(0).asDouble(), c.get(1).asDouble()))
      case other => throw new IllegalArgumentException(s"GeoJSON type $other")
    }
    // real-world boundary files are often self-intersecting; the filter
    // machinery (PreparedGeometry) requires validity
    if (parsed.isValid) parsed
    else org.locationtech.jts.geom.util.GeometryFixer.fix(parsed)
  }

  /** Geohash cell → bbox polygon — standard public algorithm (the
    * reference ports the same from a public implementation,
    * _geohash_parser.py:28-67). */
  def geohashBbox(geohash: String): Geometry = {
    val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    var latMin = -90.0; var latMax = 90.0
    var lonMin = -180.0; var lonMax = 180.0
    var isLon = true
    geohash.toLowerCase(java.util.Locale.ROOT).foreach { c =>
      val idx = Base32.indexOf(c)
      require(idx >= 0, s"invalid geohash char: $c")
      (4 to 0 by -1).foreach { bit =>
        val b = (idx >> bit) & 1
        if (isLon) {
          val mid = (lonMin + lonMax) / 2
          if (b == 1) lonMin = mid else lonMax = mid
        } else {
          val mid = (latMin + latMax) / 2
          if (b == 1) latMin = mid else latMax = mid
        }
        isLon = !isLon
      }
    }
    bbox(lonMin, latMin, lonMax, latMax)
  }

  /** Union of several geohash cells (cli.py:162-188 accepts lists). */
  def geohashesToGeometry(hashes: Seq[String]): Geometry =
    hashes.map(geohashBbox).reduce(_.union(_))
}
