package graft.osm

import org.locationtech.jts.geom.Geometry

/** Geocoding geometry filter (reference: quackosm/geocode.py:1-10,
  * cli.py:144-160 — free-text query → geometry via Nominatim).
  *
  * Nominatim is a network service, so the engine ships the INTERFACE plus
  * an offline gazetteer-backed implementation: a local GeoJSON
  * FeatureCollection whose features carry a `name` (or `display_name`,
  * Nominatim's field) property. A deployment with network access plugs an
  * HTTP resolver into the same [[Geocoder]] trait; every downstream stage
  * (bbox pushdown, exact intersect, extract cover) only ever sees the
  * resulting geometry.
  */
object Geocode {

  /** One free-text query → geometry; throw if unresolvable (the reference
    * surfaces `Cannot geocode provided Nominatim query`, cli.py:159). */
  trait Geocoder {
    def geometry(query: String): Geometry
  }

  /** Union of several query results — the reference's
    * `geocode_to_geometry` accepts a list and unions it. */
  def toGeometry(queries: Seq[String], geocoder: Geocoder): Geometry = {
    require(queries.nonEmpty, "no geocode queries given")
    queries.map(geocoder.geometry).reduce(_.union(_))
  }

  /** Offline geocoder over a local GeoJSON FeatureCollection: features are
    * matched case-insensitively on their `name` or `display_name`
    * property (exact match first, then unique substring). */
  final class GazetteerGeocoder(path: String) extends Geocoder {
    private val entries: Seq[(String, Geometry)] = {
      val text = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
      require(root.has("features"), s"not a GeoJSON FeatureCollection: $path")
      val feats = root.get("features")
      (0 until feats.size()).flatMap { i =>
        val f = feats.get(i)
        val props = f.get("properties")
        val name = Option(props.get("display_name"))
          .orElse(Option(props.get("name"))).filterNot(_.isNull)
        name.map(n =>
          n.asText().toLowerCase(java.util.Locale.ROOT) -> GeometryFilters.parseGeoJson(f.toString))
      }
    }

    override def geometry(query: String): Geometry = {
      val q = query.trim.toLowerCase(java.util.Locale.ROOT)
      entries.find(_._1 == q).map(_._2).getOrElse {
        val subs = entries.filter(_._1.contains(q))
        subs match {
          case Seq((_, g)) => g
          case Seq() => throw new IllegalArgumentException(
            s"Cannot geocode provided query: $query (gazetteer has " +
              s"${entries.size} entries)")
          case many => throw new IllegalArgumentException(
            s"Ambiguous geocode query: $query matches " +
              many.map(_._1).take(5).mkString(", "))
        }
      }
    }
  }
}
