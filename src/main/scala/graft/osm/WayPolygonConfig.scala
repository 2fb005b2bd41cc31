package graft.osm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Way polygon-vs-linestring decision config — semantic port of the
  * reference's `osm_way_polygon_features.json` +
  * `_osm_way_polygon_features.py:7-32` (the OSMnx `_is_closed_way_a_polygon`
  * ruleset), compiled to a single Catalyst Column over the raw (unstripped)
  * tags map (pbf_file_reader.py:3200-3282).
  */
object WayPolygonConfig {

  /** A closed way with any of these keys is a polygon. */
  val all: Seq[String] = Seq(
    "allotments", "area:highway", "boundary", "bridge:support",
    "building:part", "building", "cemetery", "club", "craft",
    "demolished:building", "disused:amenity", "disused:leisure",
    "disused:shop", "healthcare", "historic", "industrial",
    "internet_access", "junction", "landuse", "leisure", "office", "place",
    "police", "polling_station", "public_transport", "residential", "ruins",
    "seamark:type", "shop", "sport", "telecom", "tourism")

  /** Polygon only when the key's value is in the allowlist. */
  val allowlist: Map[String, Seq[String]] = Map(
    "advertising" -> Seq("sculpture", "sign"),
    "aerialway" -> Seq("station"),
    "barrier" -> Seq("city_wall", "hedge", "wall", "toll_booth"),
    "highway" -> Seq("services", "rest_area", "platform"),
    "railway" -> Seq("station", "turntable", "roundhouse", "platform"),
    "waterway" -> Seq("riverbank", "dock", "boatyard", "dam", "fuel"))

  /** Polygon unless the key's value is in the denylist. */
  val denylist: Map[String, Seq[String]] = Map(
    "aeroway" -> Seq("jet_bridge", "parking_position", "taxiway", "no"),
    "amenity" -> Seq("bench", "weighbridge"),
    "attraction" -> Seq("river_rafting", "train", "water_slide", "boat_ride"),
    "emergency" -> Seq("designated", "destination", "no", "official",
      "private", "yes"),
    "geological" -> Seq("volcanic_caldera_rim", "fault"),
    "golf" -> Seq("cartpath", "hole", "path"),
    "indoor" -> Seq("corridor", "wall"),
    "man_made" -> Seq("yes", "breakwater", "carpet_hanger", "crane",
      "cutline", "dyke", "embankment", "goods_conveyor", "groyne", "pier",
      "pipeline", "torii", "video_wall"),
    "military" -> Seq("trench"),
    "natural" -> Seq("bay", "cliff", "coastline", "ridge", "strait",
      "tree_row", "valley", "no", "arete"),
    "piste:type" -> Seq("downhill", "hike", "ice_skate", "nordic", "skitour",
      "sled", "sleigh"),
    "playground" -> Seq("balancebeam", "rope_traverse", "stepping_stone",
      "stepping_post", "rope_swing", "climbing_slope"),
    "power" -> Seq("cable", "line", "minor_line", "insulator", "busbar",
      "bay", "portal"))

  private def hasKey(tags: Column, k: String): Column =
    element_at(tags, k).isNotNull

  /** The `(area=yes OR config clauses)` disjunction
    * (pbf_file_reader.py:3205-3237). `tags` must be RAW tags — `area` is a
    * metadata tag stripped from output tags but load-bearing here. */
  def polygonFeatureClause(tags: Column): Column = {
    val areaYes = element_at(tags, "area") === "yes"
    val allKeys = all.map(hasKey(tags, _))
    val allowed = allowlist.toSeq.sortBy(_._1).map { case (k, vs) =>
      element_at(tags, k).isin(vs: _*)
    }
    val denied = denylist.toSeq.sortBy(_._1).map { case (k, vs) =>
      hasKey(tags, k) && !element_at(tags, k).isin(vs: _*)
    }
    (Seq(areaYes) ++ allKeys ++ allowed ++ denied).reduce(_ || _)
  }

  /** Full is_polygon decision for a closed way (pbf_file_reader.py:3238-3262):
    * closed ring AND >=4 distinct consecutive points AND has raw tags AND
    * NOT area=no AND polygon-feature clause. Ring-shape checks are passed in
    * as Columns computed from the vertex array (codegen'd, no UDF). */
  def isPolygon(rawTags: Column, isClosed: Column, nPointsDedup: Column): Column =
    isClosed && (nPointsDedup >= 4) && rawTags.isNotNull &&
      !element_at(rawTags, "area").eqNullSafe("no") &&
      polygonFeatureClause(rawTags)
}
