package graft.osm

import org.scalatest.funsuite.AnyFunSuite
import graft.osm.ExtractCover.{cover, Extract}
import graft.osm.GeometryFilters.bbox

class ExtractCoverSpec extends AnyFunSuite {

  private def ex(id: String, minx: Double, miny: Double, maxx: Double,
      maxy: Double): Extract = {
    val g = bbox(minx, miny, maxx, maxy)
    Extract(id, id, s"$id.osm.pbf", "world", g.getArea, s"http://x/$id", g)
  }

  test("picks the single best-fitting extract") {
    val index = Seq(
      ex("world", -180, -90, 180, 90),
      ex("small", 0, 0, 2, 2),
      ex("tight", 0.4, 0.4, 1.6, 1.6))
    val q = bbox(0.5, 0.5, 1.5, 1.5)
    val got = cover(q, index)
    assert(got.map(_.id) == Seq("tight")) // best IoU, not the huge world file
  }

  test("covers a geometry spanning two extracts with both") {
    val index = Seq(
      ex("left", 0, 0, 1, 2), ex("right", 1, 0, 2, 2),
      ex("world", -180, -90, 180, 90))
    val q = bbox(0.4, 0.5, 1.6, 1.5)
    val got = cover(q, index)
    assert(got.map(_.id).toSet == Set("left", "right"))
  }

  test("drops redundant extracts from the cover") {
    val index = Seq(
      ex("big", 0, 0, 4, 4), ex("inner", 1, 1, 2, 2))
    val q = bbox(0.5, 0.5, 3.5, 3.5)
    val got = cover(q, index)
    assert(got.map(_.id) == Seq("big")) // inner adds nothing
  }

  test("raises when the geometry cannot be covered") {
    val index = Seq(ex("europe", 0, 40, 20, 60))
    val q = bbox(100, -10, 110, 0)
    assertThrows[IllegalStateException](cover(q, index))
  }

  test("zero-area queries (point / line) pick containing extracts") {
    val index = Seq(
      ex("world", -180, -90, 180, 90),
      ex("left", 0, 0, 1, 2), ex("right", 1, 0, 2, 2))
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    val point = gf.createPoint(new org.locationtech.jts.geom.Coordinate(0.5, 1.0))
    assert(cover(point, index).map(_.id) == Seq("left")) // smallest containing
    val line = gf.createLineString(Array(
      new org.locationtech.jts.geom.Coordinate(0.5, 1.0),
      new org.locationtech.jts.geom.Coordinate(1.5, 1.0)))
    assert(cover(line, index).map(_.id).toSet == Set("left", "right"))
    val farPoint = gf.createPoint(new org.locationtech.jts.geom.Coordinate(200, 0))
    assertThrows[IllegalStateException](
      cover(farPoint, Seq(ex("small", 0, 0, 1, 1))))
  }

  test("smaller area wins IoU ties") {
    val q = bbox(0, 0, 1, 1)
    val small = ex("exact", 0, 0, 1, 1)
    val dup = ex("padded", -0.5, -0.5, 1.5, 1.5)
    assert(cover(q, Seq(dup, small)).map(_.id) == Seq("exact"))
  }

  test("GeoJSON index loader mirrors the reference's property mapping") {
    val path = getClass.getResource("/extract_index_fixture.geojson").getPath
    val index = ExtractIndex.loadGeoJson(path)
    // the update-only feature (no urls.pbf) is skipped
    assert(index.size == 4)
    // ids source-prefixed, names slash-flattened
    assert(index.map(_.id).toSet == Set("Geofabrik_europe", "Geofabrik_france",
      "Geofabrik_monaco", "Geofabrik_us/california"))
    assert(index.find(_.id == "Geofabrik_us/california").get.name ==
      "us_california")
    // parent chain: explicit parent prefixed, missing parent = source,
    // us subtree reparented under us
    assert(index.find(_.id == "Geofabrik_europe").get.parent == "Geofabrik")
    assert(index.find(_.id == "Geofabrik_monaco").get.parent == "Geofabrik_europe")
    assert(index.find(_.id == "Geofabrik_us/california").get.parent ==
      "Geofabrik_us")
    // file names walk the parent chain root-to-leaf (bare slug chain, no
    // extension — the reference appends .osm.pbf at download time)
    assert(index.find(_.id == "Geofabrik_monaco").get.fileName ==
      "geofabrik_europe_monaco")
    assert(index.find(_.id == "Geofabrik_france").get.fileName ==
      "geofabrik_europe_france")
    // sorted ascending by geodetic area (california's 11°×10° box at ~37°N
    // is slightly smaller than france's 14°×9.5° at ~47°N)
    assert(index.map(_.name) ==
      Seq("monaco", "us_california", "france", "europe"))
    assert(index.map(_.area) == index.map(_.area).sorted)
    // sanity: spherical-excess area of the monaco box ≈ 37 km² (±10%)
    val monacoArea = index.find(_.id == "Geofabrik_monaco").get.area
    assert(monacoArea > 30 && monacoArea < 45, monacoArea.toString)
  }

  test("findByQuery: file-name and name matches, tie-breaks, suggestions") {
    val path = getClass.getResource("/extract_index_fixture.geojson").getPath
    val index = ExtractIndex.loadGeoJson(path)
    // exact name match, case-insensitive
    assert(ExtractIndex.findByQuery(index, "Monaco").id == "Geofabrik_monaco")
    // full file-name match, with _ <-> space equivalence
    assert(ExtractIndex.findByQuery(index, "geofabrik europe monaco").id ==
      "Geofabrik_monaco")
    // several extracts with the SAME name: first match = smallest (area, id)
    val dup = index ++ Seq(index.find(_.name == "monaco").get
      .copy(id = "BBBike_monaco", parent = "BBBike",
        fileName = "bbbike_monaco", area = 1e9))
    assert(ExtractIndex.findByQuery(dup, "monaco").id == "Geofabrik_monaco")
    assertThrows[IllegalArgumentException](
      ExtractIndex.findByQuery(dup, "monaco", selectFirstMatch = false))
    // zero matches: loud error with close-match suggestions
    val e = intercept[NoSuchElementException](
      ExtractIndex.findByQuery(index, "monacco"))
    assert(e.getMessage.contains("monaco"), e.getMessage)
  }

  test("convertNamedExtract: query -> fetch -> conversion") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val monaco = "/root/reference/tests/test_files/monaco.osm.pbf"
    val idxPath = getClass.getResource("/extract_index_fixture.geojson").getPath
    val index = ExtractIndex.loadGeoJson(idxPath)
    val (features, cuts) = ExtractCover.convertNamedExtract(
      spark, "Monaco", index, _ => monaco,
      OsmPipeline.Options(tagsFilter =
        Some(Map("building" -> graft.osm.TagFilters.AnyValue))))
    try assert(features.count() == 1283) // the documented monaco building count
    finally cuts.release()
  }

  test("parquet index cache round-trips and rejects outdated structure") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val path = getClass.getResource("/extract_index_fixture.geojson").getPath
    val index = ExtractIndex.loadGeoJson(path)
    val writer = new org.locationtech.jts.io.WKBWriter()
    val cache = java.nio.file.Files.createTempDirectory("idx").toString + "/index.parquet"
    index.map(e => (e.id, e.name, e.fileName, e.parent, writer.write(e.geometry),
        e.area, e.url))
      .toDF("id", "name", "file_name", "parent", "geometry", "area", "url")
      .write.parquet(cache)
    val back = ExtractIndex.loadParquet(spark, cache)
      .sortBy(e => (e.area, e.id))
    assert(back.map(e => (e.id, e.name, e.fileName, e.parent, e.area, e.url)) ==
      index.map(e => (e.id, e.name, e.fileName, e.parent, e.area, e.url)))
    assert(back.zip(index).forall { case (b, a) => b.geometry.equalsExact(a.geometry) })
    // outdated structure (missing columns) is a hard error, not silence
    val bad = java.nio.file.Files.createTempDirectory("idx").toString + "/bad.parquet"
    index.map(e => (e.id, e.url)).toDF("id", "url").write.parquet(bad)
    assertThrows[IllegalArgumentException](ExtractIndex.loadParquet(spark, bad))
  }

  test("convertGeometryFromIndex: fixture index covers monaco end-to-end") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val monaco = "/root/reference/tests/test_files/monaco.osm.pbf"
    val idxPath = getClass.getResource("/extract_index_fixture.geojson").getPath
    val queryWkt = bbox(7.41, 43.725, 7.43, 43.74).toText
    val fetched = scala.collection.mutable.ArrayBuffer.empty[String]
    val (features, cuts) = ExtractCover.convertGeometryFromIndex(
      spark, queryWkt, idxPath,
      e => { fetched += e.id; monaco })
    try {
      // the cover picks ONLY the monaco extract (best IoU), never europe
      assert(fetched.toSeq == Seq("Geofabrik_monaco"))
      assert(features.count() > 0)
    } finally cuts.release()
  }

  test("convertGeometry: cover -> fetch -> multi-file conversion == single-file") {
    // Split monaco into two overlapping synthetic extracts (nodes split by
    // longitude, ways/relations duplicated into both — every element is in
    // at least one extract, like real neighboring extracts), index them by
    // bbox, and let the §3.2 path pick BOTH for a query spanning the seam.
    // The result must match converting the original single file with the
    // same geometry filter.
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val monaco = "/root/reference/tests/test_files/monaco.osm.pbf"
    val dir = java.nio.file.Files.createTempDirectory("extracts").toString
    val rows = spark.read.format("osmpbf").load(monaco)
    val elems = graft.pbf.PbfWriter.fromRows(rows).collect()
    val splitLon = 7.424 // roughly mid-monaco
    def writeHalf(name: String, keepNode: graft.pbf.OsmElement => Boolean): String = {
      val path = s"$dir/$name.osm.pbf"
      graft.pbf.PbfWriter.write(
        elems.iterator.filter(e => e.kind != "node" || keepNode(e)), path)
      path
    }
    val west = writeHalf("west", _.lon <= splitLon + 0.001) // overlap margin
    val east = writeHalf("east", _.lon >= splitLon - 0.001)
    val paths = Map("west" -> west, "east" -> east)
    val index = Seq(
      Extract("west", "west", "west.osm.pbf", "monaco",
        bbox(7.40, 43.72, splitLon, 43.76).getArea, "local",
        bbox(7.40, 43.72, splitLon, 43.76)),
      Extract("east", "east", "east.osm.pbf", "monaco",
        bbox(splitLon, 43.72, 7.44, 43.76).getArea, "local",
        bbox(splitLon, 43.72, 7.44, 43.76)))
    val queryWkt = bbox(7.421, 43.732, 7.428, 43.737).toText // spans the seam
    val (covered, cuts) = ExtractCover.convertGeometry(
      spark, queryWkt, index, e => paths(e.id))
    val (direct, cuts2) = OsmPipeline.featuresWithCuts(spark, Seq(monaco),
      OsmPipeline.Options(geometryWkt = Some(queryWkt)))
    try {
      val a = covered.select("feature_id").collect().map(_.getString(0)).toSet
      val b = direct.select("feature_id").collect().map(_.getString(0)).toSet
      assert(a.nonEmpty)
      assert(a == b)
    } finally { cuts.release(); cuts2.release() }
  }
}
