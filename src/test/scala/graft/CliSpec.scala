package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.osm.TagFilters._

class CliSpec extends AnyFunSuite {
  private val Monaco = "/root/reference/tests/test_files/monaco.osm.pbf"

  test("tags-filter JSON parses flat and grouped forms (cli.py semantics)") {
    val flat = Cli.parseTagsFilter(
      """{"building": true, "highway": ["primary", "secondary"],
        |"name": "Monaco", "landuse": false}""".stripMargin)
    assert(flat == Left(Map(
      "building" -> AnyValue,
      "highway" -> Values(Seq("primary", "secondary")),
      "name" -> Values(Seq("Monaco")),
      "landuse" -> Absent)))
    val grouped = Cli.parseTagsFilter(
      """{"buildings": {"building": true}, "roads": {"highway": true}}""")
    assert(grouped == Right(Map(
      "buildings" -> Map("building" -> AnyValue),
      "roads" -> Map("highway" -> AnyValue))))
  }

  test("end-to-end CLI conversion with filter + bbox + sort writes GeoParquet") {
    val out = java.nio.file.Files.createTempDirectory("cli").toString + "/monaco"
    Cli.main(Array(
      Monaco,
      "--output", out,
      "--osm-tags-filter", """{"building": true}""",
      "--geom-filter-bbox", "7.41,43.72,7.44,43.76",
      "--sort"))
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    val back = spark.read.parquet(out)
    assert(back.count() > 500)
    assert(back.columns.toSeq == Seq("feature_id", "tags", "geometry"))
  }

  test("geocode geometry filter resolves through the local gazetteer") {
    val out = java.nio.file.Files.createTempDirectory("cli").toString + "/geocoded"
    val gaz = getClass.getResource("/gazetteer_fixture.geojson").getPath
    Cli.main(Array(
      Monaco,
      "--output", out,
      "--osm-tags-filter", """{"building": true}""",
      "--geom-filter-geocode", "Fontvieille",
      "--geocode-gazetteer", gaz))
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    val back = spark.read.parquet(out)
    val n = back.count()
    assert(n > 0)
    // Fontvieille is a strict subset of monaco: fewer buildings than the
    // full-extract 1283
    assert(n < 1283, n.toString)
    // without a gazetteer the flag fails loudly
    assertThrows[IllegalArgumentException] {
      Cli.main(Array(Monaco, "--output", out + "2",
        "--geom-filter-geocode", "Fontvieille"))
    }
  }

  test("H3 filter fails loudly naming the supported alternatives") {
    // permanent descope (cli.py:190-225 shells into DuckDB's community h3
    // extension): the flag must error with guidance, never be silently
    // ignored (which would convert the WHOLE extract)
    val e = intercept[IllegalArgumentException] {
      Cli.main(Array(Monaco, "--output", "/tmp/never-written",
        "--geom-filter-index-h3", "8a3969a40ac7fff"))
    }
    assert(e.getMessage.contains("geom-filter-index-h3") &&
      e.getMessage.contains("geom-filter-index-s2") &&
      e.getMessage.contains("geom-filter-index-geohash"))
    // COMBINED with a supported geometry flag it must STILL error: the
    // check is unconditional, not a low-precedence arm of the geometry
    // chain that a bbox would shadow (silently dropping the h3 filter)
    val e2 = intercept[IllegalArgumentException] {
      Cli.main(Array(Monaco, "--output", "/tmp/never-written",
        "--geom-filter-bbox", "7.41,43.72,7.42,43.73",
        "--geom-filter-index-h3", "8a3969a40ac7fff"))
    }
    assert(e2.getMessage.contains("geom-filter-index-h3"))
  }

  test("exploded CLI output has per-key columns") {
    val out = java.nio.file.Files.createTempDirectory("cli").toString + "/expl"
    Cli.main(Array(
      Monaco,
      "--output", out,
      "--osm-tags-filter", """{"amenity": ["restaurant", "cafe", "bar"]}""",
      "--explode-tags"))
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    val back = spark.read.parquet(out)
    assert(back.columns.contains("amenity"))
    assert(back.count() > 0)
  }
}
