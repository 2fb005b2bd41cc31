package graft.osm

import org.scalatest.funsuite.AnyFunSuite

class GeometryFiltersSpec extends AnyFunSuite {

  test("bbox parser builds the canonical monaco filter polygon") {
    val g = GeometryFilters.parseBbox("7.41649,43.73109,7.42193,43.73371")
    val e = g.getEnvelopeInternal
    assert(e.getMinX == 7.41649 && e.getMaxY == 43.73371)
    assert(g.isValid)
  }

  test("case folds survive a hostile default locale (Turkish dotless i)") {
    // a cluster JVM inherits the host's default locale; under tr-TR the
    // DEFAULT-locale fold maps "I" to dotless "ı", so any user-facing
    // case-insensitive match that forgot Locale.ROOT silently misses
    // every name containing an I. Prove the hazard is live in this JVM,
    // then prove the geocoder is immune.
    // NOTE: Locale.setDefault is process-global. This is safe because the
    // forked test JVM runs suites SEQUENTIALLY (Test/fork with the default
    // testForkedParallel=false); if parallel forked execution is ever
    // enabled, this mutation would poison concurrently-running suites and
    // must move behind a shared lock.
    val prev = java.util.Locale.getDefault
    java.util.Locale.setDefault(java.util.Locale.forLanguageTag("tr-TR"))
    try {
      assert("I".toLowerCase == "ı", "tr locale not in effect")
      val gaz = new Geocode.GazetteerGeocoder(
        getClass.getResource("/gazetteer_fixture.geojson").getPath)
      val f = gaz.geometry("FONTVIEILLE") // capital I ×2
      assert(f.getArea > 0)
    } finally java.util.Locale.setDefault(prev)
  }

  test("gazetteer geocoder resolves names, unions queries, rejects unknowns") {
    val gaz = new Geocode.GazetteerGeocoder(
      getClass.getResource("/gazetteer_fixture.geojson").getPath)
    // exact (case-insensitive) display_name match
    val monaco = gaz.geometry("monaco, monaco-ville, monaco")
    assert(monaco.getEnvelopeInternal.getMinX == 7.38)
    // unique substring match falls back
    val fontvieille = gaz.geometry("Fontvieille")
    assert(fontvieille.getArea < monaco.getArea)
    // multi-query union covers both neighbourhoods
    val both = Geocode.toGeometry(Seq("Fontvieille", "Monte Carlo"), gaz)
    assert(both.contains(fontvieille))
    assert(both.getArea > fontvieille.getArea)
    // unknown and ambiguous queries fail loudly
    assertThrows[IllegalArgumentException](gaz.geometry("atlantis"))
    assertThrows[IllegalArgumentException](gaz.geometry("mon"))
  }

  test("wkt parser round-trips") {
    val g = GeometryFilters.parseWkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    assert(g.getArea == 1.0)
  }

  test("geojson parser handles Polygon, Feature wrapper, and MultiPolygon") {
    val poly = GeometryFilters.parseGeoJson(
      """{"type":"Polygon","coordinates":[[[0,0],[2,0],[2,2],[0,2],[0,0]]]}""")
    assert(poly.getArea == 4.0)
    val feature = GeometryFilters.parseGeoJson(
      """{"type":"Feature","properties":{},"geometry":
        |{"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[0,1],[0,0]]]}}""".stripMargin)
    assert(feature.getArea == 1.0)
    val multi = GeometryFilters.parseGeoJson(
      """{"type":"MultiPolygon","coordinates":[
        |[[[0,0],[1,0],[1,1],[0,1],[0,0]]],
        |[[[5,5],[6,5],[6,6],[5,6],[5,5]]]]}""".stripMargin)
    assert(math.abs(multi.getArea - 2.0) < 1e-9)
  }

  test("geojson parser reads the monaco boundary fixture") {
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        "/root/reference/tests/test_files/monaco_boundary.geojson")))
    val g = GeometryFilters.parseGeoJson(json)
    assert(g.isValid && g.getArea > 0)
    val e = g.getEnvelopeInternal
    assert(e.getMinX > 7.0 && e.getMaxX < 8.0)
    assert(e.getMinY > 43.0 && e.getMaxY < 44.0)
  }

  test("geohash cell decodes to the documented bbox") {
    // public test vector: geohash 'ezs42' -> lon [-5.625,-5.58984375],
    // lat [42.583,42.627] (~0.044 cell)
    val g = GeometryFilters.geohashBbox("ezs42")
    val e = g.getEnvelopeInternal
    assert(math.abs(e.getMinX - -5.625) < 1e-9)
    assert(math.abs(e.getMaxX - -5.5810546875) < 1e-9)
    assert(math.abs(e.getMinY - 42.5830078125) < 1e-9)
    assert(math.abs(e.getMaxY - 42.626953125) < 1e-9)
  }

  test("multiple geohashes union into one filter geometry") {
    val g = GeometryFilters.geohashesToGeometry(Seq("u09t", "u09w"))
    assert(g.isValid && g.getArea > 0)
  }
}
