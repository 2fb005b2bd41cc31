package graft.osm

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ResultCacheSpec extends AnyFunSuite {
  private val Monaco = "/root/reference/tests/test_files/monaco.osm.pbf"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("same parameters reuse the cached conversion; ignoreCache rebuilds") {
    val work = java.nio.file.Files.createTempDirectory("rc").toString
    val opts = OsmPipeline.Options(tagsFilter =
      Some(Map("building" -> graft.osm.TagFilters.AnyValue)))
    val out1 = ResultCache.convert(spark, Seq(Monaco), opts, workDir = work)
    assert(spark.read.parquet(out1).count() == 1283)
    val marker = new java.io.File(out1, "_SUCCESS_GRAFT")
    val mtime1 = marker.lastModified()

    // cache hit: same path, marker untouched
    val out2 = ResultCache.convert(spark, Seq(Monaco), opts, workDir = work)
    assert(out2 == out1)
    assert(marker.lastModified() == mtime1)

    // parameter change lands at a different path
    val out3 = ResultCache.convert(spark, Seq(Monaco),
      OsmPipeline.Options(), workDir = work)
    assert(out3 != out1)

    // ignoreCache forces a rebuild (marker rewritten)
    Thread.sleep(1100) // mtime resolution
    val out4 = ResultCache.convert(spark, Seq(Monaco), opts, workDir = work,
      ignoreCache = true)
    assert(out4 == out1)
    assert(marker.lastModified() > mtime1)
  }

  test("non-default sort algorithm / extent re-key the result path; " +
      "defaults keep the reference-parity path") {
    val work = "files"
    def path(alg: String,
        ext: Option[(Double, Double, Double, Double)]) =
      ResultCache.resultFilePath(work, Seq(Monaco), OsmPipeline.Options(),
        sortAlgorithm = alg, sortExtent = ext)
    val default = path("str", None)
    // the 2-arg legacy form and explicit defaults agree — existing
    // cached conversions stay addressable
    assert(ResultCache.resultFilePath(work, Seq(Monaco),
      OsmPipeline.Options()) == default)
    assert(default.endsWith("_sorted.parquet"))
    // switching algorithm or pinning a custom extent must not silently
    // serve a file sorted under different parameters
    assert(path("hilbert", None) != default)
    val ext = Some((7.40, 43.72, 7.44, 43.76))
    assert(path("str", ext) != default)
    assert(path("hilbert", ext) != path("str", ext))
    assert(path("hilbert", None) == path("hilbert", None))
    // unsorted results never carry a sort segment at all
    assert(ResultCache.resultFilePath(work, Seq(Monaco),
      OsmPipeline.Options(), sortResult = false, sortAlgorithm = "hilbert")
      == ResultCache.resultFilePath(work, Seq(Monaco),
        OsmPipeline.Options(), sortResult = false))
    // the CLI always derives sortExtent from the geometry filter's
    // envelope (Cli.scala) — that extent is the DEFAULT for a filtered
    // conversion, already keyed via the geometry hash, so the path
    // keeps the reference's plain `_sorted` naming and a pre-r10 warm
    // cache stays addressable; a DIFFERENT extent still re-keys
    val wkt = "POLYGON ((7.40 43.72, 7.44 43.72, 7.44 43.76, " +
      "7.40 43.76, 7.40 43.72))"
    val gopts = OsmPipeline.Options(geometryWkt = Some(wkt))
    val cliShaped = ResultCache.resultFilePath(work, Seq(Monaco), gopts,
      sortExtent = Some((7.40, 43.72, 7.44, 43.76)))
    assert(cliShaped.endsWith("_sorted.parquet"), cliShaped)
    assert(cliShaped == ResultCache.resultFilePath(work, Seq(Monaco), gopts))
    assert(ResultCache.resultFilePath(work, Seq(Monaco), gopts,
      sortExtent = Some((7.0, 43.0, 8.0, 44.0))) != cliShaped)
  }

  test("geometry hash is orientation-canonical (reference :1412-1458)") {
    val work = "files"
    def path(wkt: String) = ResultCache.resultFilePath(work, Seq(Monaco),
      OsmPipeline.Options(geometryWkt = Some(wkt)))
    // the same square: CCW from origin / CW winding / rotated start vertex
    val ccw = "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
    val cw = "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))"
    val rotated = "POLYGON ((1 1, 0 1, 0 0, 1 0, 1 1))"
    assert(path(cw) == path(ccw), "winding order must not change the path")
    assert(path(rotated) == path(ccw), "start vertex must not change the path")
    // sub-1e-7 coordinate noise rounds away (reference rounds to 7
    // decimals at append time — noise on a NON-minimum vertex, since the
    // rotation anchor is chosen before rounding, same as the reference);
    // a real change re-keys
    val noisy = "POLYGON ((0 0, 1 0.00000001, 1 1, 0 1, 0 0))"
    assert(path(noisy) == path(ccw), "1e-8 noise must round away")
    assert(path("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))") != path(ccw))
    // multipolygon member order is centroid-sorted before hashing
    val ab = "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))"
    val ba = "MULTIPOLYGON (((5 5, 6 5, 6 6, 5 6, 5 5)), ((0 0, 1 0, 1 1, 0 1, 0 0)))"
    assert(path(ab) == path(ba), "part order must not change the path")
    // holes: winding of an interior ring is canonicalized too
    val holeCcw = "POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (3 3, 4 3, 4 4, 3 4, 3 3))"
    val holeCw = "POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (3 3, 3 4, 4 4, 4 3, 3 3))"
    assert(path(holeCw) == path(holeCcw))
  }
}
