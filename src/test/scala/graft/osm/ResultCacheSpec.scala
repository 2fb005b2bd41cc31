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
}
