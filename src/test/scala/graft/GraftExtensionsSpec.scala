package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions exposes hilbert_index to SQL") {
    // extensions only apply at session construction — build a dedicated
    // session (and restore a clean slate for the other shared-session
    // suites afterwards)
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = spark.sql(
        "SELECT hilbert_index(0.5, 0.5, 0.0, 0.0, 1.0, 1.0) AS h").head()
      assert(!r.isNullAt(0))
      // same value as the temp-function registration route
      Graft.setup(spark)
      val r2 = spark.sql(
        "SELECT hilbert_index(0.5, 0.5, 0.0, 0.0, 1.0, 1.0) AS h").head()
      assert(r.getLong(0) == r2.getLong(0))
      // Graft.setup also brought the st_* UDF surface
      assert(spark.sql("SELECT st_astext(st_point_wkb(1.0d, 2.0d)) AS t")
        .head().getString(0).startsWith("POINT"))
      // the text kernels are SQL-visible through the extension too
      assert(spark.sql(
        "SELECT merge_pair(split_words('a a b'), 'a', 'b') AS m")
        .head().getSeq[String](0) == Seq("a", "a b"))
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
