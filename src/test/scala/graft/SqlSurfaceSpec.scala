package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface: registered st_* functions, hilbert_index, and plain
  * spark.sql over the osmpbf source + testdata views. */
class SqlSurfaceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("st_* UDFs work from SQL") {
    graft.osm.GeomUdfs.register(spark)
    val r = spark.sql(
      """SELECT st_astext(st_point_wkb(7.5d, 43.7d)) AS wkt,
        |       st_geometrytype(st_point_wkb(0d, 0d)) AS t,
        |       st_isempty(st_point_wkb(1d, 1d)) AS e""".stripMargin).head()
    assert(r.getString(0) == "POINT (7.5 43.7)")
    assert(r.getString(1) == "Point")
    assert(!r.getBoolean(2))
  }

  test("hilbert_index works from SQL and is monotone on the diagonal start") {
    graft.osm.HilbertIndexExpr.register(spark)
    val r = spark.sql(
      "SELECT hilbert_index(0d, 0d, 0d, 0d, 1d, 1d) AS origin").head()
    assert(r.getLong(0) == 0L)
  }

  test("osmpbf source is queryable through SQL views") {
    spark.read.format("osmpbf")
      .load("/root/reference/tests/test_files/monaco.osm.pbf")
      .createOrReplaceTempView("osm")
    val counts = spark.sql(
      """SELECT kind, count(*) AS n FROM osm
        |WHERE size(map_keys(tags)) > 0 OR tags IS NULL
        |GROUP BY kind ORDER BY kind""".stripMargin).collect()
    assert(counts.length == 3)
    val buildings = spark.sql(
      "SELECT count(*) FROM osm WHERE kind = 'way' AND tags['building'] IS NOT NULL")
      .head().getLong(0)
    assert(buildings == 1256L)
  }

  test("testdata views answer SQL with the same results as the DataFrame API") {
    Tables.lineitem(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("lineitem")
    val sql = spark.sql(
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS s
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    import org.apache.spark.sql.functions._
    val df = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("s"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(sql == df)
  }
}
