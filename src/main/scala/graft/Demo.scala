package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Example/driver program: read an OSM PBF through the public
  * `format("osmpbf")` surface and run a tag-filtered query — the
  * minimum end-to-end slice of SURVEY §7.2. */
object Demo {
  def main(args: Array[String]): Unit = {
    val pbf = if (args.nonEmpty) args(0)
      else "/root/reference/tests/test_files/monaco.osm.pbf"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val elements = spark.read.format("osmpbf").load(pbf)
    println("=== per-kind counts ===")
    elements.groupBy("kind").count().orderBy("kind").show()

    println("=== buildings (tag filter pushdown over ways) ===")
    val buildings = elements
      .filter(col("kind") === "way" && col("tags").getItem("building").isNotNull)
    println(s"building ways: ${buildings.count()}")
    buildings.select(col("id"), element_at(col("tags"), "building").as("building"),
      size(col("refs")).as("n_refs")).orderBy("id").show(5)

    println("=== scan plan (pushdown check) ===")
    buildings.select("id").explain("formatted")
    spark.stop()
  }
}
