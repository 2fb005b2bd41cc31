package graft.osm

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Partitioning invariance of the FULL OSM conversion — the one surface
  * the gate-level sweep (tools/run_invariance.sh) does not cover, and the
  * one with a real fold-order hazard: geometry assembly runs collects,
  * linemerges and union aggregations whose operand ORDER the shuffle
  * layout could plausibly vary, and JTS unions are not bit-stable under
  * reordering unless the plan pins an order. Monaco converted under
  * 3-wide shuffles + AQE off must emit byte-identical WKB per feature_id
  * to the same conversion under 16-wide shuffles + AQE on. */
class OsmInvarianceSpec extends AnyFunSuite {
  private val Monaco = "/root/reference/tests/test_files/monaco.osm.pbf"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def withConfs(kvs: (String, String)*)(
      body: => Map[String, Array[Byte]]): Map[String, Array[Byte]] = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def convert(): Map[String, Array[Byte]] = {
    val (features, cuts) = OsmPipeline.featuresWithCuts(spark,
      Seq(Monaco), OsmPipeline.Options())
    try features.select("feature_id", "geometry").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    finally cuts.release()
  }

  test("monaco conversion emits identical WKB under opposed physical configs") {
    val a = withConfs(
      "spark.sql.shuffle.partitions" -> "3",
      "spark.sql.adaptive.enabled" -> "false")(convert())
    val b = withConfs(
      "spark.sql.shuffle.partitions" -> "16",
      "spark.sql.adaptive.enabled" -> "true")(convert())
    assert(a.size == b.size && a.size > 5000,
      s"feature counts diverged: ${a.size} vs ${b.size}")
    // b.get, not b(k): equal SIZES with different id sets is itself a
    // divergence and must produce this assertion's message (naming the
    // ids), not an opaque NoSuchElementException
    val diff = a.keys.filter(k =>
      !b.get(k).exists(java.util.Arrays.equals(a(k), _)))
    assert(diff.isEmpty,
      s"${diff.size} features' WKB diverged, e.g. ${diff.take(5).toList}")
  }
}
