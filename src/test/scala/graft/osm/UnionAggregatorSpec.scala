package graft.osm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
import org.locationtech.jts.io.WKBWriter
import org.scalatest.funsuite.AnyFunSuite

/** [[UnionAggregator]]'s reshuffle-invariance, pinned directly — the
  * r14 64-extract scale-up caught the incremental union emitting a
  * multi-part relation's MultiPolygon components in partition-arrival
  * order (point sets equal, bytes different across shuffle configs);
  * `finish` now normalizes to the JTS canonical form. This spec holds
  * the property at the operator level: for DISJOINT parts (the OSM
  * relation shape, where union passes coordinates through exactly) the
  * aggregated bytes are IDENTICAL under reversed input order and under
  * an 8-way shuffle of the rows. */
class UnionAggregatorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private val gf = new GeometryFactory()

  /** A small square polygon WKB at integer offset (ox, oy). */
  private def square(ox: Double, oy: Double): Array[Byte] = {
    val ring = Array(
      new Coordinate(ox, oy), new Coordinate(ox + 1, oy),
      new Coordinate(ox + 1, oy + 1), new Coordinate(ox, oy + 1),
      new Coordinate(ox, oy))
    new WKBWriter().write(gf.createPolygon(ring))
  }

  private def aggBytes(rows: Seq[(Long, Array[Byte])],
      parts: Int): Map[Long, Seq[Byte]] =
    rows.toDF("id", "geometry")
      .repartition(parts, col("geometry"))
      .groupBy(col("id"))
      .agg(UnionAggregator.union_agg(col("geometry")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq)
      .toMap

  test("disjoint-part unions are byte-identical under reversed order " +
      "and under an 8-way shuffle (the r14 multi-extract catch)") {
    val rnd = new scala.util.Random(14)
    // 6 groups × 3-9 disjoint squares each, scattered offsets
    val rows = (0L until 6L).flatMap { id =>
      val n = 3 + rnd.nextInt(7)
      val offs = rnd.shuffle((0 until 40).toList).take(n)
      offs.map(o => id -> square(o * 3.0, (o % 7) * 3.0))
    }
    val fwd = aggBytes(rows, 1)
    val rev = aggBytes(rows.reverse, 1)
    val shuffled = aggBytes(rnd.shuffle(rows), 8)
    assert(fwd == rev, "reversed input order changed union bytes")
    assert(fwd == shuffled, "8-way shuffle changed union bytes")
  }

  test("two disjoint polygons union to the SAME MultiPolygon bytes in " +
      "both orders (the relation/5986437 component-order class)") {
    val a = square(0, 0)
    val b = square(10, 10)
    val ab = aggBytes(Seq(1L -> a, 1L -> b), 1)(1L)
    val ba = aggBytes(Seq(1L -> b, 1L -> a), 1)(1L)
    assert(ab == ba)
  }

  test("null rows fold away; an all-null group yields null") {
    val rows = Seq((1L, square(0, 0)), (1L, null.asInstanceOf[Array[Byte]]),
      (2L, null.asInstanceOf[Array[Byte]]))
    val out = rows.toDF("id", "geometry")
      .groupBy(col("id"))
      .agg(UnionAggregator.union_agg(col("geometry")).as("g"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Array[Byte]](1)))
      .toMap
    assert(out(1L).isDefined && out(2L).isEmpty)
  }
}
