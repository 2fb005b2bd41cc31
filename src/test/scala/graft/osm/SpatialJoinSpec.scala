package graft.osm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
import org.locationtech.jts.io.WKBWriter
import org.scalatest.funsuite.AnyFunSuite

/** Grid-bucketed spatial join vs a brute-force JTS ground truth, on
  * synthetic rectangles/triangles AND on real monaco building polygons. */
class SpatialJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val gf = new GeometryFactory()
  private def poly(pts: (Double, Double)*): Array[Byte] =
    new WKBWriter().write(gf.createPolygon(
      (pts :+ pts.head).map { case (x, y) => new Coordinate(x, y) }.toArray))

  test("matches brute force on synthetic polygons, boundary points included") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 40 polygons: axis-aligned rectangles + triangles around (7.4, 43.7),
    // sizes straddling the cell pitch (some smaller, some spanning many)
    val polys = (0 until 40).map { i =>
      val cx = 7.40 + rnd.nextDouble() * 0.06
      val cy = 43.70 + rnd.nextDouble() * 0.04
      val w = 0.001 + rnd.nextDouble() * 0.02
      val h = 0.001 + rnd.nextDouble() * 0.02
      val wkb =
        if (i % 3 == 0) poly((cx, cy), (cx + w, cy), (cx + w / 2, cy + h))
        else poly((cx, cy), (cx + w, cy), (cx + w, cy + h), (cx, cy + h))
      (i.toLong, wkb)
    }
    // 2000 random points + exact corner/edge points of the first rectangle
    val pts = (0 until 2000).map { j =>
      (10000L + j, 7.40 + rnd.nextDouble() * 0.07, 43.70 + rnd.nextDouble() * 0.05)
    }
    val polyDf = polys.toDF("poly_id", "wkb")
    val ptsDf = pts.toDF("pt_id", "x", "y")

    val got = SpatialJoin.pointInPolygon(ptsDf, "x", "y", polyDf, "wkb",
      cellDeg = 0.005)
      .select("pt_id", "poly_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val reader = new org.locationtech.jts.io.WKBReader(gf)
    val geoms = polys.map { case (id, wkb) => id -> reader.read(wkb) }
    val expect = (for {
      (pid, x, y) <- pts
      (gid, g) <- geoms
      if g.intersects(gf.createPoint(new Coordinate(x, y)))
    } yield (pid, gid)).toSet
    assert(expect.nonEmpty, "ground truth must be non-trivial")
    assert(got == expect)
  }

  test("empty geometries are dropped instead of crashing sequence()") {
    import spark.implicits._
    val empty = new WKBWriter().write(gf.createPolygon())
    val polys = Seq((1L, empty),
      (2L, poly((7.40, 43.70), (7.41, 43.70), (7.41, 43.71), (7.40, 43.71))))
      .toDF("poly_id", "wkb")
    val pts = Seq((1L, 7.405, 43.705)).toDF("pt_id", "x", "y")
    val got = SpatialJoin.pointInPolygon(pts, "x", "y", polys, "wkb")
      .select("poly_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L))
  }

  test("no pair duplication when a polygon spans many cells") {
    import spark.implicits._
    val big = Seq((1L, poly((7.40, 43.70), (7.46, 43.70), (7.46, 43.74), (7.40, 43.74))))
      .toDF("poly_id", "wkb")
    val inside = Seq((1L, 7.43, 43.72), (2L, 7.401, 43.701)).toDF("pt_id", "x", "y")
    val joined = SpatialJoin.pointInPolygon(inside, "x", "y", big, "wkb",
      cellDeg = 0.001)
    // the bucketing must plan as an equi join — never a cartesian/NL join
    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct") &&
      !physical.contains("BroadcastNestedLoopJoin"), physical.take(500))
    val rows = joined.select("pt_id").collect().map(_.getLong(0)).toSeq
    assert(rows.sorted == Seq(1L, 2L)) // once each, despite ~2400 cell replicas
  }

  test("real monaco buildings: grid join equals the per-polygon filter") {
    val (features, cuts) = OsmPipeline.featuresWithCuts(spark,
      Seq("/root/reference/tests/test_files/monaco.osm.pbf"),
      OsmPipeline.Options(tagsFilter =
        Some(Map("building" -> TagFilters.AnyValue))))
    try {
      val polysAll = features
        .filter(udf(GeomUdfs.geomType).apply(col("geometry")) === "Polygon")
        .select(col("feature_id"), col("geometry")).limit(300).cache()
      val nPolys = polysAll.count()
      assert(nPolys > 100)
      import spark.implicits._
      val probe = (for {
        i <- 0 until 60; j <- 0 until 40
      } yield (i * 40L + j, 7.40 + i * 0.0008, 43.72 + j * 0.0004))
        .toDF("pt_id", "x", "y")
      val got = SpatialJoin.pointInPolygon(probe, "x", "y",
        polysAll, "geometry", cellDeg = 0.002)
        .select("pt_id", "feature_id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      // ground truth: JTS over the collected (bounded: 300 polys × 2400 pts)
      val reader = new org.locationtech.jts.io.WKBReader(gf)
      val geoms = polysAll.collect()
        .map(r => r.getString(0) -> reader.read(r.getAs[Array[Byte]](1)))
      val probes = probe.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      val expect = (for {
        (pid, x, y) <- probes
        (fid, g) <- geoms
        if g.intersects(gf.createPoint(new Coordinate(x, y)))
      } yield (pid, fid)).toSet
      assert(got == expect)
      assert(expect.nonEmpty, "probe grid must hit at least one building")
    } finally cuts.release()
  }
}
