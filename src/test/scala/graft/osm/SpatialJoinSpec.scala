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

  test("hot-cell skew: AQE skew-split engages and results are unchanged") {
    // 90% of all points land in ONE grid cell — the dense-city shape the
    // scaladoc claims is "ordinary join skew — AQE splits them". Prove
    // it: with skew thresholds scaled to test data volume (the 100 TB
    // deployment uses the defaults, which sit in the same ratio to its
    // partition sizes), the executed plan must carry the skew marker.
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "65536")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
    // both sides must shuffle: a broadcast join would (correctly) make
    // skew irrelevant, but here we exercise the big×big path
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val hotX = 7.4005; val hotY = 43.7005
    def ptsOn(sess: SparkSession) = sess.range(0, 120000).select(
      col("id").as("pt_id"),
      when(col("id") % 10 < 9,
          lit(hotX) + (rand(11) - 0.5) * 0.008) // inside one 0.01° cell
        .otherwise(lit(7.0) + rand(12) * 0.9).as("x"),
      when(col("id") % 10 < 9,
          lit(hotY) + (rand(13) - 0.5) * 0.008)
        .otherwise(lit(43.0) + rand(14) * 0.9).as("y"))
    val rnd = new scala.util.Random(21)
    val polyRows = (0 until 60).map { i =>
      // first few boxes cover the hot cell, the rest scatter
      val (cx, cy) =
        if (i < 5) (hotX - 0.01 + rnd.nextDouble() * 0.01,
          hotY - 0.01 + rnd.nextDouble() * 0.01)
        else (7.0 + rnd.nextDouble() * 0.9, 43.0 + rnd.nextDouble() * 0.9)
      (i.toLong, poly((cx, cy), (cx + 0.02, cy), (cx + 0.02, cy + 0.02),
        (cx, cy + 0.02)))
    }
    def polysOn(sess: SparkSession) = {
      import sess.implicits._
      polyRows.toDF("poly_id", "wkb")
    }
    // collect THIS queryExecution (count() would spawn its own), so the
    // AQE-final plan — where skew decisions materialize — is inspectable
    val joined = SpatialJoin.pointInPolygon(ptsOn(s), "x", "y", polysOn(s),
      "wkb", cellDeg = 0.01).select("pt_id")
    val nAqe = joined.collect().length.toLong
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"), "AQE skew-split did not engage:\n" +
      plan.take(1500))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
    // same join without AQE (deterministic generators): identical count
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val nPlain = SpatialJoin.pointInPolygon(ptsOn(s2), "x", "y",
      polysOn(s2), "wkb", cellDeg = 0.01).count()
    assert(nAqe == nPlain && nAqe > 0)
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
