package graft.osm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed spatial join — points against polygons with NO equi key.
  *
  * The reference only ever tests points against ONE driver-held geometry
  * (its STRtree worker, _intersection.py:15-55, broadcast by construction);
  * its polygon×polygon join J7 is id-bounded. This operator covers the
  * general case both leave open: N points × M polygons, both distributed.
  *
  * Spark-first shape — uniform-grid bucketing turns the theta join into an
  * equi join:
  *
  *  1. cell(x, y) = (floor(x/δ), floor(y/δ)), encoded into one LONG with
  *     codegen'd arithmetic — NO UDF on the (big) points side, so the scan,
  *     the cell computation and the shuffle write stay in one codegen span.
  *  2. each polygon is replicated to every cell its envelope overlaps (an
  *     explode over the bbox cell range — bounded by bbox_area/δ² per
  *     polygon; pick δ near the typical polygon diameter to keep the
  *     replication factor small).
  *  3. candidates = shuffle hash join on the cell id. A point lives in
  *     exactly one cell and a polygon appears at most once per cell, so a
  *     (point, polygon) pair meets at most once — no post-join dedup.
  *  4. exact verify: JTS intersects (boundary-inclusive, same predicate as
  *     the conversion's point filter) with a per-thread LRU of PREPARED
  *     geometries keyed by the polygon bytes — a polygon's candidates
  *     cluster inside a partition, so each task thread prepares a handful
  *     of polygons once, then answers point probes from the index.
  *
  * At 100 TB: the points side never replicates and shuffles once on a
  * high-cardinality key; hot cells (dense cities) are ordinary join skew —
  * AQE splits them; a continent-sized polygon in a fine grid is the one
  * anti-pattern (huge replication) — raise δ or pre-split such polygons.
  */
object SpatialJoin {

  /** Offset/width giving ±2^21 cells per axis — at δ = 0.001° that spans
    * the full ±180° range with room to spare. */
  private val CellOffset = 1L << 21

  private def cellOf(cx: Column, cy: Column): Column =
    (cx + CellOffset) * (CellOffset * 2) + (cy + CellOffset)

  /** Exact verifier with a per-thread prepared-geometry LRU (keyed by the
    * WKB bytes — correct across concurrent joins on different frames). */
  private object ContainsKernel extends Serializable {
    @transient private lazy val cache =
      new ThreadLocal[java.util.LinkedHashMap[java.nio.ByteBuffer,
          org.locationtech.jts.geom.prep.PreparedGeometry]] {
        override def initialValue() =
          new java.util.LinkedHashMap[java.nio.ByteBuffer,
              org.locationtech.jts.geom.prep.PreparedGeometry](
              16, 0.75f, true) {
            override def removeEldestEntry(
                e: java.util.Map.Entry[java.nio.ByteBuffer,
                  org.locationtech.jts.geom.prep.PreparedGeometry]): Boolean =
              size() > 128
          }
      }
    @transient private lazy val gf =
      new ThreadLocal[org.locationtech.jts.geom.GeometryFactory] {
        override def initialValue() =
          new org.locationtech.jts.geom.GeometryFactory()
      }
    val test: (Array[Byte], Double, Double) => Boolean = (wkb, x, y) => {
      val key = java.nio.ByteBuffer.wrap(wkb)
      val c = cache.get()
      var prep = c.get(key)
      if (prep == null) {
        prep = org.locationtech.jts.geom.prep.PreparedGeometryFactory.prepare(
          new org.locationtech.jts.io.WKBReader(gf.get()).read(wkb))
        c.put(key, prep)
      }
      prep.intersects(gf.get().createPoint(
        new org.locationtech.jts.geom.Coordinate(x, y)))
    }
  }

  /** Join `points` (two double columns) with `polygons` (a WKB binary
    * column): one output row per (point, polygon) pair where the point
    * intersects the polygon (boundary-inclusive). Output = point columns ++
    * polygon columns (names must not collide). `cellDeg` is the grid pitch
    * δ in degrees. */
  def pointInPolygon(points: DataFrame, xCol: String, yCol: String,
      polygons: DataFrame, wkbCol: String,
      cellDeg: Double = 0.01): DataFrame = {
    // floor: below ~1e-6° (≈0.1 m) lon/lat cell indexes would leave the
    // ±2^21 encoding range and overflow the packed cell id
    require(cellDeg >= 1e-6, s"cellDeg must be >= 1e-6 degrees, got $cellDeg")
    val pts = points.withColumn("_cell",
      cellOf(floor(col(xCol) / cellDeg).cast("long"),
        floor(col(yCol) / cellDeg).cast("long")))
    val extent = udf(GeomUdfs.extent).apply(col(wkbCol))
    val polys = polygons
      .filter(col(wkbCol).isNotNull)
      .withColumn("_ext", extent)
      // empty geometries have an inverted JTS envelope (min > max), which
      // would make sequence() throw — they can't contain a point, drop them
      .filter(col("_ext._1") <= col("_ext._3") &&
        col("_ext._2") <= col("_ext._4"))
      .withColumn("_cx", explode(sequence(
        floor(col("_ext._1") / cellDeg).cast("long"),
        floor(col("_ext._3") / cellDeg).cast("long"))))
      .withColumn("_cy", explode(sequence(
        floor(col("_ext._2") / cellDeg).cast("long"),
        floor(col("_ext._4") / cellDeg).cast("long"))))
      .withColumn("_cell", cellOf(col("_cx"), col("_cy")))
      .drop("_ext", "_cx", "_cy")
    val verify = udf(ContainsKernel.test)
    pts.join(polys, Seq("_cell"))
      .filter(verify(col(wkbCol), col(xCol), col(yCol)))
      .drop("_cell")
  }

  /** jx_spatial_join gate: customers as points on an exact binary
    * lattice (steps of 1/16°, so Spark and the oracle compute
    * bit-identical doubles), nations as a 5×5 grid of 3°×3° boxes —
    * axis-aligned so DuckDB can state point-in-polygon as BETWEEN while
    * the engine runs the full grid-bucket + JTS-verify path on real
    * POLYGON WKB. (pid, box_id) per containment, totally ordered. */
  def jxGate(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val pts = graft.Tables.customer(s, dir).select(
      col("c_custkey").cast("long").as("pid"),
      ((col("c_custkey") % 320).cast("double") / lit(16.0) - lit(10.0))
        .as("px"),
      (((col("c_custkey") * 7) % 320).cast("double") / lit(16.0) -
        lit(10.0)).as("py"))
    val boxes = graft.Tables.nation(s, dir).select(
      col("n_nationkey").cast("long").as("box_id"),
      ((col("n_nationkey") % 5).cast("double") * lit(4.0) - lit(10.0))
        .as("x0"),
      (floor(col("n_nationkey") / 5).cast("double") * lit(4.0) -
        lit(10.0)).as("y0"))
      .withColumn("_wkb", GeomUdfs.polygon_wkb(array(
        array(col("x0"), col("y0")),
        array(col("x0") + 3.0, col("y0")),
        array(col("x0") + 3.0, col("y0") + 3.0),
        array(col("x0"), col("y0") + 3.0),
        array(col("x0"), col("y0")))))
      .select(col("box_id"), col("_wkb"))
    pointInPolygon(pts, "px", "py", boxes, "_wkb", cellDeg = 1.0)
      .select(col("pid"), col("box_id"))
      .orderBy(col("pid"), col("box_id"))
  }
}
