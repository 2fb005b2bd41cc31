package graft.osm

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.io.{WKBReader, WKBWriter}

/** ST_Union_Agg as a typed Aggregator (SURVEY §2.12 — the one genuine
  * custom aggregate the reference needs; pbf_file_reader.py:3337,3386-3389).
  *
  * Unlike collect_list + union-UDF, this unions incrementally inside the
  * partial-aggregation buffers (map-side combine), so per-group memory is
  * one geometry, not the whole list — the property that matters when a
  * group has millions of members at 100 TB.
  *
  * `finish` NORMALIZES the union (JTS canonical form: component order,
  * ring start point, orientation). Incremental union builds the result
  * in ARRIVAL order, and arrival order is partition-layout-dependent —
  * the r14 64-extract scale-up caught exactly this: a multi-part
  * relation's MultiPolygon carried its components in different orders
  * under opposed shuffle configs (equal point sets, different WKB).
  * Normalization makes the OUTPUT canonical whatever order the partials
  * merged in. For disjoint parts (the OSM relation shape) the union
  * passes coordinates through exactly, so the normalized result is
  * bit-reproducible under any partitioning; genuinely overlapping
  * float-coordinate inputs can still drift at the ulp level with merge
  * order — inherent to incremental float union (the alternative,
  * buffering every member for a sorted one-shot union, forfeits the
  * bounded-memory map-side combine this aggregator exists for). */
object UnionAggregator extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {

  private def read(b: Array[Byte]): Geometry = new WKBReader().read(b)
  private def write(g: Geometry): Array[Byte] = new WKBWriter().write(g)

  override def zero: Array[Byte] = null

  override def reduce(buf: Array[Byte], a: Array[Byte]): Array[Byte] =
    if (a == null) buf
    else if (buf == null) a
    else write(read(buf).union(read(a)))

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
    reduce(b1, b2)

  override def finish(reduction: Array[Byte]): Array[Byte] =
    if (reduction == null) null
    else {
      val g = read(reduction)
      g.normalize()
      write(g)
    }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY

  /** Column form: st_union_agg(geometryWkb). */
  def union_agg(c: Column): Column =
    org.apache.spark.sql.functions.udaf(this).apply(c)
}
