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
  */
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

  override def finish(reduction: Array[Byte]): Array[Byte] = reduction

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY

  /** Column form: st_union_agg(geometryWkb). */
  def union_agg(c: Column): Column =
    org.apache.spark.sql.functions.udaf(this).apply(c)
}
