package graft.osm

import org.scalatest.funsuite.AnyFunSuite

/** Direct unit coverage of the JTS geometry kernel — the semantics the
  * conversion relies on, pinned at function level (the pipeline specs
  * cover them end-to-end; these isolate the contract of each function,
  * reference semantics per pbf_file_reader.py:3242-3463, 4246-4259).
  */
class GeomUdfsSpec extends AnyFunSuite {

  private def pt(x: Double, y: Double) = Seq(x, y)

  test("lineWkb dedups consecutive points; degenerate lines yield null") {
    val line = GeomUdfs.lineWkb(Seq(pt(0, 0), pt(0, 0), pt(1, 1), pt(1, 1), pt(2, 0)))
    assert(GeomUdfs.asText(line) == "LINESTRING (0 0, 1 1, 2 0)")
    // all-duplicate collapses below 2 points -> null (reference macro:
    // CASE WHEN ST_NPoints >= 2)
    assert(GeomUdfs.lineWkb(Seq(pt(5, 5), pt(5, 5))) == null)
    assert(GeomUdfs.lineWkb(Seq(pt(5, 5))) == null)
  }

  test("polygonWkb requires a closed ring of >= 4 distinct-consecutive points") {
    val ring = Seq(pt(0, 0), pt(1, 0), pt(1, 1), pt(0, 1), pt(0, 0))
    assert(GeomUdfs.geomType(GeomUdfs.polygonWkb(ring)) == "Polygon")
    // open ring -> null
    assert(GeomUdfs.polygonWkb(ring.dropRight(1)) == null)
    // closed but too few points after dedup (triangle needs 4 incl. close)
    assert(GeomUdfs.polygonWkb(Seq(pt(0, 0), pt(1, 1), pt(0, 0))) == null)
  }

  test("lineMergeDump stitches segments into one ring regardless of order") {
    // four quarter-segments of a square, shuffled and partly reversed —
    // the relation-assembly case (member ways in arbitrary order/direction)
    val segs = Seq(
      Seq(pt(1, 1), pt(0, 1)),
      Seq(pt(0, 0), pt(1, 0)),
      Seq(pt(0, 1), pt(0, 0)),
      Seq(pt(1, 0), pt(1, 1)))
    val merged = GeomUdfs.lineMergeDump(segs)
    assert(merged.size == 1)
    val ring = merged.head
    assert(ring.head == ring.last) // closed
    assert(ring.toSet == Set(pt(0, 0), pt(1, 0), pt(1, 1), pt(0, 1)))
  }

  test("subtractHoles removes the union of inner rings") {
    val outer = GeomUdfs.polygonWkb(Seq(pt(0, 0), pt(4, 0), pt(4, 4), pt(0, 4), pt(0, 0)))
    val hole1 = GeomUdfs.polygonWkb(Seq(pt(1, 1), pt(2, 1), pt(2, 2), pt(1, 2), pt(1, 1)))
    val hole2 = GeomUdfs.polygonWkb(Seq(pt(3, 3), pt(3.5, 3), pt(3.5, 3.5), pt(3, 3.5), pt(3, 3)))
    val out = GeomUdfs.subtractHoles(outer, Seq(hole1, hole2))
    val wkt = GeomUdfs.asText(out)
    assert(wkt.startsWith("POLYGON"))
    assert(wkt.count(_ == '(') == 4) // shell + 2 holes + outer paren
    assert(GeomUdfs.geomWithin(hole1, outer))
  }

  test("unionWkb merges touching polygons into one") {
    val a = GeomUdfs.polygonWkb(Seq(pt(0, 0), pt(1, 0), pt(1, 1), pt(0, 1), pt(0, 0)))
    val b = GeomUdfs.polygonWkb(Seq(pt(1, 0), pt(2, 0), pt(2, 1), pt(1, 1), pt(1, 0)))
    val u = GeomUdfs.unionWkb(Seq(a, b))
    assert(GeomUdfs.geomType(u) == "Polygon")
    val (xmin, ymin, xmax, ymax) = GeomUdfs.extent(u)
    assert((xmin, ymin, xmax, ymax) == (0.0, 0.0, 2.0, 1.0))
  }

  test("makeValid is byte-identity on valid geometry, repairs a bowtie") {
    val valid = GeomUdfs.polygonWkb(Seq(pt(0, 0), pt(1, 0), pt(1, 1), pt(0, 1), pt(0, 0)))
    assert(GeomUdfs.makeValid(valid) eq valid) // identity, not a re-encode
    // self-intersecting bowtie: (0,0)-(1,1)-(1,0)-(0,1)-(0,0)
    val bowtie = GeomUdfs.polygonWkb(Seq(pt(0, 0), pt(1, 1), pt(1, 0), pt(0, 1), pt(0, 0)))
    val fixed = GeomUdfs.makeValid(bowtie)
    assert(!(fixed eq bowtie))
    assert(GeomUdfs.geomType(fixed) == "MultiPolygon") // two triangles
    assert(!GeomUdfs.geomIsEmpty(fixed))
  }

  test("extent and pointWkb round-trip coordinates exactly") {
    val p = GeomUdfs.pointWkb(7.4234567, 43.7312345)
    assert(GeomUdfs.extent(p) == ((7.4234567, 43.7312345, 7.4234567, 43.7312345)))
    assert(GeomUdfs.asText(p) == "POINT (7.4234567 43.7312345)")
  }
}
