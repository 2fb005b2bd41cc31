package graft.osm

import org.scalatest.funsuite.AnyFunSuite
import graft.osm.ExtractCover.{cover, Extract}
import graft.osm.GeometryFilters.bbox

class ExtractCoverSpec extends AnyFunSuite {

  private def ex(id: String, minx: Double, miny: Double, maxx: Double,
      maxy: Double): Extract = {
    val g = bbox(minx, miny, maxx, maxy)
    Extract(id, id, s"$id.osm.pbf", "world", g.getArea, s"http://x/$id", g)
  }

  test("picks the single best-fitting extract") {
    val index = Seq(
      ex("world", -180, -90, 180, 90),
      ex("small", 0, 0, 2, 2),
      ex("tight", 0.4, 0.4, 1.6, 1.6))
    val q = bbox(0.5, 0.5, 1.5, 1.5)
    val got = cover(q, index)
    assert(got.map(_.id) == Seq("tight")) // best IoU, not the huge world file
  }

  test("covers a geometry spanning two extracts with both") {
    val index = Seq(
      ex("left", 0, 0, 1, 2), ex("right", 1, 0, 2, 2),
      ex("world", -180, -90, 180, 90))
    val q = bbox(0.4, 0.5, 1.6, 1.5)
    val got = cover(q, index)
    assert(got.map(_.id).toSet == Set("left", "right"))
  }

  test("drops redundant extracts from the cover") {
    val index = Seq(
      ex("big", 0, 0, 4, 4), ex("inner", 1, 1, 2, 2))
    val q = bbox(0.5, 0.5, 3.5, 3.5)
    val got = cover(q, index)
    assert(got.map(_.id) == Seq("big")) // inner adds nothing
  }

  test("raises when the geometry cannot be covered") {
    val index = Seq(ex("europe", 0, 40, 20, 60))
    val q = bbox(100, -10, 110, 0)
    assertThrows[IllegalStateException](cover(q, index))
  }

  test("smaller area wins IoU ties") {
    val q = bbox(0, 0, 1, 1)
    val small = ex("exact", 0, 0, 1, 1)
    val dup = ex("padded", -0.5, -0.5, 1.5, 1.5)
    assert(cover(q, Seq(dup, small)).map(_.id) == Seq("exact"))
  }
}
