package graft.osm

import org.scalatest.funsuite.AnyFunSuite

/** Validation of the dependency-free S2 cell decoder against hand-derived
  * values from the public spec (face cells have analytically-known
  * corners) plus encode/decode self-consistency. */
class S2CellsSpec extends AnyFunSuite {

  test("token parse/print round-trips") {
    for (t <- Seq("1", "3", "5", "b", "f", "89c2584", "89c25", "4/".replace("/", ""))) {
      assert(S2Cells.tokenFromCellId(S2Cells.cellIdFromToken(t)) == t)
    }
  }

  test("face-0 level-0 cell (token '1') has the analytic corners") {
    val id = S2Cells.cellIdFromToken("1")
    assert(S2Cells.level(id) == 0)
    // face 0 covers u,v in [-1,1]: corners at xyz (1, ±1, ±1) →
    // lng = ±45°, lat = ±atan(1/√2) = ±35.264390°
    val vs = S2Cells.cellVertices(id)
    val expLat = math.atan(1 / math.sqrt(2)).toDegrees
    val expected = Set((-45.0, -expLat), (45.0, -expLat), (45.0, expLat), (-45.0, expLat))
    vs.foreach { case (lon, lat) =>
      assert(expected.exists { case (elon, elat) =>
        math.abs(elon - lon) < 1e-9 && math.abs(elat - lat) < 1e-9
      }, s"unexpected corner ($lon, $lat)")
    }
    assert(vs.toSet.size == 4)
  }

  test("all six level-0 face tokens decode with level 0 and distinct faces") {
    val tokens = Seq("1", "3", "5", "7", "9", "b")
    val ids = tokens.map(S2Cells.cellIdFromToken)
    ids.foreach(id => assert(S2Cells.level(id) == 0))
    assert(ids.map(_ >>> 61).toSet.size == 6)
  }

  test("encode→decode round-trip: cell polygon contains its source point") {
    val pts = Seq((7.4246, 43.7384), (-122.41, 37.77), (151.21, -33.87),
      (0.0, 0.001), (139.69, 35.69), (-58.38, -34.6))
    val gfac = new org.locationtech.jts.geom.GeometryFactory()
    for ((lon, lat) <- pts; lvl <- Seq(8, 12, 16)) {
      val id = S2Cells.cellIdFromLonLat(lon, lat, lvl)
      assert(S2Cells.level(id) == lvl)
      val poly = S2Cells.cellPolygon(id)
      val p = gfac.createPoint(new org.locationtech.jts.geom.Coordinate(lon, lat))
      assert(poly.buffer(1e-9).contains(p),
        s"cell ${S2Cells.tokenFromCellId(id)} (lvl $lvl) should contain ($lon, $lat)")
    }
  }

  test("child cells tile their parent") {
    val parent = S2Cells.cellIdFromLonLat(7.42, 43.73, 10)
    val parentPoly = S2Cells.cellPolygon(parent)
    // the four level-11 children share the parent's area (planar approx)
    val lsb = java.lang.Long.numberOfTrailingZeros(parent)
    val childLsb = 1L << (lsb - 2)
    val base = parent - (1L << lsb) // clear the marker
    val children = (0 until 4).map(k =>
      base + childLsb + 2L * k * childLsb)
    val union = children.map(S2Cells.cellPolygon).reduce(_.union(_))
    // edges are straight in UV space but slightly curved in lon/lat, so
    // the planar symmetric difference is small but nonzero
    val symDiff = parentPoly.symDifference(union).getArea
    assert(symDiff < parentPoly.getArea * 1e-2,
      s"children must tile parent (residual $symDiff of ${parentPoly.getArea})")
  }

  test("tokensToGeometry unions multiple cells") {
    val t1 = S2Cells.tokenFromCellId(S2Cells.cellIdFromLonLat(7.42, 43.73, 12))
    val t2 = S2Cells.tokenFromCellId(S2Cells.cellIdFromLonLat(7.44, 43.75, 12))
    val g = S2Cells.tokensToGeometry(Seq(t1, s" $t2"))
    assert(g.getArea > 0)
  }
}
