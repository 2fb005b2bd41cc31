package graft.pbf

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based writer↔decoder inverse check over ARBITRARY elements —
  * unicode tags, empty-string keys/values (string-table index-0 hazard),
  * negative ids (zigzag deltas), null/missing roles, single-element and
  * kind-alternating streams. Complements PbfWriterSpec's monaco
  * round-trip (realistic data) with adversarial generated data.
  */
class PbfRoundTripSpec extends AnyFunSuite {

  private val strGen: Gen[String] = Gen.frequency(
    5 -> Gen.alphaNumStr.map(_.take(12)),
    2 -> Gen.oneOf("highway", "name:en", "Ünïcödé", "улица", "水道", "a b"),
    1 -> Gen.const(""))

  private val tagsGen: Gen[Array[(String, String)]] =
    Gen.chooseNum(0, 5).flatMap { n =>
      Gen.listOfN(n, Gen.zip(strGen, strGen))
        .map(_.distinctBy(_._1).toArray)
    }

  private def nodeGen(id: Long): Gen[OsmElement] = for {
    tags <- tagsGen
    latE7 <- Gen.chooseNum(-900000000L, 900000000L)
    lonE7 <- Gen.chooseNum(-1800000000L, 1800000000L)
  } yield OsmElement("node", id, if (tags.isEmpty) null else tags,
    null, null, null, latE7 * 1e-7, lonE7 * 1e-7)

  private def wayGen(id: Long): Gen[OsmElement] = for {
    tags <- tagsGen
    refs <- Gen.nonEmptyListOf(Gen.chooseNum(-100000L, 5000000000L))
  } yield OsmElement("way", id, if (tags.isEmpty) null else tags,
    refs.toArray, null, null, Double.NaN, Double.NaN)

  private def relGen(id: Long): Gen[OsmElement] = for {
    tags <- tagsGen
    n <- Gen.chooseNum(1, 6)
    refs <- Gen.listOfN(n, Gen.chooseNum(1L, 5000000000L))
    types <- Gen.listOfN(n, Gen.oneOf("node", "way", "relation"))
    roles <- Gen.listOfN(n, Gen.oneOf[String]("outer", "inner", "part", null))
  } yield OsmElement("relation", id, if (tags.isEmpty) null else tags,
    refs.toArray, types.toArray, roles.toArray, Double.NaN, Double.NaN)

  private val elemsGen: Gen[List[OsmElement]] =
    Gen.chooseNum(1, 120).flatMap { n =>
      Gen.sequence[List[OsmElement], OsmElement]((0 until n).map { i =>
        // every 4th id negative: OSM uses negative ids for proposed/local
        // elements and they exercise the zigzag sign path of the id deltas
        val sign = if (i % 4 == 0) -1L else 1L
        Gen.oneOf(nodeGen(sign * (i * 3L + 1)), wayGen(sign * (i * 3L + 2)),
          relGen(sign * (i * 3L + 3)))
      })
    }

  private type Canon = (String, Long, Seq[(String, String)], Seq[Long],
    Seq[String], Seq[String], Long, Long)

  /** Writer conventions folded in: empty tag array == null; relation
    * refTypes null == all-node; roles null entry == "" == null; coords
    * quantized to 1e-7. */
  private def canon(e: OsmElement): Canon = (
    e.kind, e.id,
    Option(e.tags).map(_.toSeq).getOrElse(Nil),
    Option(e.refs).map(_.toSeq).getOrElse(Nil),
    if (e.kind == "relation")
      Option(e.refTypes).map(_.toSeq)
        .getOrElse(Seq.fill(Option(e.refs).map(_.length).getOrElse(0))("node"))
    else Nil,
    if (e.kind == "relation")
      Option(e.refRoles).map(_.toSeq.map(r => if (r == null) "" else r))
        .getOrElse(Seq.fill(Option(e.refs).map(_.length).getOrElse(0))(""))
    else Nil,
    if (e.lat.isNaN) Long.MinValue else Math.round(e.lat * 1e7),
    if (e.lon.isNaN) Long.MinValue else Math.round(e.lon * 1e7))

  private def decodeFile(path: String): List[OsmElement] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    OsmPbfSource.scanBlobs(Seq(path), conf).flatMap { b =>
      val in = new java.io.RandomAccessFile(b.path.stripPrefix("file:"), "r")
      try {
        val buf = new Array[Byte](b.length)
        in.seek(b.offset)
        in.readFully(buf)
        PbfDecoder.decodeBlock(PbfDecoder.inflateBlob(buf),
          Set("node", "way", "relation")).toList
      } finally in.close()
    }.toList
  }

  test("property: arbitrary element streams round-trip exactly") {
    val dir = java.nio.file.Files.createTempDirectory("pbfprop").toString
    (0 until 25).foreach { i =>
      val elems = elemsGen.apply(Gen.Parameters.default, Seed(1234L + i))
        .getOrElse(Nil)
      val path = s"$dir/case$i.osm.pbf"
      val n = PbfWriter.write(elems.iterator, path,
        blockSize = 16) // small blocks: force multi-block, kind-run splits
      assert(n == elems.length)
      val back = decodeFile(path)
      assert(back.length == elems.length, s"case $i count")
      back.zip(elems).zipWithIndex.foreach { case ((b, e), j) =>
        assert(canon(b) == canon(e), s"case $i element $j")
      }
    }
  }

  test("empty-string tag values do not corrupt DenseNodes framing") {
    // regression for the string-table index-0 hazard: "" as a tag value
    // must get its own index, or it terminates the node's kv stream
    val dir = java.nio.file.Files.createTempDirectory("pbfprop").toString
    val elems = List(
      OsmElement("node", 1L, Array("k" -> "", "" -> "v"), null, null, null, 1.0, 2.0),
      OsmElement("node", 2L, Array("name" -> "x"), null, null, null, 3.0, 4.0))
    val path = s"$dir/empty.osm.pbf"
    PbfWriter.write(elems.iterator, path)
    val back = decodeFile(path)
    assert(back.map(canon) == elems.map(canon))
  }
}
