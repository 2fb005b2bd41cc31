package graft.pbf

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip validation of the PBF sink against the (independently
  * byte-validated) PBF scan. */
class PbfWriterSpec extends AnyFunSuite {
  private val Monaco = "/root/reference/tests/test_files/monaco.osm.pbf"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private type Canon = (Seq[(String, String)], Seq[Long], Seq[String], Seq[String], Double, Double)

  private def canonical(path: String*): Map[(String, Long), Canon] = {
    val df = spark.read.format("osmpbf").load(path: _*)
    PbfWriter.fromRows(df).collect().map { e =>
      (e.kind, e.id) -> ((
        Option(e.tags).map(_.toSeq.sortBy(_._1)).getOrElse(Nil),
        Option(e.refs).map(_.toSeq).getOrElse(Nil),
        Option(e.refTypes).map(_.toSeq).getOrElse(Nil),
        Option(e.refRoles).map(_.toSeq.map(Option(_).getOrElse(""))).getOrElse(Nil),
        if (e.lat.isNaN) -999d else e.lat, // NaN != NaN breaks tuple equality
        if (e.lon.isNaN) -999d else e.lon))
    }.toMap
  }

  test("monaco round-trips through the writer with identical elements") {
    val original = canonical(Monaco)
    val out = java.nio.file.Files.createTempDirectory("pbfw").toString + "/monaco_rt.osm.pbf"
    val n = PbfWriter.write(
      PbfWriter.fromRows(spark.read.format("osmpbf").load(Monaco))
        .collect().iterator, out)
    assert(n == original.size)
    val roundTripped = canonical(out)
    assert(roundTripped.size == original.size)
    // exact element-level equality, including coordinates (quantization is
    // lossless for coordinates that came from a PBF)
    val diffs = original.iterator.collect {
      case (k, v) if !roundTripped.get(k).contains(v) =>
        (k, v, roundTripped.get(k))
    }.take(2).toList
    withClue(s"first diffs: $diffs") { assert(diffs.isEmpty) }
  }

  test("distributed sink writes a readable multi-file layout") {
    val dir = java.nio.file.Files.createTempDirectory("pbfw").toString + "/parts"
    val ds = PbfWriter.fromRows(spark.read.format("osmpbf").load(Monaco))
      .repartition(4)
    val written = PbfWriter.sinkPartitioned(ds, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".osm.pbf"))
    assert(files.length == 4)
    val back = spark.read.format("osmpbf").load(dir + "/*.osm.pbf")
    assert(back.count() == written)
    assert(canonical(dir + "/*.osm.pbf") == canonical(Monaco))
  }
}
