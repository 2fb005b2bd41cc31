package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Example/driver program: read an OSM PBF through the public
  * `format("osmpbf")` surface and run a tag-filtered query — the
  * minimum end-to-end slice of SURVEY §7.2. */
object Demo {
  def main(args: Array[String]): Unit = {
    val pbf = if (args.nonEmpty) args(0)
      else "/root/reference/tests/test_files/monaco.osm.pbf"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val elements = spark.read.format("osmpbf").load(pbf)
    println("=== per-kind counts ===")
    elements.groupBy("kind").count().orderBy("kind").show()

    println("=== buildings (tag filter pushdown over ways) ===")
    val buildings = elements
      .filter(col("kind") === "way" && col("tags").getItem("building").isNotNull)
    println(s"building ways: ${buildings.count()}")
    buildings.select(col("id"), element_at(col("tags"), "building").as("building"),
      size(col("refs")).as("n_refs")).orderBy("id").show(5)

    println("=== scan plan (pushdown check) ===")
    buildings.select("id").explain("formatted")

    println("=== full conversion -> GeoParquet ===")
    val features = graft.osm.OsmPipeline.features(spark, Seq(pbf))
    val out = java.nio.file.Files.createTempDirectory("graft_demo").toString + "/out"
    graft.osm.GeoParquet.write(features, out, singleFile = true, sortSpatially = true)
    val back = spark.read.parquet(out)
    println(s"features written: ${back.count()}")
    val kv = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(out + "/data.parquet"),
        spark.sessionState.newHadoopConf()))
      .getFooter.getFileMetaData.getKeyValueMetaData
    println("geo footer: " + kv.get("geo").take(120) + "...")

    println("=== distributed spatial join (grid-bucketed, exact-verified) ===")
    // probe grid over the extract vs its polygon features — no equi key,
    // both sides distributed
    import spark.implicits._
    val polys = back
      .filter(udf(graft.osm.GeomUdfs.geomType).apply(col("geometry")) === "Polygon")
      .select(col("feature_id"), col("geometry"))
    val probes = (for { i <- 0 until 50; j <- 0 until 40 }
      yield (i * 40L + j, 7.40 + i * 0.001, 43.72 + j * 0.0005))
      .toDF("pt_id", "x", "y")
    val hits = graft.osm.SpatialJoin.pointInPolygon(
      probes, "x", "y", polys, "geometry", cellDeg = 0.002)
    println(s"probe points inside polygon features: ${hits.count()}")

    val sfDir = sys.env.get("SPARK_GRAFT_SF_DIR")
    sfDir.foreach { dir =>
      println("=== corpus hygiene over documents (generic CorpusOps) ===")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()
      val afterNearDup = operators.CorpusOps.deduplicate(docs, "doc_id", "text")
      println(s"near-dedup: $n -> ${afterNearDup.count()} docs")
      println("top boilerplate 3-grams:")
      operators.CorpusOps.boilerplateNgrams(docs, "doc_id", "text", topK = 5).show(false)

      println("=== embedding search (generic EmbeddingOps) ===")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val q = emb.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0).map(_.toDouble)
      println("exact top-3 neighbors of vec 0:")
      operators.EmbeddingOps.cosineTopK(
        emb.filter(col("vec_id") =!= 0), "vec_id", "embedding", q, k = 3).show()

      println("=== PII scrub + keywords + domain-ready profile ===")
      operators.CorpusOps.scrubPii(docs, "text")
        .agg(sum("n_emails").as("emails"), sum("n_ips").as("ips")).show()
      println("tf-idf keywords of the first 3 docs:")
      operators.CorpusOps.tfidfKeywords(docs, "doc_id", "text")
        .filter(col("doc_id") < 3).orderBy("doc_id", "rank").show(false)
      println("per-language length deciles (1st and 10th):")
      operators.CorpusOps.lengthDeciles(docs, "doc_id", "text", "lang")
        .filter(col("decile").isin(1, 10)).orderBy("lang", "decile").show()

      println("=== decontamination vs a planted reference corpus ===")
      val reference = docs.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 900000L).as("rid"), col("text").as("rtext"))
      val clean = operators.CorpusOps.decontaminateNearDup(
        docs, "doc_id", "text", reference, "rid", "rtext", threshold = 0.9)
      println(s"near-dup decontamination: $n -> ${clean.count()} docs " +
        s"(reference: ${reference.count()} planted near-copies)")

      println("=== compressed vector search (IVF-PQ) ===")
      val idx = operators.IvfPq.build(emb, "vec_id", "embedding")
      println("ADC top-5 for vec 0 over M-byte codes (4 of 16 cells probed):")
      operators.IvfPq.topK(idx, q, topK = 5, nProbe = 4).show()
      idx.release()

      println("=== one-call curation pipeline ===")
      val annotated = operators.TextPipeline.curate(
        docs, "doc_id", "text",
        benchmark = Some((reference.select(col("rtext")), "rtext")))
      operators.TextPipeline.report(annotated).show()
    }
    spark.stop()
  }
}
