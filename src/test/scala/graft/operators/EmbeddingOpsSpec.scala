package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DataFrame-generic embedding API vs the gate twins, through renamed
  * columns and a driver-held query vector (= the vec_id 0 embedding, so
  * the gate queries are the ground truth). */
class EmbeddingOpsSpec extends AnyFunSuite {
  private val Sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val renamed = graft.Tables.embeddings(spark, Sf)
    .select(col("vec_id").as("item"), col("embedding").as("emb"))

  private lazy val query: Seq[Double] = graft.Tables.embeddings(spark, Sf)
    .filter(col("vec_id") === 0).select("embedding")
    .head().getSeq[Float](0).map(_.toDouble)

  private def rounded(df: org.apache.spark.sql.DataFrame) =
    df.select(col(df.columns.head), round(col("cosine"), 6).as("cosine"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("cosineTopK matches the x1 gate ranking") {
    val got = rounded(EmbeddingOps.cosineTopK(
      renamed.filter(col("item") =!= 0), "item", "emb", query, k = 10))
    val gate = SimilarityQueries.x1CosineTopK(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == gate && got.size == 10)
  }

  test("annTopK matches the x5 gate ranking (literal bucket filter)") {
    val ann = EmbeddingOps.annTopK(
      renamed.filter(col("item") =!= 0), "item", "emb", query,
      k = 10, planes = 8)
    // no join anywhere: the query bucket is a literal pushed into a filter
    assert(!ann.queryExecution.executedPlan.toString.contains("Join"))
    val gate = SimilarityQueries.x5AnnBuckets(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rounded(ann) == gate)
  }

  test("ivfTopK matches the trained-IVF gate path") {
    // train on the FULL corpus (matching the gate), ask for one extra and
    // drop the query row itself (cosine 1.0, always rank 1)
    val got = rounded(EmbeddingOps.ivfTopK(renamed, "item", "emb", query,
      k = 11).filter(col("item") =!= 0)).take(10)
    val gate = IvfAnn.ivfTrainedTopK(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == gate && got.nonEmpty)
  }

  test("dimension mismatches are rejected loudly, not truncated") {
    intercept[IllegalArgumentException] {
      EmbeddingOps.annTopK(renamed, "item", "emb", Seq(1.0, 2.0), k = 3)
    }
    intercept[IllegalArgumentException] {
      EmbeddingOps.ivfTopK(renamed, "item", "emb", Seq(1.0, 2.0), k = 3)
        .collect()
    }
  }

  test("nearDupPairs matches the x6 gate pairs") {
    val got = EmbeddingOps.nearDupPairs(renamed, "item", "emb",
      threshold = 0.4, planes = 6)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
      .filter(col("cosine") > 0.4) // gate thresholds on the ROUNDED value
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val gate = SimilarityQueries.x6EmbeddingNearDup(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == gate && got.nonEmpty)
  }
}
