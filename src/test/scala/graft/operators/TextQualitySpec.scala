package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** d11 (within-doc repetition) and d12 (corpus boilerplate n-grams):
  * invariants plus an independent recomputation that avoids the engine's
  * hash/kernel path, so a kernel regression can't self-confirm. */
class TextQualitySpec extends AnyFunSuite {
  private val Sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("d11 matches a hash-free recomputation and flags consistently") {
    val got = TextQueries.d11RepetitionQuality(spark, Sf).collect()
    assert(got.nonEmpty)
    // independent path: raw-word counts via built-ins only (no md5 hashing,
    // no custom kernels) — collisionless ground truth
    val words = graft.Tables.documents(spark, Sf)
      .select(col("doc_id"),
        explode(filter(split(lower(col("text")), "\\s+"),
          w => length(w) > 0)).as("w"))
    val expect = words.groupBy("doc_id", "w").count()
      .groupBy("doc_id")
      .agg(sum("count").as("n_words"), count(lit(1)).as("n_distinct"),
        max("count").as("top_cnt"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    got.foreach { r =>
      val (nw, nd, top) = expect(r.getLong(0))
      assert(r.getLong(1) == nw, s"n_words for doc ${r.getLong(0)}")
      assert(r.getLong(2) == nd, s"n_distinct for doc ${r.getLong(0)}")
      assert(math.abs(r.getDouble(3) - top.toDouble / nw) < 1e-6)
      assert(r.getBoolean(4) == (top * 10 >= nw))
      assert(nd <= nw && r.getDouble(3) > 0 && r.getDouble(3) <= 1.0)
    }
  }

  test("d12 returns the true top document-frequency n-grams in total order") {
    val got = TextQueries.d12BoilerplateNgrams(spark, Sf).collect()
    assert(got.nonEmpty && got.length <= 20)
    // n_docs non-increasing, shash ascending within equal counts, no dups
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(1) > b.getLong(1) ||
          (a.getLong(1) == b.getLong(1) && a.getLong(0) < b.getLong(0)))
      case _ => ()
    }
    // the reported max doc-frequency equals an independently computed one
    val trueMax = SimilarityQueries.docShingles(spark, Sf).distinct()
      .groupBy("shash").count().agg(max("count")).head().getLong(0)
    assert(got.head.getLong(1) == trueMax)
  }
}
