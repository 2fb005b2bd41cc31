package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions exposes hilbert_index to SQL") {
    // extensions only apply at session construction — build a dedicated
    // session (and restore a clean slate for the other shared-session
    // suites afterwards)
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = spark.sql(
        "SELECT hilbert_index(0.5, 0.5, 0.0, 0.0, 1.0, 1.0) AS h").head()
      assert(!r.isNullAt(0))
      // same value as the temp-function registration route
      Graft.setup(spark)
      val r2 = spark.sql(
        "SELECT hilbert_index(0.5, 0.5, 0.0, 0.0, 1.0, 1.0) AS h").head()
      assert(r.getLong(0) == r2.getLong(0))
      // Graft.setup also brought the st_* UDF surface
      assert(spark.sql("SELECT st_astext(st_point_wkb(1.0d, 2.0d)) AS t")
        .head().getString(0).startsWith("POINT"))
      // the text kernels are SQL-visible through the extension too
      assert(spark.sql(
        "SELECT merge_pair(split_words('a a b'), 'a', 'b') AS m")
        .head().getSeq[String](0) == Seq("a", "a b"))
      // ...including the round-8 tokenizer family (the advisor's r7
      // finding: extension-built sessions must carry EVERY kernel)
      assert(spark.sql(
        "SELECT adjacent_pairs(split_words('a b c')) AS p")
        .head().getSeq[org.apache.spark.sql.Row](0).size == 2)
      assert(spark.sql(
        "SELECT apply_bpe_table(split_words('a b c'), array('a'), array('b')) AS t")
        .head().getSeq[String](0) == Seq("a b", "c"))
      assert(spark.sql(
        "SELECT wordpiece('abc', array('ab', 'c')) AS w")
        .head().getSeq[String](0) == Seq("ab", "c"))
      assert(spark.sql(
        "SELECT viterbi_segment('abc', array('ab', 'c'), array(5L, 3L)).n_pieces AS n")
        .head().getLong(0) == 2L)
      assert(spark.sql("SELECT char_ngrams('ab', 2) AS g")
        .head().getSeq[String](0) == Seq("a", "ab", "b"))
      assert(spark.sql("SELECT ngram_hashes('a b c', 2) AS h")
        .head().getSeq[Long](0).size == 2)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
