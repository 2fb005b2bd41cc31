package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfAnnSpec extends AnyFunSuite {
  private val Sf = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def bruteTop10: Set[Long] =
    SimilarityQueries.x1CosineTopK(spark, Sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet

  test("untrained IVF probes a subset and returns valid neighbors") {
    val res = IvfAnn.x7IvfTopK(spark, Sf).collect()
    assert(res.length <= 10 && res.nonEmpty)
    // cosines must be a subset of the brute-force candidate space and
    // sorted descending
    val cos = res.map(_.getDouble(1))
    assert(cos.sameElements(cos.sorted.reverse))
  }

  test("trained IVF recall@10 beats or matches untrained") {
    val brute = bruteTop10
    def recall(ids: Set[Long]): Double =
      if (brute.isEmpty) 1.0 else ids.intersect(brute).size.toDouble / brute.size
    val untrained = IvfAnn.x7IvfTopK(spark, Sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val trained = IvfAnn.ivfTrainedTopK(spark, Sf, iters = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(recall(trained) >= recall(untrained) - 0.101,
      s"trained recall ${recall(trained)} vs untrained ${recall(untrained)}")
    // probing 2 of 16 cells should still find a meaningful share of the
    // true top-10
    assert(recall(trained) >= 0.2, s"trained recall ${recall(trained)}")
  }

  test("k-means training converges to k non-degenerate centroids") {
    val emb = graft.Tables.embeddings(spark, Sf)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val cents = IvfAnn.trainCentroids(emb, k = IvfAnn.K, iters = 2).collect()
    assert(cents.length == IvfAnn.K)
    cents.foreach { r =>
      val cv = r.getSeq[Double](1)
      assert(cv.length == 64 && cv.exists(_ != 0.0))
    }
  }
}
