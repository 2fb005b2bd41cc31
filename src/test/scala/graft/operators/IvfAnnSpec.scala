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

  test("spreadSeeds: k distinct centroids, deterministic under " +
      "repartitioning, pads when buckets run out") {
    val emb = graft.Tables.embeddings(spark, Sf)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
    def seeds(df: org.apache.spark.sql.DataFrame, k: Int): Seq[Long] =
      IvfAnn.spreadSeeds(df, k).collect().map(_.getLong(0)).sorted.toSeq
    val a = seeds(emb, 16)
    assert(a.length == 16 && a.distinct.length == 16)
    // count/min are order-independent; (count desc, bucket asc) is a
    // total order — the pick must survive any physical layout
    assert(seeds(emb.repartition(2), 16) == a)
    assert(seeds(emb.repartition(8, col("v")), 16) == a)
    // k far above the occupied-bucket count exercises the smallest-id
    // padding arm and still returns exactly k distinct seeds
    val tiny = emb.limit(40)
    val padded = seeds(tiny, 32)
    assert(padded.length == 32 && padded.distinct.length == 32)
    // trainer round-trip: seedSpread centroids feed Lloyd's unchanged
    val cents = IvfAnn.trainCentroids(emb, k = 16, iters = 1,
      seedSpread = true).collect()
    assert(cents.length == 16)
  }

  test("semDedup drops the higher id of a similar pair, only within a cell") {
    import spark.implicits._
    // two orthogonal centroids; vectors 10/11 nearly parallel in cell 0,
    // vector 12 lives in cell 1 and must never be compared against them
    val e1 = Array(1.0, 0.0, 0.0, 0.0)
    val e2 = Array(0.0, 1.0, 0.0, 0.0)
    val near1 = Array(0.999, 0.01, 0.0, 0.0)
    val emb = Seq(
      (0L, e1), (1L, e2),
      (10L, near1), (11L, Array(0.998, 0.02, 0.0, 0.0)),
      (12L, Array(0.02, 0.998, 0.0, 0.0))).toDF("vec_id", "v")
    val cents = Seq((0L, e1), (1L, e2)).toDF("cid", "cv")
    val drops = IvfAnn.semDedup(emb, cents, tau = 0.9)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // 10 and 11 drop in cell 0 (both nearly parallel to smaller id 0;
    // 11 also to 10, hence n_similar = 2); 12 drops in cell 1 against 1.
    // Nothing crosses cells: 12's only similars live in cell 0's pair set
    // if the cell bound were broken, and 0/1 themselves must survive.
    assert(drops.keySet == Set(10L, 11L, 12L), s"$drops")
    assert(drops(10L) == ((0L, 1L)), s"$drops")
    assert(drops(11L) == ((0L, 2L)), s"$drops")
    assert(drops(12L) == ((1L, 1L)), s"$drops")
  }
}
