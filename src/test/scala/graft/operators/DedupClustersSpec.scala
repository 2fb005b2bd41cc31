package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class DedupClustersSpec extends AnyFunSuite {
  private val Sf = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("driver union-find and distributed label propagation agree") {
    val driver = SimilarityQueries.x8DedupClusters(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val dist = SimilarityQueries.dedupClusters(spark, Sf, driverEdgeLimit = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(driver.nonEmpty)
    assert(driver == dist)
    // labels are component minima: every cluster id is a member of its
    // own cluster and no label exceeds its doc id
    driver.foreach { case (doc, cl) => assert(cl <= doc) }
    val byCluster = driver.groupBy(_._2)
    byCluster.foreach { case (cl, members) =>
      assert(members.exists(_._1 == cl), s"cluster $cl must contain its label")
      assert(members.size >= 2, s"cluster $cl must have at least one pair")
    }
  }
}
