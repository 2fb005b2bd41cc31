package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** In-suite sample of the partitioning-invariance sweep
  * (tools/run_invariance.sh runs the full 123-gate version across three
  * session configs in separate JVMs): a gate's result — row order and
  * float bits included — must not depend on shuffle width, input split
  * size, or AQE, because a cluster varies all three at runtime (AQE
  * coalescing, skew splits, dynamic allocation). Uses runtime-mutable
  * confs on the shared session and restores them, so it composes with
  * every other suite. Gates chosen to cover the shapes that could go
  * wrong: float aggregation trees, window tie-breaks, banded LSH hash
  * joins, vector sweeps, stratified sampling, watermarked windows. */
class InvarianceSpec extends AnyFunSuite {
  private val Sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Gates = Seq(
    "q1_agg",                  // float sum/avg fold tree
    "ax_percentiles",          // percentile_approx merge order
    "d9_stratified_sample",    // deterministic per-stratum sampling
    "d14_tfidf_keywords",      // idf log-floats + per-doc top-k windows
    "d21_domain_mix",          // histogram + boundary cell
    "e1_window_batch",         // event-time windows over the nanos table
    "w2_partitioned_row_number", // window tie-breaks
    "x2_minhash_lsh",          // banded signature hash join
    "x17_bm25_topk",           // bm25 float scoring + top-k
    "x33_vec_admit")           // all-pairs vector sweep + threshold

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("sampled gates are invariant to shuffle width, split size and AQE") {
    for (g <- Gates) {
      val fn = SparkEntry.queries(g)
      var a: Seq[org.apache.spark.sql.Row] = null
      var b: Seq[org.apache.spark.sql.Row] = null
      withConfs(
        "spark.sql.shuffle.partitions" -> "3",
        "spark.sql.files.maxPartitionBytes" -> "65536",
        "spark.sql.files.openCostInBytes" -> "0",
        "spark.sql.adaptive.enabled" -> "false") {
        a = fn(spark, Sf).collect().toSeq
      }
      withConfs(
        "spark.sql.shuffle.partitions" -> "19",
        "spark.sql.adaptive.enabled" -> "true") {
        b = fn(spark, Sf).collect().toSeq
      }
      assert(a.nonEmpty, s"$g returned no rows")
      assert(a == b, s"$g diverged between physical configs")
    }
  }

  test("w2's one-exchange window formulation matches the orderBy formulation row for row") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("w2_partitioned_row_number")(spark, Sf)
    // the formulation this replaced: hash exchange for the window, then
    // a second range exchange for the global orderBy
    val expected = Tables.lineitem(spark, Sf)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))))
      .filter(col("rn") <= 2)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("rn").cast("long").as("rn"))
      .orderBy("l_orderkey", "rn")
    // row-for-row INCLUDING order: the dump order is part of the gate
    assert(got.collect().toSeq == expected.collect().toSeq)
    withConfs("spark.sql.adaptive.enabled" -> "false") {
      val plan = SparkEntry.queries("w2_partitioned_row_number")(spark, Sf)
        .queryExecution.executedPlan.toString
      val exchanges = "Exchange ".r.findAllIn(plan).size
      assert(exchanges == 1, s"expected exactly 1 exchange:\n$plan")
      assert(!plan.contains("SinglePartition"), plan)
    }
  }
}
