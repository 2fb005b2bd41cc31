package graft

import org.apache.spark.sql.SparkSession

/** Dev-only micro profiler: times one query repeatedly in a warm JVM.
  * Usage: runMain graft.DevProfile <queryName> <sfDir> <reps> */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (name == "x2parts") {
      def t(label: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
      t("shingles")(operators.SimilarityQueries.minhashSignatures(spark, sfDir).count())
      t("x2_full")(operators.SimilarityQueries.x2MinhashLsh(spark, sfDir).count())
      t("x2_again")(operators.SimilarityQueries.x2MinhashLsh(spark, sfDir).count())
    } else {
      val fn = SparkEntry.queries(name)
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        println(f"run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
