package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleUtilsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bucketed tables join without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    // suites share one JVM session: drop catalog entries AND their
    // managed locations from previous runs
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles.foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    ScaleUtils.writeBucketed(
      graft.Tables.lineitem(spark, dir), "li_bucketed", "l_orderkey", 8)
    ScaleUtils.writeBucketed(
      graft.Tables.orders(spark, dir)
        .withColumnRenamed("o_orderkey", "l_orderkey"),
      "ord_bucketed", "l_orderkey", 8)
    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"), Seq("l_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() > 0)
  }

  test("withGlobalIndex matches the global window and never single-partitions") {
    val dir = "/root/testdata/sf0.001"
    val ord = graft.Tables.orders(spark, dir)
    // oracle: the single-partition window formulation this replaces
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("o_orderkey"))
    val expected = ord
      .withColumn("idx", row_number().over(w).cast("long") - 1)
      .select(col("o_orderkey"), col("idx"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val indexed = ScaleUtils.withGlobalIndex(ord, Seq(col("o_orderkey")))
    val got = indexed.select(col("o_orderkey"), col("_gidx"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
    // the sorted stage feeding zipWithIndex must be range-partitioned, not
    // funneled through one task
    val sortedPlan = ord.repartitionByRange(col("o_orderkey"))
      .sortWithinPartitions(col("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(sortedPlan.contains("Exchange rangepartitioning"), sortedPlan)
    assert(!sortedPlan.contains("SinglePartition"), sortedPlan)
    assert(!sortedPlan.contains("Window"), sortedPlan)
  }

  test("withGlobalIndex handles empty input and tie-broken duplicate keys") {
    val s = spark
    import s.implicits._
    // empty input → empty output, schema intact
    val empty = ScaleUtils.withGlobalIndex(
      Seq.empty[(Long, String)].toDF("k", "v"), Seq(col("k")))
    assert(empty.columns.toSeq == Seq("k", "v", "_gidx"))
    assert(empty.count() == 0)
    // duplicate primary keys with a tie-break column: the composite key is
    // unique, so the numbering is the deterministic lexicographic order
    val dup = Seq((1L, "b"), (1L, "a"), (0L, "z"), (2L, "a"), (1L, "a2"))
      .toDF("k", "v")
    val got = ScaleUtils.withGlobalIndex(dup, Seq(col("k"), col("v")))
      .select("k", "v", "_gidx")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((0L, "z", 0L), (1L, "a", 1L), (1L, "a2", 2L),
      (1L, "b", 3L), (2L, "a", 4L)))
  }

  test("salted join returns exactly the same result as a plain join") {
    val dir = "/root/testdata/sf0.001"
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(ord, Seq("l_orderkey"))
      .agg(count(lit(1)), round(sum(col("l_quantity") * col("o_totalprice")), 2))
      .head()
    val salted = ScaleUtils.saltedJoin(li, ord, "l_orderkey", salts = 7)
      .agg(count(lit(1)), round(sum(col("l_quantity") * col("o_totalprice")), 2))
      .head()
    assert(plain == salted)
  }
}
