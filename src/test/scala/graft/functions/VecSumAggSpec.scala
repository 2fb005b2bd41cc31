package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[VecSumAgg]] — the Lloyd's-update kernel — held to the
  * posexplode + per-dim avg form it replaced: identical round-6
  * portable means (the bit the x34 oracle replays), last-ulp raw
  * agreement, null-vector skipping, and loud raggedness. */
class VecSumAggSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def grouped = {
    val rnd = new scala.util.Random(7)
    // 6 groups × ~200 vectors of dim 16, plus nulls sprinkled into
    // group 2 (posexplode skipped them; count(v) must skip them too)
    (0 until 1200).map { i =>
      val g = i % 6
      val v = if (g == 2 && i % 37 == 0) null
        else Seq.fill(16)(rnd.nextDouble() * 2 - 1)
      (g, v)
    }.toDF("g", "v").repartition(4)
  }

  /** The exact update form the trainers ran before the kernel. */
  private def oldMeans(portable: Boolean) = {
    val mean = if (portable) round(avg(col("x")), 6) else avg(col("x"))
    grouped
      .select(col("g"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("g"), col("dim"))
      .agg(mean.as("m"))
      .groupBy(col("g"))
      .agg(transform(
        sort_array(collect_list(struct(col("dim"), col("m")))),
        p => p.getField("m")).as("nv"))
  }

  private def newMeans(portable: Boolean) = {
    def mean(s: org.apache.spark.sql.Column) =
      if (portable) round(s / col("_n"), 6) else s / col("_n")
    grouped
      .groupBy(col("g"))
      .agg(VecSumAgg.vec_sum(col("v")).as("_s"), count(col("v")).as("_n"))
      .select(col("g"), transform(col("_s"), s => mean(s)).as("nv"))
  }

  private def collectMeans(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap

  /** The typed-Aggregator REFERENCE form ([[VecSumAgg]] the class). */
  private def refMeans(portable: Boolean) = {
    def mean(s: org.apache.spark.sql.Column) =
      if (portable) round(s / col("_n"), 6) else s / col("_n")
    grouped
      .groupBy(col("g"))
      .agg(VecSumAgg.vec_sum_ref(col("v")).as("_s"), count(col("v")).as("_n"))
      .select(col("g"), transform(col("_s"), s => mean(s)).as("nv"))
  }

  test("portable (round-6) means are BIT-IDENTICAL to the posexplode " +
      "form — the quantization the x34 oracle replays") {
    assert(collectMeans(newMeans(true)) == collectMeans(oldMeans(true)))
  }

  test("the primitive TypedImperativeAggregate behind vec_sum equals " +
      "the typed-Aggregator reference bit-for-bit, raw and portable") {
    assert(collectMeans(newMeans(true)) == collectMeans(refMeans(true)))
    val n = collectMeans(newMeans(false))
    val r = collectMeans(refMeans(false))
    assert(n.keySet == r.keySet)
    // identical fold semantics, but partial-buffer boundaries may
    // differ between the two physical agg modes — same multiset, so
    // raw sums agree to accumulated ulps (and the portable round-6
    // decision above is exactly equal)
    n.foreach { case (g, nv) =>
      nv.zip(r(g)).foreach { case (a, b) =>
        assert(math.abs(a - b) <= math.max(math.abs(a), 1.0) * 1e-12,
          s"g=$g: $a vs $b")
      }
    }
  }

  test("raw means agree to last-ulp (same multiset, different " +
      "summation grouping)") {
    val o = collectMeans(oldMeans(false))
    val n = collectMeans(newMeans(false))
    assert(o.keySet == n.keySet)
    o.foreach { case (g, ov) =>
      ov.zip(n(g)).foreach { case (a, b) =>
        // a few hundred additions regrouped: allow accumulated ulps,
        // still ~5 orders tighter than the 1e-6 portable quantum
        assert(math.abs(a - b) <= math.max(math.abs(a), 1.0) * 1e-12,
          s"g=$g: $a vs $b")
      }
    }
  }

  test("a ragged vector fails loudly (the posexplode form silently " +
      "averaged ragged dims over differing counts)") {
    val ragged = Seq((0, Seq(1.0, 2.0)), (0, Seq(1.0, 2.0, 3.0)))
      .toDF("g", "v")
    val e = intercept[Exception] {
      ragged.groupBy(col("g")).agg(VecSumAgg.vec_sum(col("v"))).collect()
    }
    // surfaces from reduce ("ragged vector widths") or — when the two
    // rows land in different partial buffers — merge ("ragged partial
    // widths"); both name the defect
    def names(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("vec_sum: ragged")) ||
        names(t.getCause))
    assert(names(e), e.getMessage)
  }

  test("an un-cast array<float> column aggregates with element-wise " +
      "upcast, identical to the explicit cast (the udaf form's " +
      "encoder behavior — callers need not pre-cast)") {
    val f = Seq((0, Seq(1.5f, 2.5f)), (0, Seq(0.25f, 0.75f)))
      .toDF("g", "v")
    def sums(c: org.apache.spark.sql.Column) =
      f.groupBy(col("g")).agg(VecSumAgg.vec_sum(c).as("s"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val bare = sums(col("v"))
    val cast = sums(col("v").cast("array<double>"))
    assert(bare == cast && bare(0) == Seq(1.75, 3.25), bare.toString)
  }

  test("an empty vector fails loudly in EITHER row order — as the " +
      "FIRST row it would otherwise alias the zero buffer and make " +
      "the mean silently wrong (sum skips it, count(v) counts it)") {
    for (rows <- Seq(
        Seq((0, Seq.empty[Double]), (0, Seq(1.0, 2.0))),
        Seq((0, Seq(1.0, 2.0)), (0, Seq.empty[Double])))) {
      val df = rows.toDF("g", "v").coalesce(1)
      val e = intercept[Exception] {
        df.groupBy(col("g")).agg(VecSumAgg.vec_sum(col("v"))).collect()
      }
      def names(t: Throwable): Boolean = t != null &&
        (Option(t.getMessage).exists(_.contains("vec_sum: empty vector"))
          || names(t.getCause))
      assert(names(e), s"order $rows: ${e.getMessage}")
    }
  }

  test("an all-null group sums to null, so the trainers' coalesce " +
      "keeps the previous centroid (the empty-cell contract)") {
    val allNull = Seq((0, Option.empty[Seq[Double]]),
      (0, Option.empty[Seq[Double]]), (1, Option(Seq(2.0, 4.0))))
      .toDF("g", "v")
    val got = allNull.groupBy(col("g"))
      .agg(VecSumAgg.vec_sum(col("v")).as("s"))
      .collect()
      .map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) None else Some(r.getSeq[Double](1).toSeq)))
      .toMap
    assert(got(0).isEmpty, "all-null group must finish null")
    assert(got(1).contains(Seq(2.0, 4.0)))
  }
}
