package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[MicroMeanAgg]] — the exact portable Lloyd's-update kernel — held
  * bit-identical to the `round(vec_sum(v)/n, 6)` double form it
  * replaces on random trainer-shaped fixtures (no fixture sits within
  * the 5e-13 pico-quantization of a micro boundary), pinned on the
  * halfway residues where the double form was allowed to diverge
  * cross-engine, and exercised through the 128-bit carry path. */
class MicroMeanAggSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def grouped = {
    val rnd = new scala.util.Random(13)
    // 6 groups × ~200 vectors of dim 16 in the trainers' value range
    // (normalized embeddings / residuals), plus nulls in group 2
    (0 until 1200).map { i =>
      val g = i % 6
      val v = if (g == 2 && i % 37 == 0) null
        else Seq.fill(16)(rnd.nextDouble() * 2 - 1)
      (g, v)
    }.toDF("g", "v").repartition(4)
  }

  /** The round-6 double form the portable trainers ran before. */
  private def oldMeans = grouped
    .groupBy(col("g"))
    .agg(VecSumAgg.vec_sum(col("v")).as("_s"), count(col("v")).as("_n"))
    .select(col("g"),
      transform(col("_s"), s => round(s / col("_n"), 6)).as("nv"))

  private def newMeans = grouped
    .groupBy(col("g"))
    .agg(MicroMeanAgg.vec_mean_micro(col("v")).as("nv"))

  private def collectMeans(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap

  test("bit-identical to the round-6 double form on trainer fixtures") {
    val old = collectMeans(oldMeans)
    val neu = collectMeans(newMeans)
    assert(old.keySet == neu.keySet)
    old.foreach { case (g, vs) =>
      vs.lazyZip(neu(g)).zipWithIndex.foreach { case ((o, n), d) =>
        assert(o == n, s"group $g dim $d: old $o new $n")
      }
    }
  }

  test("halfway residues round half-away-from-zero, both signs, pinned") {
    val df = Seq(
      ("p", Seq(2.0e-6)), ("p", Seq(3.0e-6)),     // avg 2.5 micro → 3
      ("n", Seq(-2.0e-6)), ("n", Seq(-3.0e-6)),   // avg -2.5 micro → -3
      ("q", Seq(0.5e-6)), ("q", Seq(0.5e-6)))     // avg 0.5 micro → 1
      .toDF("g", "v")
      .groupBy(col("g")).agg(MicroMeanAgg.vec_mean_micro(col("v")).as("m"))
    val got = df.collect().map(r => r.getString(0) -> r.getSeq[Double](1).head).toMap
    assert(got("p") == 3.0e-6)
    assert(got("n") == -3.0e-6)
    assert(got("q") == 1.0e-6)
  }

  test("128-bit accumulation survives past Long range") {
    // q per row = 4.5e6 · 1e12 = 4.5e18; three rows sum to 1.35e19 —
    // past Long.MaxValue, into the hi word. Exact mean must come back.
    val df = Seq.fill(3)(Seq(4.5e6)).toDF("v")
      .groupBy(lit(1)).agg(MicroMeanAgg.vec_mean_micro(col("v")).as("m"))
    assert(df.collect().head.getSeq[Double](1).head == 4.5e6)
    // negative direction
    val dn = Seq.fill(3)(Seq(-4.5e6)).toDF("v")
      .groupBy(lit(1)).agg(MicroMeanAgg.vec_mean_micro(col("v")).as("m"))
    assert(dn.collect().head.getSeq[Double](1).head == -4.5e6)
  }

  test("microMean unit math: exact division, both signs, large sums") {
    import java.math.BigInteger
    // 5 pico-sum… in micro terms: s=5e6 pico over n=2 → 2.5 micro → 3
    assert(MicroMeanAgg.microMean(BigInteger.valueOf(5000000L), 2) == 3.0e-6)
    assert(MicroMeanAgg.microMean(BigInteger.valueOf(-5000000L), 2) == -3.0e-6)
    // non-halfway: 1e12 pico over 3 rows = 333333.33 micro → 0.333333
    assert(MicroMeanAgg.microMean(BigInteger.valueOf(1000000000000L), 3)
      == 0.333333)
    // 128-bit scale: 1.35e19 over 3 = 4.5e18 pico = 4.5e6
    assert(MicroMeanAgg.microMean(
      new BigInteger("13500000000000000000"), 3) == 4.5e6)
  }

  test("loud on ragged, empty, null-element and non-finite input") {
    def fails(rows: Seq[Seq[Double]]): Unit = {
      val e = intercept[Exception] {
        rows.toDF("v").groupBy(lit(1))
          .agg(MicroMeanAgg.vec_mean_micro(col("v")).as("m")).collect()
      }
      assert(e.getMessage != null)
    }
    fails(Seq(Seq(1.0, 2.0), Seq(1.0)))          // ragged
    fails(Seq(Seq.empty[Double]))                 // empty
    fails(Seq(Seq(Double.NaN)))                   // non-finite
    // null rows are skipped; all-null group → null
    val r = Seq[(Int, Seq[Double])]((1, null), (1, null)).toDF("g", "v")
      .groupBy(col("g")).agg(MicroMeanAgg.vec_mean_micro(col("v")).as("m"))
      .collect().head
    assert(r.isNullAt(1))
  }
}
