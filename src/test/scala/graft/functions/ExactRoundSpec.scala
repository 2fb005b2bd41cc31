package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[ExactRound.ratio]] — exact integer-rational half-away-from-zero
  * rounding — pinned on the 2^a·5^b halfway residues (where
  * `round(double, k)` is allowed to disagree across engines) and
  * property-checked against exact BigDecimal division. */
class ExactRoundSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def ratioOf(num: Long, den: Long, k: Int): Double =
    Seq((num, den)).toDF("n", "d")
      .select(ExactRound.ratio(col("n"), col("d"), k).as("r"))
      .collect().head.getDouble(0)

  test("halfway residues round HALF-UP, pinned by hand") {
    // 33·10^4/32 = 10312.5 exactly — the d14 tf·N/df shape
    assert(ratioOf(33, 32, 4) == 1.0313)
    // 10^6/128 = 7812.5 exactly — the d11/x32 count-ratio shape
    assert(ratioOf(1, 128, 6) == 0.007813)
    // integer part > 1: 161·10^4/32 = 50312.5
    assert(ratioOf(161, 32, 4) == 5.0313)
    // NOT halfway (odd denominator can never sit on the grid): exact
    // rational rounding == BigDecimal HALF_UP
    assert(ratioOf(1, 3, 6) == 0.333333)
    assert(ratioOf(2, 3, 6) == 0.666667)
  }

  test("matches exact BigDecimal HALF_UP division on random ratios") {
    val rnd = new scala.util.Random(42)
    val cases = (1 to 300).map { _ =>
      val num = rnd.nextLong(2000000L)
      val den = 1L + rnd.nextLong(500000L)
      val k = rnd.nextInt(7)
      (num, den, k)
    } ++ Seq((0L, 7L, 4), (1L, 1L, 0), (999999999999L, 7L, 6))
    val got = cases.map { case (n, d, k) => ratioOf(n, d, k) }
    val want = cases.map { case (n, d, k) =>
      new java.math.BigDecimal(n)
        .divide(new java.math.BigDecimal(d), k,
          java.math.RoundingMode.HALF_UP)
        .doubleValue()
    }
    cases.lazyZip(got).lazyZip(want).foreach { case ((n, d, k), g, w) =>
      assert(g == w, s"ratio($n, $d, $k): got $g want $w")
    }
  }

  test("decimal path survives products past Long range") {
    // tf·N at extreme corpus scale: 10^10 docs × 10^4 tf × 2·10^4 grid
    // would wrap a Long numerator — the helper's DECIMAL(38,0) path
    // must stay exact (callers pre-cast the product's first factor)
    val df = Seq((10000L, 10000000000L, 3L)).toDF("tf", "n", "df")
    val v = df.select(ExactRound.ratio(
        col("tf").cast(org.apache.spark.sql.types.DecimalType(38, 0))
          * col("n"),
        col("df"), 4).as("r"))
      .collect().head.getDouble(0)
    // 10^14/3 = 33333333333333.333… → round4 = 33333333333333.3333
    val want = new java.math.BigDecimal("100000000000000")
      .divide(new java.math.BigDecimal(3), 4, java.math.RoundingMode.HALF_UP)
      .doubleValue()
    assert(v == want)
  }

  test("overflow FAILS LOUDLY on both ANSI paths; null-in stays null-out") {
    // a 37-digit numerator: num·2·10^6 exceeds DECIMAL(38,0). Under
    // ANSI (the Spark 4 default) the decimal multiply itself throws
    // NUMERIC_VALUE_OUT_OF_RANGE; with ANSI off +
    // allowPrecisionLoss=true it silently NULLs — there the raise_error
    // guard must fire. Either way: loud, never a silent null.
    val big = new java.math.BigDecimal("9".repeat(37))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    def overflowDf(s: org.apache.spark.sql.SparkSession) = {
      import s.implicits._
      Seq(1).toDF("x")
        .select(ExactRound.ratio(
          lit(big).cast(org.apache.spark.sql.types.DecimalType(38, 0)),
          lit(3L), 6).as("r"))
    }
    val eAnsi = intercept[Exception] { overflowDf(spark).collect() }
    assert(msgs(eAnsi).exists(m => m.contains("ExactRound.ratio") ||
        m.contains("NUMERIC_VALUE_OUT_OF_RANGE")),
      s"expected a loud overflow, got: ${msgs(eAnsi)}")
    // non-ANSI deployment: the guard itself must catch the silent null
    val lax = spark.newSession()
    lax.conf.set("spark.sql.ansi.enabled", "false")
    val eLax = intercept[Exception] { overflowDf(lax).collect() }
    assert(msgs(eLax).exists(_.contains("ExactRound.ratio")),
      s"expected the guard's message under ansi=false, got: ${msgs(eLax)}")
    // null input propagates as null (SQL semantics), no raise
    val r = Seq((Option.empty[java.lang.Long], 3L)).toDF("n", "d")
      .select(ExactRound.ratio(col("n"), col("d"), 6).as("r"))
      .collect().head
    assert(r.isNullAt(0))
  }
}
