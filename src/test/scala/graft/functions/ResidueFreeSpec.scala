package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Machine-checks of the PLANS "residue-free" rounding claims (VERDICT
  * r13 ask #3) — the sites that still round a DOUBLE because their
  * exact value supposedly cannot sit ON the k-decimal halfway grid.
  *
  * The load-bearing lemma (proved in prose, property-checked here): a
  * rational u/d in lowest terms sits ON the scale-k halfway grid iff
  * 2·10^k·u/d is an ODD integer — which forces d's 2-adic valuation to
  * be exactly k+1 ≥ 1. So an ODD reduced denominator can never be
  * halfway at ANY scale. That (not the looser "never 2^a·5^b", which
  * fails at a=0: idf(N=3, df=2) = 3/5) is the invariant that keeps
  * BM25's idf safe.
  *
  * Mechanizing the r13 claims REFUTED them for BOTH remaining
  * double-round families. RRF: 1/(60+r) IS exactly halfway at scale 6
  * whenever 60+r = 2^7·5^b (r = 68, 580, 3140, 15940, …), and
  * two-sided sums reach the grid too ((4,68) → 3/128). BM25: the full
  * per-term contribution reaches the micro halfway grid at e.g.
  * N=80 docs / S=2192 tokens / df=1 / tf=1 / dl=23 (c = 56.7265625).
  * Both operators therefore now round via exact integer arithmetic
  * (rrfFuse → ExactRound.ratio; every BM25 scorer →
  * ExactRound.bm25MicroContrib, with avgdl consumed as the exact
  * rational sum_dl/n). The properties here pin the refutations, the
  * fixed operators against exact BigInt/BigDecimal arithmetic
  * INCLUDING on-grid inputs, and the generative
  * ExactRound-vs-double-round agreement off the grid.
  */
class ResidueFreeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(140L + i)))

  /** u/d (NOT necessarily reduced) is exactly ON the scale-k halfway
    * grid ⟺ 2·10^k·u/d is an odd integer. */
  private def isHalfway(u: BigInt, d: BigInt, k: Int): Boolean = {
    val t = u * 2 * BigInt(10).pow(k)
    t % d == 0 && ((t / d) % 2).abs == 1
  }

  test("lemma: an odd reduced denominator is never halfway at any scale") {
    val g = for {
      u <- Gen.chooseNum(0L, 1000000000L)
      d <- Gen.chooseNum(1L, 500000000L).map(x => 2 * x - 1) // odd
      k <- Gen.chooseNum(0, 12)
    } yield (u, d, k)
    samples(g, 4000).foreach { case (u, d, k) =>
      // u/d need not be reduced: any representation with an odd
      // denominator has an odd REDUCED denominator
      assert(!isHalfway(u, d, k), s"$u/$d halfway at scale $k")
    }
  }

  test("BM25 idf (2N-2df+1)/(2df+1): reduced denominator always ODD " +
      "(the sound invariant; 'never 2^a·5^b' is FALSE at a=0)") {
    val g = for {
      n <- Gen.chooseNum(1L, 10000000000L)
      df <- Gen.chooseNum(1L, n)
    } yield (n, df)
    samples(g, 4000).foreach { case (n, df) =>
      val num = BigInt(2 * n - 2 * df + 1)
      val den = BigInt(2 * df + 1)
      val red = den / num.gcd(den)
      assert(red.testBit(0), s"idf($n,$df) reduced denominator even: $red")
      (0 to 12).foreach(k => assert(!isHalfway(num, den, k)))
    }
    // the literal r13 phrasing is refutable: idf(3,2) = 3/5 has a
    // 2^0·5^1 reduced denominator — harmless (terminating, lands ON
    // the grid, not halfway), which is why oddness is the real claim
    assert(BigInt(2 * 3 - 2 * 2 + 1) == 3 && BigInt(2 * 2 + 1) == 5)
  }

  // the full indexed-BM25 per-term contribution as an exact rational
  // (k1 = 6/5, b = 3/4, avgdl = S/N exact):
  //   c = 22·tf·S·(2N−2df+1) / ((2df+1)·(10·tf·S + 3·S + 9·dl·N))
  // halfway at the micro grid ⟺ 2·10^6·c is an odd integer
  private def bm25Halfway(n: Long, df: Long, tf: Long, dl: Long,
      s: BigInt): Boolean =
    isHalfway(BigInt(22) * tf * s * (2 * n - 2 * df + 1),
      BigInt(2 * df + 1) * (BigInt(10) * tf * s + 3 * s + BigInt(9) * dl * n),
      6)

  test("BM25 refutation: the micro contribution's exact value CAN sit " +
      "dead ON the halfway grid — the r13 hand-proof was wrong") {
    // found by this spec's generative sweep in r14 (the very
    // mechanization VERDICT r13 asked for): both tuples put the
    // per-term contribution exactly ON x.5 micro, where the old
    // round(double·10^6) was allowed to disagree across engines
    assert(bm25Halfway(80, 1, 1, 23, BigInt(2192)))    // 56726562.5 micro
    assert(bm25Halfway(195287, 1, 50, 1, BigInt(195287)))
    // exact value of the small case: c = 7667616/135168 = 56.7265625
    assert(BigInt(22) * 1 * 2192 * 159 == BigInt(7667616) &&
      BigInt(3) * (10 * 2192 + 3 * 2192 + 9 * 23 * 80) == BigInt(135168))
  }

  test("production bm25Scores half-ups the halfway corpus identically to " +
      "exact integer arithmetic (the fix: ExactRound.bm25MicroContrib)") {
    // the refutation tuple as a REAL corpus: 80 docs, S = 2192 tokens,
    // needle term df=1/tf=1/dl=23 → c = 56.7265625 → 56.726563
    val needleDoc = ("needle" +: Seq.fill(22)("w")).mkString(" ")
    val docs = spark.range(0, 80).select(col("id").as("doc_id"),
      when(col("id") === 0, lit(needleDoc))
        .when(col("id") === 79, lit(Seq.fill(63)("w").mkString(" ")))
        .otherwise(lit(Seq.fill(27)("w").mkString(" "))).as("text"))
    val got = graft.operators.RetrievalOps
      .bm25Scores(docs, "doc_id", "text", Seq("needle"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(0L -> 56.726563))
  }

  test("generative: the exact BM25 kernel equals BigInt half-up " +
      "arithmetic over a corpus-shaped domain, halfway tuples included") {
    val g = for {
      n <- Gen.chooseNum(1L, 1000000L)
      df <- Gen.chooseNum(1L, n)
      tf <- Gen.chooseNum(1L, 1000L)
      dl <- Gen.chooseNum(1L, 10000L)
      s <- Gen.chooseNum(n, n * 1000L)
    } yield (n, df, tf, dl, s)
    val cases = samples(g, 800) ++
      Seq((80L, 1L, 1L, 23L, 2192L), (195287L, 1L, 50L, 1L, 195287L))
    val got = cases.toDF("n", "df", "tf", "dl", "s")
      .select(col("n"), col("df"), col("tf"), col("dl"), col("s"),
        ExactRound.bm25MicroContrib(col("tf"), col("df"), col("dl"),
          col("n"), col("s")).as("micro"))
      .collect()
    got.foreach { r =>
      val (n, df, tf, dl, s) = (BigInt(r.getLong(0)), BigInt(r.getLong(1)),
        BigInt(r.getLong(2)), BigInt(r.getLong(3)), BigInt(r.getLong(4)))
      val num = 22 * tf * s * (2 * n - 2 * df + 1)
      val den = (2 * df + 1) * (10 * tf * s + 3 * s + 9 * dl * n)
      val want = (num * 2000000 + den) / (den * 2)
      assert(BigInt(r.getLong(5)) == want,
        s"kernel($n,$df,$tf,$dl,$s): got ${r.getLong(5)} want $want")
    }
  }

  test("RRF refutation: 1/(60+r) IS halfway at scale 6 exactly when " +
      "60+r = 2^7·5^b — the r13 hand-proof was wrong for ranks >= 68") {
    val halfwayRanks = (1L to 20000L).filter(r => isHalfway(1, 60 + r, 6))
    assert(halfwayRanks == Seq(68L, 580L, 3140L, 15940L))
    // and two-sided sums reach the grid too: ranks (4, 68) → 3/128
    assert(isHalfway(120 + 4 + 68, (60 + 4) * (60 + 68), 6))
  }

  test("rrfFuse (exact path) equals exact BigDecimal HALF_UP for all " +
      "ranks 1..1200 one-sided and 400 two-sided pairs, ON-grid included") {
    // a: docs 1..1200 at rank = id; b: docs 1..400 at rank 1201-id —
    // docs <= 400 are two-sided, 401..1200 one-sided (rank 580's
    // halfway residue included); through the PRODUCTION operator
    val a = spark.range(1, 1201).select(col("id").as("doc"),
      col("id").as("rank"))
    val b = spark.range(1, 401).select(col("id").as("doc"),
      (lit(1201L) - col("id")).as("rank"))
    val got = graft.operators.RetrievalOps.rrfFuse(a, b, "doc", k = 2000)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == 1200)
    def exact(num: Long, den: Long): Double =
      new java.math.BigDecimal(num)
        .divide(new java.math.BigDecimal(den), 6,
          java.math.RoundingMode.HALF_UP).doubleValue()
    (1L to 1200L).foreach { d =>
      val want =
        if (d <= 400) exact(120 + d + (1201 - d), (60 + d) * (60 + 1201 - d))
        else exact(1, 60 + d)
      assert(got(d) == want, s"doc $d: got ${got(d)} want $want")
    }
    // the on-grid one-sided residue really flowed through: rank 580
    assert(got(580L) == 0.001563) // 1/640 = 0.0015625 → half-up
  }

  test("the remaining on-grid sites can NEVER be halfway: x20's λ=0.5 " +
      "grid at scale 7, x24's md5 grid and recall@10 at scale 6") {
    // these are the r13 sites that stay on double round() — their
    // claims SURVIVE mechanization (unlike RRF/BM25) because each
    // value is an exact multiple of its own rounding grid:
    //   x20: score = (m1−m2)/(2·10^6) with m1,m2 round-6 micro ints
    //        → ·10^7 = 5(m1−m2), an integer → never half-odd
    //   x24: md5%10^6/10^6 → ·10^6 integer
    //   recall@10: hits/10 → ·10^6 = hits·10^5 integer
    val g = for {
      m1 <- Gen.chooseNum(-1000000L, 1000000L)
      m2 <- Gen.chooseNum(-1000000L, 1000000L)
    } yield (m1, m2)
    samples(g, 3000).foreach { case (m1, m2) =>
      assert(!isHalfway(BigInt((m1 - m2).abs), BigInt(2000000), 7),
        s"x20 grid halfway at m1=$m1 m2=$m2")
    }
    (0L to 10L).foreach(h => assert(!isHalfway(BigInt(h), BigInt(10), 6)))
    samples(Gen.chooseNum(0L, 999999L), 2000).foreach { m =>
      assert(!isHalfway(BigInt(m), BigInt(1000000), 6),
        s"x24 md5 grid halfway at m=$m")
    }
  }

  test("generative: ExactRound.ratio == double round(num/den, k) " +
      "everywhere OFF the halfway grid (sound magnitude window)") {
    // soundness window: |num·den·10^k| < 2^52 keeps the double
    // quotient's error below the distance to the nearest halfway
    // point, so double-rounding is unambiguous off the grid
    val g = for {
      num <- Gen.chooseNum(0L, 1000000L)
      den <- Gen.chooseNum(1L, 10000L)
      k <- Gen.chooseNum(0, 5)
    } yield (num, den, k)
    val cases = samples(g, 3000)
      .filter { case (u, d, k) => !isHalfway(u, d, k) }
    val df = cases.toDF("num", "den", "k")
    def byK(f: Int => org.apache.spark.sql.Column) =
      (0 to 5).map(k => when(col("k") === k, f(k)): org.apache.spark.sql.Column)
        .reduce((a, b) => coalesce(a, b))
    val got = df.select(col("num"), col("den"), col("k"),
        byK(k => ExactRound.ratio(col("num"), col("den"), k)).as("exact"),
        byK(k => round(col("num").cast("double") / col("den").cast("double"),
          k)).as("dbl"))
      .collect()
    assert(got.length == cases.size)
    got.foreach { r =>
      assert(r.getDouble(3) == r.getDouble(4),
        s"ratio(${r.getLong(0)}, ${r.getLong(1)}, ${r.get(2)}): " +
          s"exact ${r.getDouble(3)} vs double ${r.getDouble(4)}")
    }
  }
}
