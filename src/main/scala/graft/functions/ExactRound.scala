package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact integer-rational rounding for cross-engine-reproducible scores.
  *
  * The hazard class (found live by the r12 x20 defect): `round(p/q, k)`
  * where p/q is an exact integer ratio whose true value can land ON the
  * k-decimal halfway grid — there, the two engines' last-ulp doubles
  * (division is one IEEE op, but the halfway decision sits exactly at
  * the rounding boundary of the DECIMAL representation) can legitimately
  * round apart regardless of each engine's rounding rule. DuckDB rounds
  * the binary double through its own decimal path; the JVM rounds the
  * SHORTEST decimal representation (BigDecimal.valueOf) — at a halfway
  * residue those disagree by one grid step.
  *
  * The cure is to never round a double at all: compute
  * round-half-away-from-zero of p/q at k decimals in EXACT integer
  * arithmetic —
  *
  *   r = (2·p·10^k + q) div (2·q)        [p, q >= 0 integers]
  *   result = toDouble(r) / 10^k
  *
  * and mirror the same integer expression in the DuckDB oracle
  * (`(p::HUGEINT * 2 * 10^k + q) // (q::HUGEINT * 2)`). The final
  * divide-by-10^k is one correctly-rounded IEEE op on exact operands, so
  * both engines produce the identical double ALWAYS — including on the
  * 2^a·5^b halfway residues (the `dx_halfway_grid` gate pins one such
  * residue through this helper and its oracle mirror every round).
  *
  * Arithmetic runs in DECIMAL(38,0): the operands are cast before any
  * multiply, so a `tf * N` product that would silently wrap a BIGINT at
  * corpus scale (1e10 docs × 1e4 tf × 2·10^4 ≈ 2e18, a last-few-bits
  * escape from Long) stays exact to 38 digits. All-columnar, codegen'd —
  * no UDF, no driver round-trip.
  */
object ExactRound {

  /** round(num/den · 10^k, 0) as an exact DECIMAL integer — the shared
    * core of [[ratio]] and [[bm25MicroContrib]]. */
  private def halfUpCore(num: Column, den: Column, k: Int): Column = {
    require(k >= 0 && k <= 12, s"scale $k out of range")
    val p = math.pow(10, k).toLong
    val n = num.cast(DecimalType(38, 0))
    val d = den.cast(DecimalType(38, 0))
    val n2 = n * lit(2L) * lit(p) + d
    val d2 = d * lit(2L)
    // exact floor division of non-negative decimals: subtract the exact
    // remainder first, so the decimal divide's value is an integer and
    // its scale rounding cannot perturb it (a bare floor(n2/d2) would
    // round at the division's result scale BEFORE the floor and go off
    // by one when the true quotient is within 5e-7 of an integer)
    val r = (n2 - pmod(n2, d2)) / d2
    // fail-loud overflow guard: under
    // spark.sql.decimalOperations.allowPrecisionLoss=true with ANSI off,
    // a num*2*10^k product past 38 digits or a quotient past
    // DECIMAL(38,6)'s integral capacity silently returns NULL — which
    // would propagate a null score downstream instead of surfacing the
    // contract breach. Raise instead when the inputs were non-null but
    // the exact arithmetic overflowed (null-in → null-out stays null,
    // preserving SQL semantics for callers with legitimately null
    // rows). Under ANSI (the Spark 4 default) the decimal op itself
    // throws NUMERIC_VALUE_OUT_OF_RANGE first — same fail-loud
    // outcome, different message (ExactRoundSpec pins both).
    when(r.isNotNull || n.isNull || d.isNull, r).otherwise(
      raise_error(lit("graft.ExactRound.ratio/bm25MicroContrib: exact " +
        s"arithmetic produced NULL from non-null operands — either " +
        s"num*2*10^$k or the quotient exceeded DECIMAL(38,0)'s 38 " +
        "digits, or den is zero (the contract requires a non-zero " +
        "denominator); the exactness contract cannot hold for these " +
        "operands")))
  }

  /** `round(num/den, k)` half-away-from-zero via exact integer
    * arithmetic. `num` and `den` must be NON-NEGATIVE integral columns
    * (long or decimal); `den` must be non-zero. Callers with a product
    * numerator must pass one factor pre-cast (e.g.
    * `col("tf").cast(DecimalType(38,0)) * col("n")`) so the multiply
    * itself runs in decimal. */
  def ratio(num: Column, den: Column, k: Int): Column =
    halfUpCore(num, den, k).cast("double") / lit(math.pow(10, k))

  /** The exact micro-unit BM25 per-(doc,term) contribution, as a LONG:
    * round-half-away of c·10^6 where, with the DEFAULT parameters
    * k1 = 6/5 and b = 3/4 and the EXACT average doc length
    * avgdl = sumDl/n,
    *
    *   c = idf · tf-part
    *     = (N−df+1/2)/(df+1/2) · tf(k1+1)/(tf + k1(1−b) + k1·b·dl/avgdl)
    *     = 22·tf·S·(2N−2df+1) / ((2df+1)·(10·tf·S + 3·S + 9·dl·N))
    *
    * All-integer operands, DECIMAL(38,0) arithmetic throughout — no
    * double is ever rounded, so the value is reproducible cross-engine
    * INCLUDING on the halfway grid. This closes the BM25 member of the
    * r12 x20 defect class: mechanizing the r13 "residue-free" hand
    * proof (ResidueFreeSpec) REFUTED it — e.g. N=80 docs, S=2192
    * tokens, df=1, tf=1, dl=23 puts c exactly ON 56726562.5 micro,
    * where two engines' double rounds can legitimately disagree. The
    * DuckDB mirror is the HUGEINT `//` expression in SparkEntry's
    * bm25TermCtes.
    *
    * Magnitude bound (the overflow guard raises loudly past it):
    * num = 44·10^6·tf·S·(2N−2df+1)·… stays inside DECIMAL(38) for
    * tf ≤ 10^4, S ≤ 10^14 tokens, N ≤ 10^10 docs — comfortably past
    * 100 TB corpus scale. */
  def bm25MicroContrib(tf: Column, df: Column, dl: Column,
      n: Column, sumDl: Column): Column = {
    val d38 = DecimalType(38, 0)
    val tfd = tf.cast(d38)
    val sd = sumDl.cast(d38)
    val nd = n.cast(d38)
    val dfd = df.cast(d38)
    val dld = dl.cast(d38)
    val num = lit(22L) * tfd * sd * (nd * lit(2L) - dfd * lit(2L) + lit(1L))
    val den = (dfd * lit(2L) + lit(1L)) *
      (tfd * sd * lit(10L) + sd * lit(3L) + dld * nd * lit(9L))
    halfUpCore(num, den, 6).cast("long")
  }

  /** The DuckDB mirror of [[ratio]] as SQL text, for oracle authors:
    * `CAST((num * 2 * 10^k + den) // (den * 2) AS DOUBLE) / 10^k` with
    * HUGEINT casts (`//` truncates toward zero = floor for the
    * non-negative operands this contract requires). */
  def ratioSql(num: String, den: String, k: Int): String = {
    val p = math.pow(10, k).toLong
    s"CAST((($num)::HUGEINT * ${2 * p} + ($den)) // (($den)::HUGEINT * 2) " +
      s"AS DOUBLE) / $p.0"
  }
}
