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

  /** `round(num/den, k)` half-away-from-zero via exact integer
    * arithmetic. `num` and `den` must be NON-NEGATIVE integral columns
    * (long or decimal); `den` must be non-zero. Callers with a product
    * numerator must pass one factor pre-cast (e.g.
    * `col("tf").cast(DecimalType(38,0)) * col("n")`) so the multiply
    * itself runs in decimal. */
  def ratio(num: Column, den: Column, k: Int): Column = {
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
    r.cast("double") / lit(p.toDouble)
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
