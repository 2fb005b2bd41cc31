package graft.functions

import org.apache.spark.sql.Column

/** Element-wise EXACT portable vector mean — the oracle-replayable
  * Lloyd's update step ([[graft.operators.IvfAnn.trainCentroids]],
  * [[graft.operators.ProductQuantizer.train]], portable mode).
  *
  * The form it replaces — `round(vec_sum(v)/n, 6)` — summed DOUBLES,
  * whose value depends on partial-merge order: engine and oracle sums
  * differ in the last ulps, which the round-6 quantization absorbs
  * EXCEPT when the true average sits ON the 6-decimal halfway grid
  * (possible when a cell population is exactly 2^a·5^b — the PLANS r12
  * audit's latent case #1, the same class as the x20 defect that DID
  * fire). This aggregate removes the order dependence entirely:
  *
  *   1. each element quantizes to PICO-units through one deterministic
  *      IEEE sequence: q = floor(x·1e12 + 0.5) as a long — the same two
  *      ops on both engines (`CAST(floor(x*1e12+0.5) AS HUGEINT)` in
  *      DuckDB), so both hold the IDENTICAL integer;
  *   2. the per-dimension sum S runs in 128-bit integer arithmetic —
  *      exact and order-independent (a 100 TB cell of 1e10 rows ×
  *      2e12-pico elements tops out near 2e22, past a long but 58 bits
  *      inside the 128-bit accumulator);
  *   3. the mean rounds to MICRO-units (the portable grid) half-away-
  *      from-zero in exact integer arithmetic:
  *      r = sgn(S) · (2·|S| + n·10^6) div (2·n·10^6), emitted as the
  *      double r/10^6 (one correctly-rounded IEEE divide of exact
  *      operands — identical on any engine).
  *
  * The 5e-13 input-quantization step is three orders of magnitude below
  * the 1e-6 portable grid, so every existing fixture decision is
  * unchanged (MicroMeanAggSpec holds the kernel bit-identical to the
  * round-6 double form on the trainer fixtures, and the x34/x12/x15
  * oracles re-verify) — but on the halfway residue both engines now
  * agree BY CONSTRUCTION instead of by last-ulp luck.
  *
  * Same loudness contract as [[VecSumAggExpr]]: null rows are skipped
  * (and not counted), empty vectors / ragged widths / null or non-finite
  * elements throw, an all-null group evaluates to null. */
object MicroMeanAgg {
  /** Column form: vec_mean_micro(v) over an `array<float|double>`
    * column — emits `array<double>` of exact portable means on the
    * micro grid. */
  def vec_mean_micro(c: Column): Column =
    org.apache.spark.sql.graft.SessionOps.column(
      MicroMeanAggExpr(org.apache.spark.sql.graft.SessionOps.expression(c))
        .toAggregateExpression())

  /** Pico-quantization of one element — the deterministic IEEE sequence
    * both engines run (multiply, add, floor; DuckDB:
    * `CAST(floor(x*1e12+0.5) AS HUGEINT)`). Package-visible for the
    * equivalence spec. */
  private[functions] def quantize(x: Double): Long = {
    if (!java.lang.Double.isFinite(x))
      throw new IllegalArgumentException(
        s"vec_mean_micro: non-finite element $x — portable training " +
          "requires finite inputs")
    val q = Math.floor(x * 1e12 + 0.5)
    if (q > 4.6e18 || q < -4.6e18)
      throw new IllegalArgumentException(
        s"vec_mean_micro: element $x overflows the pico-unit long")
    q.toLong
  }

  /** Exact half-away-from-zero division of the pico sum by n at the
    * micro grid, as a double. Package-visible for the spec. */
  private[functions] def microMean(s: java.math.BigInteger, n: Long): Double = {
    // n·10^6 in BigInteger — a 1e13-row cell would silently wrap the
    // long product
    val nMicro = java.math.BigInteger.valueOf(n)
      .multiply(java.math.BigInteger.valueOf(1000000L))
    val num = s.abs.shiftLeft(1).add(nMicro)
    val den = nMicro.shiftLeft(1)
    val r = num.divide(den).longValueExact() * (if (s.signum < 0) -1L else 1L)
    r.toDouble / 1e6
  }
}

/** The aggregate: buffer layout is one Array[Long] of `2d + 1` slots —
  * [n, hi_0, lo_0, …, hi_{d-1}, lo_{d-1}] — each dimension's sum held
  * as a signed 128-bit (hi·2^64 + unsigned lo) pair so corpus-scale
  * cells cannot overflow. Update folds one quantized row with a
  * primitive while-loop; map-side partials combine before the shuffle
  * exchange (k buffers travel, never n×d rows — the [[VecSumAggExpr]]
  * shape). */
case class MicroMeanAggExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[Array[Long]]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[
      org.apache.spark.sql.catalyst.expressions.Expression] {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.types._

  override def prettyName: String = "vec_mean_micro"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_mean_micro expects array<float|double>, got ${other.simpleString}")
    }

  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  /** b(2i+1)=hi, b(2i+2)=lo += signed 64-bit q (128-bit two's-complement
    * add: unsigned carry out of the low word, sign-extended high word). */
  private def add128(b: Array[Long], dim: Int, q: Long): Unit = {
    val lo = b(2 * dim + 2)
    val newLo = lo + q
    val carry = ((lo & q) | ((lo | q) & ~newLo)) >>> 63
    b(2 * dim + 1) += (q >> 63) + carry
    b(2 * dim + 2) = newLo
  }

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) b
    else {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n == 0)
        throw new IllegalArgumentException(
          "vec_mean_micro: empty vector — uniform-dimension input required")
      val buf =
        if (b.isEmpty) new Array[Long](2 * n + 1)
        else {
          if (b.length != 2 * n + 1)
            throw new IllegalArgumentException(
              s"vec_mean_micro: ragged vector widths ${(b.length - 1) / 2} " +
                s"vs $n — uniform-dimension input required")
          b
        }
      var i = 0
      while (i < n) {
        if (a.isNullAt(i)) throw new IllegalArgumentException(
          s"vec_mean_micro: null element at dim $i")
        val x = if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
        add128(buf, i, MicroMeanAgg.quantize(x))
        i += 1
      }
      buf(0) += 1
      buf
    }
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    if (x.isEmpty) y
    else if (y.isEmpty) x
    else {
      if (x.length != y.length)
        throw new IllegalArgumentException(
          s"vec_mean_micro: ragged partial widths ${(x.length - 1) / 2} " +
            s"vs ${(y.length - 1) / 2}")
      val d = (x.length - 1) / 2
      var i = 0
      while (i < d) {
        val lo1 = x(2 * i + 2); val lo2 = y(2 * i + 2)
        val newLo = lo1 + lo2
        val carry = ((lo1 & lo2) | ((lo1 | lo2) & ~newLo)) >>> 63
        x(2 * i + 1) += y(2 * i + 1) + carry
        x(2 * i + 2) = newLo
        i += 1
      }
      x(0) += y(0)
      x
    }

  private def toBigInt(hi: Long, lo: Long): java.math.BigInteger = {
    val loU = java.math.BigInteger.valueOf(lo & Long.MaxValue)
      .add(if (lo < 0) java.math.BigInteger.ONE.shiftLeft(63)
           else java.math.BigInteger.ZERO)
    java.math.BigInteger.valueOf(hi).shiftLeft(64).add(loU)
  }

  override def eval(b: Array[Long]): Any =
    if (b.isEmpty) null
    else {
      val d = (b.length - 1) / 2
      val n = b(0)
      val out = new Array[Double](d)
      var i = 0
      while (i < d) {
        out(i) = MicroMeanAgg.microMean(toBigInt(b(2 * i + 1), b(2 * i + 2)), n)
        i += 1
      }
      new GenericArrayData(out)
    }

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(b.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(b)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val r = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(r)
    r
  }

  override def withNewMutableAggBufferOffset(o: Int): MicroMeanAggExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MicroMeanAggExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): MicroMeanAggExpr =
    copy(child = newChild)
}
