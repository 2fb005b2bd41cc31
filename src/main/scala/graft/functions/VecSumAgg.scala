package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise vector SUM as a typed Aggregator — the update-step
  * kernel of Lloyd's k-means ([[graft.operators.IvfAnn.trainCentroids]],
  * [[graft.operators.ProductQuantizer.train]]).
  *
  * The form it replaces — `posexplode(v)` to (group, dim, x) rows, then
  * `groupBy(group, dim).agg(avg(x))`, then re-assemble with
  * `sort_array(collect_list(...))` — amplifies every input row into d
  * rows, each paying the hash-aggregate probe machinery per DIMENSION
  * per iteration: the measured residual cost of portable IVF-PQ
  * training after the assignment kernels (x34, VERDICT r11 #5). This
  * aggregator keeps one buffer per GROUP (k × d doubles total — a
  * function of parameters, never of the data) and folds each row with
  * one primitive while-loop: map-side partial sums combine before the
  * shuffle, so the exchange carries k buffers, not n×d rows.
  *
  * Mean semantics: callers divide by `count(v)` (the non-null row
  * count) — the same sum/count division Spark's `avg` performs. The
  * SUMMATION ORDER differs from the hash-agg form's only in grouping
  * (same multiset of doubles), so raw sums agree to last-ulp
  * (spec-held agg == posexplode form). The PORTABLE trainers no longer
  * round this double sum — they use the exact integer
  * [[MicroMeanAgg]] kernel (r13), which removes the order dependence
  * entirely; this sum remains the non-portable update step and the
  * general-purpose vector-sum primitive.
  *
  * UNIFORM WIDTH REQUIRED: a ragged vector fails loudly. (The
  * posexplode form silently averaged ragged dims over differing
  * counts — a data error laundered into wrong centroids.) Null
  * vectors are skipped, as posexplode skipped them. */
class VecSumAgg extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {

  override def zero: Array[Double] = Array.emptyDoubleArray

  override def reduce(b: Array[Double], a: Seq[Double]): Array[Double] =
    if (a == null) b
    else if (a.isEmpty) {
      // a zero-LENGTH vector would be indistinguishable from the zero
      // buffer: accepted as the first row of a partition it would make
      // the sum silently skip it while count(v) still counts it (wrong
      // mean), and as a later row it would throw "ragged" — loud or
      // silently wrong depending on row ORDER. Always loud instead.
      throw new IllegalArgumentException(
        "vec_sum: empty vector — uniform-dimension input required")
    } else if (b.isEmpty) {
      val r = new Array[Double](a.size)
      var i = 0
      while (i < r.length) { r(i) = a(i); i += 1 }
      r
    } else {
      require(b.length == a.size,
        s"vec_sum: ragged vector widths ${b.length} vs ${a.size} — " +
          "uniform-dimension input required")
      var i = 0
      while (i < b.length) { b(i) += a(i); i += 1 }
      b
    }

  override def merge(x: Array[Double], y: Array[Double]): Array[Double] =
    if (x.isEmpty) y
    else if (y.isEmpty) x
    else {
      require(x.length == y.length,
        s"vec_sum: ragged partial widths ${x.length} vs ${y.length}")
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }

  override def finish(r: Array[Double]): Seq[Double] =
    if (r.isEmpty) null else scala.collection.immutable.ArraySeq.unsafeWrapArray(r)

  // buffers live as plain objects inside the aggregate's hash map;
  // Kryo only serializes the k spilled/exchanged partials
  override def bufferEncoder: Encoder[Array[Double]] =
    Encoders.kryo[Array[Double]]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object VecSumAgg {
  /** Column form: vec_sum(v) over an `array<double>` column.
    *
    * Backed by [[VecSumAggExpr]], the primitive TypedImperativeAggregate
    * — the typed-Aggregator class above is kept as the REFERENCE
    * implementation the spec holds it to (VecSumAggSpec asserts
    * expression == Aggregator == posexplode form bit-for-bit; the
    * Aggregator's per-row ExpressionEncoder deserialization boxes every
    * element, which at 16M subvector rows per training iteration was
    * ~half the update pass). */
  def vec_sum(c: Column): Column =
    org.apache.spark.sql.graft.SessionOps.column(
      VecSumAggExpr(org.apache.spark.sql.graft.SessionOps.expression(c))
        .toAggregateExpression())

  /** The reference typed-Aggregator form, for the equivalence spec. */
  def vec_sum_ref(c: Column): Column =
    org.apache.spark.sql.functions.udaf(new VecSumAgg).apply(c)
}

/** [[VecSumAgg]] as a primitive imperative aggregate: the update path
  * reads the incoming `array<double>` through [[org.apache.spark.sql
  * .catalyst.util.ArrayData.getDouble]] — no per-row encoder
  * deserialization, no element boxing. Semantics are EXACTLY the
  * Aggregator's (spec-held): null rows skipped, a null ELEMENT poisons
  * loudly (the posexplode form silently dropped it — same loud-ragged
  * philosophy), empty vectors throw, ragged widths throw, an all-null
  * group evaluates to null. Buffers serialize for exchange/spill as
  * raw little-endian doubles. */
case class VecSumAggExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[Array[Double]]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[
      org.apache.spark.sql.catalyst.expressions.Expression] {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.types._

  override def prettyName: String = "vec_sum"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // array<float> upcasts element-wise, exactly as the udaf form's
      // Seq[Double] encoder did — callers need not pre-cast
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_sum expects array<float|double>, got ${other.simpleString}")
    }

  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Double] =
    Array.emptyDoubleArray

  override def update(b: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) b
    else {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n == 0)
        throw new IllegalArgumentException(
          "vec_sum: empty vector — uniform-dimension input required")
      if (b.isEmpty) {
        val r = new Array[Double](n)
        var i = 0
        while (i < n) {
          if (a.isNullAt(i)) throw new IllegalArgumentException(
            s"vec_sum: null element at dim $i")
          r(i) = if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
          i += 1
        }
        r
      } else {
        if (b.length != n)
          throw new IllegalArgumentException(
            s"vec_sum: ragged vector widths ${b.length} vs $n — " +
              "uniform-dimension input required")
        var i = 0
        while (i < n) {
          if (a.isNullAt(i)) throw new IllegalArgumentException(
            s"vec_sum: null element at dim $i")
          b(i) += (if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i))
          i += 1
        }
        b
      }
    }
  }

  override def merge(x: Array[Double], y: Array[Double]): Array[Double] =
    if (x.isEmpty) y
    else if (y.isEmpty) x
    else {
      if (x.length != y.length)
        throw new IllegalArgumentException(
          s"vec_sum: ragged partial widths ${x.length} vs ${y.length}")
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }

  override def eval(b: Array[Double]): Any =
    if (b.isEmpty) null else new GenericArrayData(b)

  override def serialize(b: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(b.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asDoubleBuffer().put(b)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val r = new Array[Double](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asDoubleBuffer().get(r)
    r
  }

  override def withNewMutableAggBufferOffset(o: Int): VecSumAggExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumAggExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): VecSumAggExpr =
    copy(child = newChild)
}
