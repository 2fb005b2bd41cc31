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
  * (same multiset of doubles), so raw sums agree to last-ulp and the
  * portable round-6 quantization yields bit-identical decisions (the
  * [[graft.operators.IvfAnn.trainCentroids]] portable-envelope
  * argument; spec-held agg == posexplode form, and every downstream
  * oracle re-verified).
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
  /** Column form: vec_sum(v) over an `array<double>` column. */
  def vec_sum(c: Column): Column =
    org.apache.spark.sql.functions.udaf(new VecSumAgg).apply(c)
}
