package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Buffer for [[BoundedCollectSet]]: `overflow` latches once the distinct
  * count passes the bound; `items` never exceeds bound elements. */
case class BoundedSetBuf(var overflow: Boolean, var items: Seq[Long])

/** Bounded collect-set over LONG values: accumulates distinct values up to
  * `maxSize`, and one distinct value PAST the bound flips the group to
  * overflow (result null) and stops accumulating. For callers that discard
  * over-cap groups anyway (doc-frequency caps, candidate buckets), this
  * bounds per-group aggregation state at `maxSize` entries on every
  * executor — `collect_set`'s unbounded worst case is exactly what a
  * boilerplate fingerprint bucket at corpus scale would hit.
  *
  * Membership is a linear scan: sized for small caps (≤ ~1000, the
  * doc-frequency-cap regime). The output array is sorted ascending, so
  * in-bucket pair generation (i < j) needs no further ordering. */
class BoundedCollectSet(maxSize: Int)
    extends Aggregator[Long, BoundedSetBuf, Array[Long]] {
  require(maxSize >= 1, s"maxSize must be >= 1, got $maxSize")

  override def zero: BoundedSetBuf = BoundedSetBuf(false, Vector.empty)

  override def reduce(b: BoundedSetBuf, a: Long): BoundedSetBuf = {
    if (!b.overflow && !b.items.contains(a)) {
      if (b.items.size >= maxSize) { b.overflow = true; b.items = Vector.empty }
      else b.items = b.items :+ a
    }
    b
  }

  override def merge(x: BoundedSetBuf, y: BoundedSetBuf): BoundedSetBuf = {
    if (x.overflow || y.overflow) { x.overflow = true; x.items = Vector.empty }
    else y.items.foreach(v => reduce(x, v))
    x
  }

  override def finish(b: BoundedSetBuf): Array[Long] =
    if (b.overflow) null else b.items.toArray.sorted

  override def bufferEncoder: Encoder[BoundedSetBuf] = Encoders.product[BoundedSetBuf]
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
