package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Codegen-friendly bridge for the one operation Spark's public surface
  * can't express without leaving Tungsten rows: appending a global,
  * order-consistent index (`RDD.zipWithIndex`) to a DataFrame.
  *
  * The public route (`df.rdd.zipWithIndex()` + `createDataFrame`) pays a
  * full `InternalRow -> Row -> InternalRow` conversion: every value is
  * boxed into a `GenericRowWithSchema` on the way out and re-encoded
  * through a `RowEncoder` on the way back — per row, off the codegen
  * path. This shim lives in the `org.apache.spark.sql` namespace solely
  * to reach the two `private[sql]` seams that avoid that tax:
  * `queryExecution.toRdd` (the operator's output `UnsafeRow`s, as-is)
  * and `SparkSession.internalCreateDataFrame` (re-enter the plan as a
  * `LogicalRDD`, whose scan re-projects to unsafe rows without boxing).
  *
  * Row-reuse safety: upstream iterators recycle their `UnsafeRow`
  * buffers, and the `JoinedRow`/`GenericInternalRow` pair here is
  * likewise recycled per partition. That is the documented contract of
  * `LogicalRDD`'s scan (`RDDScanExec` runs an `UnsafeProjection` over
  * each row before any operator buffers it), so no copies are needed.
  *
  * zipWithIndex runs one counting job over the partitions before the
  * main pass; both jobs share the same lineage, so a shuffle directly
  * upstream (e.g. `repartitionByRange`) has its map stage executed once
  * and its files reused by the second job — the scheme stays two fully
  * parallel passes at any scale.
  */
object InternalRowOps {

  /** Append `idxName: LONG` = the row's 0-based global position in the
    * DataFrame's current partition/row order. The order must already be
    * deterministic (range-partitioned + sorted) for the index to mean
    * anything — [[graft.operators.ScaleUtils.withGlobalIndex]] is the
    * caller that establishes it. */
  def zipWithGlobalIndex(df: org.apache.spark.sql.DataFrame,
      idxName: String): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.DataFrame]
    val out = StructType(df.schema.fields :+
      StructField(idxName, LongType, nullable = false))
    val rdd = ds.queryExecution.toRdd.zipWithIndex().mapPartitions { it =>
      val joined = new JoinedRow
      val idx = new GenericInternalRow(1)
      it.map { case (r, i) =>
        idx.setLong(0, i)
        joined(r, idx): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    ds.sparkSession.internalCreateDataFrame(rdd, out)
  }
}
