package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scale techniques used across the engine, exposed as utilities:
  * bucketed co-located joins (shuffle-free at read time) and salted joins
  * for skewed keys (complementing AQE skew-join for the cases it can't
  * rewrite, e.g. aggregations feeding a join).
  */
object ScaleUtils {

  /** Write both sides bucketed+sorted on the join key so later joins are
    * exchange-free (bucket-local sort-merge). The 100 TB pattern for
    * repeatedly-joined fact tables. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Scale-safe global row numbering (0-based), the distributed replacement
    * for `row_number().over(Window.orderBy(...))` — which funnels the whole
    * table through ONE task. Here: `repartitionByRange` gives disjoint,
    * ordered key ranges per partition; an in-partition sort makes the order
    * total; `RDD.zipWithIndex` then assigns global indexes with one counting
    * pass + one numbering pass, both fully parallel. No single-partition
    * Exchange, no Window (ref semantics: pbf_file_reader.py:3037-3045 —
    * only bounded chunk size matters, so per-partition offsets are exact).
    *
    * The zip runs on `InternalRow`s via
    * [[org.apache.spark.sql.graft.InternalRowOps]] — the public
    * `df.rdd`/`createDataFrame` route would box every row to a generic
    * `Row` and re-encode it, per row, off the codegen path.
    *
    * The sort key must be a deterministic total order (unique, or with ties
    * broken by additional columns) so the two zipWithIndex passes agree. */
  def withGlobalIndex(df: DataFrame, sortCols: Seq[Column],
      idxName: String = "_gidx"): DataFrame =
    org.apache.spark.sql.graft.InternalRowOps.zipWithGlobalIndex(
      df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*),
      idxName)

  /** Salted equi-join for skewed LEFT keys: the left side gets a random
    * salt in [0, salts); the right side is replicated `salts` times with
    * explode — correctness-preserving for inner/left joins on `key`. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)).cast("int"))
    val saltedRight = right
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
    saltedLeft.join(saltedRight, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
