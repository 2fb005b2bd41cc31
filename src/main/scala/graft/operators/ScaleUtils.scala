package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
