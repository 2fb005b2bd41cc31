package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Exposes Spark's internal bloom-filter expressions as session
  * functions. Spark keeps `bloom_filter_agg` / `might_contain` out of
  * the public registry — they exist to back the optimizer's
  * InjectRuntimeFilter rewrite — but the machinery (distributed
  * OR-merged sketch build, codegen'd membership probe that deserializes
  * the sketch once per task) is exactly what an explicit bloom-prefilter
  * join needs, so the temp-function route re-registers the same classes.
  *
  * `bloom_filter_agg(xxhash64(k), estItems, numBits)` aggregates to the
  * serialized sketch (BINARY); `bloom_might_contain(sketch, xxhash64(k))`
  * probes it. The sketch argument must be foldable (a collected literal)
  * or a scalar subquery — the Catalyst contract of the underlying
  * expression. */
object BloomExprs {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("bloom_filter_agg"))) {
      reg.createOrReplaceTempFunction("bloom_filter_agg",
        exprs => exprs.length match {
          case 1 => new BloomFilterAggregate(exprs(0))
          case 2 => new BloomFilterAggregate(exprs(0), exprs(1))
          case _ => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
        }, "built-in")
      reg.createOrReplaceTempFunction("bloom_might_contain",
        exprs => BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
    }
  }
}
