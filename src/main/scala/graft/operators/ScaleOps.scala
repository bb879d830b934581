package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-out building blocks that don't change query semantics: skew
  * salting for hot keys. (AQE's skew-join handling covers the join case at
  * runtime; explicit salting remains the tool for aggregation skew and for
  * engines/configs without AQE.) */
object ScaleOps {

  /** Two-phase sum-by-key with salting: a hot key's rows are spread over
    * `buckets` sub-keys for the first (heavy) aggregation, then the small
    * per-(key, salt) partials are re-aggregated. Result is identical to a
    * direct `groupBy(key).sum` for EXACT measures (integer, decimal, or
    * grid-snapped doubles — see [[graft.queries.grid]]); for raw doubles
    * the re-grouping changes the floating-point addition order, so use the
    * grid first if bit-stable output is required.
    *
    * The salt derives from `monotonically_increasing_id`, so rows of the
    * same key land in different buckets regardless of their partitioning
    * (bucket assignment — not the exact-sum result — varies with partition
    * layout).
    */
  def saltedSum(df: DataFrame, key: String, value: Column,
                buckets: Int): DataFrame = {
    require(buckets > 0)
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(buckets)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(value).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("sum_value"))
  }
}
