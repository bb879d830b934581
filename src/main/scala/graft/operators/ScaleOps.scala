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
    * The salt is `pmod(xxhash64(<all row columns>, seed), buckets)` — a
    * pure function of row CONTENT, so bucket assignment is stable under
    * repartitioning and task retry (a `monotonically_increasing_id` salt
    * depends on partition layout and changes when a task re-runs mid-
    * pipeline). Duplicate rows hash to the same bucket, which is harmless
    * for sums; a hot key spreads as long as its rows differ anywhere.
    */
  def saltedSum(df: DataFrame, key: String, value: Column,
                buckets: Int, seed: Long = 42L): DataFrame = {
    require(buckets > 0)
    val rowHash = xxhash64(df.columns.map(col) :+ lit(seed): _*)
    df.withColumn("__salt", pmod(rowHash, lit(buckets.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(value).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("sum_value"))
  }

  /** Skew-proof inner equi-join: the (skewed) fact side is salted by a
    * content hash into `buckets` sub-keys; the dim side is replicated
    * once per salt via `explode(sequence(...))`; the join key becomes
    * (key, salt). A hot fact key's rows land in `buckets` shuffle
    * partitions instead of one straggler task. The result is EXACTLY
    * `fact ⋈ dim` on `key` (each fact row still matches its dim row
    * exactly once — at its own salt), so correctness never depends on
    * the salt. Cost: the dim side shuffles `buckets`× its size — size
    * `buckets` to the skew, not the cluster, and only reach for this
    * when the dim is too big to broadcast AND AQE's runtime skew split
    * can't see the skew (first-shuffle skew, stream side, AQE off).
    * Fact and dim column names (other than `key`) must be disjoint.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 buckets: Int, seed: Long = 42L): DataFrame = {
    require(buckets > 0)
    val rowHash = xxhash64(fact.columns.map(col) :+ lit(seed): _*)
    val saltedFact = fact
      .withColumn("__salt", pmod(rowHash, lit(buckets.toLong)))
    val replDim = dim
      .withColumn("__salt",
        explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedFact.join(replDim, Seq(key, "__salt")).drop("__salt")
  }
}
