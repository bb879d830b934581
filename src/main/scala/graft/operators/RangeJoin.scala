package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval range join — an operator family Spark has no
  * native physical operator for (a naive formulation plans a cartesian /
  * broadcast-nested-loop join with an inequality condition, O(N·M)).
  *
  * Composition strategy (custom-operator preference (a): built from
  * existing ops): quantize time into fixed buckets, explode each interval
  * to the buckets it covers, equi-join points to intervals on the bucket,
  * then apply the exact containment predicate. A point carries exactly ONE
  * bucket, so a (point, interval) pair can match on at most one exploded
  * bucket — no post-join dedup is needed.
  *
  * Scale shape: the equi-join hash-partitions both sides by bucket — no
  * cross product anywhere; fan-out is bounded by interval_len/bucket + 1
  * rows per interval. Pick `bucketMicros` near the median interval length:
  * larger buckets mean fewer interval replicas but more false candidates
  * filtered after the join; at 100 TB both sides stay shuffle-partitioned
  * and AQE handles bucket skew (hot hours) like any other join key.
  */
object RangeJoin {

  /** Join `points` (with an event-time column `ptUs`, long micros) to
    * `intervals` (with `[startUs, endUs)` long-micros columns): returns
    * the inner join of all columns with `ptUs ∈ [startUs, endUs)`.
    * Column names must not collide across the two inputs. */
  def pointInInterval(points: DataFrame, ptUs: String,
                      intervals: DataFrame, startUs: String, endUs: String,
                      bucketMicros: Long): DataFrame = {
    // integer `div`, not `/` — the bucket index must be exact on longs
    val pts = points.withColumn("__bucket", expr(s"$ptUs div $bucketMicros"))
    val ivs = intervals.withColumn("__bucket",
      explode(sequence(expr(s"$startUs div $bucketMicros"),
        expr(s"($endUs - 1) div $bucketMicros"))))
    pts.join(ivs, "__bucket")
      .filter(col(ptUs) >= col(startUs) && col(ptUs) < col(endUs))
      .drop("__bucket")
  }
}
