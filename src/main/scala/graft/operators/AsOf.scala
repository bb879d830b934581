package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every probe row, the most recent build-side value at or
  * before the probe time, per key.
  *
  * Implemented as the scalable union+window formulation: tag both streams,
  * union them, and take the running last non-null build value per key in
  * time order — one shuffle on the key and one window pass, independent of
  * how many build rows precede each probe row (a naive range join is
  * O(probe × matching-range)). Ties: build rows sort before probe rows at
  * the same instant (inclusive as-of); equal-time build rows resolve to
  * the greatest value, making the result total. Null probe times sort
  * FIRST (Spark's ASC default — the oracle mirrors it with NULLS FIRST):
  * a probe row with no timestamp precedes every build row and so matches
  * nothing, surfacing a null asof_value — the enrichment analog of the
  * "null ts is off the timeline" contract. */
object AsOf {

  /** @param probe (key, time, id) rows asking "latest value as of time"
    * @param build (key, time, value) rows providing the values
    * @return (id, key, time, asof_value) — asof_value null when no build
    *         row at or before the probe time exists for the key */
  def lastValueAsOf(probe: DataFrame, probeKey: String, probeTime: String,
                    probeId: String, build: DataFrame, buildKey: String,
                    buildTime: String, buildVal: String): DataFrame = {
    // null placeholders typed from the actual schemas so the union never
    // coerces (works for any orderable value/id type, not just long)
    val valType = build.schema(buildVal).dataType
    val idType = probe.schema(probeId).dataType
    val p = probe.select(col(probeKey).as("k"), col(probeTime).as("t"),
      col(probeId).as("id"), lit(null).cast(valType).as("v"),
      lit(0).as("side"))
    val b = build.select(col(buildKey).as("k"), col(buildTime).as("t"),
      lit(null).cast(idType).as("id"), col(buildVal).as("v"),
      lit(1).as("side"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t").asc, col("side").desc, col("v").asc_nulls_first)
      .rowsBetween(Long.MinValue, Window.currentRow)
    p.union(b)
      .withColumn("asof_value", last(col("v"), ignoreNulls = true).over(w))
      .filter(col("side") === 0)
      .select(col("id"), col("k"), col("t"), col("asof_value"))
  }

  /** FORWARD as-of join: for every probe row, the EARLIEST build-side
    * value at or after the probe time, per key — the next-touch /
    * time-to-next-maintenance direction [[lastValueAsOf]] cannot express.
    *
    * The same union+window shape mirrored: one shuffle on the key, one
    * window pass with the frame opened FORWARD (`[current row, ∞)`) and
    * `first` ignoreNulls instead of `last`. Ordering mirrors too, with
    * one deliberate asymmetry: null probe times sort LAST here (not
    * first) — in a forward frame a null-t row must have nothing after it,
    * or it would claim every build row; either way the contract is the
    * same, a probe with no timestamp is off the timeline and matches
    * nothing. Ties: probe rows sort BEFORE build rows at the same instant
    * (side asc — inclusive as-of), equal-time build rows resolve to the
    * SMALLEST value (v asc, the first non-null in frame order), making
    * the result total. Null-time build rows also sort last; exclude them
    * upstream (a valueless instant provides nothing — the attribution
    * gates' filter) or they become reachable from null-t probes only. */
  def firstValueAsOf(probe: DataFrame, probeKey: String, probeTime: String,
                     probeId: String, build: DataFrame, buildKey: String,
                     buildTime: String, buildVal: String): DataFrame = {
    val valType = build.schema(buildVal).dataType
    val idType = probe.schema(probeId).dataType
    val p = probe.select(col(probeKey).as("k"), col(probeTime).as("t"),
      col(probeId).as("id"), lit(null).cast(valType).as("v"),
      lit(0).as("side"))
    val b = build.select(col(buildKey).as("k"), col(buildTime).as("t"),
      lit(null).cast(idType).as("id"), col(buildVal).as("v"),
      lit(1).as("side"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t").asc_nulls_last, col("side").asc,
        col("v").asc_nulls_last)
      .rowsBetween(Window.currentRow, Long.MaxValue)
    p.union(b)
      .withColumn("asof_value", first(col("v"), ignoreNulls = true).over(w))
      .filter(col("side") === 0)
      .select(col("id"), col("k"), col("t"), col("asof_value"))
  }
}
