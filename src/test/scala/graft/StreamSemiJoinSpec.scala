package graft

import org.apache.spark.sql.functions._

/** Boundary pins for the gated stream-stream LEFT SEMI interval join
  * (`events_stream_join_semi`). The claims the oracle depends on:
  *
  *  1. emission is EAGER — a view is emitted as soon as its first
  *     matching click is buffered, with no dependence on the watermark
  *     horizon (the inner-mode polarity, not the outer null-extension's
  *     eviction polarity) — so a single-batch drain is the batch semi
  *     join with no horizon clause;
  *  2. at-most-once — several matching clicks emit the view ONCE;
  *  3. the interval bounds are `clk_ts >= imp_ts` (non-strict) and
  *     `clk_ts < imp_ts + 30min` (strict), µs-exact;
  *  4. null-user views match nothing.
  */
class StreamSemiJoinSpec extends SparkSpec {

  private val T0 = 1704067200000000L // 2024-01-01 00:00 UTC in µs
  private val MINu = 60L * 1000000L

  private def corpus(rows: Seq[(Long, Long, java.lang.Long, String)])
      : String = {
    import spark.implicits._
    val dir = TempLayouts.tracked("graft-sjspec").toString
    rows.map { case (id, us, uid, et) =>
      (id, us, uid, et, 1.0, """{"k":1}""")
    }
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def run(dir: String): Seq[Long] = {
    val out = graft.streaming.StreamingRun
      .attributionSemiAvailableNow(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    Caching.releaseAll(); spark.catalog.clearCache()
    out
  }

  private def L(x: Long): java.lang.Long = java.lang.Long.valueOf(x)

  test("eager emission: matched views emit with no horizon; unmatched " +
    "views never emit") {
    // no watermark clock rows at all — if emission were eviction-driven,
    // nothing could ever emit (the watermark stays at epoch 0)
    val dir = corpus(Seq(
      (1L, T0, L(1L), "view"), //            matched below: emitted
      (2L, T0 + 10 * MINu, L(1L), "click"),
      (3L, T0, L(2L), "view"), //            no click for user 2: never
      (4L, T0 + 40 * MINu, L(3L), "view"), // user 3 click is BEFORE it
      (5L, T0, L(3L), "click")))
    assert(run(dir) == Seq(1L),
      "semi emission did not match the eager no-horizon contract")
  }

  test("at-most-once under multiple matching clicks") {
    val dir = corpus(Seq(
      (1L, T0, L(1L), "view"),
      (2L, T0 + MINu, L(1L), "click"),
      (3L, T0 + 2 * MINu, L(1L), "click"),
      (4L, T0 + 3 * MINu, L(1L), "click")))
    assert(run(dir) == Seq(1L), "view duplicated by multiple matches")
  }

  test("interval bounds: >= at the open, strict < at the close, µs-exact") {
    val dir = corpus(Seq(
      (1L, T0, L(1L), "view"), //  click AT imp_ts: matched (>=)
      (2L, T0, L(1L), "click"),
      (3L, T0, L(2L), "view"), //  click at close − 1 µs: matched
      (4L, T0 + 30 * MINu - 1L, L(2L), "click"),
      (5L, T0, L(3L), "view"), //  click exactly at close: NOT matched
      (6L, T0 + 30 * MINu, L(3L), "click")))
    assert(run(dir) == Seq(1L, 3L), "interval boundary polarity diverged")
  }

  test("null-user views match nothing") {
    val dir = corpus(Seq(
      (1L, T0, null, "view"),
      (2L, T0 + MINu, null, "click"),
      (3L, T0, L(1L), "view"),
      (4L, T0 + MINu, L(1L), "click")))
    assert(run(dir) == Seq(3L), "null-user rows joined")
  }
}
