package graft

import org.apache.spark.sql.functions._

/** Boundary pins for the gated stream-stream RIGHT OUTER interval join
  * (`events_stream_join_right`). The click-side null-emission horizon
  * was pinned for the FULL join by `StreamFullJoinSpec`; the right
  * join shares the click-state machinery, but the gate's oracle clause
  * deserves its own probe through the rightOuter mode rather than an
  * inherited assumption:
  *
  *  1. an unmatched CLICK null-extends iff
  *     `clk_ts_us <= (wm_ms − 1) · 1000` — NO 30-minute term, 1 ms
  *     watermark tick, non-strict µs at the boundary — where
  *     `wm_ms = floor(min(maxView, maxClick)_us / 1000) − 600000`;
  *  2. unmatched VIEWS are never emitted in any form (the asymmetry
  *     that distinguishes rightOuter from fullOuter);
  *  3. the per-side-MIN watermark: an empty view side pins the global
  *     watermark at epoch 0 and suppresses every null emission.
  */
class StreamRightJoinSpec extends SparkSpec {

  private val T0 = 1704067200000000L // 2024-01-01 00:00 UTC in µs
  private val MINu = 60L * 1000000L

  private def corpus(rows: Seq[(Long, Long, Long, String)]): String = {
    import spark.implicits._
    val dir = TempLayouts.tracked("graft-rjspec").toString
    rows.map { case (id, us, uid, et) => (id, us, uid, et, 1.0, """{"k":1}""") }
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def run(dir: String): Set[(Option[Long], Option[Long])] = {
    val out = graft.streaming.StreamingRun
      .attributionRightAvailableNow(spark, dir)
      .collect()
      .map(r => (
        if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    Caching.releaseAll(); spark.catalog.clearCache()
    out
  }

  test("click-side horizon through rightOuter: non-strict µs at " +
    "(wm_ms − 1)·1000, no 30-minute term; views never null-extend") {
    // sub-ms clock salt so the ms floor is exercised
    val maxTs = T0 + 200 * MINu + 700L
    val wmMs = maxTs / 1000L - 600000L
    val bC = (wmMs - 1L) * 1000L // click boundary
    val dir = corpus(Seq(
      (0L, maxTs, 999L, "view"), //  view-side clock (no clicks for 999)
      (1L, maxTs, 998L, "click"), // click-side clock (no views for 998)
      (10L, bC - 1L, 10L, "click"), //  inside: emitted
      (11L, bC, 11L, "click"), //       exactly at: EMITTED (non-strict)
      (12L, bC + 1L, 12L, "click"), //  1 µs past: withheld
      (13L, wmMs * 1000L - 1L, 13L, "click"), // wm − 1 µs: withheld
      (20L, T0, 20L, "view"), //        unmatched view: NEVER emitted
      (30L, T0, 31L, "view"), //        matched pair: always emitted
      (31L, T0 + 5 * MINu, 31L, "click")))
    assert(run(dir) === Set(
      (None, Some(10L)), (None, Some(11L)), (Some(30L), Some(31L))),
      "right-outer click horizon diverged from the pinned arithmetic")
  }

  test("an empty view side suppresses click null emissions") {
    val maxTs = T0 + 200 * MINu
    val dir = corpus(Seq(
      (1L, maxTs, 998L, "click"),
      (2L, T0, 1L, "click"))) // hours inside any single-stream horizon
    assert(run(dir) === Set.empty,
      "an empty view side must pin the watermark at epoch 0")
  }
}
