package graft

import org.apache.spark.sql.functions._

/** Boundary pins for the gated stream-stream FULL OUTER interval join
  * (`events_stream_join_full`). The two null-emission horizons were
  * discovered with probe corpora and are encoded in the oracle's WHERE
  * clause; these re-pin each probed fact so a Spark-version change in
  * the join's per-side state-eviction math fails HERE with a named
  * boundary instead of as an opaque driver hash mismatch:
  *
  *  1. an unmatched VIEW null-extends iff
  *     `imp_ts_us <= (wm_ms − 1800000) · 1000` (the left-outer horizon,
  *     re-checked through the full join), where
  *     `wm_ms = floor(min(maxView, maxClick)_us / 1000) − 600000`;
  *  2. an unmatched CLICK null-extends iff
  *     `clk_ts_us <= (wm_ms − 1) · 1000` — NO 30-minute term (click
  *     state only waits for views at-or-below its own instant) and a
  *     1 ms step (the watermark's granularity), non-strict µs at the
  *     boundary;
  *  3. both horizons ride the per-side-MIN watermark: a side with no
  *     rows pins it at epoch 0 and suppresses every null emission on
  *     BOTH sides.
  */
class StreamFullJoinSpec extends SparkSpec {

  private val T0 = 1704067200000000L // 2024-01-01 00:00 UTC in µs
  private val MINu = 60L * 1000000L

  private def corpus(rows: Seq[(Long, Long, Long, String)]): String = {
    import spark.implicits._
    val dir = TempLayouts.tracked("graft-fjspec").toString
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
      .attributionFullAvailableNow(spark, dir)
      .collect()
      .map(r => (
        if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    Caching.releaseAll(); spark.catalog.clearCache()
    out
  }

  test("click-side horizon: non-strict µs at (wm_ms − 1)·1000, no " +
    "30-minute term; view-side horizon unchanged at wm − 30min") {
    // sub-ms clock salt so the ms floor is exercised
    val maxTs = T0 + 200 * MINu + 700L
    val wmMs = maxTs / 1000L - 600000L
    val bC = (wmMs - 1L) * 1000L //          click boundary
    val bV = (wmMs - 1800000L) * 1000L //    view boundary
    val dir = corpus(Seq(
      (0L, maxTs, 999L, "view"), //  view-side clock (no clicks for 999)
      (1L, maxTs, 998L, "click"), // click-side clock (no views for 998)
      (10L, bC - 1L, 10L, "click"), //  inside: emitted
      (11L, bC, 11L, "click"), //       exactly at: EMITTED (non-strict)
      (12L, bC + 1L, 12L, "click"), //  1 µs past: withheld
      (13L, bC + 500L, 13L, "click"), // mid-ms past: withheld
      (14L, wmMs * 1000L - 1L, 14L, "click"), // wm − 1 µs: withheld
      (20L, bV, 20L, "view"), //       exactly at: emitted
      (21L, bV + 1L, 21L, "view"))) // 1 µs past: withheld
    assert(run(dir) === Set(
      (None, Some(10L)), (None, Some(11L)), (Some(20L), None)),
      "per-side emission horizons diverged from the pinned arithmetic")
  }

  test("an empty view side suppresses null emissions on BOTH sides") {
    val maxTs = T0 + 200 * MINu
    val dir = corpus(Seq(
      (1L, maxTs, 998L, "click"),
      (2L, T0, 1L, "click"))) // hours inside any single-stream horizon
    assert(run(dir).isEmpty,
      "null rows emitted although the view side never advanced its " +
        "watermark")
  }

  test("matched pairs emit regardless of horizons; each side " +
    "null-extends independently under its own") {
    val maxTs = T0 + 400 * MINu
    val wmMs = maxTs / 1000L - 600000L
    val bC = (wmMs - 1L) * 1000L
    val bV = (wmMs - 1800000L) * 1000L
    val dir = corpus(Seq(
      (0L, maxTs, 999L, "view"),
      (1L, maxTs, 998L, "click"),
      // user 1: a match near the head (both well past every horizon)
      (2L, maxTs - 5 * MINu, 1L, "view"),
      (3L, maxTs - 2 * MINu, 1L, "click"),
      // user 2: a click 31 min after the view — no match; the view is
      // inside the view horizon, the click inside the click horizon:
      // BOTH null-extend
      (4L, bV - 40 * MINu, 2L, "view"),
      (5L, bV - 9 * MINu, 2L, "click"),
      // user 3: unmatched click between the two horizons — inside the
      // click horizon (≤ bC) but a view there would be withheld
      (6L, bV + 10 * MINu, 3L, "click")))
    assert(run(dir) === Set(
      (Some(2L), Some(3L)),
      (Some(4L), None), (None, Some(5L)),
      (None, Some(6L))),
      "full-outer emission mix diverged")
  }
}
