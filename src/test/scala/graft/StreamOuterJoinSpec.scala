package graft

import org.apache.spark.sql.functions._

/** Boundary pins for the gated stream-stream LEFT OUTER interval join
  * (`events_stream_join_outer`). The emission arithmetic was discovered
  * with a probe corpus and is encoded in the oracle's horizon clause;
  * these corpora re-pin each probed fact so a Spark-version change in the
  * join's state-eviction math fails HERE with a named boundary instead of
  * as an opaque driver hash mismatch:
  *
  *  1. a null-extended view is emitted iff
  *     `imp_ts_us <= (floor(min(maxView, maxClick)_us / 1000) − 600000 −
  *     1800000) · 1000` — NON-STRICT at the boundary, µs-exact on the
  *     view side, ms-floored watermark;
  *  2. the watermark is PER-SIDE: the global watermark is the MIN of the
  *     two filtered streams' own maxima, so an empty click side pins it
  *     at epoch 0 and suppresses every null emission;
  *  3. inner matches are emitted regardless of any horizon.
  */
class StreamOuterJoinSpec extends SparkSpec {

  private val T0 = 1704067200000000L // 2024-01-01 00:00 UTC in µs
  private val MINu = 60L * 1000000L

  /** Write an events corpus (µs timestamps) and return its dir. */
  private def corpus(rows: Seq[(Long, Long, Long, String)]): String = {
    import spark.implicits._
    val dir = TempLayouts.tracked("graft-ojspec").toString
    rows.map { case (id, us, uid, et) => (id, us, uid, et, 1.0, """{"k":1}""") }
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def run(dir: String): Seq[(Long, Option[Long])] = {
    val out = graft.streaming.StreamingRun
      .attributionOuterAvailableNow(spark, dir)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSeq
    Caching.releaseAll(); spark.catalog.clearCache()
    out
  }

  test("outer emission boundary: non-strict at wm−30min, µs-exact view " +
    "side, ms-floored watermark from a sub-ms clock") {
    // clocks carry +700 µs so the ms floor is exercised, not just
    // ms-aligned data; both sides get one so the per-side min is the
    // shared max
    val maxTs = T0 + 200 * MINu + 700L
    val bnd = ((maxTs / 1000L) - 600000L - 1800000L) * 1000L
    val dir = corpus(Seq(
      (0L, maxTs, 999L, "click"), // click-side clock (no views for 999)
      (1L, maxTs, 998L, "view"), //  view-side clock (no clicks for 998)
      (2L, bnd, 1L, "view"), //      exactly at the boundary: EMITTED
      (3L, bnd + 1L, 2L, "view"), // 1 µs past: withheld
      (4L, bnd + 700L, 3L, "view"), // same ms as bnd but µs past: withheld
      (5L, bnd - 1L, 4L, "view"))) // inside: emitted
    assert(run(dir).toSet === Set(2L -> None, 5L -> None),
      "emission set diverged from the pinned eviction arithmetic")
  }

  test("the watermark is per-side: an empty click side suppresses every " +
    "null emission") {
    val maxTs = T0 + 200 * MINu
    val dir = corpus(Seq(
      (0L, maxTs, 998L, "view"),
      (1L, T0, 1L, "view"), // hours inside any single-stream horizon
      (2L, T0 + MINu, 2L, "view")))
    assert(run(dir).isEmpty,
      "null rows emitted although the click side never advanced its " +
        "watermark")
  }

  test("inner matches emit regardless of the horizon; unmatched views " +
    "inside it null-extend; trailing unmatched views never appear") {
    val maxTs = T0 + 200 * MINu
    val bnd = ((maxTs / 1000L) - 600000L - 1800000L) * 1000L
    val dir = corpus(Seq(
      (0L, maxTs, 999L, "click"),
      (1L, maxTs, 998L, "view"), // trailing unmatched: absent
      // user 1: view + click 10 min later — a match, view is PAST the
      // horizon too (emitted as the pair, not null-extended)
      (2L, maxTs - 5 * MINu, 1L, "view"),
      (3L, maxTs - 2 * MINu, 1L, "click"),
      // user 2: unmatched view inside the horizon
      (4L, bnd - MINu, 2L, "view"),
      // user 3: click 31 min after the view — outside the interval, so
      // the view null-extends (it is inside the horizon)
      (5L, bnd - 40 * MINu, 3L, "view"),
      (6L, bnd - 9 * MINu, 3L, "click")))
    assert(run(dir).toSet ===
      Set(2L -> Some(3L), 4L -> None, 5L -> None),
      "inner/outer emission mix diverged")
  }
}
