package graft

import org.apache.spark.sql.functions._

/** Boundary pins for the gated CHAINED WINDOWED AGGREGATIONS
  * (`events_stream_agg_agg`: hourly tumbling → daily re-agg via
  * `window(window_time(w), '1 day')` in one topology). Probed fact the
  * oracle encodes: the chain carries NO watermark delay — a daily
  * window emits iff `end_ms <= wm_ms`, the plain single-operator
  * windowed-agg horizon with its non-strict polarity (δ = 0 → emitted,
  * δ = −1 ms → withheld). This is the OPPOSITE finding to the join→agg
  * chain (horizon delayed by the join's 30-minute state retention,
  * `StreamJoinAggSpec`): an upstream windowed agg evicts rows whose
  * event time (w.end − 1µs) is already behind the evicting watermark,
  * so the downstream day closes on the same watermark — nothing
  * upstream can still produce in-day rows once the day end is reached,
  * where a buffered join input can. The δ-sweep exists because
  * ASSUMING either behavior is exactly how a chained oracle goes
  * wrong. */
class StreamAggAggSpec extends SparkSpec {

  private val T0 = 1704067200000000L // 2024-01-01 00:00 UTC in µs
  private val HOURu = 3600L * 1000000L
  private val DAYu = 24L * HOURu

  private def corpus(rows: Seq[(Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = TempLayouts.tracked("graft-aaspec").toString
    rows.zipWithIndex.map { case ((uid, us, et, v), i) =>
      (i.toLong, us, uid, et, v, """{"k":1}""") }
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def run(dir: String): Seq[(Long, String, Long, Long, Double)] = {
    val out = graft.streaming.StreamingRun
      .aggAggAvailableNow(spark, dir)
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("day")
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L,
        r.getString(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))
      .toSeq
    Caching.releaseAll(); spark.catalog.clearCache()
    out
  }

  test("exact boundary: daily window emits at wm == day end (δ = 0) and " +
    "is withheld one ms before — no chain delay, non-strict polarity") {
    val E = (T0 + DAYu) / 1000L // day-0 end in ms
    for ((deltaMs, expectEmit) <- Seq(-1L -> false, 0L -> true,
      1L -> true, 1800000L -> true)) {
      // driver row pins wm_ms = E + δ (sub-ms salt exercises the floor)
      val maxTs = (E + deltaMs + 600000L) * 1000L + 700L
      val rows = Seq(
        (1L, T0 + 10L, "view", 2.0),
        (1L, T0 + 5 * HOURu, "view", 3.0),
        (1L, T0 + 23 * HOURu, "view", 4.0),
        (9L, maxTs, "click", 1.0))
      val day0 = run(corpus(rows)).filter(t => t._1 == T0 && t._2 == "view")
      assert(day0.nonEmpty === expectEmit,
        s"δ=$deltaMs ms: expected emit=$expectEmit, got $day0")
      if (expectEmit)
        assert(day0 === Seq((T0, "view", 3L, 3L, 9.0)),
          s"δ=$deltaMs ms: daily content must roll all 3 hourly rows up")
    }
  }

  test("the flush batch cascades: an hour ending exactly at the day end " +
    "is evicted upstream AND aggregated downstream in one drain") {
    // last event in hour 23 → that hour's end == day end == wm exactly
    val E = (T0 + DAYu) / 1000L
    val rows = Seq(
      (1L, T0 + 23 * HOURu + 30 * 60000000L, "view", 5.0),
      (9L, (E + 600000L) * 1000L, "click", 1.0))
    val day0 = run(corpus(rows)).filter(t => t._1 == T0 && t._2 == "view")
    assert(day0 === Seq((T0, "view", 1L, 1L, 5.0)))
  }

  test("multi-day emission set and per-type isolation: closed days emit " +
    "per (day, type); the open day is withheld entirely") {
    // day 0: 2 views + 1 click; day 1: 1 view; wm lands mid-day-1
    val rows = Seq(
      (1L, T0 + HOURu, "view", 1.0),
      (2L, T0 + 2 * HOURu, "view", 2.0),
      (3L, T0 + 3 * HOURu, "click", 10.0),
      (4L, T0 + DAYu + HOURu, "view", 7.0),
      (9L, T0 + DAYu + 20 * HOURu, "click", 1.0))
    val got = run(corpus(rows)).sorted
    assert(got === Seq(
      (T0, "click", 1L, 1L, 10.0),
      (T0, "view", 2L, 2L, 3.0)),
      "only day-0 groups may emit; the open day 1 must be withheld")
  }
}
