package graft

import org.apache.spark.sql.functions._

/** Boundary pins for the gated CHAINED DEDUP → WINDOWED AGGREGATION
  * (`events_stream_dedup_agg`: `dropDuplicatesWithinWatermark` over the
  * whole row identity feeding an hourly tumbling rollup in one
  * topology — the at-least-once-ingest production pair of the
  * multiple-stateful-operators family).
  *
  * The δ-sweep exists because ASSUMING the downstream horizon is
  * exactly how a chained oracle goes wrong: join→agg carries a
  * 30-minute state-retention delay, agg→agg carries none — the
  * polarity is per-upstream-operator. PROBED RESULT pinned here: dedup
  * → agg carries NO delay (the hourly window emits iff
  * `end_ms <= wm_ms`, non-strict; δ = 0 → emitted, δ = −1 ms →
  * withheld), because the dedup operator is pass-through on first
  * sight — it buffers suppression keys, never rows. */
class StreamDedupAggSpec extends SparkSpec {

  private val T0 = 1704067200000000L // 2024-01-01 00:00 UTC in µs
  private val HOURu = 3600L * 1000000L

  private def corpus(rows: Seq[(Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = TempLayouts.tracked("graft-daspec").toString
    rows.map { case (id, us, et, v) =>
      (id, us, 7L, et, v, """{"k":1}""") }
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .repartition(3) // dedup must survive multi-partition ingest
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def run(dir: String): Seq[(Long, String, Long, Double)] = {
    val out = graft.streaming.StreamingRun
      .dedupAggAvailableNow(spark, dir)
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("wstart")
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L,
        r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
      .toSeq
    Caching.releaseAll(); spark.catalog.clearCache()
    out
  }

  test("exact boundary: the hourly window emits at wm == hour end " +
    "(δ = 0) and is withheld one ms before — no chain delay from the " +
    "dedup operator, non-strict polarity") {
    val E = (T0 + HOURu) / 1000L // hour-0 end in ms
    for ((deltaMs, expectEmit) <- Seq(-1L -> false, 0L -> true,
      1L -> true, 1800000L -> true)) {
      // driver row pins wm_ms = E + δ (sub-ms salt exercises the floor)
      val maxTs = (E + deltaMs + 600000L) * 1000L + 700L
      val rows = Seq(
        (1L, T0 + 10L, "view", 2.0),
        (1L, T0 + 10L, "view", 2.0), // exact redelivery — must collapse
        (2L, T0 + 30 * 60000000L, "view", 3.0),
        (9L, maxTs, "click", 1.0))
      val hour0 = run(corpus(rows)).filter(t => t._1 == T0 && t._2 == "view")
      assert(hour0.nonEmpty === expectEmit,
        s"δ=$deltaMs ms: expected emit=$expectEmit, got $hour0")
      if (expectEmit)
        assert(hour0 === Seq((T0, "view", 2L, 5.0)),
          s"δ=$deltaMs ms: the redelivered row must count ONCE")
    }
  }

  test("dedup key is the whole row identity: same event_id with a " +
    "different payload is NOT a duplicate; byte-identical rows collapse " +
    "across partitions") {
    val rows = Seq(
      (1L, T0 + 10L, "view", 2.0),
      (1L, T0 + 10L, "view", 2.0),   // exact dup → dropped
      (1L, T0 + 10L, "view", 9.0),   // same id, new value → kept
      (1L, T0 + 20L, "view", 2.0),   // same id, new ts → kept
      (1L, T0 + 10L, "click", 2.0),  // same id, new type → kept
      (9L, T0 + 3 * HOURu, "click", 1.0))
    val got = run(corpus(rows)).filter(_._1 == T0).sorted
    assert(got === Seq(
      (T0, "click", 1L, 2.0),
      (T0, "view", 3L, 13.0)))
  }

  test("the flush batch cascades through both stateful operators: " +
    "dedup state and window state both evict on the final watermark") {
    // the only data is in hour 0; wm (max − 10min) passes the hour end
    // only via the second event — one drain, both operators close
    val rows = Seq(
      (1L, T0 + 5 * 60000000L, "view", 4.0),
      (1L, T0 + 5 * 60000000L, "view", 4.0),
      (9L, T0 + 2 * HOURu, "click", 1.0))
    val got = run(corpus(rows)).filter(t => t._1 == T0)
    assert(got === Seq((T0, "view", 1L, 4.0)))
  }
}
