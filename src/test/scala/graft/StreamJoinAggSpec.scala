package graft

import org.apache.spark.sql.functions._

/** Boundary pins for the gated CHAINED stateful pipeline
  * (`events_stream_join_agg`: stream-stream interval join → tumbling
  * windowed count, the multiple-stateful-operators topology). Probed
  * fact the oracle encodes: the downstream aggregation emits a window
  * iff `end_ms <= wm_ms − 1800000` — the global watermark DELAYED BY
  * THE JOIN'S LEFT-SIDE STATE RETENTION (the 30-minute interval width:
  * a view buffered that long can still produce joined rows inside the
  * window, so the agg cannot close it earlier), with the windowed-agg
  * NON-STRICT polarity at the boundary (δ = 30min exactly → emitted;
  * δ = 30min − 1ms → withheld; probed by the δ-sweep below). The
  * single-operator horizon (`end_ms <= wm_ms`) does NOT hold through
  * the chain — that is the behavior difference this spec exists to
  * pin. */
class StreamJoinAggSpec extends SparkSpec {

  private val T0 = 1704067200000000L // 2024-01-01 00:00 UTC in µs
  private val HOURu = 3600L * 1000000L
  private val MINu = 60L * 1000000L

  private def corpus(rows: Seq[(Long, Long, Long, String)]): String = {
    import spark.implicits._
    val dir = TempLayouts.tracked("graft-jaspec").toString
    rows.map { case (id, us, uid, et) => (id, us, uid, et, 1.0, """{"k":1}""") }
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def run(dir: String): Seq[(Long, Long, Long)] = {
    val out = graft.streaming.StreamingRun
      .joinAggAvailableNow(spark, dir)
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("wstart")
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L,
        r.getLong(1), r.getLong(2)))
      .toSeq
    Caching.releaseAll(); spark.catalog.clearCache()
    out
  }

  test("windows up to wm − 30min emit on a full drain, later ones are " +
    "withheld") {
    // clocks: both sides max out at T0 + 10h + 700µs (sub-ms salt)
    val maxTs = T0 + 10 * HOURu + 700L
    // global wm_ms = floor(maxTs/1000) − 600000 (10 min delay)
    val wmMs = maxTs / 1000L - 600000L
    // matched pairs (view+click same user, click 5 min after view), one
    // pair per hour window across the candidate horizon region:
    // windows ending at T0+1h .. T0+10h
    val rows = Seq.newBuilder[(Long, Long, Long, String)]
    rows += ((0L, maxTs, 999L, "view"))
    rows += ((1L, maxTs, 998L, "click"))
    for (h <- 0 until 10) {
      val uid = 100L + h
      val vt = T0 + h * HOURu + 10 * MINu
      rows += ((10L + 2 * h, vt, uid, "view"))
      rows += ((11L + 2 * h, vt + 5 * MINu, uid, "click"))
    }
    val got = run(corpus(rows.result())).sortBy(_._1)
    // wm = T0 + 590 min; horizon = wm − 30 min = T0 + 560 min, so the
    // windows ending T0+1h .. T0+9h emit and the T0+10h one is withheld
    assert(got === (0 until 9).map(h =>
      (T0 + h * HOURu, 1L, 5 * MINu)),
      "chained-agg emission set diverged from end <= wm − 30min")
  }

  test("exact boundary: δ = wm_ms − end_ms, non-strict at 30 min") {
    // one matched pair in the window [T0+9h, T0+10h) (end E); the clock
    // rows place wm_ms = E + δ for each probed δ (in ms)
    val E = (T0 + 10 * HOURu) / 1000L // window end in ms
    val sweep = for (deltaMs <- Seq(1799999L, 1800000L, 1800001L)) yield {
      val maxTs = (E + deltaMs + 600000L) * 1000L + 700L
      val vt = T0 + 9 * HOURu + 10 * MINu
      val got = run(corpus(Seq(
        (0L, maxTs, 999L, "view"),
        (1L, maxTs, 998L, "click"),
        (10L, vt, 100L, "view"),
        (11L, vt + 5 * MINu, 100L, "click"))))
      deltaMs -> got.nonEmpty
    }
    assert(sweep === Seq(1799999L -> false, 1800000L -> true,
      1800001L -> true),
      "the 30-minute join-delay boundary moved or changed polarity")
  }
}
