package graft

import graft.streaming.{SessIn, StreamingRun}
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The oracle-gated streaming sessionization (`events_stream_session`):
  * the emission contract the DuckDB oracle replays must be pinned against
  * the actual runtime, not assumed — in particular the event-time-timeout
  * BOUNDARY (strict `<` at millisecond granularity, with the microsecond
  * close time floored), which decides whether a user's final session
  * appears in the gate output at all. */
class StreamSessionSpec extends SparkSpec {

  private val T0 = 1704067200000L // 2024-01-01 00:00:00 UTC, ms

  private def in(uid: Long, us: Long, cents: Option[Long]): SessIn = {
    val t = new Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    SessIn(uid, t, us, cents)
  }

  test("timeout boundary is STRICT at ms granularity: watermark == close " +
    "emits nothing, watermark one ms past emits the session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SessIn]
    val q = StreamingRun.sessionizeByUser(ms.toDS()).toDF()
      .writeStream.format("memory").queryName("sess_boundary")
      .outputMode(OutputMode.Append()).start()
    try {
      // u1's lone event carries a 999 µs remainder: the timeout must be
      // set at the ms FLOOR of the close time (floor(ts_us/1000) + gap)
      ms.addData(in(1L, T0 * 1000L + 999L, Some(100L)))
      q.processAllAvailable()
      // u2 drives the watermark; after this batch wm = T0+40min−10min =
      // T0+30min — EXACTLY u1's floored timeout timestamp
      ms.addData(in(2L, (T0 + 40 * 60000L) * 1000L, Some(1L)))
      q.processAllAvailable()
      // the new wm only takes effect in the NEXT batch's timeout pass
      ms.addData(in(2L, (T0 + 40 * 60000L) * 1000L, Some(1L)))
      q.processAllAvailable()
      val atBoundary = spark.table("sess_boundary")
        .filter(col("user_id") === 1L).count()
      assert(atBoundary === 0L,
        "timeout fired at watermark == close: Spark's event-time timeout " +
          "is documented strict — the oracle's horizon clause relies on it")
      // one ms past the boundary: wm = T0+30min+1ms > timeout → fires
      ms.addData(in(2L, (T0 + 40 * 60000L + 1L) * 1000L, Some(1L)))
      q.processAllAvailable()
      ms.addData(in(2L, (T0 + 40 * 60000L + 1L) * 1000L, Some(1L)))
      q.processAllAvailable()
      val rows = spark.table("sess_boundary")
        .filter(col("user_id") === 1L)
        .select("start_us", "n_events", "sum_cents").collect()
      assert(rows.length === 1)
      assert(rows(0).getLong(0) === T0 * 1000L + 999L) // µs start preserved
      assert(rows(0).getLong(1) === 1L)
      assert(rows(0).getLong(2) === 100L)
    } finally q.stop()
  }

  test("a session closed by a successor event is emitted immediately, " +
    "and an all-null-value session sums to NULL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SessIn]
    val q = StreamingRun.sessionizeByUser(ms.toDS()).toDF()
      .writeStream.format("memory").queryName("sess_succ")
      .outputMode(OutputMode.Append()).start()
    try {
      // two null-valued events 10 min apart merge; the event 30 min and
      // one µs after the second (strictly past the gap — exactly 30 min
      // would MERGE under session_window's touching rule) closes the
      // session by succession — no watermark advance needed for emission
      ms.addData(in(7L, T0 * 1000L, None),
        in(7L, (T0 + 10 * 60000L) * 1000L, None),
        in(7L, (T0 + 40 * 60000L) * 1000L + 1L, Some(5L)))
      q.processAllAvailable()
      val rows = spark.table("sess_succ").collect()
      assert(rows.length === 1)
      assert(rows(0).getLong(0) === 7L)
      assert(rows(0).getLong(2) === 2L) // n_events
      assert(rows(0).isNullAt(3), "sum of an all-null session must be NULL")
    } finally q.stop()
  }

  private def thr(uid: Long, et: String, us: Long, id: Long)
      : graft.streaming.ThrIn = {
    val t = new Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    graft.streaming.ThrIn(uid, et, t, us, id)
  }

  test("throttle gap rule is strict (> gap keeps, == gap drops) and " +
    "state expiry does not change the kept set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[graft.streaming.ThrIn]
    val q = StreamingRun.throttleByKey(ms.toDS()).toDF()
      .writeStream.format("memory").queryName("thr_out")
      .outputMode(OutputMode.Append()).start()
    try {
      val base = T0 * 1000L
      val gapUs = 30L * 60 * 1000000L
      // in one batch: kept at base; base+gap EXACTLY is dropped (strict
      // >, the batch walk's rule); base+gap+1µs re-arms from the LAST
      // KEPT event, so it is kept; base+gap+2µs is then inside the new
      // gap and dropped
      ms.addData(
        thr(1L, "click", base, 10L),
        thr(1L, "click", base + gapUs, 11L),
        thr(1L, "click", base + gapUs + 1L, 12L),
        thr(1L, "click", base + gapUs + 2L, 13L))
      q.processAllAvailable()
      val kept1 = spark.table("thr_out").select("event_id").collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(kept1 === Seq(10L, 12L))
      // push the watermark far past lastKept+gap so the key's state
      // expires (u2 drives the wm; its own event is kept independently),
      // then a much later u1 event must still be kept — expiry is
      // invisible in the kept set
      ms.addData(thr(2L, "view", base + 10L * gapUs, 20L))
      q.processAllAvailable()
      ms.addData(thr(2L, "view", base + 10L * gapUs, 21L)) // timeout pass
      q.processAllAvailable()
      ms.addData(thr(1L, "click", base + 11L * gapUs, 30L))
      q.processAllAvailable()
      val keptAll = spark.table("thr_out").select("event_id").collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(keptAll === Seq(10L, 12L, 20L, 30L))
    } finally q.stop()
  }

  test("throttleAvailableNow equals the batch debounce-kept walk over " +
    "the streaming-timeline event set on the driver fixture") {
    val dir = "/root/testdata/sf0.001"
    val got = StreamingRun.throttleAvailableNow(spark, dir)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val batchEvents = Tables.events(spark, dir)
      .filter(col("ts").isNotNull &&
        col("ts") >= timestamp_micros(lit(0L)) && col("user_id").isNotNull)
    val expected = graft.queries.Events
      .debounceKept(batchEvents, gapUs = 1800000000L)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty)
    assert(got === expected,
      s"stream kept ${got.size} vs batch ${expected.size}; " +
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("attributionAvailableNow (stream-stream interval join) equals " +
    "the batch interval join on the driver fixture") {
    val dir = "/root/testdata/sf0.001"
    val got = StreamingRun.attributionAvailableNow(spark, dir)
      .select("imp_id", "clk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("ts") >= timestamp_micros(lit(0L)))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("imp_id"), col("user_id").as("u"),
        col("ts").as("imp_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("clk_id"), col("user_id").as("u2"),
        col("ts").as("clk_ts"))
    val expected = v.join(c, col("u") === col("u2") &&
        col("clk_ts") >= col("imp_ts") &&
        col("clk_ts") < col("imp_ts") + expr("INTERVAL 30 MINUTES"))
      .select("imp_id", "clk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty)
    assert(got === expected)
  }

  test("enrichAvailableNow (stream-static broadcast join) equals the " +
    "batch left join on the driver fixture") {
    val dir = "/root/testdata/sf0.001"
    val got = StreamingRun.enrichAvailableNow(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)))).toSet
    val ev = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("ts") >= timestamp_micros(lit(0L)))
      .select(col("event_id"), col("user_id"), col("event_type"))
    val dim = Tables.table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val expected = ev
      .join(dim, col("user_id") === col("c_custkey"), "left_outer")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_mktsegment"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)))).toSet
    assert(got.nonEmpty)
    assert(got.exists(_._4.isDefined), "no event actually enriched")
    assert(got === expected)
  }

  test("sessionAvailableNow matches the gaps-and-islands + horizon " +
    "oracle semantics on the driver fixture") {
    val dir = "/root/testdata/sf0.001"
    val got = StreamingRun.sessionAvailableNow(spark, dir)
      .select(col("user_id"),
        unix_micros(col("session_start").cast("timestamp")).as("start_us"),
        col("n_events"), col("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet

    // the oracle, mirrored in Spark: per-user gaps-and-islands sessions,
    // then the append-mode emission clause (closed-by-successor OR
    // ms-floored horizon strictly past the ms-floored close)
    val ev = Tables.events(spark, dir)
      .filter(col("ts").isNotNull &&
        col("ts") >= timestamp_micros(lit(0L)) && col("user_id").isNotNull)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("value"))
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val sess = ev
      .withColumn("new_session",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) > lit(1800000000L), 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_session"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val agg = sess.groupBy("user_id", "sid")
      .agg(min("us").as("start_us"), max("us").as("last_us"),
        count(lit(1)).as("n_events"),
        graft.queries.sumMoney(col("value")).as("sum_value"))
    val wmMs = ev.agg(max(col("us"))).head.getLong(0) / 1000L - 600000L
    val expected = agg
      .withColumn("last_sid",
        max("sid").over(Window.partitionBy("user_id")))
      .filter(col("sid") < col("last_sid") ||
        expr(s"last_us div 1000 + 1800000 < $wmMs"))
      .select(col("user_id"), col("start_us"), col("n_events"),
        col("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet

    assert(got.nonEmpty, "fixture produced no closed sessions")
    assert(got === expected,
      s"streaming emitted ${got.size} vs oracle-mirror ${expected.size}; " +
        s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  // ---- native session_window operator pins (events_stream_session_native)

  /** Drive the REAL session_window aggregation through MemoryStream. */
  private def drainNative(events: Seq[Seq[SessIn]], name: String)
      : Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SessIn]
    val agg = ms.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), unix_micros(col("sw.start")).as("s_us"),
        unix_micros(col("sw.end")).as("e_us"), col("n"))
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      events.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted
    } finally q.stop()
  }

  test("NATIVE session_window eviction is NON-strict at µs precision — " +
    "the opposite polarity of the GroupState timeout at the same boundary") {
    // ms-aligned end: u1's session end = T0+30min; driver u9 sets wm to
    // EXACTLY that instant (event at T0+40min). GroupState (strict <)
    // emits nothing here — the first test above pins that; the native
    // operator (windowed-agg <=) emits the session. The two gated
    // oracles encode exactly this divergence.
    val atBoundary = drainNative(Seq(
      Seq(in(1L, T0 * 1000L, Some(1L))),
      Seq(in(9L, (T0 + 40 * 60000L) * 1000L, Some(1L))),
      Seq(in(9L, (T0 + 40 * 60000L) * 1000L, Some(1L)))), "nat_b")
      .filter(_._1 == 1L)
    assert(atBoundary ===
      Seq((1L, T0 * 1000L, (T0 + 30 * 60000L) * 1000L, 1L)),
      "native operator must emit at wm == end (non-strict eviction)")
    // µs remainder: end = T0+30min + 999µs > wm·1000 → held back …
    val heldBack = drainNative(Seq(
      Seq(in(1L, T0 * 1000L + 999L, Some(1L))),
      Seq(in(9L, (T0 + 40 * 60000L) * 1000L, Some(1L))),
      Seq(in(9L, (T0 + 40 * 60000L) * 1000L, Some(1L)))), "nat_us")
      .filter(_._1 == 1L)
    assert(heldBack.isEmpty,
      "a session end 999µs past the watermark instant must be held")
    // … and one watermark ms later (wm·1000 = end+1µs) it is emitted:
    // the comparison is µs-exact against the ms-floored watermark
    val next = drainNative(Seq(
      Seq(in(1L, T0 * 1000L + 999L, Some(1L))),
      Seq(in(9L, (T0 + 40 * 60000L + 1L) * 1000L, Some(1L))),
      Seq(in(9L, (T0 + 40 * 60000L + 1L) * 1000L, Some(1L)))), "nat_us2")
      .filter(_._1 == 1L)
    assert(next.map(t => (t._1, t._2, t._4)) ===
      Seq((1L, T0 * 1000L + 999L, 1L)))
  }

  test("NATIVE session_window holds a successor-closed session until the " +
    "watermark passes its end — no closed-by-successor emission") {
    // u3: T0, then T0+30min+1µs (strictly past gap → new session). The
    // GroupState walk emits the first session immediately (pinned
    // above); the native operator's state still holds BOTH sessions
    // because wm = T0+20min+1µs−10min < first end — so the gate oracles
    // must differ exactly here (no sid < last_sid clause native-side).
    val r = drainNative(Seq(
      Seq(in(3L, T0 * 1000L, Some(1L)),
        in(3L, (T0 + 30 * 60000L) * 1000L + 1L, Some(1L))),
      Seq(in(3L, (T0 + 30 * 60000L) * 1000L + 1L, Some(1L)))), "nat_succ")
    assert(r.isEmpty,
      "successor-closed session emitted before its watermark horizon")
  }

  test("NATIVE session_window merges touching sessions (shared edge) — " +
    "the same merge rule every session oracle encodes") {
    // events exactly gap apart merge: [T0, T0+30m) touches [T0+30m, …)
    // — drive the watermark far past so the merged session emits once
    val r = drainNative(Seq(
      Seq(in(4L, T0 * 1000L, Some(1L)),
        in(4L, (T0 + 30 * 60000L) * 1000L, Some(1L))),
      Seq(in(9L, (T0 + 200 * 60000L) * 1000L, Some(1L))),
      Seq(in(9L, (T0 + 200 * 60000L) * 1000L, Some(1L)))), "nat_merge")
      .filter(_._1 == 4L)
    assert(r === Seq((4L, T0 * 1000L, (T0 + 60 * 60000L) * 1000L, 2L)),
      "touching pair must merge into one [T0, T0+60min) session of 2")
  }
}
