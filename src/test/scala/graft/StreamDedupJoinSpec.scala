package graft

import org.apache.spark.sql.functions._

/** Boundary pins for the gated CHAINED DEDUP → STREAM-STREAM INTERVAL
  * JOIN (`events_stream_dedup_join`: a 2×-redelivered view stream
  * through `dropDuplicatesWithinWatermark`, then the 30-minute interval
  * join to clicks — the last pair of the multiple-stateful-operators
  * family).
  *
  * The probe exists because ASSUMING the chain's emission contract is
  * how a chained oracle goes wrong (join→agg carries a 30-minute
  * delayed horizon; agg→agg and dedup→agg carry none). PROBED RESULT
  * pinned here: dedup→join has NO horizon at all — inner-join matches
  * emit EAGERLY on first match, so a pair at the very end of the
  * timeline (where the watermark never reaches: wm = max − 10min is
  * BEHIND the pair's own instants) is still emitted, and the dedup
  * stage is pass-through on first sight, so a single-data-batch
  * AvailableNow drain is complete with no horizon clause in the
  * oracle. */
class StreamDedupJoinSpec extends SparkSpec {

  private val T0 = 1704067200000000L // 2024-01-01 00:00 UTC in µs
  private val MINu = 60L * 1000000L

  private def corpus(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = TempLayouts.tracked("graft-djspec").toString
    rows.map { case (id, us, uid, et, v) =>
      (id, us, uid, et, v, """{"k":1}""") }
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .repartition(3) // dedup must survive multi-partition ingest
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def run(dir: String): Seq[(Long, Long)] = {
    val out = graft.streaming.StreamingRun
      .dedupJoinAvailableNow(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    Caching.releaseAll(); spark.catalog.clearCache()
    out
  }

  test("no emission horizon: a matched pair at the END of the timeline " +
    "(wm = max − 10min is behind both instants) still emits, exactly " +
    "once despite the 2x redelivery") {
    // the only events ARE the pair: wm = ms-floored max(ts) − 10min sits
    // 10 minutes BEHIND the click — a windowed agg would withhold; the
    // inner join must emit eagerly
    val rows = Seq(
      (1L, T0, 7L, "view", 2.0),
      (2L, T0 + 5 * MINu, 7L, "click", 1.0))
    assert(run(corpus(rows)) === Seq((1L, 2L)))
  }

  test("the redelivery union is collapsed by the in-topology dedup: " +
    "interval semantics match the plain inner join gate (>= start, " +
    "< end), one output row per (view, click) pair") {
    val rows = Seq(
      (1L, T0, 7L, "view", 2.0),
      (2L, T0 + 29 * MINu, 7L, "click", 1.0),  // inside [t, t+30min)
      (3L, T0 + 30 * MINu, 7L, "click", 1.0),  // exactly at end — excluded
      (4L, T0 - 1L, 7L, "click", 1.0),         // before the view — excluded
      (5L, T0 + 5 * MINu, 8L, "view", 1.0),    // other user — no click
      (9L, T0 + 60 * MINu, 6L, "click", 1.0))  // clock, no matching view
    assert(run(corpus(rows)) === Seq((1L, 2L)))
  }

  test("dedup key is the whole projected row identity: a same-id view " +
    "with a different value is a DIFFERENT event and joins separately; " +
    "byte-identical corpus duplicates collapse like the redelivery") {
    val rows = Seq(
      (1L, T0, 7L, "view", 2.0),
      (1L, T0, 7L, "view", 2.0), // byte-identical corpus dup → one event
      (1L, T0, 7L, "view", 9.0), // same id, different payload → second event
      (2L, T0 + MINu, 7L, "click", 1.0))
    // two distinct view identities × one click = the pair TWICE
    assert(run(corpus(rows)) === Seq((1L, 2L), (1L, 2L)))
  }

  test("NULL user views never pair (join equality is null-rejecting), " +
    "and null-field dedup keys collapse as equal — mirrored by the " +
    "oracle's DISTINCT") {
    import spark.implicits._
    val dir = TempLayouts.tracked("graft-djspec").toString
    Seq(
      (Some(1L), T0, None: Option[Long], "view", 2.0),
      (Some(2L), T0 + MINu, Some(7L), "click", 1.0),
      (Some(3L), T0, Some(7L), "view", 2.0))
      .map { case (id, us, uid, et, v) =>
        (id, us, uid, et, v, """{"k":1}""") }
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(run(dir) === Seq((3L, 2L)))
  }

  test("gate output equals the Spark batch twin (DISTINCT views ⋈ " +
    "clicks) on the driver fixture — the oracle's algebra, one engine") {
    val d = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, d)
      .filter(col("ts").isNotNull &&
        col("ts") >= timestamp_micros(lit(0L)))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("imp_id"), col("user_id"),
        col("ts").as("imp_ts"), col("value")).distinct()
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("clk_id"),
        col("user_id").as("cu"), col("ts").as("clk_ts"))
    val twin = v.join(c, col("user_id") === col("cu") &&
        col("clk_ts") >= col("imp_ts") &&
        col("clk_ts") < col("imp_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("imp_id"), col("clk_id"))
      .orderBy(col("imp_id"), col("clk_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(run(d) === twin)
    assert(twin.nonEmpty, "fixture must exercise the join")
  }
}
