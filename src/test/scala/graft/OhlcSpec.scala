package graft

import org.apache.spark.sql.functions._

/** Pins for `events_ohlc_hourly`: bar semantics on a hand-built series
  * (open = value at the (ts, event_id, v)-smallest row, close at the
  * largest — including the duplicate-(ts,id) tie the v component
  * breaks), and the scale-shape audit (one aggregate, no Window). */
class OhlcSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1704067200000000L // 2024-01-01 00:00 UTC in µs

  private def corpus(rows: Seq[(Long, Long, Double)]): String = {
    val dir = TempLayouts.tracked("graft-ohlc").toString
    rows.map { case (id, us, v) => (id, us, 7L, "view", v, """{"k":1}""") }
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .repartition(3) // argmin must survive multi-partition combining
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("bar semantics: open/high/low/close/n, duplicate-(ts,id) ties") {
    val dir = corpus(Seq(
      // hour 0: plain series
      (1L, T0 + 60_000_000L, 5.0), //  open (earliest)
      (2L, T0 + 120_000_000L, 9.0), // high
      (3L, T0 + 180_000_000L, 1.0), // low
      (4L, T0 + 240_000_000L, 7.0), // close (latest)
      // hour 1: duplicate (ts, event_id) rows — v breaks the tie:
      // open = smallest v of the dup pair, close = largest
      (10L, T0 + 3660_000_000L, 4.0),
      (10L, T0 + 3660_000_000L, 2.0)))
    val got = graft.queries.Events.queries("events_ohlc_hourly")(spark, dir)
      .collect().map(r => (r.getLong(5), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got === Seq(
      (4L, 5.0, 9.0, 1.0, 7.0), //  hour 0: n, open, high, low, close
      (2L, 2.0, 4.0, 2.0, 4.0))) // hour 1: dup tie → open 2.0, close 4.0
  }

  test("null event_id on an exact-ts tie: sentinel coalesce loses the " +
    "open pick and wins the close pick (DuckDB NULLS LAST/FIRST parity)") {
    val dir = TempLayouts.tracked("graft-ohlc").toString
    Seq((Option(5L), T0 + 60_000_000L, 8.0),
        (Option.empty[Long], T0 + 60_000_000L, 3.0))
      .map { case (id, us, v) => (id, us, 7L, "view", v, """{"k":1}""") }
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.queries.Events.queries("events_ohlc_hourly")(spark, dir)
      .collect().map(r => (r.getLong(5), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    // ASC: id 5 < MaxValue sentinel → open is the non-null row (8.0);
    // DESC: sentinel wins → close is the null-id row (3.0) — the exact
    // placements DuckDB's ASC NULLS LAST / DESC NULLS FIRST give
    assert(got === Seq((2L, 8.0, 8.0, 3.0, 3.0)))
  }

  test("events_cdc_apply: null event_id on an exact-ts tie wins the " +
    "last-op argmax via the MaxValue sentinel (both engines agree by " +
    "construction — Spark's struct-max alone would have LOST the null)") {
    val dir = TempLayouts.tracked("graft-cdc").toString
    // same user, identical ts: a real-id upsert (3.0) vs a null-id
    // upsert (7.0). coalesce(event_id, MaxValue) makes the null-id row
    // the argmax in Spark's struct comparator, exactly where DuckDB's
    // `event_id DESC` puts it — the snapshot value must be 7.0. An
    // uncoalesced struct would sort the null field SMALLEST and pick
    // 3.0, silently diverging from the oracle.
    Seq((Option(5L), T0 + 60_000_000L, Option(3.0)),
        (Option.empty[Long], T0 + 60_000_000L, Option(7.0)),
        // second user: null-id TOMBSTONE on the tie — op rides after
        // event_id in the key, so the null-id delete wins and the key
        // is absent from the snapshot
        (Option(6L), T0 + 60_000_000L, Option(4.0)))
      .zipWithIndex
      .map { case ((id, us, v), i) =>
        val user = if (i < 2) 7L else 8L
        (id, us, user, "view", v, """{"k":1}""") }
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // add the user-8 null-id tombstone at the same ts
    val extra = Seq((Option.empty[Long], T0 + 60_000_000L, 8L, "view",
      Option.empty[Double], """{"k":1}"""))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    extra.write.mode("append").parquet(s"$dir/events.parquet")
    val got = graft.queries.Events.queries("events_cdc_apply")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(4))).toSeq
    // user 7: null-id upsert wins → 7.0; user 8: null-id tombstone wins
    // → key absent
    assert(got === Seq((7L, 7.0)))
  }

  test("plan shape: one aggregate, no Window, no sort before the agg") {
    val dir = corpus(Seq((1L, T0, 5.0)))
    val plan = graft.queries.Events.queries("events_ohlc_hourly")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "OHLC must ride the struct-extremum aggregate, not a window")
  }
}
