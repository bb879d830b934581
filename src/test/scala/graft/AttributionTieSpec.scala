package graft

import org.apache.spark.sql.functions._

/** Tie-break pins for `events_attribution` on a hand-built corpus with
  * deliberate equal-instant and equal-time collisions — the cases no
  * driver-fixture instant exercises (order dates are midnights, event
  * clocks carry µs remainders), closing the round-10 ADVICE finding that
  * the as-of tie-break was gated only vacuously. The corpus is written
  * through the SHIFT the gated query applies (raw event ts = desired
  * effective instant + 9,862 days), so what executes is the gated plan
  * verbatim:
  *
  *  - an event AT the order's exact instant attributes (inclusive as-of:
  *    build rows sort before probe rows at equal time);
  *  - equal-time events resolve to the MAX event type (v asc under
  *    last_value);
  *  - later events never attribute; orders before every event (and
  *    customers with no events) roll into 'none'.
  */
class AttributionTieSpec extends SparkSpec {

  test("equal-instant and equal-time-multi-event attribution ties") {
    import spark.implicits._
    val dir = TempLayouts.tracked("graft-attrib").toString
    val d0 = java.time.LocalDateTime.of(1997, 3, 10, 0, 0)
    def micros(t: java.time.LocalDateTime): Long =
      t.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
        t.getNano / 1000L
    def rawEvent(effective: java.time.LocalDateTime): Long =
      micros(effective.plusDays(9862))

    // orders: (key, custkey, date, price)
    Seq(
      (10L, 1L, d0, 100.0), // user 1: two events AT the order instant
      (20L, 2L, d0, 200.0), // user 2: event 1µs before + 1µs after
      (30L, 3L, d0, 400.0), // user 3: no events at all -> none
      (40L, 4L, d0, 800.0), // user 4: equal-time pair strictly before
      (50L, 5L, d0.minusDays(30), 1600.0)) // order precedes events -> none
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("timestamp").as("o_orderdate"),
        col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    Seq(
      // user 1: equal-INSTANT with the order AND with each other: the
      // inclusive as-of sees both; max type "b" wins
      (1L, rawEvent(d0), 1L, "a"),
      (2L, rawEvent(d0), 1L, "b"),
      // user 2: 1µs before attributes; 1µs after never does
      (3L, rawEvent(d0.minusNanos(1000)), 2L, "x"),
      (4L, rawEvent(d0.plusNanos(1000)), 2L, "y"),
      // user 4: equal-time pair strictly before the order; "z" > "m"
      (5L, rawEvent(d0.minusDays(1)), 4L, "m"),
      (6L, rawEvent(d0.minusDays(1)), 4L, "z"),
      // user 5: events strictly after its order
      (7L, rawEvent(d0), 5L, "late"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"),
        lit("""{"k":1}""").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = graft.queries.Events.queries("events_attribution")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === Seq(
      ("b", 1L, 100.0), // user 1: equal-instant, max-type tie-break
      ("none", 2L, 2000.0), // users 3 and 5
      ("x", 1L, 200.0), // user 2: the 1µs-before touch, never the after
      ("z", 1L, 800.0))) // user 4: equal-time pair resolves to max type
    Caching.releaseAll(); spark.catalog.clearCache()
  }

  test("decay attribution: week-halving weights, exact conservation, " +
    "remainder to the most recent touch") {
    import spark.implicits._
    val dir = TempLayouts.tracked("graft-attrib-decay").toString
    val d0 = java.time.LocalDateTime.of(1997, 3, 10, 0, 0)
    def micros(t: java.time.LocalDateTime): Long =
      t.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
        t.getNano / 1000L
    def rawEvent(effective: java.time.LocalDateTime): Long =
      micros(effective.plusDays(9862))

    Seq(
      (10L, 1L, d0, 1.00), // 3 touches at ages 0/7/14 d: w = 4/2/1
      (30L, 3L, d0, 1.01), // 2 week-3 touches: w = 1/1, 1-cent remainder
      (90L, 9L, d0, 4.00)) // no touches -> none
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("timestamp").as("o_orderdate"),
        col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    Seq(
      // user 1: W = 7; bases floor(400/7)=57, floor(200/7)=28,
      // floor(100/7)=14 -> sum 99, remainder 1 cent to the age-0 touch
      (1L, rawEvent(d0), 1L, "t_a"),
      (2L, rawEvent(d0.minusDays(7)), 1L, "t_b"),
      (3L, rawEvent(d0.minusDays(14)), 1L, "t_c"),
      // user 3: equal weights, oc=101 -> bases 50/50, remainder 1 cent
      // to the more RECENT touch (age 20 beats age 21)
      (4L, rawEvent(d0.minusDays(20)), 3L, "t_r"),
      (5L, rawEvent(d0.minusDays(21)), 3L, "t_s"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"),
        lit("""{"k":1}""").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = graft.queries.Events
      .queries("events_attribution_decay")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === Seq(
      ("none", 1L, 4.00),
      ("t_a", 1L, 0.58), // 57 base + the 1-cent remainder
      ("t_b", 1L, 0.28),
      ("t_c", 1L, 0.14),
      ("t_r", 1L, 0.51), // equal weights: remainder to the recent touch
      ("t_s", 1L, 0.50)))
    // the ledger closes: every order's cents fully distributed
    assert(got.map(_._3).sum === 1.00 + 1.01 + 4.00)
    Caching.releaseAll(); spark.catalog.clearCache()
  }
}
