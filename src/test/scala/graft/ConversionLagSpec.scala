package graft

import java.sql.Timestamp

/** Hand pins for `events_conversion_lag`: the purchase must be the first
  * at-or-after the first view (pre-view purchases never count), the lag
  * rides exact second arithmetic, same-instant conversion lands in its
  * own 0 bucket, and non-converting users are absent. */
class ConversionLagSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val dir: String = {
    import spark.implicits._
    val d = TempLayouts.tracked("graft-convlag").toString
    val rows = Seq(
      // user 1: same-instant conversion -> lag 0, bucket 0
      (1L, ts("2024-03-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-03-01 10:00:00"), 1L, "purchase", 1.0, "{}"),
      // user 2: 60 s lag -> bin(60)='111100', bucket 6
      (3L, ts("2024-03-01 10:00:00"), 2L, "view", 1.0, "{}"),
      (4L, ts("2024-03-01 10:01:00"), 2L, "purchase", 1.0, "{}"),
      // user 3: a purchase BEFORE the first view must not count; the
      // first at-or-after is 2 h later -> lag 7200, bin length 13
      (5L, ts("2024-03-01 09:00:00"), 3L, "purchase", 1.0, "{}"),
      (6L, ts("2024-03-01 10:00:00"), 3L, "view", 1.0, "{}"),
      (7L, ts("2024-03-01 12:00:00"), 3L, "purchase", 1.0, "{}"),
      // user 4: view only; user 5: purchase only -> neither converts
      (8L, ts("2024-03-01 10:00:00"), 4L, "view", 1.0, "{}"),
      (9L, ts("2024-03-01 10:00:00"), 5L, "purchase", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("at-or-after contract, exact second lags, power-of-two buckets " +
    "with 0 separate") {
    val out = graft.queries.Events
      .queries("events_conversion_lag")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(out === Map(
      0L -> ((1L, 0L, 0L)),       // user 1
      6L -> ((1L, 60L, 60L)),     // user 2
      13L -> ((1L, 7200L, 7200L)) // user 3: pre-view purchase ignored
    ))
  }
}
