package graft

import org.apache.spark.sql.functions._

/** Semantics pins for the event-stream filters: the two debounce variants
  * agree everywhere except inside long bursts, where debounce-to-last-kept
  * re-arms and the raw-gap filter does not. */
class EventsSpec extends SparkSpec {

  /** One key, 13 events 10 minutes apart (a 2-hour burst). */
  private def burst() = {
    import spark.implicits._
    val base = 1704067200000000L // 2024-01-01T00:00:00Z in micros
    (0 until 13).map { i =>
      (i.toLong, 1L, "click", base + i * 600000000L)
    }.toDF("event_id", "user_id", "event_type", "us")
      .select(col("event_id"), col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"))
  }

  test("debounce-to-last-kept re-arms inside a long burst (one event per " +
    "30-minute budget, not just the first)") {
    import spark.implicits._
    val kept = graft.queries.Events.debounceKept(burst(), gapUs = 1800000000L)
      .select("event_id").as[Long].collect().toSeq
    // t=0 kept; 10/20/30 min within the strict >30min gap of 0 dropped;
    // t=40 re-arms; then 80, 120
    assert(kept === Seq(0L, 4L, 8L, 12L))
  }

  test("the raw-gap filter keeps only the first event of the same burst") {
    import spark.implicits._
    // pipe the synthetic burst through the oracled raw-gap query shape
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val kept = burst()
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("prev_us").isNull ||
        unix_micros(col("ts")) - col("prev_us") > lit(1800000000L))
      .select("event_id").as[Long].collect().toSeq
    assert(kept === Seq(0L))
  }

  test("debounceKept matches a sequential reference walk on random " +
    "multi-key event sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(42) // fixed seed — deterministic test
    val base = 1704067200000000L
    for (trial <- 0 until 3) {
      val events = (0 until 400).map { i =>
        (i.toLong, rnd.nextInt(4).toLong,
          Seq("click", "view")(rnd.nextInt(2)),
          // clustered gaps: 0..80 min so kept/dropped decisions mix
          base + rnd.nextLong(48L * 3600000000L))
      }
      val df = events.toDF("event_id", "user_id", "event_type", "us")
        .select(col("event_id"), col("user_id"), col("event_type"),
          timestamp_micros(col("us")).as("ts"))
      val got = graft.queries.Events.debounceKept(df, gapUs = 1800000000L)
        .select("event_id").as[Long].collect().toSet
      // reference: plain sequential walk per key over (us, event_id) order
      val want = events.groupBy(e => (e._2, e._3)).flatMap { case (_, es) =>
        var lastKept = Long.MinValue
        es.sortBy(e => (e._4, e._1)).flatMap { e =>
          if (lastKept == Long.MinValue || e._4 - lastKept > 1800000000L) {
            lastKept = e._4; Some(e._1)
          } else None
        }
      }.toSet
      assert(got === want, s"trial $trial diverged")
    }
  }

  test("the two variants agree when every inter-event gap exceeds the " +
    "debounce window") {
    import spark.implicits._
    val base = 1704067200000000L
    val sparse = (0 until 6).map { i =>
      (i.toLong, 1L, "view", base + i * 3600000000L) // hourly
    }.toDF("event_id", "user_id", "event_type", "us")
      .select(col("event_id"), col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"))
    val kept = graft.queries.Events.debounceKept(sparse, gapUs = 1800000000L)
      .select("event_id").as[Long].collect().toSeq
    assert(kept === (0L until 6L))
  }

  test("ewma walk equals a local replay of the halving recurrence on " +
    "the fixture") {
    val d = "/root/testdata/sf0.001"
    val src = Tables.events(spark, d)
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        graft.queries.cents(col("value")).cast("long").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    val expected = src.groupBy(t => (t._2, t._3)).toSeq.flatMap {
      case (_, es) =>
        var s = Long.MinValue
        es.sortBy(t => (t._4, t._1)).toSeq.map { t =>
          s = if (s == Long.MinValue) t._5 else (t._5 + s) / 2
          t._1 -> s.toDouble / 100.0
        }
    }.toMap
    val got = SparkEntry.queries("events_ewma")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(got.keySet == expected.keySet)
    assert(got.forall { case (id, e) => expected(id) == e },
      "ewma diverged from the local replay")
    assert(got.nonEmpty)
  }

  test("incremental aggregate merge equals the direct full aggregate, " +
    "bit for bit, with a consistent action audit") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val merged = SparkEntry.queries("events_agg_incremental")(spark, d)
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0),
        r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))
    assert(merged.nonEmpty)
    // the merge must reconstruct the direct one-pass aggregate exactly —
    // that is the whole point of incremental maintenance
    val directMap = Tables.events(spark, d).filter(col("ts").isNotNull)
      .groupBy(date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"))
      .agg(count(lit(1)).as("n"),
        graft.queries.sumMoney(col("value")).as("sv"))
      .collect()
      .map(r => r.getAs[java.time.LocalDateTime](0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(merged.map(_._1).toSet === directMap.keySet)
    merged.foreach { case (day, n, nDelta, sv, action) =>
      val (dn, dsv) = directMap(day)
      assert(n === dn, s"count diverged for day $day")
      assert(sv === dsv, s"sum diverged for day $day")
      assert(nDelta >= 0 && nDelta <= n)
      action match {
        case "insert" => assert(nDelta === n)
        case "keep"   => assert(nDelta === 0L)
        case "update" => assert(nDelta > 0 && nDelta < n)
        case other    => fail(s"unknown action $other")
      }
    }
  }
}
