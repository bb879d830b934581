package graft

import org.apache.spark.sql.functions._

/** The oracle-gated streaming execution (`events_stream_tumbling`) pinned
  * against its own semantic model: append-mode emission = the batch
  * tumbling aggregation restricted to windows whose END the final
  * watermark (max ts − 10 min) has passed. This is exactly the HAVING
  * clause of the DuckDB oracle, so if this spec is green the only way the
  * driver gate can fail is a cross-engine arithmetic drift, not a
  * semantics misunderstanding. */
class StreamingRunSpec extends SparkSpec {

  test("AvailableNow streaming tumbling equals batch restricted to " +
    "watermark-closed windows") {
    val d = SparkEntry.smokeDir
    val streamed = graft.streaming.StreamingRun
      .tumblingAvailableNow(spark, d).collect()
    val maxTs = Tables.events(spark, d)
      .agg(max(unix_micros(col("ts")))).collect().head.getLong(0)
    val expected = graft.queries.Events.queries("events_tumbling")(spark, d)
      .filter(unix_micros(col("wstart").cast("timestamp")) +
        lit(3600000000L) <= lit(maxTs) - lit(600000000L))
      .collect()
    assert(streamed.length == expected.length,
      s"streamed ${streamed.length} windows, semantic model expects " +
        s"${expected.length}")
    assert(streamed.map(_.toString).sorted
      .sameElements(expected.map(_.toString).sorted))
    // and the horizon genuinely bites: the batch query has MORE windows
    // than the stream emitted (the trailing ones the watermark never
    // closed), so the oracle's HAVING clause is load-bearing
    val full = graft.queries.Events.queries("events_tumbling")(spark, d)
      .count()
    assert(full > streamed.length)
  }

  test("AvailableNow streaming sliding equals batch restricted to " +
    "watermark-closed windows — and each event lands in two windows") {
    val d = SparkEntry.smokeDir
    val streamed = graft.streaming.StreamingRun
      .slidingAvailableNow(spark, d).collect()
    val maxTs = Tables.events(spark, d)
      .agg(max(unix_micros(col("ts")))).collect().head.getLong(0)
    // semantic model: the batch 2h/1h sliding agg, restricted to windows
    // whose end (wstart + 2h) the final watermark passed (non-strict)
    val expected = graft.queries.Events.queries("events_sliding")(spark, d)
      .filter(unix_micros(col("wstart").cast("timestamp")) +
        lit(7200000000L) <= lit(maxTs) - lit(600000000L))
      .collect()
    assert(streamed.length == expected.length)
    assert(streamed.map(_.toString).sorted
      .sameElements(expected.map(_.toString).sorted))
    // multi-assignment really happened: total per-window counts sum to
    // ~2× the event count over fully-covered interior windows, i.e. the
    // window count exceeds the tumbling window count
    val tumbling = graft.streaming.StreamingRun
      .tumblingAvailableNow(spark, d)
      .select(col("wstart")).distinct().count()
    assert(streamed.length > tumbling,
      "sliding emitted no more windows than tumbling — slide inactive")
  }

  test("complete-mode totals equal the batch aggregate over the " +
    "streaming timeline") {
    val d = SparkEntry.smokeDir
    val streamed = graft.streaming.StreamingRun
      .totalsAvailableNow(spark, d).collect()
    val batch = Tables.events(spark, d)
      .filter(col("ts").isNotNull &&
        col("ts") >= timestamp_micros(lit(0L)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.queries.sumMoney(col("value")).as("sum_value"))
      .orderBy(col("event_type").asc_nulls_last)
      .collect()
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
  }

  test("pre-epoch events are off the streaming timeline (and only the " +
    "streaming one)") {
    import spark.implicits._
    // Spark's event-time watermark initializes to epoch 0, so a pre-1970
    // window is late in the very first batch; the pipeline pins that as
    // an explicit contract filter (mirrored in the oracle) instead of a
    // runtime initial-value detail. Batch keeps pre-epoch windows.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-preepoch").toString
    Seq(
      (1L, -157766400000000000L, 0L, "click", 1.0, """{"k":1}"""), // 1965
      (2L, 1704067200000000000L, 0L, "click", 1.0, """{"k":1}"""),
      (3L, 1704070800000000000L, 0L, "click", 1.0, """{"k":1}"""),
      (4L, 1704074400000000000L, 0L, "click", 1.0, """{"k":1}""")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val streamed = graft.streaming.StreamingRun
      .tumblingAvailableNow(spark, dir)
      .select(col("wstart").cast("timestamp"))
      .as[java.sql.Timestamp].collect()
    assert(streamed.nonEmpty)
    assert(streamed.forall(_.getTime >= 0L),
      s"pre-epoch window leaked into the stream: ${streamed.toSeq}")
    val batch = graft.queries.Events.queries("events_tumbling")(spark, dir)
      .select(col("wstart").cast("timestamp"))
      .as[java.sql.Timestamp].collect()
    assert(batch.exists(_.getTime < 0L),
      "batch tumbling should retain the pre-epoch window")
  }

  test("adaptive state partitions: cap binds for large sources, " +
    "ceil(bytes/perPart) below it, untouched on unusable inputs") {
    val f = graft.streaming.StreamingRun.adaptiveStatePartitions _
    val MiB = 1L << 20
    // cap binds: a source past configured × perPart keeps the full
    // cluster-tuned fan-out — the property that makes the source-bytes
    // proxy safe at scale (under-partitioning is bounded to sources
    // between perPart and configured × perPart)
    assert(f(java.lang.Long.valueOf(10L * 1024 * 1024 * MiB), Some(32),
      32 * MiB) === Some(32))
    assert(f(java.lang.Long.valueOf(32L * 32 * MiB), Some(32),
      32 * MiB) === Some(32)) // exactly at the knee
    // below the knee: one partition per perPart of source, ceil'd
    assert(f(java.lang.Long.valueOf(1L), Some(32), 32 * MiB) === Some(1))
    assert(f(java.lang.Long.valueOf(32 * MiB), Some(32), 32 * MiB)
      === Some(1))
    assert(f(java.lang.Long.valueOf(32 * MiB + 1), Some(32), 32 * MiB)
      === Some(2))
    assert(f(java.lang.Long.valueOf(5L * 32 * MiB), Some(32), 32 * MiB)
      === Some(5))
    // unusable inputs leave the session untouched
    assert(f(null, Some(32), 32 * MiB) === None)
    assert(f(java.lang.Long.valueOf(0L), Some(32), 32 * MiB) === None)
    assert(f(java.lang.Long.valueOf(1L), None, 32 * MiB) === None)
    assert(f(java.lang.Long.valueOf(1L), Some(0), 32 * MiB) === None)
  }
}
