package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** A timestamped event as it arrives on a stream. */
final case class StreamEvent(ts: java.sql.Timestamp, event_type: String,
                             value: Double)

/** Structured Streaming surface (SURVEY.md §7 step 7): the streaming
  * variants of the batch event-time queries in
  * [[graft.queries.Events]]. Not oracle-checked — the driver gate is
  * batch-only — but exercised end-to-end by the test suite via
  * `MemoryStream`.
  *
  * Scale notes: watermark + windowed aggregation keeps state bounded (old
  * windows are dropped once the watermark passes); `mapGroupsWithState`
  * state is per-key and lives in the state store, partitioned by the
  * grouping key — the standard streaming scale-out. */
object StreamingDemo {

  /** Streaming form of `events_tumbling`: 1-hour tumbling windows with a
    * 10-minute watermark for late data. Works on any streaming DataFrame
    * with (ts: timestamp, event_type: string) columns. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"))

  /** Custom stateful operator: running count per event type via
    * `mapGroupsWithState` — the arbitrary-state surface (the stream-side
    * analog of the reference's reducer accumulator,
    * `/root/reference/slave.cc:101-152`). */
  def runningCounts(events: Dataset[StreamEvent]): Dataset[(String, Long)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[StreamEvent], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + it.size
          state.update(total)
          (key, total)
      }
  }
}
