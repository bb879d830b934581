package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A timestamped event as it arrives on a stream. */
final case class StreamEvent(ts: java.sql.Timestamp, event_type: String,
                             value: Double)

/** Open-session state kept per key in the state store. */
final case class OpenSession(startMs: Long, lastMs: Long, n: Long)

/** A closed session emitted downstream. */
final case class SessionOut(event_type: String,
                            session_start: java.sql.Timestamp, n_events: Long)

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

  /** Streaming ingest dedup: drop rows whose dedup key was already seen,
    * keeping state only within the watermark horizon — the stream-side
    * form of [[graft.queries.Dedup.exact]] for continuous corpus ingest
    * (state is bounded by watermark expiry instead of growing forever).
    * The event-time column is deliberately NOT part of the dedup subset:
    * duplicates arrive at different times; `dropDuplicatesWithinWatermark`
    * exists precisely to expire key state by event time while deduping on
    * the key alone.
    *
    * @param events stream with an event-time column `eventTimeCol`
    * @param keyCols the dedup key (must not include the event-time column)
    */
  def dedupedStream(events: DataFrame, keyCols: Seq[String],
                    eventTimeCol: String = "ts",
                    delay: String = "10 minutes"): DataFrame = {
    require(!keyCols.contains(eventTimeCol),
      "dedup key must not include the event-time column")
    events
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)
  }

  /** Custom stateful sessionization via `flatMapGroupsWithState` with
    * event-time timeouts: events within `gapMinutes` of each other merge
    * into one session per key; a session is emitted once the watermark
    * passes its close time (last event + gap). State per key is one open
    * session — bounded, watermark-expired, store-partitioned by key. */
  def sessionize(events: Dataset[StreamEvent], gapMinutes: Int)
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (key: String, it: Iterator[StreamEvent],
         state: GroupState[OpenSession]) =>
          val batch = it.toSeq.sortBy(_.ts.getTime)
          var open = state.getOption
          val closed = Seq.newBuilder[SessionOut]
          if (batch.isEmpty) {
            // woken by timeout: the watermark passed the open session's
            // close time — emit and clear
            open.foreach(o =>
              closed += SessionOut(key, new java.sql.Timestamp(o.startMs),
                o.n))
            state.remove()
          } else {
            for (e <- batch) {
              val t = e.ts.getTime
              open match {
                // inclusive [start-gap, last+gap] reach, matching
                // session_window's touching-windows merge (an event
                // exactly gap after the last one joins the session —
                // pinned against the native operator in StreamingSpec);
                // out-of-order (within-watermark) events extend the
                // session backwards
                case Some(o) if t >= o.startMs - gapMs &&
                    t <= o.lastMs + gapMs =>
                  open = Some(OpenSession(math.min(o.startMs, t),
                    math.max(o.lastMs, t), o.n + 1))
                case Some(o) if t > o.lastMs + gapMs =>
                  closed += SessionOut(key,
                    new java.sql.Timestamp(o.startMs), o.n)
                  open = Some(OpenSession(t, t, 1))
                case Some(_) =>
                  // admitted late but beyond the open session's backward
                  // reach: emit as its own session immediately (single-
                  // open-session state cannot grow a session in the past)
                  closed += SessionOut(key, new java.sql.Timestamp(t), 1)
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            val o = open.get
            state.update(o)
            state.setTimeoutTimestamp(o.lastMs + gapMs)
          }
          closed.result().iterator
      }
  }

  /** Streaming throttle — the stream twin of the batch
    * `events_debounce_kept` walk ([[graft.queries.Events.debounceKept]]):
    * per key, an event is kept iff it arrives more than `gapMinutes`
    * after the last KEPT event; the filter re-arms on every kept event.
    * State per key is ONE long (the last kept event-time).
    *
    * State expiry is provably safe: the timeout fires once the watermark
    * passes lastKept + gap, and from then on every admitted event has
    * event-time ≥ watermark > lastKept + gap — it would be kept anyway —
    * so removing the state cannot change the kept set. Bounded state at
    * any key cardinality, store-partitioned by key.
    *
    * Intra-batch events are walked in event-time order with (value,
    * event_type) as the deterministic tie-break for same-instant events
    * (the batch walk's tie-break is event_id, which StreamEvent does not
    * carry); cross-batch ordering is the stream's own (watermark-bounded)
    * guarantee, so a stream fed in event-time order reproduces the batch
    * walk exactly — pinned by StreamingSpec.
    *
    * Memory note: PERSISTENT state per key is one long, but the walk
    * must see the key's micro-batch slice in event-time order, so each
    * invocation buffers and sorts that slice — transient per-task memory
    * is O(events of the hottest key in THIS micro-batch), bounded by
    * micro-batch sizing (trigger interval / maxOffsetsPerTrigger), not
    * O(1). A hot key in a huge batch costs memory in the sort, never in
    * the state store. */
  def throttle(events: Dataset[StreamEvent], gapMinutes: Int)
      : Dataset[StreamEvent] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (_: String, it: Iterator[StreamEvent], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            // watermark passed lastKept + gap: any future event is kept
            // regardless of this state — safe to drop
            state.remove()
            Iterator.empty
          } else {
            val batch =
              it.toSeq.sortBy(e => (e.ts.getTime, e.value, e.event_type))
            var lastKept = state.getOption.getOrElse(Long.MinValue)
            val kept = Seq.newBuilder[StreamEvent]
            for (e <- batch) {
              val t = e.ts.getTime
              if (lastKept == Long.MinValue || t - lastKept > gapMs) {
                lastKept = t
                kept += e
              }
            }
            if (lastKept != Long.MinValue) {
              state.update(lastKept)
              state.setTimeoutTimestamp(lastKept + gapMs)
            }
            kept.result().iterator
          }
      }
  }

  /** Stream-static enrichment join: each micro-batch of the stream joins
    * the static dimension — stateless (no streaming state store), and the
    * explicit broadcast means the dimension never forces a stream-side
    * shuffle: the classic dimension-enrichment shape at any scale. Left
    * outer, so events with no dimension row pass through un-enriched
    * rather than silently dropping. */
  def enrich(events: DataFrame, dim: DataFrame,
             key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left_outer")

  /** Stream-stream interval join (the attribution shape): each click
    * joins the impression with the same key that happened at most
    * `windowMinutes` before it. BOTH sides are watermarked and the join
    * condition bounds event time on both — that is what lets Spark expire
    * buffered rows from the join state store instead of holding either
    * stream forever; state is partitioned by the join key, the standard
    * stream-join scale-out. */
  def attribute(impressions: DataFrame, clicks: DataFrame,
                key: String = "event_type",
                windowMinutes: Int = 30): DataFrame = {
    val imp = impressions.withWatermark("ts", "10 minutes")
      .select(col(key).as("imp_key"), col("ts").as("imp_ts"))
    val clk = clicks.withWatermark("ts", "10 minutes")
      .select(col(key).as("clk_key"), col("ts").as("click_ts"))
    imp.join(clk,
      col("imp_key") === col("clk_key") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") < col("imp_ts") +
          expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("imp_key").as("key"), col("imp_ts"), col("click_ts"))
  }

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
