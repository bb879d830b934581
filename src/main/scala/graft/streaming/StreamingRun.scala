package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Typed input to the streaming sessionization walk: the watermarked
  * event-time column plus the same instant as exact micros (GroupState
  * timeouts are millisecond-granular, but session gap arithmetic must
  * stay microsecond-exact to match batch `session_window` semantics),
  * and the value pre-gridded to cents (None = null value, which a SQL
  * `sum` ignores). */
final case class SessIn(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
                        cents: Option[Long])

/** Open-session state per user: bounds, event count, and the running
  * cents sum with a flag distinguishing "no non-null value yet" (sum is
  * NULL) from a genuine zero sum. */
final case class SessState(startUs: Long, lastUs: Long, n: Long,
                           sumCents: Long, anyValue: Boolean)

/** A closed session as emitted to the sink. */
final case class SessOut(user_id: Long, start_us: Long, n_events: Long,
                         sum_cents: Option[Long])

/** Typed input to the streaming throttle walk: event time as the
  * watermarked column plus exact micros, and the event id that is the
  * batch walk's deterministic tie-break for same-instant events. */
final case class ThrIn(user_id: Long, event_type: String,
                       ts: java.sql.Timestamp, ts_us: Long, event_id: Long)

/** A kept (throttle-passing) event as emitted to the sink. */
final case class ThrOut(event_id: Long, user_id: Long, event_type: String,
                        ts_us: Long)

/** Typed input to the transformWithState running-totals processor:
  * value pre-gridded to cents with the null flag split out (a case-class
  * Long cannot carry SQL null; the sum convention is "null contributes
  * nothing", so cents = 0 ∧ has_val = 0 encodes it exactly). */
final case class TwsIn(user_id: Long, ts_us: Long, cents: Long,
                       has_val: Long)

/** Per-user running aggregate held in the transformWithState ValueState
  * (RocksDB-backed): event count, non-null-value count, exact cents sum,
  * latest event-time micros. */
final case class TwsAgg(n: Long, nv: Long, sumCents: Long, maxTs: Long)

/** The per-batch emission: the user's cumulative totals AFTER this
  * batch. */
final case class TwsOut(user_id: Long, n: Long, n_values: Long,
                        sum_cents: Long, last_ts_us: Long)

/** Typed input to the transformWithState journey/type-count processors:
  * the (ts_us, event_id, event_type) triple that defines the journey's
  * total order (event_type last — duplicate-(ts,id) corpora need the
  * third tie-break). */
final case class JournIn(user_id: Long, ts_us: Long, event_id: Long,
                         event_type: String)

/** A per-batch journey emission: the user's first-5 event-type path
  * under the (ts_us, event_id, event_type) total order, plus the total
  * event count held in state. */
final case class JournOut(user_id: Long, path: String, n_events: Long)

/** A per-batch map-state emission: one (user, event_type) count. */
final case class TypeCntOut(user_id: Long, event_type: String, n: Long)

/** `transformWithState` with LIST state — the append-log state slot
  * ([[RunningTotalsProcessor]] covers ValueState, the session port
  * covers timers): the per-user event journey accumulates in a
  * `ListState[JournIn]` (append is O(1) per event — RocksDB merges the
  * tail, no read-modify-write of the whole list), and each batch emits
  * the user's first-5 path under the (ts_us, event_id, event_type)
  * total order plus the total count. The per-batch sort touches ONE
  * user's list (bounded by that user's history — a production topology
  * caps the list; the gate documents the shape, `TwsSpec`-style
  * cross-batch carry is pinned by the shared single-drain convention). */
final class JourneyProcessorTws
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, JournIn, JournOut] {
  import org.apache.spark.sql.streaming.{ListState, TTLConfig}
  @transient private var st: ListState[JournIn] = _

  override def init(outputMode: OutputMode,
                    timeMode: org.apache.spark.sql.streaming.TimeMode)
      : Unit =
    st = getHandle.getListState[JournIn]("journey",
      org.apache.spark.sql.Encoders.product[JournIn], TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[JournIn],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[JournOut] = {
    rows.foreach(st.appendValue)
    // third tie-break key sorts by UTF-16 code units (Scala String
    // Ordering) while the oracle's ORDER BY is DuckDB binary UTF-8 —
    // identical for the ASCII event_type vocabulary this corpus
    // carries (contract: ASCII-only types); a non-ASCII type set would
    // need a UTF-8-byte tie-break here to stay collation-proof
    val all = st.get().toArray
      .sortBy(e => (e.ts_us, e.event_id, e.event_type))
    Iterator.single(JournOut(user,
      all.take(5).map(_.event_type).mkString(">"), all.length.toLong))
  }
}

/** `transformWithState` with MAP state — the keyed-counter state slot:
  * per-user per-event-type counts in a `MapState[String, Long]` (point
  * reads/writes — the state that would be a hot-key hash map in a hand
  * -rolled consumer), each batch emitting every (user, type, count)
  * entry. */
final class TypeCountsProcessorTws
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, JournIn, TypeCntOut] {
  import org.apache.spark.sql.streaming.{MapState, TTLConfig}
  @transient private var st: MapState[String, Long] = _

  override def init(outputMode: OutputMode,
                    timeMode: org.apache.spark.sql.streaming.TimeMode)
      : Unit =
    st = getHandle.getMapState[String, Long]("counts",
      org.apache.spark.sql.Encoders.STRING,
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[JournIn],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[TypeCntOut] = {
    rows.foreach { r =>
      val cur = if (st.containsKey(r.event_type)) st.getValue(r.event_type)
                else 0L
      st.updateValue(r.event_type, cur + 1L)
    }
    st.iterator().map(kv => TypeCntOut(user, kv._1, kv._2))
  }
}

/** The sessionization walk of [[StreamingRun.sessionizeByUser]] ported to
  * Spark 4's `StatefulProcessor` with EVENT-TIME TIMERS — the timer half
  * of the transformWithState surface ([[RunningTotalsProcessor]] covers
  * the state half with TimeMode.None): the open session lives in a
  * `ValueState[SessState]`, and a registered timer at
  * `floor(last_us/1000) + gap_ms` replaces GroupState's
  * `setTimeoutTimestamp`. `handleExpiredTimer` is the `hasTimedOut`
  * branch: emit the open session, clear state. Timer maintenance is
  * explicit in this API (GroupState's set-timeout REPLACES, timers
  * ACCUMULATE), so the processor deletes the previous session-close
  * timer before registering the moved one — the one genuinely new
  * obligation vs the GroupState port, pinned by `TwsSpec` (a stale
  * undeleted timer would double-emit). Expiry polarity PROBED ON THE
  * HORIZON CORPUS and it is the OPPOSITE of GroupState's: a TWS timer
  * fires when the watermark reaches it NON-strictly (wm_ms >= expiry;
  * GroupState's event-time timeout needs wm_ms > timeout — the horizon
  * corpus, whose sessions close exactly ON the ms-floored boundary,
  * emitted two extra sessions under a naive port). The processor
  * therefore registers `close + 1 ms`: wm >= t+1 ⟺ wm > t on the
  * integer ms grid, reproducing the strict GroupState arithmetic
  * exactly — so `events_stream_tws_session` shares
  * `events_stream_session`'s oracle verbatim (one emission arithmetic,
  * two stateful APIs), with the polarity difference pinned in
  * `TwsSpec`. */
final class SessionProcessorTws(gapMinutes: Int = 30)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, SessIn, SessOut] {
  import org.apache.spark.sql.streaming.{TTLConfig, ValueState}
  private val gapUs = gapMinutes * 60L * 1000000L
  private val gapMs = gapMinutes * 60L * 1000L
  @transient private var st: ValueState[SessState] = _

  override def init(outputMode: OutputMode,
                    timeMode: org.apache.spark.sql.streaming.TimeMode)
      : Unit =
    st = getHandle.getValueState[SessState]("open",
      org.apache.spark.sql.Encoders.product[SessState], TTLConfig.NONE)

  private def emit(uid: Long, o: SessState): SessOut =
    SessOut(uid, o.startUs, o.n,
      if (o.anyValue) Some(o.sumCents) else None)

  override def handleInputRows(uid: Long, rows: Iterator[SessIn],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[SessOut] = {
    val batch = rows.toArray.sortBy(_.ts_us)
    var open: Option[SessState] = if (st.exists()) Some(st.get()) else None
    val prevTimer = open.map(o => o.lastUs / 1000L + gapMs + 1L)
    val closed = Seq.newBuilder[SessOut]
    for (e <- batch) {
      val c = e.cents.getOrElse(0L)
      val v = e.cents.isDefined
      open match {
        // the sessionizeByUser walk verbatim: inclusive two-sided reach,
        // strictly-past-gap split, late-singleton immediate emission
        case Some(o) if e.ts_us >= o.startUs - gapUs &&
            e.ts_us <= o.lastUs + gapUs =>
          open = Some(SessState(math.min(o.startUs, e.ts_us),
            math.max(o.lastUs, e.ts_us), o.n + 1, o.sumCents + c,
            o.anyValue || v))
        case Some(o) if e.ts_us > o.lastUs + gapUs =>
          closed += emit(uid, o)
          open = Some(SessState(e.ts_us, e.ts_us, 1L, c, v))
        case Some(_) =>
          closed += SessOut(uid, e.ts_us, 1L, if (v) Some(c) else None)
        case None =>
          open = Some(SessState(e.ts_us, e.ts_us, 1L, c, v))
      }
    }
    open.foreach { o =>
      st.update(o)
      // +1 ms: TWS timers fire NON-strictly at the watermark, GroupState
      // timeouts strictly past it — see the class doc's probe pin
      val t = o.lastUs / 1000L + gapMs + 1L
      if (!prevTimer.contains(t)) {
        prevTimer.foreach(getHandle.deleteTimer)
        getHandle.registerTimer(t)
      }
    }
    closed.result().iterator
  }

  override def handleExpiredTimer(uid: Long,
      timerValues: org.apache.spark.sql.streaming.TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[SessOut] =
    if (st.exists()) {
      val o = st.get()
      st.clear()
      Iterator.single(emit(uid, o))
    } else Iterator.empty
}

/** Spark 4's arbitrary-stateful-processing operator surface
  * (`transformWithState` / `StatefulProcessor` — the successor to
  * `flatMapGroupsWithState`, with named typed state slots behind a
  * handle and a mandatory RocksDB state store): a running per-user
  * totals processor. One `ValueState[TwsAgg]` slot; every input batch
  * folds into it and emits the post-batch cumulative row. Batch-split
  * invariance of the STATE (not the emission stream) is pinned in
  * `TwsSpec` via MemoryStream two-batch runs; the gate drains the
  * single-data-batch AvailableNow topology, where the one emitted row
  * per user IS the batch aggregate. */
final class RunningTotalsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, TwsIn, TwsOut] {
  import org.apache.spark.sql.streaming.{TTLConfig, ValueState}
  @transient private var st: ValueState[TwsAgg] = _

  override def init(outputMode: OutputMode,
                    timeMode: org.apache.spark.sql.streaming.TimeMode)
      : Unit =
    st = getHandle.getValueState[TwsAgg]("agg",
      org.apache.spark.sql.Encoders.product[TwsAgg], TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[TwsIn],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[TwsOut] = {
    var agg = if (st.exists()) st.get() else TwsAgg(0L, 0L, 0L, Long.MinValue)
    rows.foreach { r =>
      agg = TwsAgg(agg.n + 1L, agg.nv + r.has_val, agg.sumCents + r.cents,
        math.max(agg.maxTs, r.ts_us))
    }
    st.update(agg)
    Iterator.single(TwsOut(user, agg.n, agg.nv, agg.sumCents, agg.maxTs))
  }
}

/** Oracle-gated STREAMING execution (SURVEY.md §2 streaming row).
  *
  * [[StreamingDemo]] holds the streaming operator surface and
  * `StreamingSpec` pins stream==batch equivalence through `MemoryStream`,
  * but that is test-grade evidence: nothing in the driver's hash gate ever
  * ran a real streaming query. The entry here closes that gap — it is a
  * genuine Structured Streaming execution (file source → watermark →
  * event-time tumbling aggregation → parquet sink via
  * `Trigger.AvailableNow`) whose sink is read back as the query result and
  * hash-compared against a DuckDB oracle.
  *
  * The oracle encodes APPEND-MODE WATERMARK SEMANTICS, not batch
  * semantics: a window is only emitted once the final watermark
  * (max event time − 10 min) passes its end, so trailing windows the
  * watermark never closes are absent from BOTH engines — the oracle
  * replays that with a `HAVING wstart + 1h <= max(ts) − 10min` clause.
  * This is deliberate: the gate then verifies the streaming runtime's
  * state-eviction contract itself, not merely that the plan happens to
  * equal the batch one.
  *
  * Scale shape: identical to batch `events_tumbling` — partial (map-side)
  * aggregation feeds one hash exchange on (window, event_type); streaming
  * state is bounded by the watermark horizon (old windows are evicted on
  * emission), and the sink appends — the standard continuous-ingest
  * topology on a cluster. The per-query temp sink/checkpoint dirs stand in
  * for the durable object-store paths a deployment would use.
  */
object StreamingRun {

  /** Run the tumbling-window pipeline as a real stream over
    * `dir/events.parquet` and return the sink contents, totally ordered.
    * Blocks until `Trigger.AvailableNow` drains the source (including the
    * no-data flush batch that evicts watermark-closed windows). */
  /** The shared streaming source over `dir/events.parquet` with the
    * streaming-timeline contract applied: ts canonicalized through the
    * same encoding dispatch as the batch reader (nanos-as-long truncation
    * or micros-NTZ reinterpretation — `Tables.canonicalTs`), null-ts
    * events off every timeline, and
    * pre-epoch events off the STREAMING timeline (Spark initializes the
    * event-time watermark to epoch 0, so a pre-1970 window is "late" in
    * the very first batch and silently dropped — found by salting 1965
    * events; batch event-time keeps them). Both filters are mirrored in
    * every streaming oracle. File streams need an explicit schema (taken
    * from a batch footer read) and a DIRECTORY: driver fixtures store
    * events as a single parquet file, test corpora as a written
    * directory — stream the parent with a name filter in the file case,
    * the dir directly otherwise. */
  private def eventStream(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batchTwin = s.read.parquet(path)
    val f = new java.io.File(path)
    // record the source size for the adaptive state-partition rule at
    // the drain site (directory corpora: sum the data files one level
    // down — fixtures are flat parquet dirs)
    val srcBytes: Long =
      if (f.isDirectory) {
        val fs = Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        fs.iterator.filter(_.isFile).map(_.length()).sum
      } else f.length()
    sourceBytesLocal.set(srcBytes)
    val reader = s.readStream.schema(batchTwin.schema)
    val src =
      if (f.isDirectory) reader.parquet(path)
      else reader.option("pathGlobFilter", f.getName).parquet(f.getParent)
    src
      .withColumn("ts", graft.Tables.canonicalTs(batchTwin))
      .filter(col("ts").isNotNull)
      .filter(col("ts") >= timestamp_micros(lit(0L)))
  }

  /** Release the JVM's state-store runtime after a drain completes
    * (providers unloaded AND the maintenance pool stopped — see
    * `GraftStateStoreRelease` for why it must be both).
    *
    * Each drain here runs against a FRESH checkpoint, so the providers
    * the finished query loaded (with their in-memory version maps —
    * HDFSBackedStateStoreProvider keeps recent state versions on heap)
    * can never be reused; left loaded they accumulate across drains in
    * one JVM — 5 stores × 32 partitions PER multi-stateful drain — and
    * the heap they pin plus the maintenance scans over them degrade
    * every subsequent streaming execution in the process. Measured on
    * `events_stream_dedup_join` reps in one JVM: 10.5 → 54 s across 5
    * reps with providers retained, 8.8–11.4 s flat with this release.
    * A real long-lived cluster job RESUMES its checkpoint and wants
    * the cache; a drain-and-discard harness does not. The next
    * streaming query lazily restarts the runtime on first access. */
  private def releaseStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state
      .GraftStateStoreRelease.releaseAll()

  /** Source bytes of the drain being assembled on this thread — written
    * by [[eventStream]] (the single source constructor every streaming
    * gate goes through), read by the stream-start sites to derive a
    * scale-adaptive state-partition count. Thread-local so concurrently
    * built drains (parallel spec suites) cannot cross-talk; a site that
    * starts a stream not built through [[eventStream]] finds null and
    * leaves the session's partitioning untouched. */
  private val sourceBytesLocal = new ThreadLocal[java.lang.Long]

  /** Scale-adaptive shuffle-partition count for a stateful streaming
    * drain (optimization guide §2: derive partitioning from input size,
    * never a constant tuned for one deployment). Stateful streaming is
    * the one place AQE cannot help: the engine disables adaptive
    * execution for stateful workloads, so the drain inherits the
    * session's full `spark.sql.shuffle.partitions` as its STATE-STORE
    * partition count no matter how small the source is — and every
    * micro-batch then pays (partitions × state-store instances) store
    * loads + delta commits. Measured via StreamProbe at sf0.1/local[32]:
    * a stream-stream join batch reported 41–77 s of summed state-store
    * commit time across 32 partitions × 4 join stores (~2 s of the
    * batch's wall), on a 2 MB source whose join state is a few MB.
    *
    * The rule: one state partition per 32 MiB of source input, floored
    * at 1, capped at the session's configured shuffle partitions — so a
    * production-scale stream (TBs) keeps the cluster-tuned fan-out
    * (the cap binds) while a small drain stops paying fixed per-partition
    * store overhead. Applied by scoping the session conf around
    * `start()` + `awaitTermination()`: the stream's cloned session reads
    * it at plan time, and the original value is restored for everything
    * after the drain (read-back, ordering, the next query). Results are
    * partition-count-invariant — this moves only WHERE state rows live,
    * never what is computed.
    *
    * KNOWN LIMIT of the proxy: SOURCE bytes stand in for STATE bytes.
    * A stream whose state outgrows its input share — high-cardinality
    * keys under a long watermark retention, stream-stream joins that
    * buffer both sides — can be under-partitioned when its source sits
    * between perPart and (configured × perPart): the derived count then
    * reflects input volume, not the state each partition must hold.
    * The configured-partitions cap bounds the exposure (a source past
    * configured × perPart keeps the full cluster fan-out), and
    * `SPARK_GRAFT_STREAM_PART_BYTES` lets a deployment whose state/input
    * ratio is high shrink perPart. Pinned by
    * `StreamingRunSpec."adaptive state partitions"`. */
  private def withAdaptiveStatePartitions[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val bytes = sourceBytesLocal.get()
    val before = s.conf.getOption(key)
    val parts = adaptiveStatePartitions(bytes, before.flatMap(_.toIntOption))
    parts match {
      case Some(p) =>
        s.conf.set(key, p.toString)
        try body finally before.foreach(s.conf.set(key, _))
      case None => body
    }
  }

  /** The derivation rule of [[withAdaptiveStatePartitions]], pure so the
    * contract is pinnable: `min(configured, ceil(bytes / perPart))`,
    * None (leave the session untouched) when either input is unusable.
    * `perPart` = bytes of source input per state partition —
    * parameterized (`SPARK_GRAFT_STREAM_PART_BYTES`) with a measured
    * local default; a deployment tunes it to its own state-store commit
    * cost vs per-partition compute trade. */
  private[graft] def adaptiveStatePartitions(
      bytes: java.lang.Long, configured: Option[Int],
      perPart: Long = sys.env.get("SPARK_GRAFT_STREAM_PART_BYTES")
        .flatMap(_.toLongOption).filter(_ > 0L).getOrElse(32L << 20))
      : Option[Int] =
    (bytes, configured) match {
      case (b, Some(cur)) if b != null && b > 0L && cur > 0 =>
        Some(math.min(cur.toLong, (b + perPart - 1) / perPart).toInt)
      case _ => None
    }

  /** Drain an append-mode streaming frame through a parquet sink via
    * `Trigger.AvailableNow` (including the no-data flush batch that
    * evicts watermark-closed state) and return the sink contents. The
    * checkpoint is only meaningful across restarts of the SAME continuous
    * query; this one has drained, so it is dropped instead of letting
    * repeated invocations (bench sweeps, determinism re-runs) accumulate
    * state dirs. The SINK dir must outlive this call — the returned frame
    * scans it lazily — so it is the caller-visible artifact, exactly like
    * any query's output location. The explicit schema on the read-back
    * matters: an all-late or empty corpus leaves a sink with no data
    * files, which schema inference would reject. */
  private def drainToSink(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    // JVM-exit-tracked: the sink must outlive this call (lazy read-back)
    // but repeated drains were leaking 1,600+ sink dirs across runs
    // the checkpoint is also tracked: the eager delete below only runs on
    // the success path, and a failed drain must not leak it past JVM exit
    val out = graft.TempLayouts.tracked("graft-stream-sink").toString
    val ckpt = graft.TempLayouts.tracked("graft-stream-ckpt").toString
    withAdaptiveStatePartitions(s) {
      val q = df.writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // diagnostic (StreamProbe / plan-evidence capture): print the last
      // executed micro-batch's physical plan — the only place the
      // stateful stages' real partitioning is visible (a static
      // df.explain shows the unplanned streaming relation)
      if (sys.env.contains("SPARK_GRAFT_STREAM_EXPLAIN")) q.explain()
    }
    releaseStateStores()
    deleteRecursively(new java.io.File(ckpt))
    s.read.schema(df.schema).parquet(out)
  }

  /** Oracle-gated streaming SLIDING windows — the eighth streaming shape
    * in the hash gate: where tumbling assigns each event to exactly one
    * window, the 2h/1h slide assigns it to two overlapping ones, which
    * exercises the multi-assignment path of the streaming window state
    * store (each window is separate state, evicted independently once
    * the watermark passes ITS end — the trailing window of the pair
    * survives one watermark step longer, so the horizon clause prunes a
    * different set than tumbling's). Same append-mode eviction polarity
    * as tumbling: NON-STRICT (a window ending exactly at the watermark
    * is emitted). */
  def slidingAvailableNow(s: SparkSession, dir: String): DataFrame = {
    val agg = eventStream(s, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
      .agg(count(lit(1)).as("n"),
        graft.queries.sumMoney(col("value")).as("sum_value"))
      .select(col("w.start").cast("timestamp_ntz").as("wstart"),
        col("n"), col("sum_value"))
    drainToSink(agg).orderBy(col("wstart"))
  }

  def tumblingAvailableNow(s: SparkSession, dir: String): DataFrame = {
    val agg = eventStream(s, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.queries.sumMoney(col("value")).as("sum_value"))
      .select(col("w.start").cast("timestamp_ntz").as("wstart"),
        col("event_type"), col("n"), col("sum_value"))
    drainToSink(agg).orderBy(col("wstart"), col("event_type"))
  }

  /** The stateful sessionization walk behind [[sessionAvailableNow]],
    * factored over any watermarked typed stream so the spec can drive it
    * through `MemoryStream` (boundary pins) while the gated query drives
    * it from the file source. Semantics (the append-mode emission
    * contract the oracle replays):
    *
    *   - events at most 30 minutes apart merge into one session per
    *     user, microsecond-exact and INCLUSIVE of the boundary: an event
    *     exactly `gap` after the previous one joins the same session,
    *     because Spark's `session_window` merges touching windows
    *     ([t, t+gap) and [t+gap, …) share an edge and merge — proven by
    *     the horizon probe corpus, which caught the batch oracle
    *     splitting there); only STRICTLY past the gap starts a new
    *     session;
    *   - a session closed BY A SUCCESSOR event (the next event of the
    *     same user is strictly more than gap later) is emitted immediately, watermark
    *     regardless;
    *   - each user's final open session is emitted only when the
    *     event-time timeout fires, i.e. when the watermark STRICTLY
    *     passes its close time at millisecond granularity (GroupState
    *     timeouts and Spark watermarks are both ms-based: the timeout is
    *     set at floor(lastUs/1000) + gap ms, the watermark is
    *     floor(maxSeenUs/1000) − 10 min, and expiry requires
    *     timeout < watermark — the strictness and the ms floors are
    *     pinned by a MemoryStream boundary test and replayed by the
    *     oracle's horizon clause).
    *
    * Determinism: the gate's drain shape is a SINGLE data batch (a file
    * source with no per-trigger cap snapshots every file into one
    * micro-batch) plus the AvailableNow flush batch, so the walk sees
    * each user's events in full event-time order and the emitted set is
    * exactly the oracle's. Under multi-batch splits the TIMEOUT path
    * stays confluent — an admitted event has ts >= watermark and a
    * session only times out once the watermark strictly passes its
    * close, so no admitted event can ever extend a timed-out session
    * (it would start a new one under the strict `> gap` rule anyway) — but a
    * session already closed by a SUCCESSOR can in principle be bridged
    * by a within-watermark out-of-order event in a later batch: the
    * inherent stream/batch sessionization divergence, impossible in the
    * single-drain shape the oracle encodes.
    *
    * Scale shape: state per user is ONE open session (bounded,
    * watermark-expired, store-partitioned by the grouping key); the
    * per-invocation sort is O(this user's events in THIS micro-batch),
    * bounded by trigger sizing, never by history. */
  def sessionizeByUser(events: Dataset[SessIn],
                       gapMinutes: Int = 30): Dataset[SessOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val gapMs = gapMinutes * 60L * 1000L
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[SessIn], state: GroupState[SessState]) =>
          def out(o: SessState): SessOut =
            SessOut(uid, o.startUs, o.n,
              if (o.anyValue) Some(o.sumCents) else None)
          if (state.hasTimedOut) {
            // the watermark strictly passed the open session's close time
            val o = state.get
            state.remove()
            Iterator.single(out(o))
          } else {
            val batch = it.toArray.sortBy(_.ts_us)
            var open = state.getOption
            val closed = Seq.newBuilder[SessOut]
            for (e <- batch) {
              val c = e.cents.getOrElse(0L)
              val v = e.cents.isDefined
              open match {
                // inclusive [start-gap, last+gap] reach on both sides —
                // touching sessions merge, session_window's own rule;
                // out-of-order (within-watermark) events extend the
                // session backwards too
                case Some(o) if e.ts_us >= o.startUs - gapUs &&
                    e.ts_us <= o.lastUs + gapUs =>
                  open = Some(SessState(math.min(o.startUs, e.ts_us),
                    math.max(o.lastUs, e.ts_us), o.n + 1, o.sumCents + c,
                    o.anyValue || v))
                case Some(o) if e.ts_us > o.lastUs + gapUs =>
                  closed += out(o)
                  open = Some(SessState(e.ts_us, e.ts_us, 1L, c, v))
                case Some(_) =>
                  // admitted late but beyond the open session's backward
                  // reach: its own singleton session, emitted now (single-
                  // open-session state cannot grow a session in the past)
                  closed += SessOut(uid, e.ts_us, 1L,
                    if (v) Some(c) else None)
                case None =>
                  open = Some(SessState(e.ts_us, e.ts_us, 1L, c, v))
              }
            }
            open.foreach { o =>
              state.update(o)
              // GroupState timeouts are ms-granular: floor the µs close
              state.setTimeoutTimestamp(o.lastUs / 1000L + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Oracle-gated streaming sessionization — the second streaming shape
    * in the hash gate, and the first STATEFUL-API one: file source →
    * watermark → `flatMapGroupsWithState` per-user 30-minute-gap
    * sessionization → parquet sink, drained by `Trigger.AvailableNow`.
    * Where [[tumblingAvailableNow]] gates the built-in windowed-
    * aggregation state machine, this gates the arbitrary-state API:
    * user-written state transitions, event-time timeouts, and the
    * append-mode emission contract (see [[sessionizeByUser]]) are all
    * hash-compared against the DuckDB gaps-and-islands oracle.
    *
    * One extra contract beyond the shared streaming timeline: a session
    * needs an owner, so null-user events are off the sessionization by
    * contract (the typed walk keys by primitive user id; no gate corpus
    * carries a null user_id, so the filter is vacuous on real data — it
    * exists to make the typed path total, mirrored in the oracle). */
  def sessionAvailableNow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val typed = eventStream(s, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"),
        graft.queries.cents(col("value")).cast("long").as("cents"))
      .as[SessIn]
    drainToSink(sessionizeByUser(typed).toDF())
      .select(col("user_id"),
        timestamp_micros(col("start_us")).cast("timestamp_ntz")
          .as("session_start"),
        col("n_events"),
        (col("sum_cents").cast("double") / 100.0).as("sum_value"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** Oracle-gated NATIVE streaming session windows — the built-in
    * `session_window` aggregation run as a real `writeStream` drain (the
    * one session-operator mode the GroupState walk and the TWS-timer
    * port reproduce but never executed). Same topology as
    * [[sessionAvailableNow]] — per-user 30-minute-gap sessions, 10-minute
    * watermark, append mode — but the state merge and eviction belong to
    * the operator, not hand-rolled state.
    *
    * Emission contract (probed in StreamSessionSpec, NOT assumed —
    * it differs from the GroupState walk on two axes):
    *  - eviction is WATERMARK-driven for every session: a session closed
    *    by a successor event still waits in state until the horizon
    *    passes its end, so the oracle has no closed-by-successor escape
    *    clause;
    *  - the horizon is NON-strict at microsecond precision — emitted iff
    *    end_us <= wm_ms·1000 where end_us = last_us + gap_us (the
    *    windowed-agg `<=` polarity; GroupState timeouts are strict and
    *    ms-floored, and the boundary corpus separates the two).
    *
    * Scale shape: state is one merged-session range per (user, session)
    * key in the store, map-side partial aggregation applies within a
    * micro-batch, and eviction is incremental per watermark advance —
    * the operator form survives key cardinalities that a per-user
    * collect-and-sort walk cannot. */
  def sessionWindowAvailableNow(s: SparkSession, dir: String): DataFrame = {
    val agg = eventStream(s, dir)
      .filter(col("user_id").isNotNull)
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        graft.queries.sumMoney(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("sw.start").cast("timestamp_ntz").as("session_start"),
        col("n_events"), col("sum_value"))
    drainToSink(agg).orderBy(col("user_id"), col("session_start"))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }

  /** The streaming throttle walk behind [[throttleAvailableNow]] — the
    * stream twin of the batch `events_debounce_kept` walk
    * ([[graft.queries.Events.debounceKept]]), factored over any
    * watermarked typed stream so `MemoryStream` specs can pin the
    * boundaries. Per (user_id, event_type) key, an event is kept iff it
    * arrives STRICTLY more than `gapMinutes` after the last KEPT event
    * (microsecond-exact, same `> gap` rule as the batch walk); kept
    * events are emitted immediately, so over a full drain the emitted
    * set is exactly the batch walk's kept set — the horizon plays no
    * role in emission, only in state cleanup.
    *
    * State per key is ONE long (the last kept event time in µs), and its
    * event-time-timeout expiry is provably safe at ms granularity: the
    * timeout fires once wm_ms > floor(lastKept_us/1000) + gap_ms, and
    * any event admitted afterwards has floor(ts_us/1000) >= wm_ms, so
    * ts_us >= wm_ms·1000 > lastKept_us + gap_us — it is kept regardless
    * of the dropped state, and the kept set is unchanged. Intra-batch
    * events are walked in (ts, event_id) order — the batch walk's own
    * tie-break — and the gate's single-data-batch drain makes the walk
    * order identical to the batch walk's total per-key order. */
  def throttleByKey(events: Dataset[ThrIn],
                    gapMinutes: Int = 30): Dataset[ThrOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val gapMs = gapMinutes * 60L * 1000L
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (_: (Long, String), it: Iterator[ThrIn], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove() // safe: see expiry proof above
            Iterator.empty
          } else {
            val batch = it.toArray.sortBy(e => (e.ts_us, e.event_id))
            var lastKept = state.getOption.getOrElse(Long.MinValue)
            val kept = Seq.newBuilder[ThrOut]
            for (e <- batch)
              if (lastKept == Long.MinValue || e.ts_us - lastKept > gapUs) {
                lastKept = e.ts_us
                kept += ThrOut(e.event_id, e.user_id, e.event_type, e.ts_us)
              }
            if (lastKept != Long.MinValue) {
              // re-set value is monotone (>= the previous timeout, which
              // the watermark has not strictly passed), so it can never
              // be older than the current watermark
              state.update(lastKept)
              state.setTimeoutTimestamp(lastKept / 1000L + gapMs)
            }
            kept.result().iterator
          }
      }
  }

  /** Oracle-gated streaming throttle — third streaming shape in the hash
    * gate: file source → watermark → one-long-state `flatMapGroupsWith
    * State` debounce-to-last-kept → parquet sink via AvailableNow. The
    * oracle is the batch `events_debounce_kept` recursive-CTE walk with
    * the streaming-timeline contract filters added (null ts / pre-epoch
    * off the stream; null-user off the typed walk, as in
    * [[sessionAvailableNow]]) — no horizon clause at all, because kept
    * events are emitted at processing time: the gate thus verifies that
    * streaming state expiry provably does NOT change the kept set, not
    * merely that eviction happened. */
  def throttleAvailableNow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val typed = eventStream(s, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .as[ThrIn]
    drainToSink(throttleByKey(typed).toDF())
      .select(col("event_id"), col("user_id"), col("event_type"),
        timestamp_micros(col("ts_us")).cast("timestamp_ntz").as("ts"))
      .orderBy(col("event_id"))
  }

  /** Oracle-gated stream-stream watermarked interval join — the fourth
    * streaming shape in the hash gate, covering the last stateful
    * streaming operator class (join state buffering): each click joins
    * the same user's views at most 30 minutes before it, both sides
    * watermarked with the two-sided time bound that lets Spark expire
    * buffered rows (the attribution shape of `StreamingDemo.attribute`).
    * The two sides are two independent file-source readers over the same
    * events table (not a stream self-join).
    *
    * Emission: an INNER stream-stream join emits a pair as soon as both
    * rows are buffered; in the gate's single-data-batch drain the
    * watermark is still at epoch 0 while every row arrives, so nothing
    * is late, no state is evicted before matching, and the emitted set
    * is exactly the batch interval join — which is the oracle (no
    * horizon clause). What the gate verifies is that the join buffering
    * machinery reproduces the batch join on a full drain; the eviction
    * contract itself is covered by `StreamingSpec`'s multi-batch tests.
    * Null-user events join nothing in either engine (SQL equi-join null
    * semantics), so no owner filter is needed. */
  def attributionAvailableNow(s: SparkSession, dir: String): DataFrame = {
    val views = eventStream(s, dir)
      .filter(col("event_type") === "view")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("imp_id"), col("user_id").as("imp_user"),
        col("ts").as("imp_ts"))
    val clicks = eventStream(s, dir)
      .filter(col("event_type") === "click")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("clk_id"), col("user_id").as("clk_user"),
        col("ts").as("clk_ts"))
    val joined = views.join(clicks,
      col("imp_user") === col("clk_user") &&
        col("clk_ts") >= col("imp_ts") &&
        col("clk_ts") < col("imp_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("imp_id"), col("clk_id"),
        col("imp_user").as("user_id"),
        col("imp_ts").cast("timestamp_ntz").as("imp_ts"),
        col("clk_ts").cast("timestamp_ntz").as("clk_ts"))
    drainToSink(joined).orderBy(col("imp_id"), col("clk_id"))
  }

  /** Oracle-gated stream-stream LEFT OUTER watermarked interval join —
    * the null-extending mode real attribution pipelines run (every
    * impression reported, clicked or not), and the one join mode
    * [[attributionAvailableNow]]'s inner gate does not cover. Same two
    * independent file-source readers, same two-sided interval condition;
    * `leftOuter` additionally emits each unmatched view null-extended —
    * but only when its join window can no longer match. The exact
    * emission arithmetic was pinned by a boundary probe corpus (single
    * ±1 µs / ±1 ms offsets around every candidate line): a null result
    * for a view exists iff
    * `imp_ts_us <= (floor(min(maxView, maxClick)_us / 1000) − 600000 −
    * 1800000) · 1000` — i.e. (1) the watermark is PER-SIDE (each
    * `withWatermark` node tracks its own filtered stream's max; the
    * global watermark is the MIN, so an empty side holds it at epoch 0
    * and suppresses every null emission), (2) ms-floored from the side
    * max, (3) compared NON-STRICTLY against the view's full-µs instant
    * (windowed-agg eviction polarity, not GroupState's strict <).
    * Inner matches are emitted as rows are buffered (no horizon, as in
    * the inner gate); the null-extension is emitted on STATE EVICTION,
    * which the AvailableNow no-data flush batch drives — so trailing
    * views whose window the final watermark never closes are ABSENT
    * from both engines, the append-mode-eviction contract pinned for
    * join state. StreamOuterJoinSpec re-pins all three probed facts
    * with boundary corpora. */
  def attributionOuterAvailableNow(s: SparkSession, dir: String): DataFrame = {
    val views = eventStream(s, dir)
      .filter(col("event_type") === "view")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("imp_id"), col("user_id").as("imp_user"),
        col("ts").as("imp_ts"))
    val clicks = eventStream(s, dir)
      .filter(col("event_type") === "click")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("clk_id"), col("user_id").as("clk_user"),
        col("ts").as("clk_ts"))
    val joined = views.join(clicks,
      col("imp_user") === col("clk_user") &&
        col("clk_ts") >= col("imp_ts") &&
        col("clk_ts") < col("imp_ts") + expr("INTERVAL 30 MINUTES"),
      "leftOuter")
      .select(col("imp_id"), col("clk_id"),
        col("imp_user").as("user_id"),
        col("imp_ts").cast("timestamp_ntz").as("imp_ts"),
        col("clk_ts").cast("timestamp_ntz").as("clk_ts"))
    drainToSink(joined)
      .orderBy(col("imp_id"), col("clk_id").asc_nulls_last)
  }

  /** Oracle-gated stream-stream FULL OUTER watermarked interval join —
    * the last join mode ([[attributionAvailableNow]] inner,
    * [[attributionOuterAvailableNow]] left): every impression AND every
    * click reported, matched or not — the reconciliation shape (did any
    * click arrive clickstream-only? any impression adstream-only?).
    * Same readers, same interval condition; null-extensions are emitted
    * on STATE EVICTION per side:
    *  - an unmatched VIEW null-extends under the left-outer horizon
    *    (non-strict µs vs ms-floored `min(maxView, maxClick) − 10min −
    *    30min` — re-pinned by `StreamOuterJoinSpec`);
    *  - an unmatched CLICK null-extends under ITS OWN state horizon,
    *    which has NO 30-minute term: a stored click only matches views
    *    with `imp_ts ≤ clk_ts`, and future accepted views sit above the
    *    global watermark, so the click state is releasable as soon as
    *    the watermark passes `clk_ts` itself — probed boundary:
    *    `clk_ts_us <= (wm_ms − 1) · 1000` where wm_ms = ms-floored
    *    min(maxView, maxClick) − 10min: the click's full-µs instant is
    *    compared NON-STRICTLY against the boundary one watermark tick
    *    (1 ms) below wm_ms, exactly as the oracle and
    *    `StreamFullJoinSpec` pin it (a click at wm_ms·1000 − 1 µs is
    *    WITHHELD — the tick-below form and a strict `< wm_ms · 1000`
    *    differ for sub-millisecond timestamps inside the final
    *    watermark millisecond). Different shape from the view side's
    *    windowed-agg-style horizon — the two sides genuinely differ,
    *    which is exactly why both get probe pins in
    *    `StreamFullJoinSpec`. */
  def attributionFullAvailableNow(s: SparkSession, dir: String): DataFrame = {
    val views = eventStream(s, dir)
      .filter(col("event_type") === "view")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("imp_id"), col("user_id").as("imp_user"),
        col("ts").as("imp_ts"))
    val clicks = eventStream(s, dir)
      .filter(col("event_type") === "click")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("clk_id"), col("user_id").as("clk_user"),
        col("ts").as("clk_ts"))
    val joined = views.join(clicks,
      col("imp_user") === col("clk_user") &&
        col("clk_ts") >= col("imp_ts") &&
        col("clk_ts") < col("imp_ts") + expr("INTERVAL 30 MINUTES"),
      "fullOuter")
      .select(col("imp_id"), col("clk_id"),
        coalesce(col("imp_user"), col("clk_user")).as("user_id"),
        col("imp_ts").cast("timestamp_ntz").as("imp_ts"),
        col("clk_ts").cast("timestamp_ntz").as("clk_ts"))
    drainToSink(joined)
      .orderBy(col("imp_id").asc_nulls_last, col("clk_id").asc_nulls_last)
  }

  /** Oracle-gated stream-stream LEFT SEMI watermarked interval join —
    * the "only matched impressions" mode closing the stream-stream join
    * matrix ([[attributionAvailableNow]] inner,
    * [[attributionOuterAvailableNow]] left, [[attributionFullAvailableNow]]
    * full): each view is emitted AT MOST ONCE, iff some click by the
    * same user lands in its 30-minute window — the dedup-free existence
    * test (an inner join duplicates a view per click; semi never does).
    * Same two independent file-source readers, same two-sided interval
    * condition. Emission: a semi join emits the LEFT row as soon as its
    * first match is buffered (probed and pinned in `StreamSemiJoinSpec`
    * — emission is eager like the inner mode, NOT eviction-driven like
    * the outer null-extensions; state merely remembers "already
    * emitted" to suppress later matches), so a full single-batch drain
    * reproduces the batch semi join with no horizon clause, which is
    * the oracle. Null-user views match nothing (equi-join null
    * semantics), mirrored by the oracle's null-rejecting EXISTS. */
  def attributionSemiAvailableNow(s: SparkSession, dir: String): DataFrame = {
    val views = eventStream(s, dir)
      .filter(col("event_type") === "view")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("imp_id"), col("user_id").as("imp_user"),
        col("ts").as("imp_ts"))
    val clicks = eventStream(s, dir)
      .filter(col("event_type") === "click")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("clk_id"), col("user_id").as("clk_user"),
        col("ts").as("clk_ts"))
    val joined = views.join(clicks,
      col("imp_user") === col("clk_user") &&
        col("clk_ts") >= col("imp_ts") &&
        col("clk_ts") < col("imp_ts") + expr("INTERVAL 30 MINUTES"),
      "leftSemi")
      .select(col("imp_id"), col("imp_user").as("user_id"),
        col("imp_ts").cast("timestamp_ntz").as("imp_ts"))
    drainToSink(joined).orderBy(col("imp_id"))
  }

  /** Oracle-gated stream-stream RIGHT OUTER watermarked interval join —
    * the click-anchored mirror of [[attributionOuterAvailableNow]]
    * (every CLICK reported, attributed or orphaned — the "which clicks
    * have no preceding impression?" audit), completing the join-mode
    * matrix: inner, leftOuter, fullOuter, leftSemi, rightOuter. Same
    * two independent file-source readers, same two-sided interval
    * condition. Matched pairs emit as buffered (no horizon); an
    * unmatched click null-extends on STATE EVICTION under the
    * click-side horizon the full-outer probe pinned —
    * `clk_ts_us <= (wm_ms − 1) · 1000` with
    * `wm_ms = floor(min(maxView, maxClick)_us / 1000) − 600000`, NO
    * 30-minute term (click state only waits for views at-or-below its
    * own instant) — re-pinned through the rightOuter mode by
    * `StreamRightJoinSpec` (the mode shares the full join's click-state
    * machinery, but that is an implementation fact, so the gate gets
    * its own boundary corpus rather than inheriting the pin). Either
    * side empty → per-side-MIN watermark stays at epoch 0 → no null
    * rows. */
  def attributionRightAvailableNow(s: SparkSession, dir: String): DataFrame = {
    val views = eventStream(s, dir)
      .filter(col("event_type") === "view")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("imp_id"), col("user_id").as("imp_user"),
        col("ts").as("imp_ts"))
    val clicks = eventStream(s, dir)
      .filter(col("event_type") === "click")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("clk_id"), col("user_id").as("clk_user"),
        col("ts").as("clk_ts"))
    val joined = views.join(clicks,
      col("imp_user") === col("clk_user") &&
        col("clk_ts") >= col("imp_ts") &&
        col("clk_ts") < col("imp_ts") + expr("INTERVAL 30 MINUTES"),
      "rightOuter")
      .select(col("imp_id"), col("clk_id"),
        col("clk_user").as("user_id"),
        col("imp_ts").cast("timestamp_ntz").as("imp_ts"),
        col("clk_ts").cast("timestamp_ntz").as("clk_ts"))
    drainToSink(joined)
      .orderBy(col("clk_id"), col("imp_id").asc_nulls_last)
  }

  /** Oracle-gated CHAINED STATEFUL pipeline — stream-stream interval
    * join FOLLOWED by a tumbling windowed aggregation in one continuous
    * query (the multiple-stateful-operators capability, SPARK-42376):
    * attribute clicks to impressions, then roll the attributed pairs up
    * to hourly counts — the shape a real-time attribution dashboard
    * runs as ONE topology instead of join-to-sink + batch rollup. The
    * downstream agg windows on the JOIN OUTPUT's impression event time;
    * watermark propagation through the join DELAYS the downstream
    * watermark by the join's left-side state retention — PROBED FACT
    * (δ-sweep in `StreamJoinAggSpec`): a window is emitted iff
    * `end_ms <= wm_ms − 1800000` (wm_ms = ms-floored
    * min(maxView, maxClick) − 10min; 1800000 ms = the 30-minute
    * interval width, the longest a buffered view can still produce
    * in-window joined rows), NON-STRICT at the boundary (δ = 30min
    * exactly → emitted, δ = 30min − 1ms → withheld) — the
    * single-operator horizon `end_ms <= wm_ms` does NOT hold through
    * the chain. Inner matches themselves are complete on a
    * single-data-batch drain (the inner-join gate's no-late argument),
    * so the horizon is purely the downstream agg's emission contract. */
  def joinAggAvailableNow(s: SparkSession, dir: String): DataFrame = {
    val views = eventStream(s, dir)
      .filter(col("event_type") === "view")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("imp_id"), col("user_id").as("imp_user"),
        col("ts").as("imp_ts"))
    val clicks = eventStream(s, dir)
      .filter(col("event_type") === "click")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("clk_id"), col("user_id").as("clk_user"),
        col("ts").as("clk_ts"))
    val joined = views.join(clicks,
      col("imp_user") === col("clk_user") &&
        col("clk_ts") >= col("imp_ts") &&
        col("clk_ts") < col("imp_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("imp_ts"),
        (unix_micros(col("clk_ts")) - unix_micros(col("imp_ts")))
          .as("lag_us"))
    val agg = joined
      .groupBy(window(col("imp_ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("lag_us")).as("lag_us_sum"))
      .select(col("w.start").cast("timestamp_ntz").as("wstart"),
        col("n_pairs"), col("lag_us_sum"))
    drainToSink(agg).orderBy(col("wstart"))
  }

  /** Oracle-gated CHAINED WINDOWED AGGREGATIONS — tumbling hourly
    * counts re-aggregated to daily totals in ONE streaming topology via
    * `window(window_time(w), '1 day')` (SPARK-40925, the agg→agg member
    * of the multiple-stateful-operators family next to the gated
    * join→agg): the shape a metrics pipeline runs as one query instead
    * of hourly-to-sink + batch rollup. `window_time` recovers an event
    * -time column (w.end − 1µs) from the upstream window so the daily
    * window can legally re-window it.
    *
    * PROBED FACT (δ-sweep in `StreamAggAggSpec`): unlike the join→agg
    * chain — whose downstream horizon is DELAYED by the join's
    * state-retention interval — the agg→agg chain carries NO delay: a
    * daily window emits iff `end_ms <= wm_ms` (non-strict, δ = 0 →
    * emitted, δ = −1 ms → withheld), the single-operator windowed-agg
    * horizon. The upstream hour evicts rows whose event time
    * (end − 1µs) is already behind the watermark that evicted them, so
    * the daily windows close on the SAME watermark; the AvailableNow
    * flush batch cascades through both operators (an hour ending
    * exactly at the day end = wm is evicted upstream and aggregated
    * downstream in one drain).
    *
    * Exact money: integer cents ride the chain as longs and divide only
    * at the output projection — re-summing the hourly DOUBLE would
    * compound representation error across levels.
    *
    * Scale shape: both levels are map-side-combinable hash aggregates
    * keyed by (window, type); state is one row per open (hour, type)
    * upstream and (day, type) downstream, watermark-bounded — the
    * hierarchy a 100 TB/day pipeline needs, where re-scanning raw
    * events for the daily rollup would double the ingest cost. */
  def aggAggAvailableNow(s: SparkSession, dir: String): DataFrame = {
    val hourly = eventStream(s, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(graft.queries.cents(col("value")).cast("long")).as("c"))
    val daily = hourly
      .groupBy(window(window_time(col("w")), "1 day").as("d"),
        col("event_type"))
      .agg(sum(col("n")).cast("long").as("n_events"),
        count(lit(1)).as("n_hours"),
        sum(col("c")).cast("long").as("cs"))
      .select(col("d.start").cast("timestamp_ntz").as("day"),
        col("event_type"), col("n_events"), col("n_hours"),
        (col("cs").cast("double") / 100.0).as("sum_value"))
    drainToSink(daily)
      .orderBy(col("day"), col("event_type").asc_nulls_last)
  }

  /** Oracle-gated CHAINED DEDUP → WINDOWED AGGREGATION — the remaining
    * production pair of the multiple-stateful-operators family
    * (join→agg and agg→agg are gated above): at-least-once ingest
    * deduplicated by `dropDuplicatesWithinWatermark`, rolled up to
    * hourly (window, type) counts/sums in ONE topology — the shape an
    * event pipeline runs when its source redelivers (Kafka
    * at-least-once, retried file drops) and re-scanning the raw log to
    * dedup before a batch rollup would double the ingest cost.
    *
    * The dedup key is the WHOLE row identity (event_id, ts, type,
    * value): an at-least-once duplicate is a byte-identical redelivery,
    * and a composite key keeps the survivor's groupable attributes
    * deterministic (a bare event_id key with conflicting payloads would
    * make the downstream window assignment depend on arrival order —
    * the oracle could never replay it). Both engines treat NULL key
    * fields as equal here (Spark dropDuplicates semantics ≡ SQL
    * DISTINCT), so null-salted corpora collapse identically.
    *
    * PROBED FACT (δ-sweep in `StreamDedupAggSpec`): the chain carries
    * NO watermark delay — the hourly window emits iff
    * `end_ms <= wm_ms`, the plain single-operator horizon with its
    * non-strict polarity, like agg→agg and UNLIKE join→agg (whose
    * horizon is delayed by the join's state-retention interval). The
    * dedup operator is pass-through on first sight — it buffers only
    * suppression KEYS, never rows — so nothing upstream can still
    * produce in-window rows once the watermark passes the window end.
    *
    * Scale shape: dedup state is one key per unique row within the
    * watermark horizon (evicted continuously — the unbounded-state trap
    * of plain dropDuplicates is exactly what WithinWatermark exists to
    * fix), and the rollup is a map-side-combinable hash agg; both
    * stages shuffle on their natural keys. */
  def dedupAggAvailableNow(s: SparkSession, dir: String): DataFrame = {
    val deduped = eventStream(s, dir)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id", "ts", "event_type",
        "value")
    val agg = deduped
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(graft.queries.cents(col("value")).cast("long")).as("c"))
      .select(col("w.start").cast("timestamp_ntz").as("wstart"),
        col("event_type"), col("n"),
        (col("c").cast("double") / 100.0).as("sum_value"))
    drainToSink(agg)
      .orderBy(col("wstart"), col("event_type").asc_nulls_last)
  }

  /** Oracle-gated CHAINED DEDUP → STREAM-STREAM INTERVAL JOIN — the
    * last unexplored pair of the multiple-stateful-operators family
    * (join→agg, agg→agg, dedup→agg are gated above): an at-least-once
    * view stream deduplicated by `dropDuplicatesWithinWatermark` and
    * THEN interval-joined to the click stream in ONE topology — the
    * attribution shape when the impression feed redelivers (Kafka
    * at-least-once): without the in-topology dedup every redelivered
    * impression would double its attributed pairs.
    *
    * Redelivery is REAL in this gate, not hypothetical: the view side
    * reads the source TWICE and unions the reads (every view delivered
    * exactly 2×, on every corpus), so the dedup stage is live at gate
    * time — a broken dedup doubles every pair and the hash catches it.
    * The dedup key is the whole projected row identity (event_id, ts,
    * user_id, value — the dedup_agg convention: byte-identical
    * redeliveries collapse, a same-id row with a different payload is
    * a DIFFERENT event and must keep joining), replayed by the oracle
    * as DISTINCT over the same columns.
    *
    * PROBED FACTS (δ-sweep in `StreamDedupJoinSpec`): the chain
    * carries NO emission horizon — inner-join matches emit EAGERLY on
    * first match (a pair at the very end of the timeline, where the
    * watermark never reaches, is still emitted), exactly like the
    * plain inner join gate; and the dedup stage introduces NO delay
    * (pass-through on first sight — it buffers suppression keys, never
    * rows), so on a single-data-batch AvailableNow drain the output is
    * COMPLETE: oracle = DISTINCT views ⋈ clicks, no horizon clause.
    *
    * Scale shape: dedup state is one key per unique view within the
    * watermark horizon (continuously evicted); join state is the
    * interval-bounded per-side buffer of the gated inner join. Both
    * stages shuffle on their natural keys — the dedup on the row
    * identity, the join on user_id. */
  def dedupJoinAvailableNow(s: SparkSession, dir: String): DataFrame = {
    def rawViews = eventStream(s, dir)
      .filter(col("event_type") === "view")
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    val views = rawViews.unionAll(rawViews) // at-least-once: deliver 2x
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id", "ts", "user_id", "value")
      .select(col("event_id").as("imp_id"), col("user_id").as("imp_user"),
        col("ts").as("imp_ts"))
    val clicks = eventStream(s, dir)
      .filter(col("event_type") === "click")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("clk_id"), col("user_id").as("clk_user"),
        col("ts").as("clk_ts"))
    val joined = views.join(clicks,
      col("imp_user") === col("clk_user") &&
        col("clk_ts") >= col("imp_ts") &&
        col("clk_ts") < col("imp_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("imp_id"), col("clk_id"),
        col("clk_user").as("user_id"),
        col("imp_ts").cast("timestamp_ntz").as("imp_ts"),
        col("clk_ts").cast("timestamp_ntz").as("clk_ts"))
    drainToSink(joined).orderBy(col("imp_id"), col("clk_id"))
  }

  /** Oracle-gated FOREACHBATCH sink — the arbitrary-sink escape hatch
    * (the API a production topology uses to MERGE/upsert each
    * micro-batch into stores Spark has no native sink for: JDBC, KV
    * stores, object-store compaction layouts). Update-mode per-type
    * running counts flow into `foreachBatch`, which appends each
    * batch's changed rows tagged with the batch id into a keyed parquet
    * log; the snapshot read resolves per key to the LATEST batch's row
    * — the append-log + compaction-view upsert, resolved by one
    * max(struct(batch_id, …)) aggregate (batch_id is unique per key, so
    * the argmax is decided at the first field). On the single-data-
    * batch drain the snapshot holds each key's batch-0 row = the batch
    * aggregate, which is the oracle; multi-batch update-mode
    * accumulation is pinned engine-side by `StreamingSpec`. The
    * explicit read schema matters: an empty corpus leaves a log with no
    * files. */
  def foreachBatchAvailableNow(s: SparkSession, dir: String): DataFrame = {
    // checkpoint tracked like every sibling gate (stateInspect precedent):
    // eager delete below covers only the success path
    val out = graft.TempLayouts.tracked("graft-febatch-sink").toString
    val ckpt = graft.TempLayouts.tracked("graft-febatch-ckpt").toString
    val counts = eventStream(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.queries.sumMoney(col("value")).as("sum_value"))
    withAdaptiveStatePartitions(s) {
      val q = counts.writeStream
        .outputMode("update")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], id: Long) =>
          batch.withColumn("batch_id", lit(id))
            .write.mode("append").parquet(out)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    releaseStateStores()
    deleteRecursively(new java.io.File(ckpt))
    s.read.schema(counts.schema.add("batch_id", "long")).parquet(out)
      .groupBy(col("event_type"))
      .agg(max(struct(col("batch_id"), col("n"), col("sum_value")))
        .as("m"))
      .select(col("event_type"), col("m.n").as("n"),
        col("m.sum_value").as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** Oracle-gated STATE STORE READER — the operational introspection
    * surface (Spark 4 `statestore` batch source): run the tumbling-agg
    * topology to completion, then read the checkpoint's state store AS
    * A DATAFRAME and report the windows still buffered — i.e. the
    * exact COMPLEMENT of what the append-mode sink received (append
    * eviction removes a window from state when it emits, so post-drain
    * state = windows whose end the final watermark has not passed).
    * This is how an operator answers "what is in flight right now?" —
    * lag dashboards, state-size audits, debugging a stuck watermark —
    * without touching the running query. The checkpoint must survive
    * the drain for the reader to see it (TempLayouts-tracked, unlike
    * the other gates' deleted checkpoints). The oracle is the tumbling
    * oracle's HAVING clause NEGATED — window end STRICTLY ABOVE
    * max(ts) − 10min (emission is non-strict `<=`, so the complement
    * is strict `>`), over the same streaming-timeline event set.
    * The reader's raw schema (key/value structs + partition metadata)
    * is pinned in `StateReaderSpec`; the gate projects it to plain
    * (wstart, n, sum_value) columns per GateSchemaSpec. */
  def stateInspectAvailableNow(s: SparkSession, dir: String): DataFrame = {
    val agg = eventStream(s, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"),
        graft.queries.sumMoney(col("value")).as("sum_value"))
      .select(col("w.start").cast("timestamp_ntz").as("wstart"),
        col("n"), col("sum_value"))
    val out = graft.TempLayouts.tracked("graft-stream-sink").toString
    val ckpt = graft.TempLayouts.tracked("graft-state-ckpt").toString
    withAdaptiveStatePartitions(s) {
      val q = agg.writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    releaseStateStores()
    val st = s.read.format("statestore").load(ckpt)
    // raw reader schema (StateReaderSpec pin): key.window.{start,end};
    // value = the AGG BUFFER, not the result row — {count: long,
    // sum: decimal(38,0), isEmpty: boolean} (buffer field names come
    // from the aggregate functions, not the query aliases; the sum
    // buffer is the pre-division integer-cents accumulator, upcast to
    // decimal by Sum's overflow widening; isEmpty marks a sum that has
    // seen no non-null input — the buffer encoding of SQL's NULL sum)
    st.select(col("key.window.start").cast("timestamp_ntz").as("wstart"),
      col("value.count").as("n"),
      when(col("value.isEmpty"), lit(null).cast("double"))
        .otherwise(col("value.sum").cast("double") / 100.0)
        .as("sum_value"))
      .orderBy(col("wstart"))
  }

  /** Oracle-gated `transformWithState` running totals — the NEWEST
    * stateful operator class in Spark (4.x `StatefulProcessor`: named
    * typed state slots behind a handle, timer surface, RocksDB-mandatory
    * state store — the successor to the `GroupState` API the session/
    * throttle gates exercise): per-user cumulative (count, non-null
    * count, exact cents sum, latest micros), the continuous
    * profile-maintenance shape. The RocksDB provider is set around the
    * drain and restored (the other streaming gates run the default
    * HDFS-backed provider — this gate proves the RocksDB path end to
    * end, including state encoder round-trips through the native store).
    * Emission is per-(batch, user) with cumulative values; in the gate's
    * single-data-batch drain (the convention every stream gate shares)
    * the emitted set IS the batch aggregate over the streaming timeline,
    * which is the oracle — while `TwsSpec` pins the cross-batch
    * semantics the gate can't see (state carries across batches;
    * re-keyed cumulative equals the union aggregate). */
  def twsRunningAvailableNow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      val typed = eventStream(s, dir)
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          coalesce(graft.queries.cents(col("value")).cast("long"), lit(0L))
            .as("cents"),
          when(col("value").isNotNull, 1L).otherwise(0L).as("has_val"))
        .as[TwsIn]
      val out = typed.groupByKey(_.user_id)
        .transformWithState(new RunningTotalsProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Append())
      drainToSink(out.toDF())
        .select(col("user_id"), col("n"), col("n_values"),
          col("sum_cents"), col("last_ts_us"))
        .orderBy(col("user_id"))
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  /** Oracle-gated transformWithState LIST STATE — per-user journeys in
    * an append-log `ListState` ([[JourneyProcessorTws]]): each batch
    * emits the first-5 event-type path under the (ts_us, event_id,
    * event_type) total order plus the user's total event count. Under
    * the single-data-batch drain convention the emission IS the batch
    * walk, which is the oracle (string_agg over the rank ≤ 5 prefix of
    * the same total order). Null-type events are off the journey by
    * contract (a path leg needs a name — mirrored in the oracle); null
    * users off the keyed walk as in the other typed gates. RocksDB
    * provider set around the drain (TWS-mandatory). */
  def twsJourneyAvailableNow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      val typed = eventStream(s, dir)
        .filter(col("user_id").isNotNull && col("event_type").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("event_type"))
        .as[JournIn]
      val out = typed.groupByKey(_.user_id)
        .transformWithState(new JourneyProcessorTws,
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Append())
      drainToSink(out.toDF())
        .select(col("user_id"), col("path"), col("n_events"))
        .orderBy(col("user_id"))
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  /** Oracle-gated transformWithState MAP STATE — per-user per-type
    * counters in a `MapState[String, Long]`
    * ([[TypeCountsProcessorTws]]), each batch emitting every (user,
    * type, count) entry — the point-read/point-write state slot. Under
    * the single-data-batch drain the emitted set is the batch
    * (user, type) aggregate, which is the oracle. Same contract
    * filters and RocksDB wrap as the journey gate. */
  def twsTypeCountsAvailableNow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      val typed = eventStream(s, dir)
        .filter(col("user_id").isNotNull && col("event_type").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("event_type"))
        .as[JournIn]
      val out = typed.groupByKey(_.user_id)
        .transformWithState(new TypeCountsProcessorTws,
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Append())
      drainToSink(out.toDF())
        .select(col("user_id"), col("event_type"), col("n"))
        .orderBy(col("user_id"), col("event_type"))
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  /** Oracle-gated transformWithState SESSIONIZATION with event-time
    * timers — [[SessionProcessorTws]] run over [[sessionAvailableNow]]'s
    * exact input shape (same typed projection, same watermark), sharing
    * `events_stream_session`'s oracle verbatim: one emission arithmetic
    * (sessions close when the ms-floored watermark STRICTLY passes
    * last+gap), two stateful APIs (GroupState timeouts vs TWS timers).
    * RocksDB provider set around the drain like the running-totals
    * gate. */
  def twsSessionAvailableNow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      val typed = eventStream(s, dir)
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"),
          graft.queries.cents(col("value")).cast("long").as("cents"))
        .as[SessIn]
        .withWatermark("ts", "10 minutes")
      val out = typed.groupByKey(_.user_id)
        .transformWithState(new SessionProcessorTws(30),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          OutputMode.Append())
      drainToSink(out.toDF())
        .select(col("user_id"),
          timestamp_micros(col("start_us")).cast("timestamp_ntz")
            .as("session_start"),
          col("n_events"),
          (col("sum_cents").cast("double") / 100.0).as("sum_value"))
        .orderBy(col("user_id"), col("session_start"))
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  /** Oracle-gated stream-static broadcast enrichment — the fifth
    * streaming shape in the gate, and the stateless one: every
    * micro-batch of the event stream left-outer joins a BROADCAST static
    * dimension (customer segment by user id), the standard continuous
    * dimension-enrichment topology. No streaming state store is
    * involved; what the gate verifies is the stream-static join planning
    * itself — the dimension rides the broadcast, the stream side never
    * shuffles, and a drain reproduces the batch left join exactly (the
    * per-batch join is pure, so emission is batch-split-invariant —
    * unlike the stateful shapes, no single-drain caveat is needed).
    * Left outer keeps events with no dimension row (and null-key events
    * join nothing in either engine, so no owner filter is needed).
    * With this, every `StreamingDemo` surface is gated: windowed agg,
    * arbitrary-state sessionization, one-value-state throttle,
    * stream-stream join, stream-static enrich — plus
    * [[dedupAvailableNow]] (the dedup state store, key-projected) and
    * [[countsAvailableNow]] (update-mode running counts via the
    * memory-sink read-back). */
  def enrichAvailableNow(s: SparkSession, dir: String): DataFrame = {
    val dim = broadcast(graft.Tables.table(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment")))
    val enriched = eventStream(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .join(dim, col("user_id") === col("c_custkey"), "left_outer")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_mktsegment").as("segment"))
    drainToSink(enriched).orderBy(col("event_id"))
  }

  /** Oracle-gated streaming ingest dedup — the sixth streaming shape in
    * the hash gate, covering the last stateful operator class: the
    * `dropDuplicatesWithinWatermark` dedup state store. The retry-dedup
    * topology of continuous ingest (at-least-once delivery re-sends the
    * same event id; state per key expires once the watermark passes the
    * horizon, so the store is bounded by recent history instead of all
    * ids ever seen).
    *
    * Determinism: earlier rounds classified this operator un-oracle-able
    * because the FIRST-SEEN surviving row's payload is
    * processing-order-dependent. That is true of the payload — and false
    * of the KEY: projecting the output to the dedup key makes the
    * emitted set exactly the distinct key set of the drain, which is
    * order-independent. The payload-nondeterminism half stays pinned
    * engine-side in `StreamingSpec`/`StreamDedupSpec`; the gate hashes
    * the key-projected form.
    *
    * Emission: in the gate's single-data-batch drain the watermark is at
    * epoch 0 while every row arrives, so no key state expires mid-drain
    * and the emitted set is the GLOBAL distinct on the streaming
    * timeline — which is the oracle (no horizon clause, like the join).
    * Under multi-batch ingest a duplicate arriving after its key's state
    * expired is re-admitted BY DESIGN (the "within watermark" contract —
    * bounded state costs exactly re-admission beyond the horizon);
    * `StreamDedupSpec` pins that boundary with MemoryStream. */
  def dedupAvailableNow(s: SparkSession, dir: String): DataFrame = {
    val deduped = eventStream(s, dir)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"))
    drainToSink(deduped).orderBy(col("event_id"))
  }

  /** Oracle-gated UPDATE-MODE running counts — the seventh streaming
    * shape, closing the LAST `StreamingDemo` surface: the
    * `mapGroupsWithState` per-key accumulator
    * ([[StreamingDemo.runningCounts]], the stream-side analog of the
    * reference reducer's accumulator) emits updated totals in update
    * mode, which has no append-sink read-back — the reason earlier
    * rounds classified it un-oracle-able. The gate instead drives a
    * MEMORY sink: in the single-data-batch drain each key is invoked
    * exactly once, so the sink table holds one row per key carrying the
    * full count — the batch aggregate, which is the oracle (the
    * AvailableNow flush batch invokes no groups and appends nothing).
    * Under multi-batch ingest the sink would hold one row per key PER
    * BATCH (the update-mode contract; `StreamingSpec` pins the
    * accumulation), so the oracle encodes the single-drain shape, like
    * the stream-stream join.
    *
    * The memory sink is the gate-harness stand-in for the keyed store a
    * production topology would `foreachBatch`-upsert into; the
    * OPERATOR's state (one long per key) lives in the distributed state
    * store either way. `value` is unused by the count but `StreamEvent`
    * types it primitive, so null measures are coalesced before the typed
    * boundary (the count is unaffected). */
  def countsAvailableNow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val typed = eventStream(s, dir)
      .select(col("ts"), col("event_type"),
        coalesce(col("value"), lit(0.0)).as("value"))
      .as[StreamEvent]
    val counts = StreamingDemo.runningCounts(typed).toDF("event_type", "n")
    val name = "graft_stream_counts_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    withAdaptiveStatePartitions(s) {
      val q = counts.writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    releaseStateStores()
    s.table(name).orderBy(col("event_type"))
  }

  /** Oracle-gated COMPLETE-mode streaming aggregation — the ninth
    * streaming shape, closing the third of Spark's three output modes
    * (append: windowed sinks; update: [[countsAvailableNow]]; complete:
    * here). A global per-key aggregate with no watermark re-emits its
    * ENTIRE result table every trigger; after the AvailableNow drain the
    * memory sink holds the final snapshot, which equals the batch
    * aggregate under ANY batch split (complete mode's defining
    * invariant — stronger than update mode's single-drain caveat, and
    * the gate's oracle is just the batch GROUP BY). State is one row
    * per key, the production pattern for live dashboards/totals. Null
    * event_type is a legitimate group (nulls-last pinned, as in
    * events_salted_sum); the shared streaming-timeline contract applies
    * via the common source. */
  def totalsAvailableNow(s: SparkSession, dir: String): DataFrame = {
    val agg = eventStream(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.queries.sumMoney(col("value")).as("sum_value"))
    val name = "graft_stream_totals_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    withAdaptiveStatePartitions(s) {
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    releaseStateStores()
    s.table(name).orderBy(col("event_type").asc_nulls_last)
  }

  /** Oracle-gated UPDATE-MODE WINDOWED aggregation — the last open cell
    * of the output-mode × windowed matrix (append×window =
    * `events_stream_tumbling`, update×global = `events_stream_counts`,
    * complete×global = `events_stream_totals`): the same hourly windows
    * as the append gate, emitted under update semantics — every (window,
    * type) group a batch CHANGES is emitted that batch, watermark or
    * not, so the oracle is the plain hourly aggregate with NO horizon
    * clause (the append gate's HAVING is exactly what this mode
    * removes). The memory sink APPENDS each batch's updated rows; on
    * the single-data-batch drain each group updates exactly once and
    * the flush batch only EVICTS watermark-expired state (no
    * re-emission — a duplicate row would break both the row count and
    * the hash), so the table is the batch aggregate. This is the mode a
    * live dashboard consumes (upsert sink keyed by window); the append
    * twin is the mode an immutable log sink needs. */
  def tumblingUpdateAvailableNow(s: SparkSession, dir: String): DataFrame = {
    val agg = eventStream(s, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.queries.sumMoney(col("value")).as("sum_value"))
      .select(col("w.start").cast("timestamp_ntz").as("wstart"),
        col("event_type"), col("n"), col("sum_value"))
    val name = "graft_stream_tumb_upd_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    withAdaptiveStatePartitions(s) {
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    releaseStateStores()
    val t = s.table(name)
    // the no-duplicate-emission contract above rests on the whole corpus
    // landing in ONE data micro-batch; if a source change ever splits
    // the drain, update mode re-emits changed groups per batch and the
    // append-only memory sink accumulates duplicate (wstart, type) rows
    // — surface that as a loud failure here, not a downstream hash diff
    // one aggregate for both guard counts (a separate count() +
    // distinct().count() ran two jobs over the sink per execution)
    val g = t.agg(count(lit(1)),
      count_distinct(struct(col("wstart"), col("event_type")))).head()
    val (emitted, groups) = (g.getLong(0), g.getLong(1))
    require(emitted == groups,
      s"events_stream_tumbling_update: $emitted emissions for $groups " +
        "groups — the single-data-batch drain assumption broke " +
        "(multi-batch update-mode re-emission); the gate needs a " +
        "latest-emission resolution step before it can hash")
    t.orderBy(col("wstart"), col("event_type").asc_nulls_last)
  }

  val queries: Map[String, graft.queries.Q] = Map(
    "events_stream_totals" -> ((s, d) => totalsAvailableNow(s, d)),
    "events_stream_tumbling" -> ((s, d) => tumblingAvailableNow(s, d)),
    "events_stream_tumbling_update" -> ((s, d) =>
      tumblingUpdateAvailableNow(s, d)),
    "events_stream_sliding" -> ((s, d) => slidingAvailableNow(s, d)),
    "events_stream_session" -> ((s, d) => sessionAvailableNow(s, d)),
    "events_stream_session_native" -> ((s, d) =>
      sessionWindowAvailableNow(s, d)),
    "events_stream_throttle" -> ((s, d) => throttleAvailableNow(s, d)),
    "events_stream_join" -> ((s, d) => attributionAvailableNow(s, d)),
    "events_stream_join_outer" -> ((s, d) =>
      attributionOuterAvailableNow(s, d)),
    "events_stream_join_full" -> ((s, d) =>
      attributionFullAvailableNow(s, d)),
    "events_stream_join_semi" -> ((s, d) =>
      attributionSemiAvailableNow(s, d)),
    "events_stream_join_right" -> ((s, d) =>
      attributionRightAvailableNow(s, d)),
    "events_stream_join_agg" -> ((s, d) => joinAggAvailableNow(s, d)),
    "events_stream_agg_agg" -> ((s, d) => aggAggAvailableNow(s, d)),
    "events_stream_dedup_agg" -> ((s, d) => dedupAggAvailableNow(s, d)),
    "events_stream_dedup_join" -> ((s, d) => dedupJoinAvailableNow(s, d)),
    "events_stream_state_inspect" -> ((s, d) =>
      stateInspectAvailableNow(s, d)),
    "events_stream_tws_journey" -> ((s, d) =>
      twsJourneyAvailableNow(s, d)),
    "events_stream_tws_typecounts" -> ((s, d) =>
      twsTypeCountsAvailableNow(s, d)),
    "events_stream_foreachbatch" -> ((s, d) =>
      foreachBatchAvailableNow(s, d)),
    "events_stream_tws_totals" -> ((s, d) =>
      twsRunningAvailableNow(s, d)),
    "events_stream_tws_session" -> ((s, d) =>
      twsSessionAvailableNow(s, d)),
    "events_stream_enrich" -> ((s, d) => enrichAvailableNow(s, d)),
    "events_stream_dedup" -> ((s, d) => dedupAvailableNow(s, d)),
    "events_stream_counts" -> ((s, d) => countsAvailableNow(s, d))
  )

  // append-mode watermark oracle: only windows whose END the final
  // watermark (max ts − 10 min) has passed are ever emitted by the
  // streaming engine, so the oracle closes over the same horizon.
  // Boundary (pinned by the horizon corpus, whose clock span puts a
  // window end EXACTLY on the ms-floored watermark): window eviction is
  // NON-STRICT — a window ending exactly at the watermark IS emitted —
  // which is the opposite polarity from GroupState timeouts (strict <).
  // The oracle's `<=` encodes that; with hour-aligned window ends the
  // µs-vs-ms floor gap is unreachable (a window end can never carry the
  // sub-ms remainder the floor would drop)
  /** The gaps-and-islands session derivation + watermark CTEs shared by
    * all three streaming session oracles — one session arithmetic, three
    * runtime surfaces (GroupState timeouts, TWS timers, the native
    * `session_window` operator), which differ ONLY in their emission
    * clause. */
  private val sessionCtes = """
      WITH ev AS MATERIALIZED (
        SELECT event_id, user_id, ts, value FROM events
        WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'
          AND user_id IS NOT NULL),
      ordered AS (
        SELECT user_id, ts, value,
          CASE WHEN lag(ts) OVER w IS NULL OR
                    ts - lag(ts) OVER w > INTERVAL '30 minutes'
               THEN 1 ELSE 0 END AS new_session,
          event_id
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sessions AS (
        SELECT user_id, ts, value,
          sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM ordered),
      agg AS (
        SELECT user_id, sid,
          min(ts) AS session_start, max(ts) AS session_last,
          count(*) AS n_events,
          CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
            / 100.0 AS sum_value
        FROM sessions GROUP BY user_id, sid),
      marked AS (
        SELECT *, max(sid) OVER (PARTITION BY user_id) AS last_sid
        FROM agg),
      wm AS (
        SELECT epoch_us(max(ts)) // 1000 - 600000 AS wm_ms FROM ev)"""

  /** Shared by `events_stream_session` (GroupState timeouts) and
    * `events_stream_tws_session` (transformWithState timers) — one
    * emission arithmetic, two stateful APIs. */
  private val sessionOracle = sessionCtes + """
      SELECT user_id, session_start, n_events, sum_value
      FROM marked, wm
      WHERE sid < last_sid
         OR epoch_us(session_last) // 1000 + 1800000 < wm_ms
      ORDER BY user_id, session_start"""

  /** The NATIVE `session_window` operator's emission clause, probed in
    * StreamSessionSpec: eviction is watermark-driven for EVERY session
    * (a successor-closed session stays in state until the horizon
    * passes — no `sid < last_sid` escape, unlike the GroupState walk)
    * and NON-strict at microsecond precision — a session whose end
    * (last + gap, µs-exact) equals the ms-floored watermark's µs
    * instant IS emitted (the windowed-agg `<=` polarity, not the
    * GroupState-timeout strict `<`). */
  private val sessionNativeOracle = sessionCtes + """
      SELECT user_id, session_start, n_events, sum_value
      FROM marked, wm
      WHERE epoch_us(session_last) + 1800000000 <= wm_ms * 1000
      ORDER BY user_id, session_start"""

  val oracles: Map[String, String] = Map(
    // complete mode: the final snapshot IS the batch aggregate over the
    // streaming timeline — no horizon clause by construction
    "events_stream_totals" -> """
      SELECT event_type, count(*) AS n,
        CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
          / 100.0 AS sum_value
      FROM events
      WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'
      GROUP BY event_type
      ORDER BY event_type NULLS LAST""",

    "events_stream_tumbling" -> """
      SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
        count(*) AS n,
        CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
      FROM events
      WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'
      GROUP BY wstart, event_type
      HAVING wstart + INTERVAL '1 hour' <=
        (SELECT max(ts) - INTERVAL '10 minutes' FROM events)
      ORDER BY wstart, event_type""",

    // the update-mode twin drops the HAVING horizon: update emits every
    // group the batch changes, watermark or not — the flush batch only
    // evicts (a re-emission would duplicate rows and hash-fail)
    "events_stream_tumbling_update" -> """
      SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
        count(*) AS n,
        CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
      FROM events
      WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'
      GROUP BY wstart, event_type
      ORDER BY wstart, event_type NULLS LAST""",

    // the batch events_sliding two-offset expansion over the streaming
    // timeline, with the same non-strict horizon clause as tumbling but
    // against each window's OWN end (wstart + 2h) — the trailing member
    // of each event's window pair is evicted one slide later
    "events_stream_sliding" -> """
      SELECT time_bucket(INTERVAL '1 hour', ts) - o * INTERVAL '1 hour'
          AS wstart,
        count(*) AS n,
        CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
          / 100.0 AS sum_value
      FROM events CROSS JOIN (VALUES (0), (1)) off(o)
      WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'
      GROUP BY wstart
      HAVING wstart + INTERVAL '2 hours' <=
        (SELECT max(ts) - INTERVAL '10 minutes' FROM events)
      ORDER BY wstart""",

    // gaps-and-islands sessions (same recipe as the batch events_session
    // oracle, per user) plus the APPEND-MODE EMISSION CLAUSE: a session
    // closed by a successor (sid < the user's last sid) is always
    // emitted; the user's final session only if the ms-floored watermark
    // horizon STRICTLY passed its ms-floored close time — the exact
    // GroupState event-time-timeout arithmetic (timeout fires on
    // timeout_ms < watermark_ms, both floored from micros; pinned by the
    // MemoryStream boundary test in StreamSessionSpec). The running-sum
    // window orders by (ts, event_id) — a strict total order — so
    // same-instant events can never land in different sessions by
    // tie-break luck.
    "events_stream_session" -> sessionOracle,

    // the TWS-timer port shares the oracle text verbatim — the gate
    // proves GroupState timeouts and transformWithState timers agree
    "events_stream_tws_session" -> sessionOracle,

    // the native session_window operator shares the session CTEs but
    // carries its own probed emission clause (watermark-driven for all
    // sessions, non-strict µs horizon — see sessionNativeOracle)
    "events_stream_session_native" -> sessionNativeOracle,

    // the batch events_debounce_kept walk (same recursive CTE) over the
    // streaming-timeline event set; deliberately NO horizon clause —
    // kept events are emitted at processing time and state expiry is
    // proven not to change the kept set (throttleByKey scaladoc), so
    // the full-drain emitted set IS the batch kept set
    "events_stream_throttle" -> """
      WITH RECURSIVE ev AS (
        SELECT event_id, user_id, event_type, ts, epoch_us(ts) AS us,
          row_number() OVER (PARTITION BY user_id, event_type
                             ORDER BY ts, event_id) AS rn
        FROM events
        WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'
          AND user_id IS NOT NULL),
      walk AS (
        SELECT user_id, event_type, rn, event_id, ts, us AS kept_us,
          TRUE AS keep
        FROM ev WHERE rn = 1
        UNION ALL
        SELECT e.user_id, e.event_type, e.rn, e.event_id, e.ts,
          CASE WHEN e.us - w.kept_us > 1800000000
               THEN e.us ELSE w.kept_us END,
          e.us - w.kept_us > 1800000000
        FROM walk w JOIN ev e
          ON e.user_id = w.user_id AND e.event_type = w.event_type
         AND e.rn = w.rn + 1)
      SELECT event_id, user_id, event_type, ts FROM walk WHERE keep
      ORDER BY event_id""",

    // the plain batch interval join over the streaming-timeline event
    // set — no horizon clause, see attributionAvailableNow: a full
    // single-batch drain emits every inner match
    "events_stream_join" -> """
      WITH v AS (
        SELECT event_id AS imp_id, user_id, ts AS imp_ts FROM events
        WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'
          AND event_type = 'view'),
      c AS (
        SELECT event_id AS clk_id, user_id, ts AS clk_ts FROM events
        WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'
          AND event_type = 'click')
      SELECT v.imp_id, c.clk_id, v.user_id, v.imp_ts, c.clk_ts
      FROM v JOIN c ON v.user_id = c.user_id
       AND c.clk_ts >= v.imp_ts
       AND c.clk_ts < v.imp_ts + INTERVAL '30 minutes'
      ORDER BY imp_id, clk_id""",

    // the single-data-batch drain makes the one emitted cumulative row
    // per user the plain aggregate over the streaming timeline; null
    // values contribute 0 to the sum and 0 to n_values in both engines
    "events_stream_tws_totals" -> """
      SELECT user_id, count(*) AS n,
        count(value) AS n_values,
        CAST(sum(CASE WHEN value IS NULL THEN 0
                      ELSE CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                 END) AS BIGINT) AS sum_cents,
        epoch_us(max(ts)) AS last_ts_us
      FROM events
      WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'
        AND user_id IS NOT NULL
      GROUP BY user_id
      ORDER BY user_id""",

    // the batch SEMI interval join over the streaming-timeline event set
    // — no horizon clause: semi emission is EAGER (a view emits when its
    // first match is buffered, pinned in StreamSemiJoinSpec), so a full
    // single-batch drain is exactly the batch EXISTS. The equi-join
    // null-semantics (null-user views match nothing) fall out of the
    // correlated EXISTS the same way
    "events_stream_join_semi" -> """
      WITH v AS (
        SELECT event_id AS imp_id, user_id, ts AS imp_ts FROM events
        WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'
          AND event_type = 'view'),
      c AS (
        SELECT user_id, ts AS clk_ts FROM events
        WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'
          AND event_type = 'click')
      SELECT v.imp_id, v.user_id, v.imp_ts
      FROM v
      WHERE EXISTS (
        SELECT 1 FROM c
        WHERE c.user_id = v.user_id
          AND c.clk_ts >= v.imp_ts
          AND c.clk_ts < v.imp_ts + INTERVAL '30 minutes')
      ORDER BY imp_id""",

    // the batch left interval join over the streaming-timeline event set
    // PLUS the outer-emission horizon, pinned by a boundary probe corpus
    // (OuterJoinBoundary notes + StreamOuterJoinSpec): matched pairs
    // always (the inner gate's no-horizon argument); a null-extended
    // view only when the final global watermark closes its window. Three
    // probed facts the clause encodes: (1) the watermark is PER-SIDE —
    // each withWatermark node tracks its OWN filtered stream's max event
    // time, and the global watermark is the MIN over nodes (so a side
    // with no rows pins the watermark at epoch 0 and NO null rows are
    // ever emitted — the CASE WHEN NULL guard, since DuckDB's least()
    // skips nulls); (2) the watermark is ms-FLOORED from the side max
    // (a +700 µs clock remainder is dropped); (3) the eviction compare
    // keeps the view's full µs precision against the ms-grid boundary
    // and is NON-STRICT: a view exactly 30 min before the watermark IS
    // emitted, +1 µs is not — window-eviction polarity (tumbling's <=),
    // NOT the GroupState strict-< one
    "events_stream_join_outer" -> """
      WITH ev AS (
        SELECT event_id, user_id, ts, event_type FROM events
        WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'),
      v AS (
        SELECT event_id AS imp_id, user_id, ts AS imp_ts FROM ev
        WHERE event_type = 'view'),
      c AS (
        SELECT event_id AS clk_id, user_id, ts AS clk_ts FROM ev
        WHERE event_type = 'click'),
      wm AS (
        SELECT CASE WHEN mv IS NULL OR mc IS NULL THEN NULL
          ELSE (epoch_us(least(mv, mc)) // 1000 - 600000 - 1800000) * 1000
          END AS bnd_us
        FROM (SELECT (SELECT max(imp_ts) FROM v) AS mv,
                     (SELECT max(clk_ts) FROM c) AS mc) mm),
      j AS (
        SELECT v.imp_id, c.clk_id, v.user_id, v.imp_ts, c.clk_ts
        FROM v LEFT JOIN c ON v.user_id = c.user_id
         AND c.clk_ts >= v.imp_ts
         AND c.clk_ts < v.imp_ts + INTERVAL '30 minutes')
      SELECT j.imp_id, j.clk_id, j.user_id, j.imp_ts, j.clk_ts
      FROM j, wm
      WHERE j.clk_id IS NOT NULL
         OR epoch_us(j.imp_ts) <= wm.bnd_us
      ORDER BY imp_id, clk_id""",

    // the batch FULL interval join over the streaming-timeline event set
    // with PER-SIDE eviction horizons, both probed (ProbeFullJoin →
    // StreamFullJoinSpec): an unmatched view null-extends under the
    // left-outer horizon (wm − 30min, non-strict µs vs the ms-floored
    // watermark — the interval's width is the view state's lifetime); an
    // unmatched click under its OWN horizon wm − 1ms (non-strict µs) —
    // NO 30-minute term, because a stored click only matches views with
    // imp_ts <= clk_ts and future accepted views sit above the
    // watermark, so click state is releasable one watermark tick past
    // clk_ts itself. The 1 ms is the watermark's granularity, not a
    // magic constant. Both horizons ride the same per-side-min ms-floored
    // watermark; either side empty → bnd NULL → no null rows anywhere
    "events_stream_join_full" -> """
      WITH ev AS (
        SELECT event_id, user_id, ts, event_type FROM events
        WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'),
      v AS (
        SELECT event_id AS imp_id, user_id, ts AS imp_ts FROM ev
        WHERE event_type = 'view'),
      c AS (
        SELECT event_id AS clk_id, user_id, ts AS clk_ts FROM ev
        WHERE event_type = 'click'),
      wm AS (
        SELECT CASE WHEN mv IS NULL OR mc IS NULL THEN NULL
          ELSE epoch_us(least(mv, mc)) // 1000 - 600000 END AS wm_ms
        FROM (SELECT (SELECT max(imp_ts) FROM v) AS mv,
                     (SELECT max(clk_ts) FROM c) AS mc) mm),
      j AS (
        SELECT v.imp_id, c.clk_id,
          coalesce(v.user_id, c.user_id) AS user_id, v.imp_ts, c.clk_ts
        FROM v FULL JOIN c ON v.user_id = c.user_id
         AND c.clk_ts >= v.imp_ts
         AND c.clk_ts < v.imp_ts + INTERVAL '30 minutes')
      SELECT j.imp_id, j.clk_id, j.user_id, j.imp_ts, j.clk_ts
      FROM j, wm
      WHERE (j.imp_id IS NOT NULL AND j.clk_id IS NOT NULL)
         OR (j.clk_id IS NULL
             AND epoch_us(j.imp_ts) <= (wm.wm_ms - 1800000) * 1000)
         OR (j.imp_id IS NULL
             AND epoch_us(j.clk_ts) <= (wm.wm_ms - 1) * 1000)
      ORDER BY imp_id NULLS LAST, clk_id NULLS LAST""",

    // the batch RIGHT interval join over the streaming-timeline event
    // set with the click-side eviction horizon re-pinned through the
    // rightOuter mode by StreamRightJoinSpec: matched pairs always (no
    // horizon); an unmatched click null-extends iff its full-µs instant
    // is NON-STRICTLY at or below (wm_ms − 1) · 1000 — no 30-minute
    // term (click state only waits for views at-or-below its own
    // instant), wm_ms = ms-floored min-side watermark; either side
    // empty → bnd NULL → no null rows
    "events_stream_join_right" -> """
      WITH ev AS (
        SELECT event_id, user_id, ts, event_type FROM events
        WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'),
      v AS (
        SELECT event_id AS imp_id, user_id, ts AS imp_ts FROM ev
        WHERE event_type = 'view'),
      c AS (
        SELECT event_id AS clk_id, user_id, ts AS clk_ts FROM ev
        WHERE event_type = 'click'),
      wm AS (
        SELECT CASE WHEN mv IS NULL OR mc IS NULL THEN NULL
          ELSE epoch_us(least(mv, mc)) // 1000 - 600000 END AS wm_ms
        FROM (SELECT (SELECT max(imp_ts) FROM v) AS mv,
                     (SELECT max(clk_ts) FROM c) AS mc) mm),
      j AS (
        SELECT v.imp_id, c.clk_id, c.user_id, v.imp_ts, c.clk_ts
        FROM v RIGHT JOIN c ON v.user_id = c.user_id
         AND c.clk_ts >= v.imp_ts
         AND c.clk_ts < v.imp_ts + INTERVAL '30 minutes')
      SELECT j.imp_id, j.clk_id, j.user_id, j.imp_ts, j.clk_ts
      FROM j, wm
      WHERE j.imp_id IS NOT NULL
         OR epoch_us(j.clk_ts) <= (wm.wm_ms - 1) * 1000
      ORDER BY clk_id, imp_id NULLS LAST""",

    // the batch interval join rolled up to tumbling hourly windows,
    // with the CHAINED-stateful emission horizon probed by
    // StreamJoinAggSpec: the downstream agg's watermark is the global
    // one DELAYED by the join's left-side state retention (the
    // 30-minute interval width), so a window emits iff
    // end_ms <= wm_ms − 1800000, non-strict at the boundary (the
    // windowed-agg polarity). Window ends sit on the ms grid, so the
    // ms-floored-watermark subtlety never bites here — but the clause
    // keeps the floored form to match the pinned arithmetic verbatim
    "events_stream_join_agg" -> """
      WITH ev AS (
        SELECT user_id, ts, event_type FROM events
        WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'),
      v AS (SELECT user_id, ts AS imp_ts FROM ev WHERE event_type = 'view'),
      c AS (SELECT user_id, ts AS clk_ts FROM ev WHERE event_type = 'click'),
      wm AS (
        SELECT CASE WHEN mv IS NULL OR mc IS NULL THEN NULL
          ELSE epoch_us(least(mv, mc)) // 1000 - 600000 END AS wm_ms
        FROM (SELECT (SELECT max(imp_ts) FROM v) AS mv,
                     (SELECT max(clk_ts) FROM c) AS mc) mm),
      j AS (
        SELECT v.imp_ts,
          epoch_us(c.clk_ts) - epoch_us(v.imp_ts) AS lag_us
        FROM v JOIN c ON v.user_id = c.user_id
         AND c.clk_ts >= v.imp_ts
         AND c.clk_ts < v.imp_ts + INTERVAL '30 minutes'),
      w AS (
        SELECT time_bucket(INTERVAL '1 hour', imp_ts) AS wstart,
          count(*) AS n_pairs,
          CAST(sum(lag_us) AS BIGINT) AS lag_us_sum
        FROM j GROUP BY 1)
      SELECT w.wstart, w.n_pairs, w.lag_us_sum
      FROM w, wm
      WHERE epoch_us(w.wstart) // 1000 + 3600000 <= wm.wm_ms - 1800000
      ORDER BY wstart""",

    // hourly → daily replayed relationally; the horizon is the PLAIN
    // windowed-agg clause against the daily end (day + 24h) with NO
    // chain delay — the probed agg→agg fact (δ-sweep in
    // StreamAggAggSpec: δ = 0 emits, δ = −1 ms withholds), in contrast
    // to the join→agg oracle above whose horizon subtracts the join's
    // 30-minute state retention. Cents stay integer through both
    // levels; a day emits only with every hour already evicted
    // upstream, so its content is complete by construction
    "events_stream_agg_agg" -> """
      WITH ev AS (
        SELECT ts, event_type, value FROM events
        WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'),
      hourly AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS h, event_type,
          count(*) AS n,
          sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS c
        FROM ev GROUP BY h, event_type),
      wm AS (SELECT epoch_us(max(ts)) // 1000 - 600000 AS wm_ms FROM ev),
      daily AS (
        SELECT time_bucket(INTERVAL '1 day', h) AS day, event_type,
          CAST(sum(n) AS BIGINT) AS n_events,
          count(*) AS n_hours,
          CAST(sum(c) AS DOUBLE) / 100.0 AS sum_value
        FROM hourly GROUP BY day, event_type)
      SELECT day, event_type, n_events, n_hours, sum_value
      FROM daily, wm
      WHERE epoch_us(day) // 1000 + 86400000 <= wm_ms
      ORDER BY day, event_type NULLS LAST""",

    // dedup replayed as DISTINCT over the whole row identity (both
    // engines treat NULL key fields as equal), then the hourly rollup
    // under the PLAIN windowed-agg horizon — the probed dedup→agg fact
    // (δ-sweep in StreamDedupAggSpec: δ = 0 emits, δ = −1 ms withholds;
    // no chain delay, like agg→agg and unlike join→agg). The watermark
    // reads the PRE-dedup timeline; max ts is dedup-invariant
    "events_stream_dedup_agg" -> """
      WITH ev AS (
        SELECT ts, event_type, value FROM events
        WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'),
      ded AS (
        SELECT DISTINCT event_id, ts, event_type, value FROM events
        WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'),
      wm AS (SELECT epoch_us(max(ts)) // 1000 - 600000 AS wm_ms FROM ev),
      w AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
          count(*) AS n,
          CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
            AS DOUBLE) / 100.0 AS sum_value
        FROM ded GROUP BY wstart, event_type)
      SELECT w.wstart, w.event_type, w.n, w.sum_value
      FROM w, wm
      WHERE epoch_us(w.wstart) // 1000 + 3600000 <= wm.wm_ms
      ORDER BY wstart, event_type NULLS LAST""",

    // dedup replayed as DISTINCT over the projected view identity (the
    // 2x redelivery union collapses; both engines treat NULL key
    // fields as equal), then the plain interval join with NO horizon
    // clause — the probed dedup→join fact (StreamDedupJoinSpec:
    // inner-join matches emit eagerly on first match, a pair past the
    // watermark's reach still emits; dedup is pass-through on first
    // sight, so a single-data-batch drain is complete). DISTINCT keeps
    // value so a same-id view with a different payload joins twice,
    // exactly like the streaming key
    "events_stream_dedup_join" -> """
      WITH v AS (
        SELECT DISTINCT event_id AS imp_id, user_id, ts AS imp_ts, value
        FROM events
        WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'
          AND event_type = 'view'),
      c AS (
        SELECT event_id AS clk_id, user_id, ts AS clk_ts FROM events
        WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'
          AND event_type = 'click')
      SELECT v.imp_id, c.clk_id, v.user_id, v.imp_ts, c.clk_ts
      FROM v JOIN c ON v.user_id = c.user_id
       AND c.clk_ts >= v.imp_ts
       AND c.clk_ts < v.imp_ts + INTERVAL '30 minutes'
      ORDER BY imp_id, clk_id""",

    // the single-data-batch drain puts each key's batch-0 row in the
    // foreachBatch log, and the latest-batch upsert read resolves to
    // exactly the batch aggregate over the streaming timeline
    "events_stream_foreachbatch" -> """
      SELECT event_type, count(*) AS n,
        CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
          / 100.0 AS sum_value
      FROM events
      WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'
      GROUP BY event_type
      ORDER BY event_type""",

    // the single-data-batch drain makes each user's one emission the
    // full batch walk: first-5 path under the (ts_us, event_id,
    // event_type) total order + total count; null-type legs off the
    // journey, null users off the keyed walk
    "events_stream_tws_journey" -> """
      WITH e AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
        FROM events
        WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'
          AND user_id IS NOT NULL AND event_type IS NOT NULL),
      r AS (
        SELECT user_id, event_type,
          row_number() OVER (PARTITION BY user_id
            ORDER BY ts_us, event_id, event_type) AS rn
        FROM e)
      SELECT r.user_id,
        string_agg(CASE WHEN rn <= 5 THEN event_type END, '>'
          ORDER BY rn) AS path,
        count(*) AS n_events
      FROM r
      GROUP BY r.user_id
      ORDER BY r.user_id""",

    // one emission per (user, type) in the single drain = the batch
    // aggregate over the same contract-filtered event set
    "events_stream_tws_typecounts" -> """
      SELECT user_id, event_type, count(*) AS n
      FROM events
      WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'
        AND user_id IS NOT NULL AND event_type IS NOT NULL
      GROUP BY user_id, event_type
      ORDER BY user_id, event_type""",

    // the COMPLEMENT of the tumbling emission set: post-drain agg state
    // holds exactly the windows the append sink did not emit, so the
    // horizon clause is the tumbling oracle's HAVING negated (emission
    // is non-strict <=, the complement is strict >); a null-sum window
    // (all values null) surfaces as isEmpty in the buffer and NULL here
    "events_stream_state_inspect" -> """
      SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart,
        count(*) AS n,
        CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
          / 100.0 AS sum_value
      FROM events
      WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'
      GROUP BY wstart
      HAVING NOT (wstart + INTERVAL '1 hour' <=
        (SELECT max(ts) - INTERVAL '10 minutes' FROM events))
      ORDER BY wstart""",

    // the plain batch left join over the streaming-timeline event set —
    // stream-static enrichment is stateless and per-batch pure, so the
    // drained output IS the batch join under any batch split
    "events_stream_enrich" -> """
      SELECT e.event_id, e.user_id, e.event_type,
        c.c_mktsegment AS segment
      FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
      WHERE e.ts IS NOT NULL
        AND e.ts >= TIMESTAMP '1970-01-01 00:00:00'
      ORDER BY e.event_id""",

    // the global distinct key set over the streaming-timeline event set —
    // no horizon clause, see dedupAvailableNow: a single-batch drain
    // dedups every row before any key state can expire
    "events_stream_dedup" -> """
      SELECT DISTINCT event_id FROM events
      WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'
      ORDER BY event_id""",

    // the plain batch count over the streaming-timeline event set — a
    // single-batch drain invokes each key's accumulator exactly once, so
    // the update-mode memory sink holds the batch aggregate (see
    // countsAvailableNow)
    "events_stream_counts" -> """
      SELECT event_type, count(*) AS n FROM events
      WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'
      GROUP BY event_type
      ORDER BY event_type"""
  )
}
