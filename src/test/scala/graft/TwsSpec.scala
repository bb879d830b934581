package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import graft.streaming.{RunningTotalsProcessor, SessIn, TwsIn}

/** Pins for the `transformWithState` running-totals processor behind
  * `events_stream_tws_totals` — the cross-batch semantics the
  * single-drain gate can't see:
  *
  *  1. state CARRIES across micro-batches: after batch 2, a user's
  *     emitted row equals the aggregate of BOTH batches' rows (not batch
  *     2 alone), and equals what one combined batch would emit;
  *  2. per-batch emission: each batch emits exactly one row per key
  *     present in it (keys absent from a batch emit nothing — state is
  *     not re-scanned);
  *  3. null-value encoding: cents=0 ∧ has_val=0 rows raise n but not
  *     n_values or the sum.
  *
  * Runs under the RocksDB provider, as the gate does (transformWithState
  * refuses the default HDFS-backed store).
  */
class TwsSpec extends SparkSpec {

  private def run(batches: Seq[Seq[TwsIn]]): Seq[Seq[(Long, Long, Long, Long, Long)]] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[TwsIn]
      val name = s"tws_out_${System.nanoTime()}"
      val q = in.toDS().groupByKey(_.user_id)
        .transformWithState(new RunningTotalsProcessor,
          TimeMode.None(), OutputMode.Append())
        .toDF()
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        val out = Seq.newBuilder[Seq[(Long, Long, Long, Long, Long)]]
        var seen = 0
        for (b <- batches) {
          in.addData(b: _*)
          q.processAllAvailable()
          val all = spark.table(name).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
              r.getLong(3), r.getLong(4))).toSeq
          out += all.drop(seen)
          seen = all.size
        }
        out.result()
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("state carries across batches; emission is per-batch cumulative") {
    val b1 = Seq(TwsIn(1L, 100L, 500L, 1L), TwsIn(1L, 200L, 300L, 1L),
      TwsIn(2L, 150L, 700L, 1L))
    val b2 = Seq(TwsIn(1L, 50L, 100L, 1L), // late row: maxTs stays 200
      TwsIn(3L, 900L, 0L, 0L)) //            null-value row for a new user
    val Seq(e1, e2) = run(Seq(b1, b2))
    assert(e1.toSet == Set((1L, 2L, 2L, 800L, 200L), (2L, 1L, 1L, 700L, 150L)))
    // batch 2: user 1 CUMULATIVE (3 events, 900 cents, maxTs still 200);
    // user 2 absent (no emission without input); user 3 null-value row
    assert(e2.toSet == Set((1L, 3L, 3L, 900L, 200L), (3L, 1L, 0L, 0L, 900L)))
  }

  test("TWS timer polarity: the +1ms-compensated session processor " +
    "agrees with the GroupState walk exactly AT the eviction boundary") {
    import org.apache.spark.sql.functions._
    // a session whose close time + gap lands EXACTLY on the ms-floored
    // watermark: GroupState's strict timeout WITHHOLDS it; raw TWS timers
    // fire non-strictly and would emit it — the probe that forced the
    // +1ms registration (see SessionProcessorTws doc). Corpus: clock at
    // maxTs; user 1's last event at wm − 30min exactly (withheld); user
    // 2's at wm − 30min − 1ms (emitted).
    val T0 = 1704067200000000L
    val MINu = 60L * 1000000L
    val maxTs = T0 + 200 * MINu + 700L // +700 µs: exercise the ms floor
    val wmMs = maxTs / 1000L - 600000L
    val onBoundary = (wmMs - 1800000L) * 1000L
    val dir = TempLayouts.tracked("graft-twsb").toString
    locally {
      import spark.implicits._
      Seq((0L, maxTs, 999L, "clk"), (1L, onBoundary, 1L, "a"),
        (2L, onBoundary - 1000L, 2L, "a"))
        .toDF("event_id", "ts_us", "user_id", "event_type")
        .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
          col("user_id"), col("event_type"), lit(1.0).as("value"),
          lit("""{"k":1}""").as("props"))
        .repartition(1)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val groupState = rows(
      graft.streaming.StreamingRun.sessionAvailableNow(spark, dir))
    val tws = rows(
      graft.streaming.StreamingRun.twsSessionAvailableNow(spark, dir))
    assert(groupState == Set(2L -> 1L),
      s"GroupState emitted the wrong set: $groupState")
    assert(tws == groupState,
      s"TWS session diverged from GroupState at the boundary: $tws")
    Caching.releaseAll(); spark.catalog.clearCache()
  }

  test("two batches end in the same state as one combined batch") {
    val rows = (1L to 20L).map(i => TwsIn(i % 3, i * 10L, i * 7L, i % 2))
    val split = run(Seq(rows.take(11), rows.drop(11)))
    val combined = run(Seq(rows))
    // the LAST emission per user in the split run == the combined run's
    val lastSplit = (split.head ++ split.last).groupBy(_._1)
      .map { case (u, rs) => rs.last }.toSet
    // (batch order within run: later batch's rows come from drop(seen),
    // so rs.last is the most recent emission for that user)
    assert(lastSplit == combined.head.toSet)
  }

  /** Drive [[TtlCountProcessor]] through two poll-then-stop drains
    * sharing one checkpoint, with a wall-clock pause between them;
    * returns the per-drain emitted counts for key 1.
    *
    * Two PROBED engine constraints shape this harness: (1) TTL is
    * ProcessingTime-mode-ONLY — `validateTTLConfig` rejects EventTime
    * with STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL; (2) a
    * ProcessingTime-mode TWS query re-triggers micro-batches endlessly
    * EVEN UNDER AvailableNow (TransformWithStateExec keeps requesting
    * batches to advance wall-clock timers/TTL: 1,900+ empty batches
    * observed before this harness's first form was killed), so neither
    * awaitTermination nor processAllAvailable ever returns — each drain
    * polls the file sink for the expected emission and then stop()s the
    * query, the checkpoint making the seam exactly-once. */
  private def runTtl(ttlMs: Long, pauseMs: Long): Seq[Seq[Long]] = {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      val root = TempLayouts.tracked("graft-ttl").toString
      val src = s"$root/in"
      def addFile(tag: Long): Unit =
        Seq(TwsIn(1L, tag, 10L, 1L)).toDF()
          .repartition(1).write.mode("append").parquet(src)
      addFile(1L)
      val schema = spark.read.parquet(src).schema
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_1",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("_2",
          org.apache.spark.sql.types.LongType)))
      def sinkCounts(): Seq[Long] =
        spark.read.schema(outSchema).parquet(s"$root/out")
          .collect().map(_.getLong(1)).toSeq
      def drain(expectRows: Int): Unit = {
        val q = spark.readStream.schema(schema).parquet(src)
          .as[TwsIn].groupByKey(_.user_id)
          .transformWithState(new TtlCountProcessor(ttlMs),
            TimeMode.ProcessingTime(), OutputMode.Append())
          .toDF()
          .writeStream.format("parquet").option("path", s"$root/out")
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try {
          val deadline = System.nanoTime() + 120L * 1000000000L
          while (sinkCounts().length < expectRows &&
            System.nanoTime() < deadline) Thread.sleep(200L)
          assert(sinkCounts().length >= expectRows,
            s"drain never emitted $expectRows rows within 120s")
        } finally q.stop()
      }
      drain(1)
      val first = sinkCounts()
      if (pauseMs > 0) Thread.sleep(pauseMs)
      addFile(2L)
      drain(2)
      val all = sinkCounts()
      Seq(first, all.diff(first))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("TTLConfig state expiry is ENGINE-SIDE ONLY (wall-clock-based, " +
    "so no event-time oracle can replay it): a ValueState past its TTL " +
    "between drains reads as absent and re-initializes") {
    // TTL anchors to wall-clock processing time, not event time: DuckDB
    // replaying the event timeline cannot reproduce WHEN a batch ran,
    // so expiry is pinned here rather than oracle-gated (the
    // dedup-payload precedent for un-oracle-able runtime facts).
    // Generous margins: a 500ms TTL vs a 5s pause — the assertion is on
    // which side of the TTL the second drain lands, not on timing
    // precision. The restart seam also pins that TTL deadlines PERSIST
    // in the checkpoint (expiry applies to recovered state, not only to
    // store-resident entries).
    val expired = runTtl(ttlMs = 500L, pauseMs = 5000L)
    assert(expired === Seq(Seq(1L), Seq(1L)),
      "state past its TTL must read as absent (count restarts at 1)")
    // control: a TTL far beyond the pause keeps the state alive
    val kept = runTtl(ttlMs = 3600000L, pauseMs = 0L)
    assert(kept === Seq(Seq(1L), Seq(2L)),
      "unexpired TTL state must carry across drains")
  }
}

/** Minimal TTL probe processor: per-key running count in a ValueState
  * registered with a wall-clock TTL — the state slot variant the gated
  * processors deliberately avoid (TTLConfig.NONE) because its expiry is
  * wall-clock-driven and therefore un-oracle-able. */
final class TtlCountProcessor(ttlMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, TwsIn, (Long, Long)] {
  import org.apache.spark.sql.streaming.{TTLConfig, ValueState}
  @transient private var st: ValueState[Long] = _

  override def init(outputMode: OutputMode,
                    timeMode: org.apache.spark.sql.streaming.TimeMode)
      : Unit =
    st = getHandle.getValueState[Long]("cnt",
      org.apache.spark.sql.Encoders.scalaLong,
      TTLConfig(java.time.Duration.ofMillis(ttlMs)))

  override def handleInputRows(key: Long, rows: Iterator[TwsIn],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(Long, Long)] = {
    val n = (if (st.exists()) st.get() else 0L) + rows.size
    st.update(n)
    Iterator.single((key, n))
  }
}
