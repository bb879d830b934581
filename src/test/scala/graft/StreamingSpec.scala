package graft

import graft.streaming.{StreamEvent, StreamingDemo}
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming surface: windowed counts with a watermark, and the
  * mapGroupsWithState custom-state operator, driven by MemoryStream. */
class StreamingSpec extends SparkSpec {

  private def ts(h: Int, m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("watermarked tumbling window counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamEvent]
    val q = StreamingDemo.windowedCounts(in.toDF())
      .writeStream.format("memory").queryName("wc_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(StreamEvent(ts(1, 5), "click", 1.0),
        StreamEvent(ts(1, 20), "click", 2.0),
        StreamEvent(ts(1, 30), "view", 3.0))
      q.processAllAvailable()
      // advance watermark past 02:10 so the 01:00 window closes
      in.addData(StreamEvent(ts(3, 0), "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table("wc_out").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(rows === Set((ts(1, 0), "click", 2L), (ts(1, 0), "view", 1L)))
    } finally q.stop()
  }

  test("streaming dedup drops duplicate keys across batches within watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamEvent]
    val q = StreamingDemo.dedupedStream(in.toDF(), Seq("event_type"))
      .writeStream.format("memory").queryName("dd_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(StreamEvent(ts(1, 0), "click", 1.0),
        StreamEvent(ts(1, 2), "click", 2.0)) // in-batch dup, different ts
      q.processAllAvailable()
      in.addData(StreamEvent(ts(1, 5), "click", 3.0)) // cross-batch dup
      q.processAllAvailable()
      in.addData(StreamEvent(ts(1, 1), "view", 1.0)) // distinct key survives
      q.processAllAvailable()
      val rows = spark.table("dd_out").collect()
        .map(r => (r.getTimestamp(0), r.getString(1)))
      assert(rows.length === 2)
      assert(rows.map(_._2).sorted.toSeq === Seq("click", "view"))
    } finally q.stop()
  }

  test("late data behind the watermark is dropped from closed windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamEvent]
    val q = StreamingDemo.windowedCounts(in.toDF())
      .writeStream.format("memory").queryName("late_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(StreamEvent(ts(1, 5), "click", 1.0))
      q.processAllAvailable()
      // watermark advances to 03:50; the 01:00 window closes and emits
      in.addData(StreamEvent(ts(4, 0), "click", 1.0))
      q.processAllAvailable()
      // a straggler for the closed 01:00 window must be dropped
      in.addData(StreamEvent(ts(1, 30), "click", 99.0))
      // push the watermark far ahead so any (incorrect) re-emission flushes
      in.addData(StreamEvent(ts(9, 0), "click", 1.0))
      q.processAllAvailable()
      val w1 = spark.table("late_out").collect()
        .filter(_.getTimestamp(0) === ts(1, 0))
        .map(r => r.getLong(2))
      assert(w1.toSeq === Seq(1L)) // straggler not counted, no re-emit
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization matches batch session_window") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      StreamEvent(ts(1, 0), "click", 1.0),
      StreamEvent(ts(1, 10), "click", 1.0), // same session (gap 30m)
      StreamEvent(ts(2, 0), "click", 1.0),  // new session (50m gap)
      StreamEvent(ts(1, 5), "view", 1.0))
    val in = MemoryStream[StreamEvent]
    val q = StreamingDemo.sessionize(in.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      // out-of-order but within the watermark (wm = 02:00 - 10m = 01:50):
      // extends the open 02:00 session backwards to 01:55; the 02:30
      // event is EXACTLY gap after 02:00 — session_window merges
      // touching windows, so it must join the session, not start one
      // (the boundary the horizon probe corpus caught in the oracle)
      in.addData(StreamEvent(ts(1, 55), "click", 1.0),
        StreamEvent(ts(2, 30), "click", 1.0))
      q.processAllAvailable()
      // advance the watermark far past every session close time, then one
      // more trigger so event-time timeouts fire and emit
      in.addData(StreamEvent(ts(9, 0), "other", 1.0))
      q.processAllAvailable()
      in.addData(StreamEvent(ts(10, 0), "other", 1.0))
      q.processAllAvailable()
      val streamed = spark.table("sess_out").collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
        .filter(_._1 != "other").toSet
      // batch truth: native session_window over the same rows (including
      // the out-of-order one)
      val batch = (events ++ Seq(StreamEvent(ts(1, 55), "click", 1.0),
        StreamEvent(ts(2, 30), "click", 1.0))).toDF()
        .groupBy(session_window(col("ts"), "30 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"), col("w.start"), col("n"))
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming throttle matches the batch debounce-to-last-kept walk") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    // a 2-hour burst every 10 minutes on one key plus sparse events on a
    // second key, fed across three in-event-time-order micro-batches
    val burst = (0 until 13).map(i => StreamEvent(ts(1 + i / 6, (i % 6) * 10),
      "click", i.toDouble))
    val sparse = Seq(StreamEvent(ts(1, 5), "view", 0.0),
      StreamEvent(ts(2, 20), "view", 1.0))
    val all = (burst ++ sparse).sortBy(_.ts.getTime)
    val (b1, rest) = all.splitAt(5)
    val (b2, b3) = rest.splitAt(5)
    val in = MemoryStream[StreamEvent]
    val q = StreamingDemo.throttle(in.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("thr_out")
      .outputMode(OutputMode.Append()).start()
    try {
      Seq(b1, b2, b3).foreach { b =>
        in.addData(b: _*); q.processAllAvailable()
      }
      val streamed = spark.table("thr_out").collect()
        .map(r => (r.getAs[String]("event_type"),
          r.getAs[Timestamp]("ts"))).toSet
      // batch truth: the same rows through the oracled batch walk
      val batchKept = graft.queries.Events.debounceKept(
        all.zipWithIndex.map { case (e, i) =>
          (i.toLong, 1L, e.event_type, e.ts) }
          .toDF("event_id", "user_id", "event_type", "ts"),
        gapUs = 30L * 60 * 1000000)
        .select(col("event_type"), col("ts").cast("timestamp"))
        .collect().map(r => (r.getString(0), r.getTimestamp(1))).toSet
      assert(streamed === batchKept)
      // and the burst really was throttled, not silenced after its head
      assert(streamed.count(_._1 == "click") > 1)
    } finally q.stop()
  }

  test("streaming throttle state survives expiry without changing the " +
    "kept set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamEvent]
    val q = StreamingDemo.throttle(in.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("thr_exp_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(StreamEvent(ts(1, 0), "click", 1.0))
      q.processAllAvailable()
      // advance the watermark far past lastKept + gap so the state times
      // out and is removed ...
      in.addData(StreamEvent(ts(8, 0), "other", 1.0))
      q.processAllAvailable()
      // ... then a post-expiry event on the original key must still be
      // kept (it is > gap after the last kept event by construction)
      in.addData(StreamEvent(ts(8, 30), "click", 2.0))
      q.processAllAvailable()
      val clicks = spark.table("thr_exp_out").collect()
        .filter(_.getAs[String]("event_type") == "click")
        .map(_.getAs[Timestamp]("ts")).toSet
      assert(clicks === Set(ts(1, 0), ts(8, 30)))
    } finally q.stop()
  }

  test("stream-static broadcast join enriches without dropping unmatched") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("click", "ui"), ("view", "ui"), ("error", "ops"))
      .toDF("event_type", "category")
    val in = MemoryStream[StreamEvent]
    val q = StreamingDemo.enrich(in.toDF(), dim, "event_type")
      .select(col("event_type"), col("category"))
      .writeStream.format("memory").queryName("en_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(StreamEvent(ts(1, 0), "click", 1.0),
        StreamEvent(ts(1, 1), "error", 2.0),
        StreamEvent(ts(1, 2), "purchase", 3.0)) // no dim row
      q.processAllAvailable()
      val rows = spark.table("en_out").collect()
        .map(r => (r.getString(0), Option(r.getString(1)))).toSet
      assert(rows === Set(("click", Some("ui")), ("error", Some("ops")),
        ("purchase", None)))
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks within the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[StreamEvent]
    val clks = MemoryStream[StreamEvent]
    val q = StreamingDemo.attribute(imps.toDF(), clks.toDF(),
      windowMinutes = 30)
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append()).start()
    try {
      imps.addData(StreamEvent(ts(1, 0), "banner", 1.0),
        StreamEvent(ts(1, 0), "popup", 1.0))
      clks.addData(
        StreamEvent(ts(1, 10), "banner", 1.0), // within 30m → matches
        StreamEvent(ts(1, 45), "banner", 1.0), // outside 30m → dropped
        StreamEvent(ts(1, 5), "sidebar", 1.0)) // no impression → dropped
      q.processAllAvailable()
      // push both watermarks far ahead so inner-join state flushes
      imps.addData(StreamEvent(ts(9, 0), "other", 1.0))
      clks.addData(StreamEvent(ts(9, 0), "other2", 1.0))
      q.processAllAvailable()
      val rows = spark.table("attr_out").collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2)))
        .toSet
      assert(rows === Set(("banner", ts(1, 0), ts(1, 10))))
    } finally q.stop()
  }

  test("streaming parquet sink: exactly the streamed rows land on disk") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-ssink").toString
    val in = MemoryStream[StreamEvent]
    val q = in.toDF()
      .writeStream.format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/ckpt")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(StreamEvent(ts(1, 0), "click", 1.0))
      q.processAllAvailable()
      in.addData(StreamEvent(ts(1, 5), "view", 2.0))
      q.processAllAvailable()
      val back = spark.read.parquet(s"$out/data")
        .collect().map(r => (r.getAs[Timestamp]("ts"),
          r.getAs[String]("event_type"))).toSet
      assert(back === Set((ts(1, 0), "click"), (ts(1, 5), "view")))
    } finally q.stop()
  }

  test("mapGroupsWithState running counts accumulate across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamEvent]
    val q = StreamingDemo.runningCounts(in.toDS())
      .toDF("event_type", "total")
      .writeStream.format("memory").queryName("rc_out")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(StreamEvent(ts(1, 0), "click", 1.0),
        StreamEvent(ts(1, 1), "click", 1.0))
      q.processAllAvailable()
      in.addData(StreamEvent(ts(1, 2), "click", 1.0),
        StreamEvent(ts(1, 3), "view", 1.0))
      q.processAllAvailable()
      val latest = spark.table("rc_out").collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      assert(latest === Map("click" -> 3L, "view" -> 1L))
    } finally q.stop()
  }
}
