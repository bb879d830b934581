package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The gated streaming ingest dedup (`events_stream_dedup`,
  * [[graft.streaming.StreamingRun.dedupAvailableNow]]): the key-projected
  * output is deterministic (a distinct key set), the single-drain form
  * equals batch distinct, and the "within watermark" boundary means a key
  * whose state expired is RE-ADMITTED — bounded state costs exactly
  * re-admission beyond the horizon, pinned here so the contract is a
  * test, not a comment. */
class StreamDedupSpec extends SparkSpec {

  private def ts(h: Int, m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("dup ids collapse within the watermark horizon; an id re-sent " +
    "beyond it is re-admitted (bounded-state contract)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val q = in.toDF().toDF("event_id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .select("event_id")
      .writeStream.format("memory").queryName("sd_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // in-batch dup at different instants + a distinct key
      in.addData((1L, ts(1, 0)), (1L, ts(1, 2)), (2L, ts(1, 0)))
      q.processAllAvailable()
      // cross-batch dup, still within the watermark horizon: dropped
      in.addData((1L, ts(1, 5)))
      q.processAllAvailable()
      // advance the watermark hours past key 1's expiry, evicting it
      in.addData((9L, ts(9, 0)))
      q.processAllAvailable()
      // the same id re-sent after expiry is a NEW key to the store
      in.addData((1L, ts(9, 1)))
      q.processAllAvailable()
      val ids = spark.table("sd_out").collect().map(_.getLong(0)).toSeq
      assert(ids.count(_ == 1L) == 2,
        s"expected post-expiry re-admission of id 1, got $ids")
      assert(ids.count(_ == 2L) == 1 && ids.count(_ == 9L) == 1)
    } finally q.stop()
  }

  test("gated single-drain form equals the batch distinct key set on the " +
    "streaming timeline") {
    val d = SparkEntry.smokeDir
    val streamed = graft.streaming.StreamingRun.dedupAvailableNow(spark, d)
      .collect().map(_.getLong(0)).toSeq
    val batch = Tables.events(spark, d)
      .filter(col("ts").isNotNull && col("ts") >= timestamp_micros(lit(0L)))
      .select(col("event_id")).distinct().orderBy(col("event_id"))
      .collect().map(_.getLong(0)).toSeq
    assert(streamed == batch)
  }
}
