package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Checkpoint-resume pins: the operational property none of the gated
  * single-drain topologies can show — a RESTARTED query (same sink, same
  * checkpoint) is exactly-once end to end:
  *
  *  1. the second drain processes ONLY files the checkpoint's source log
  *     has not seen (no reprocessing: windows emitted by drain 1 are not
  *     re-emitted, so the append sink holds each window exactly once);
  *  2. state CARRIES across the restart: a window left open by drain 1
  *     (above its final watermark) is completed and emitted by drain 2
  *     once the new data's watermark closes it — no loss at the seam;
  *  3. the union of both drains' emissions equals the batch aggregate
  *     over all data under the final watermark horizon.
  *
  * This is the recovery half of Structured Streaming's contract (the
  * emission arithmetic itself is pinned per-operator by the horizon
  * corpus); at 100 TB every long-running topology IS a sequence of
  * restarts, so the seam behavior is load-bearing, not incidental.
  */
class StreamRestartSpec extends SparkSpec {

  private def ts(h: Int, m: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("a restarted drain resumes from the checkpoint exactly-once") {
    import spark.implicits._
    val root = TempLayouts.tracked("graft-restart").toString
    val src = s"$root/in"
    val sink = s"$root/out"
    val ckpt = s"$root/ckpt"

    def addFile(rows: Seq[(java.sql.Timestamp, String)]): Unit =
      rows.toDF("ts", "event_type")
        .repartition(1).write.mode("append").parquet(src)

    // drain 1: hours 1-2 plus a clock row that closes them
    // (wm = 10:00 - 10min = 09:50; windows ending <= wm are emitted)
    addFile(Seq((ts(1, 10), "a"), (ts(1, 20), "a"), (ts(2, 5), "b"),
      (ts(10, 0), "clk")))
    val schema = spark.read.parquet(src).schema

    def drain(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("wstart"), col("event_type"), col("n"))
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    drain()
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("wstart",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType)))
    def sinkRows(): Seq[(java.sql.Timestamp, String, Long)] =
      spark.read.schema(outSchema).parquet(sink).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSeq
    assert(sinkRows().toSet === Set(
      (ts(1, 0), "a", 2L), (ts(2, 0), "b", 1L)),
      "drain 1 emitted the wrong closed-window set")

    // drain 2, SAME checkpoint: new file only; its clock (20:00) closes
    // the hour-10 window drain 1 left open PLUS the new hours 11-12
    addFile(Seq((ts(11, 15), "a"), (ts(12, 30), "b"), (ts(20, 0), "clk")))
    drain()
    val rows = sinkRows()
    // exactly-once: every (window, type) key appears ONCE across both
    // drains — nothing reprocessed, nothing doubled at the seam
    assert(rows.map(t => (t._1, t._2)).distinct.length == rows.length,
      s"duplicate window emissions across the restart: $rows")
    // no loss: the open hour-10 state survived the restart and emitted,
    // and the total equals the batch aggregate under the final horizon
    // (windows ending <= 19:50; the 20:00 clock's own window stays open)
    assert(rows.toSet === Set(
      (ts(1, 0), "a", 2L), (ts(2, 0), "b", 1L),
      (ts(10, 0), "clk", 1L), (ts(11, 0), "a", 1L), (ts(12, 0), "b", 1L)),
      "post-restart sink diverged from the batch aggregate")
    Caching.releaseAll(); spark.catalog.clearCache()
  }
}
