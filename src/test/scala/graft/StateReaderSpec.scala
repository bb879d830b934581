package graft

import org.apache.spark.sql.functions._

/** Pins for the gated state-store reader (`events_stream_state_inspect`):
  * the `statestore` batch source's raw schema over a windowed-agg
  * checkpoint, and the complement contract — post-drain state holds
  * EXACTLY the windows the append-mode sink did not emit. */
class StateReaderSpec extends SparkSpec {

  private val T0 = 1704067200000000L // 2024-01-01 00:00 UTC in µs
  private val HOURu = 3600L * 1000000L
  private val MINu = 60L * 1000000L

  private def corpus(rows: Seq[(Long, Long, Double)]): String = {
    import spark.implicits._
    val dir = TempLayouts.tracked("graft-streader").toString
    rows.map { case (id, us, v) => (id, us, 7L, "view", v, """{"k":1}""") }
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("raw reader schema pin (key window name, buffer field names)") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val dir = corpus(Seq((1L, T0 + 10 * MINu, 1.0),
      (2L, T0 + 2 * HOURu, 2.0)))
    val agg = spark.readStream
      .schema(spark.read.parquet(s"$dir/events.parquet").schema)
      .parquet(s"$dir/events.parquet")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"),
        graft.queries.sumMoney(col("value")).as("sum_value"))
      .select(col("w.start").cast("timestamp_ntz").as("wstart"),
        col("n"), col("sum_value"))
    val out = TempLayouts.tracked("graft-probe-sink").toString
    val ckpt = TempLayouts.tracked("graft-probe-ckpt").toString
    val q = agg.writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val st = spark.read.format("statestore").load(ckpt)
    // the raw reader contract the gate's projection depends on: key
    // carries the grouping window under its INTERNAL name, value is
    // the AGG BUFFER named after the functions (count/sum/isEmpty),
    // with Sum's decimal overflow-widening and null-encoding flag
    assert(st.schema.catalogString ===
      "struct<key:struct<window:struct<start:timestamp,end:timestamp>>," +
        "value:struct<count:bigint,sum:decimal(38,0),isEmpty:boolean>," +
        "partition_id:int>",
      "statestore reader schema moved — re-pin the gate projection")
  }

  test("complement contract: state holds exactly the un-emitted windows") {
    // three hourly windows; clock at T0+2h+30min → wm = T0+2h+20min, so
    // windows [0h,1h) and [1h,2h) emit; [2h,3h) stays in state
    val dir = corpus(Seq(
      (1L, T0 + 10 * MINu, 1.0),
      (2L, T0 + HOURu + 10 * MINu, 2.0),
      (3L, T0 + 2 * HOURu + 10 * MINu, 4.0),
      (4L, T0 + 2 * HOURu + 30 * MINu, 8.0)))
    val got = graft.streaming.StreamingRun
      .stateInspectAvailableNow(spark, dir)
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("wstart")
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L,
        r.getLong(1), r.getDouble(2)))
      .toSeq
    Caching.releaseAll(); spark.catalog.clearCache()
    assert(got === Seq((T0 + 2 * HOURu, 2L, 12.0)),
      "post-drain state must hold exactly the un-emitted windows")
  }
}
