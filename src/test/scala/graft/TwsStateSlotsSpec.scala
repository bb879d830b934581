package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import graft.streaming.{JournIn, JourneyProcessorTws, TypeCountsProcessorTws}

/** Cross-batch pins for the LIST- and MAP-state transformWithState
  * processors behind `events_stream_tws_journey` /
  * `events_stream_tws_typecounts` — what the single-drain gates can't
  * see:
  *
  *  1. ListState APPENDS across batches: batch 2's journey emission is
  *     the merged (ts, id, type)-ordered walk of BOTH batches, with a
  *     batch-2 row sorting BEFORE retained batch-1 rows when its key is
  *     smaller (the state is re-sorted per emission, not
  *     append-ordered);
  *  2. MapState point-updates accumulate: batch 2 re-emits a key's FULL
  *     map (all types, cumulative counts), not the delta;
  *  3. keys absent from a batch emit nothing in it.
  *
  * RocksDB provider, as the gates run (transformWithState refuses the
  * default HDFS-backed store).
  */
class TwsStateSlotsSpec extends SparkSpec {

  private def withRocks[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("ListState journey merges and re-sorts across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocks {
      val in = MemoryStream[JournIn]
      val name = s"tws_j_${System.nanoTime()}"
      val q = in.toDS().groupByKey(_.user_id)
        .transformWithState(new JourneyProcessorTws,
          TimeMode.None(), OutputMode.Append())
        .toDF()
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        in.addData(JournIn(1L, 100L, 10L, "view"),
          JournIn(1L, 300L, 11L, "click"))
        q.processAllAvailable()
        val e1 = spark.table(name).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
        assert(e1 === Seq((1L, "view>click", 2L)))
        // batch 2: an EARLIER event (ts 50) must lead the merged path
        in.addData(JournIn(1L, 50L, 12L, "signup"))
        q.processAllAvailable()
        val e2 = spark.table(name).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
          .drop(e1.size)
        assert(e2 === Seq((1L, "signup>view>click", 3L)),
          "list state must re-sort, not append-order, the journey")
      } finally q.stop()
    }
  }

  test("MapState counts accumulate; full-map re-emission; absent keys " +
    "silent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocks {
      val in = MemoryStream[JournIn]
      val name = s"tws_m_${System.nanoTime()}"
      val q = in.toDS().groupByKey(_.user_id)
        .transformWithState(new TypeCountsProcessorTws,
          TimeMode.None(), OutputMode.Append())
        .toDF()
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        in.addData(JournIn(1L, 100L, 10L, "view"),
          JournIn(1L, 200L, 11L, "view"),
          JournIn(2L, 150L, 12L, "click"))
        q.processAllAvailable()
        val e1 = spark.table(name).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
        assert(e1 === Set((1L, "view", 2L), (2L, "click", 1L)))
        in.addData(JournIn(1L, 300L, 13L, "click"),
          JournIn(1L, 400L, 14L, "view"))
        q.processAllAvailable()
        val e2 = spark.table(name).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
          .diff(e1)
        // user 1 re-emits its FULL cumulative map; user 2 is silent
        assert(e2 === Set((1L, "view", 3L), (1L, "click", 1L)),
          "map state must accumulate and re-emit the full map per batch")
      } finally q.stop()
    }
  }
}
