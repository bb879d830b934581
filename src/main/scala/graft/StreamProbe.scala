package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** One-off diagnostic main for streaming-query bench investigations
  * (guide §1: measure first). Runs the queries named in
  * SPARK_GRAFT_PROBE once each against SPARK_GRAFT_SF_DIR with a
  * StreamingQueryListener attached and prints, per micro-batch, the
  * engine's own duration breakdown (triggerExecution, addBatch,
  * getBatch, latestOffset, queryPlanning, walCommit, commitOffsets) and
  * the state-operator totals (commit time, memory, rows), so the wall
  * time of a drain can be attributed to source I/O, state-store commit,
  * sink write, or offset-log fsync before anything is changed. Not part
  * of the driver contract; Bench.scala remains the official sweep. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = sys.env.getOrElse("SPARK_GRAFT_PROBE",
      "events_stream_tumbling").split(",").toSeq
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROBE_N", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(f"[probe] query started at ${e.timestamp}")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        val ops = p.stateOperators.map { so =>
          s"${so.operatorName}{rows=${so.numRowsTotal}," +
            s"updated=${so.numRowsUpdated}(${so.allUpdatesTimeMs}ms)," +
            s"removed=${so.numRowsRemoved}(${so.allRemovalsTimeMs}ms)," +
            s"commit=${so.commitTimeMs}ms,mem=${so.memoryUsedBytes}}"
        }.mkString(" ")
        println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=$dur state: $ops")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[probe] query ${e.id} terminated")
    })
    def once(name: String): Double = {
      Caching.releaseAll(); spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      (1 to iters).foreach { i =>
        println(f"[probe] ===== $n iter $i")
        val t = once(n)
        println(f"[probe] ===== $n iter $i wall=$t%.3f s")
      }
    }
    spark.stop()
  }
}
