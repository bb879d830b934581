package graft
import org.apache.spark.sql.SparkSession

/** One-off diagnostic main for per-query bench investigations: runs the
  * queries named in SPARK_GRAFT_PROBE (comma-separated) N times each
  * against SPARK_GRAFT_SF_DIR and prints every iteration's wall time, so
  * a regression can be classified as noise (wide spread), bimodal (GC /
  * page-cache), or real (tight spread at the new level). Not part of the
  * driver contract; Bench.scala remains the official sweep. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = sys.env.getOrElse("SPARK_GRAFT_PROBE",
      "q26_set_except_all,sql_top_orders_per_segment").split(",").toSeq
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROBE_N", "7").toInt
    // extra session confs for conf A/B probes: "k=v;k=v" (diagnostic
    // only — Bench.scala remains the official sweep configuration)
    val extra = sys.env.getOrElse("SPARK_GRAFT_CONF", "").split(";")
      .map(_.trim).filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    val spark = extra.foldLeft(builder) { case (b, (k, v)) =>
      b.config(k, v) }.getOrCreate()
    // SPARK_GRAFT_STAGES=1: print each completed stage's wall time, task
    // count, and summed executor run time — attributes a query's wall
    // clock to scheduling overhead (many short stages) vs real compute
    // (few stages dominating executorRunTime) before any change is made
    if (sys.env.get("SPARK_GRAFT_STAGES").contains("1"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              e: org.apache.spark.scheduler.SparkListenerStageCompleted)
              : Unit = {
            val si = e.stageInfo
            val wall = (for {
              a <- si.completionTime; b <- si.submissionTime
            } yield a - b).getOrElse(-1L)
            println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%3d " +
              f"wall=${wall}%5d ms run=${si.taskMetrics.executorRunTime}%6d ms " +
              f"${si.name.takeWhile(_ != '(').trim}")
          }
        })
    spark.sparkContext.setLogLevel("WARN")
    def once(name: String): Double = {
      Caching.releaseAll(); spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n => once(n) } // warm
    // SPARK_GRAFT_PHASES=1: split each execution's wall into DataFrame
    // construction (query fn: reads = listing + footer inference),
    // planning (analysis+optimization+physical planning of the noop
    // write is re-done at action time, so this phase forces only the
    // read side's executedPlan as a proxy), and execution — attributes
    // the sub-second floor to driver-side fixed cost vs real compute
    val phases = sys.env.get("SPARK_GRAFT_PHASES").contains("1")
    def phased(name: String): (Double, Double, Double) = {
      Caching.releaseAll(); spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis->physical planning
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
    }
    names.foreach { n =>
      if (phases) {
        val ps = (1 to iters).map(_ => phased(n))
        def med(f: ((Double, Double, Double)) => Double) =
          ps.map(f).sorted.apply(iters / 2)
        println(f"$n%-35s build=${med(_._1)}%.3f plan=${med(_._2)}%.3f " +
          f"exec=${med(_._3)}%.3f")
      } else {
        val ts = (1 to iters).map(_ => once(n))
        println(f"$n%-35s ${ts.map(t => f"$t%.3f").mkString(" ")}  median=${ts.sorted.apply(iters / 2)}%.3f min=${ts.min}%.3f")
      }
    }
    spark.stop()
  }
}
