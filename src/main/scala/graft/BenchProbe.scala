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
    spark.sparkContext.setLogLevel("WARN")
    def once(name: String): Double = {
      Caching.releaseAll(); spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n => once(n) } // warm
    names.foreach { n =>
      val ts = (1 to iters).map(_ => once(n))
      println(f"$n%-35s ${ts.map(t => f"$t%.3f").mkString(" ")}  median=${ts.sorted.apply(iters / 2)}%.3f min=${ts.min}%.3f")
    }
    spark.stop()
  }
}
