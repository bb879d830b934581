package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit utility: for each named query (or all of them), print the
  * formatted physical plan and a timed noop-sink execution — the same
  * materialization the benchmark uses, so a plan change can be judged by
  * the number the gate will actually see.
  *
  * Usage: runMain graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val picked =
      if (names.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => names.contains(n) }
    picked.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      spark.catalog.clearCache()
      println(s"==== $name ====")
      val df = fn(spark, sfDir)
      df.explain("formatted")
      // warm once (codegen, footers), then time the best of two
      def run(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run()
      val t = math.min(run(), run())
      println(f"[explain] $name%s best-of-2 $t%.3f s on $sfDir")
    }
    spark.stop()
  }
}
