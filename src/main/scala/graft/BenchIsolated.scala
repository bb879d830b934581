package graft

import org.apache.spark.sql.SparkSession

/** Isolated per-query re-measurement — the adjudication protocol for bench
  * regression flags (BASELINE.md "Per-query regression budget").
  *
  * A full [[Bench]] sweep times every query inside one aging JVM, so a
  * flagged query can be the victim of sweep context (heap pressure from 90
  * neighbors, GC debt, page-cache churn) rather than a plan change. This
  * main measures ONLY the named queries, each as: one untimed warm-up at
  * the smallest fixture (JIT + codegen + footers), then `SPARK_GRAFT_REPS`
  * (default 7) timed executions at the target SF with tracked persists and
  * the SQL cache dropped between reps — the median-of-7 estimator that
  * adjudicated the r6 `q26`/`sql_top` and r7 `dedup_minhash_lsh` flags.
  * Same session config and noop-sink materialization as [[Bench]], so the
  * numbers are directly comparable to `bench_ref.json` entries.
  *
  * Usage: `SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.BenchIsolated dedup_minhash_lsh [more...]"`
  */
object BenchIsolated {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchIsolated <query name>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "7").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = args.toSeq.map { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      def once(dir: String): Double = {
        Caching.releaseAll()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once(SparkEntry.smokeDir) // untimed warm-up
      val times = Seq.fill(reps)(once(sfDir)).map(t => math.round(t * 1000) / 1000.0)
      val median = times.sorted.apply(reps / 2)
      s""""$name":{"median":$median,"raw":[${times.mkString(",")}]}"""
    }
    println(s"""{"metric":"isolated","reps":$reps,"sf":"$sfDir",${out.mkString(",")}}""")
    spark.stop()
  }
}
