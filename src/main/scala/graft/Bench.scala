package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up at the smallest scale factor (JIT, codegen cache,
    // parquet footers) so timed queries measure steady-state throughput
    // rather than first-execution compilation of each operator family
    val warmDir = SparkEntry.smokeDir
    if (new java.io.File(warmDir).isDirectory) {
      SparkEntry.queries.values.foreach { fn =>
        try materialize(fn(spark, warmDir)) catch { case _: Throwable => () }
      }
      // drop warm-up persist/checkpoint residue so the timed phase runs
      // with full storage memory (releaseAll also empties the tracked-
      // persist registry so it cannot grow across the sweeps)
      Caching.releaseAll()
      spark.catalog.clearCache()
    } else {
      System.err.println(s"[bench] warm-up skipped: $warmDir not found")
    }
    // three full timed sweeps, report each query's MEDIAN — robust to
    // one-off scheduler / GC / page-cache spikes in either direction
    // (best-of-N, used through round 5, is the optimistic estimator;
    // BASELINE.md's anchor note records the expected small upward drift
    // from this estimator change)
    def sweep(): Map[String, Double] = SparkEntry.queries.map {
      case (name, fn) =>
        // isolate queries: internal persists must not let one timed query
        // read another's cached subplan (CacheManager matches by plan)
        Caching.releaseAll()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        // a failed query reports -1 so breakage can't read as a speed-up
        try { materialize(fn(spark, sfDir))
          name -> (System.nanoTime() - t0) / 1e9
        } catch { case _: Throwable => name -> -1.0 }
    }
    val sweeps = Seq(sweep(), sweep(), sweep())
    val results = sweeps.head.map { case (name, _) =>
      val vs = sweeps.map(_(name))
      name -> (if (vs.exists(_ < 0)) -1.0 else vs.sorted.apply(1))
    }
    // per-query regression budget: compare this sweep's medians against the
    // committed previous-round reference and flag anything >1.5x slower, so
    // a per-query regression surfaces in the bench record itself instead of
    // waiting for a human diff of BENCH_r{N} files. The raw per-sweep
    // triples are persisted too: a flagged query whose three raw values
    // straddle the reference (e.g. 0.5/1.8/1.9) is sweep-context noise
    // (JVM heap aging, neighbor queries), while a tight triple at the new
    // level is a real plan/cost change.
    val reference: Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/root/repo/bench_ref.json")),
          java.nio.charset.StandardCharsets.UTF_8)
        "\"([A-Za-z0-9_]+)\"\\s*:\\s*([0-9.Ee+-]+)".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case _: Throwable => Map.empty }
    // whole-sweep drift: the median per-query ratio vs the reference across
    // ALL queries. A globally loaded machine (JVM pressure, page-cache
    // contention, a neighboring build) elevates every query by a common
    // factor — the r7 driver sweep ran at median 1.22x and fabricated 7
    // flags that way. Dividing each query's ratio by the sweep median
    // cancels exactly that common-mode term while leaving a genuinely
    // regressed query (whose ratio moved AGAINST the pack) flagged. The
    // drift is clamped at >= 1: normalization may only EXCUSE global
    // slowness, never tighten the threshold on a faster-than-reference run.
    // DELIBERATE BLIND SPOT + its guard: a REAL regression in shared
    // infrastructure that slows every query by the same factor is
    // indistinguishable from machine load in this record and would be
    // normalized away — so a drift beyond the documented machine-variance
    // band (25%) emits an explicit drift-alert demanding BenchIsolated
    // adjudication, and BASELINE.md forbids refreshing bench_ref from an
    // alerted sweep. Common-mode truth needs an isolated re-measure; only
    // per-query deviations are machine-separable from the sweep alone.
    val ratios = results.toSeq.collect {
      case (n, v) if v > 0 && reference.get(n).exists(_ > 0) =>
        v / reference(n)
    }.sorted
    val drift =
      if (ratios.isEmpty) 1.0 else math.max(1.0, ratios(ratios.size / 2))
    // flag = drift-normalized ratio >1.5x AND an absolute margin above the
    // drift-scaled reference — sub-second queries flap a pure ratio
    // threshold on scheduler noise alone (measured: a clean sweep flags
    // 3-4 of them spuriously without the floor). Streaming queries get a
    // 1.0s floor instead of the generic 0.25s: their wall time is
    // micro-batch startup + checkpoint I/O, whose measured within-run
    // spread is ±3s (r8: one isolated run of events_stream_sliding
    // spanned 3.69-9.40s; r11 adjudication: events_stream_throttle raw
    // [2.76..10.83] across 22 isolated reps with a stable ~3.0s median) —
    // a 0.25s floor flags that variance as regression noise every few
    // sweeps (r9: 6 flags, r10: 1, all adjudicated machine noise).
    def floorFor(n: String): Double =
      if (n.startsWith("events_stream_")) 1.0 else 0.25
    val flagged = results.toSeq
      .filter { case (n, v) =>
        v > 0 && reference.get(n).exists(r =>
          r > 0 && v > r * drift * 1.5 && v - r * drift > floorFor(n))
      }
      .sortBy { case (n, v) => -(v / reference(n)) }
      .map { case (n, v) =>
        f"""{"query":"$n","sec":$v%.3f,"ref_sec":${reference(n)}%.3f,"ratio":${v / reference(n)}%.2f,"norm_ratio":${v / (reference(n) * drift)}%.2f}"""
      }
    System.err.println(f"[bench] sweep drift vs reference: $drift%.2fx")
    if (drift > 1.25)
      System.err.println(f"[bench][drift-alert] whole-sweep drift $drift%.2fx " +
        "exceeds the machine-variance band: either the machine was loaded " +
        "or shared infrastructure regressed globally — adjudicate with " +
        "graft.BenchIsolated before trusting flags or refreshing bench_ref")
    flagged.foreach(f => System.err.println(s"[bench][regression>1.5x] $f"))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // the recorder keeps only an output TAIL, which truncates the long
    // per-query line from the front and loses the leading total — repeat a
    // compact total line LAST so it always survives, and persist the full
    // record (plus raw sweeps and the regression flags) to a file the
    // end-of-round snapshot commits
    try {
      val raw = sweeps.head.keys.map { k =>
        s"\"" + k + "\":[" + sweeps.map(_(k)).mkString(",") + "]"
      }.mkString("{", ",", "}")
      val full = line.dropRight(1) +
        f""","sweep_drift":$drift%.3f,"raw_sweeps":$raw,"flagged":[${flagged.mkString(",")}]}"""
      val p = java.nio.file.Paths.get("/root/repo/BENCH_FULL.json")
      java.nio.file.Files.write(p,
        (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () }
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"sf":"$sfDir","n_flagged":${flagged.size}}""")
    spark.stop()
  }

  /** Fully materialize a result for timing. `.count()` lets Catalyst's
    * `ColumnPruning`/`EliminateSorts` delete projected columns and final
    * sorts under the count aggregate — projection-heavy queries would be
    * timed as a bare row count. The noop sink consumes every row with all
    * columns computed, so the timed work is the declared work. */
  private def materialize(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
}
