package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Plain `spark.read.parquet` scans: Catalyst pushes predicates and prunes
  * columns into the vectorized reader (`PushedFilters` / `ReadSchema` in
  * `.explain("formatted")`), so every query below starts from a scan that
  * reads only what it needs — the property that matters at 100 TB.
  */
object Tables {

  /** Memoized reader frames per (session, dir, name) — `spark.read
    * .parquet` re-lists the path and re-reads a footer for schema
    * inference on EVERY call, a fixed ~30–80 ms driver-side cost that a
    * 270-query sweep pays hundreds of times over the same ten static
    * files (measured via the BenchProbe phase split: the "build" phase
    * is ~0.08 s of a 0.3 s sub-second query). The memo returns the same
    * immutable DataFrame handle instead; execution still scans parquet
    * every time (a plan handle holds no results), so nothing is cached
    * across runs — this is the registerViews/q43-stats-probe
    * memoization convention applied to the reader itself. Sessions are
    * held weakly (the Caching registry convention); fixture dirs are
    * immutable for a session's lifetime (tests write each corpus once
    * into a fresh temp dir), which is what makes the (dir, name) key
    * sound. */
  private val readerMemo =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = readerMemo.synchronized {
      var m = readerMemo.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        readerMemo.put(spark, m)
      }
      m
    }
    // The memo key carries everything the reader consults at LOAD time:
    //  - useV1SourceList decides the source implementation (the
    //    events_v2_daily gate scopes it to force a DSv2 BatchScan — a
    //    memo blind to it would hand that gate a V1 relation);
    //  - nanosAsLong decides the inferred schema of nanos fixtures;
    //  - the path's mtime pins the FILE LISTING: a memoized relation
    //    over a rewritten path would serve deleted part files
    //    (FAILED_READ_FILE), so a rewrite — which always bumps the
    //    file's or directory's mtime — naturally invalidates the entry.
    //    The stat is ~µs against the ~50 ms listing+inference it saves.
    // Optimizer/execution confs don't belong in the key — they act on
    // the query plan built per call, not on the memoized relation.
    val path = s"$dir/$name.parquet"
    val v1 = spark.conf.getOption("spark.sql.sources.useV1SourceList")
      .getOrElse("<default>")
    val nanos = spark.conf
      .getOption("spark.sql.legacy.parquet.nanosAsLong").getOrElse("false")
    val mtime =
      try java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(path)).toMillis
      catch { case _: Exception => -1L }
    perSession.computeIfAbsent(s"$path|v1=$v1|nanos=$nanos|m=$mtime",
      _ => spark.read.parquet(path))
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` has shipped in two physical encodings, dispatched here
    * into one canonical TimestampType column so every downstream query
    * sees a single timeline:
    *
    *  - TIMESTAMP(NANOS) (pre-round-8 driver fixtures; the adversarial
    *    probe corpora keep this layout): Spark's vectorized reader rejects
    *    parquet nanos, so `spark.sql.legacy.parquet.nanosAsLong` reads the
    *    column as raw longs, truncated to micros with integer `div` —
    *    exact, no double rounding, matching DuckDB's TIMESTAMP_NS →
    *    TIMESTAMP scanner coercion (truncation toward zero incl. pre-epoch,
    *    pinned by the probe corpora);
    *  - TIMESTAMP(MICROS, naive) (driver fixtures from round 8): read as
    *    TIMESTAMP_NTZ and reinterpreted as a UTC instant — under the
    *    engine's fixed UTC session config the identical timeline, and the
    *    same value DuckDB's scanner yields for the oracle.
    *
    * The nanosAsLong conf is set at session-build time by Verify/Bench/
    * tests; the guard below only covers ad-hoc sessions without mutating
    * already-configured ones (it must run BEFORE the scan so nanos files
    * infer as long). */
  def events(s: SparkSession, d: String): DataFrame = {
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.withColumn("ts", canonicalTs(raw))
  }

  /** The encoding dispatch for an `events` frame's raw `ts` column (shared
    * with the streaming file source, which applies it to its own reader). */
  private[graft] def canonicalTs(raw: DataFrame): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType         => timestamp_micros(expr("ts div 1000"))
      case TimestampNTZType => col("ts").cast(TimestampType)
      case TimestampType    => col("ts")
      case other => throw new IllegalArgumentException(
        s"unsupported events.ts encoding: $other (expected TIMESTAMP(NANOS)" +
          " read as long, TIMESTAMP_NTZ, or TIMESTAMP)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
