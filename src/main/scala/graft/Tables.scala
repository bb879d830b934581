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
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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
