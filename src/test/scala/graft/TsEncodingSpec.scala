package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events.ts encoding dispatch (`Tables.canonicalTs`): the same
  * instants written in every physical encoding the fixtures have shipped
  * must canonicalize to the identical TimestampType timeline — including
  * nulls, pre-epoch instants, and the ns→us trunc-toward-zero contract. */
class TsEncodingSpec extends SparkSpec {

  // instants in micros: epoch, a 2024 value, a pre-epoch 1965 value, null
  private val micros = Seq[java.lang.Long](
    0L, 1704067200123457L, -157766399999999L, null)
  // the same instants in nanos, salted with sub-us remainders that both
  // engines truncate toward zero (+999 on positive, -999 on negative)
  private val nanos = Seq[java.lang.Long](
    999L, 1704067200123457999L, -157766399999999999L, null)

  private def writeCorpus(ts: org.apache.spark.sql.DataFrame): String = {
    val d = Files.createTempDirectory("graft-tsenc").toString
    ts.write.parquet(s"$d/events.parquet")
    d
  }

  private def canon(dir: String): Seq[Option[Long]] = {
    val frame = Tables.events(spark, dir)
    assert(frame.schema("ts").dataType == TimestampType,
      "canonical ts must be TimestampType")
    frame.orderBy("event_id").select(unix_micros(col("ts")).as("us"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
      .toSeq
  }

  test("long-nanos, micros-NTZ, and micros-TZ corpora canonicalize " +
    "to the identical timeline") {
    import spark.implicits._
    val ids = micros.indices.map(_.toLong)

    // (a) the nanos layout as nanosAsLong reads it: a raw long column
    val asLong = ids.zip(nanos).toDF("event_id", "ts")
    // (b) the round-8 layout: micros TIMESTAMP_NTZ
    val asNtz = ids.zip(micros).toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    // (c) tz-adjusted micros (TimestampType passthrough)
    val asTz = ids.zip(micros).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))

    val results = Seq(asLong, asNtz, asTz).map(df => canon(writeCorpus(df)))
    assert(results(0) == results(1),
      "nanos-as-long and micros-NTZ timelines diverge")
    assert(results(1) == results(2),
      "micros-NTZ and micros-TZ timelines diverge")
    // and the canonical values are the expected instants (trunc toward 0)
    assert(results(1) == micros.map(Option(_).map(_.longValue)))
  }

  test("an unsupported ts encoding fails loudly, not silently") {
    import spark.implicits._
    val d = writeCorpus(Seq((1L, "not-a-time")).toDF("event_id", "ts"))
    val e = intercept[IllegalArgumentException](Tables.events(spark, d))
    assert(e.getMessage.contains("unsupported events.ts encoding"))
  }
}
