package graft

import org.apache.spark.sql.functions._

/** Pins [[graft.queries.Pipeline.propsClass]] against the shared
  * hostile-props truth table (scripts/props_probe.py replays the SAME
  * table through the DuckDB oracle's classification CASE — together they
  * pin cross-engine agreement on classes the driver fixture can never
  * reach, the same split NonFiniteSpec uses for the measure scrub), and
  * proves the scrub's point: the JSON query family crashes on hostile
  * props but runs clean after [[graft.queries.Pipeline.scrubProps]]. */
class PropsScrubSpec extends SparkSpec {

  // THE truth table — keep bit-identical to scripts/props_probe.py
  private val truth: Seq[(String, String)] = Seq(
    ("""{"k":3}""", "ok"),
    ("""{"k":-2}""", "ok"),
    ("""{"k":null}""", "ok"), // json-null value passes the typed test
    ("""{"j":4}""", "ok"), // missing k is fine — extraction yields null
    ("{}", "ok"),
    ("""{"k":3,"j":4}""", "ok"),
    ("""{"é":1}""", "ok"), // unicode key
    ("""{"a.b":1}""", "ok"), // dotted key (quoted json path in oracle)
    ("""{"k":9223372036854775807}""", "ok"), // int64 max
    ("""{"k":-9223372036854775808}""", "ok"), // int64 min
    ("""{"k":1,"k":2}""", "dupkey"), // extraction engine-defined on dups
    ("""{"k":1,"j":2,"k":3}""", "dupkey"), // dup among clean keys
    ("""{"k":1,"k":"x"}""", "dupkey"), // key hygiene precedes value hygiene
    ("""{"k":"3"}""", "untyped"), // number-as-string
    ("""{"k":3.7}""", "untyped"),
    ("""{"k":true}""", "untyped"),
    ("""{"k":[1,2]}""", "untyped"),
    ("""{"k":{"x":1}}""", "untyped"), // nested object value
    ("""{"k":99999999999999999999}""", "untyped"), // beyond int64
    ("""{k:3}""", "notobject"), // malformed: bare key
    ("not json", "notobject"),
    ("", "notobject"),
    ("123", "notobject"), // valid JSON, not an object
    ("[1]", "notobject"),
    ("\"str\"", "notobject"),
    ("null", "notobject"), // the JSON null document
    (null, "null"))

  private lazy val hostile = {
    import spark.implicits._
    truth.zipWithIndex
      .map { case ((p, _), i) =>
        (i.toLong, 1704067200000000L + i, i.toLong % 3, "click", 1.0, p)
      }
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
  }

  test("propsClass matches the shared truth table") {
    val got = hostile
      .select(col("event_id"),
        graft.queries.Pipeline.propsClass(col("props")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for (((_, expected), i) <- truth.zipWithIndex) {
      assert(got(i.toLong) == expected,
        s"case $i (${truth(i)._1}): got ${got(i.toLong)}, want $expected")
    }
  }

  test("the JSON query family throws on hostile props and runs after " +
    "scrubProps") {
    import spark.implicits._
    // unscrubbed: ANSI cast on {"k":"3"} must throw — the failure mode
    // the scrub contract exists to prevent
    val bare = hostile.select(
      get_json_object(col("props"), "$.k").cast("long").as("k"))
    assertThrows[Exception] { bare.collect() }
    // scrubbed: both family shapes run clean; only contract-ok rows keep
    // their payload
    val clean = graft.queries.Pipeline.scrubProps(hostile)
    val k = clean.select(
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k").isNotNull).as[Long].collect().sorted
    assert(k.toSeq == Seq(-9223372036854775808L, -2L, 3L, 3L,
      9223372036854775807L))
    val m = clean
      .select(explode(from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.LongType))))
      .count()
    assert(m == 10L) // entries across the ten ok objects' keys
  }

  test("events_scrub_props groups the driver fixture as ok/null only") {
    val out = SparkEntry.queries("events_scrub_props")(
      spark, "/root/testdata/sf0.001")
    val classes = out.select(col("props_class")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(classes.subsetOf(Set("ok", "null")))
  }
}
