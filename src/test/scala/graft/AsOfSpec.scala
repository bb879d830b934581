package graft

import graft.operators.AsOf
import java.sql.Timestamp

/** As-of join semantics on genuinely interleaved timelines (the fixture
  * tables are degenerate — all orders predate all events — so interleaving
  * is exercised here). */
class AsOfSpec extends SparkSpec {

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("probe rows pick the latest build value at or before their time") {
    import spark.implicits._
    val probe = Seq(
      (1L, ts(5), 100L),  // after v=10@2 → 10
      (1L, ts(20), 101L), // after v=20@10 → 20
      (1L, ts(10), 102L), // exactly at v=20@10 (inclusive) → 20
      (2L, ts(1), 200L),  // key 2 has no build rows before 00:01 → null
      (2L, ts(30), 201L)) // after v=77@15 → 77
      .toDF("k", "t", "id")
    val build = Seq(
      (1L, ts(2), 10L), (1L, ts(10), 20L), (1L, ts(25), 30L),
      (2L, ts(15), 77L))
      .toDF("k", "t", "v")
    val out = AsOf.lastValueAsOf(probe, "k", "t", "id", build, "k", "t", "v")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None
        else Some(r.getLong(3)))).toMap
    assert(out === Map(100L -> Some(10L), 101L -> Some(20L),
      102L -> Some(20L), 200L -> None, 201L -> Some(77L)))
  }

  test("equal-time build rows resolve to the greatest value (total order)") {
    import spark.implicits._
    val probe = Seq((1L, ts(10), 1L)).toDF("k", "t", "id")
    val build = Seq((1L, ts(5), 3L), (1L, ts(5), 9L), (1L, ts(5), 6L))
      .toDF("k", "t", "v")
    val out = AsOf.lastValueAsOf(probe, "k", "t", "id", build, "k", "t", "v")
      .collect()
    assert(out.head.getLong(3) === 9L)
  }

  test("forward walk: probe rows pick the EARLIEST build value at or " +
    "after their time; nothing after → null") {
    import spark.implicits._
    val probe = Seq(
      (1L, ts(5), 100L),  // before v=20@10 → 20
      (1L, ts(10), 101L), // exactly at v=20@10 (inclusive) → 20
      (1L, ts(26), 102L), // after the last build row → null
      (2L, ts(1), 200L))  // before v=77@15 → 77
      .toDF("k", "t", "id")
    val build = Seq(
      (1L, ts(2), 10L), (1L, ts(10), 20L), (1L, ts(25), 30L),
      (2L, ts(15), 77L))
      .toDF("k", "t", "v")
    val out = AsOf.firstValueAsOf(probe, "k", "t", "id", build, "k", "t", "v")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None
        else Some(r.getLong(3)))).toMap
    assert(out === Map(100L -> Some(20L), 101L -> Some(20L),
      102L -> None, 200L -> Some(77L)))
  }

  test("forward walk: equal-time build rows resolve to the SMALLEST " +
    "value; a null probe time matches nothing") {
    import spark.implicits._
    val probe = Seq((1L, Some(ts(10)), 1L), (1L, None, 2L))
      .toDF("k", "t", "id")
    val build = Seq((1L, ts(15), 9L), (1L, ts(15), 3L), (1L, ts(15), 6L))
      .toDF("k", "t", "v")
    val out = AsOf.firstValueAsOf(probe, "k", "t", "id", build, "k", "t", "v")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None
        else Some(r.getLong(3)))).toMap
    assert(out === Map(1L -> Some(3L), 2L -> None))
  }
}
