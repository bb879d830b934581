package graft

import java.sql.Timestamp

/** Hand-timeline pins for `events_gapfill`: the spine is dense between
  * each type's first and last hour, gaps are flagged and zero-counted,
  * the forward fill carries the last real level across gaps AND across
  * observed-but-all-null hours, and the fill never crosses types. */
class GapfillSpec extends SparkSpec {

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")

  private lazy val dir: String = {
    import spark.implicits._
    val d = TempLayouts.tracked("graft-gapfill").toString
    val rows = Seq(
      // type A: hours 10 (sum 3.00), 11 observed but all-null values,
      // 12-13 GAP, 14 (sum 1.25)
      (1L, ts(10, 0), 1L, "A", Some(1.0), "{}"),
      (2L, ts(10, 30), 1L, "A", Some(2.0), "{}"),
      (3L, ts(11, 15), 2L, "A", Option.empty[Double], "{}"),
      (4L, ts(14, 0), 1L, "A", Some(1.25), "{}"),
      // type B: single hour 20 — one-row spine, no gaps; proves the
      // fill window never crosses from A
      (5L, ts(20, 0), 3L, "B", Some(7.0), "{}"),
      // off the timeline: null ts, null type
      (6L, null.asInstanceOf[Timestamp], 1L, "A", Some(99.0), "{}"),
      (7L, ts(12, 0), 1L, null.asInstanceOf[String], Some(88.0), "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private lazy val out =
    graft.queries.Events.queries("events_gapfill")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getAs[java.time.LocalDateTime](1).toString.take(13),
        r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) null else r.getDouble(4),
        if (r.isNullAt(5)) null else r.getDouble(5)))

  test("the spine is dense per type and gaps are flagged zero-count") {
    val a = out.filter(_._1 == "A").map(_._2)
    assert(a === Seq("2024-03-01T10", "2024-03-01T11", "2024-03-01T12",
      "2024-03-01T13", "2024-03-01T14"), "A spine not dense 10..14")
    val gaps = out.filter(r => r._1 == "A" && r._4 == 1L)
    assert(gaps.map(_._2).toSet === Set("2024-03-01T12", "2024-03-01T13"))
    assert(gaps.forall(_._3 == 0L), "a gap hour must count zero events")
  }

  test("forward fill carries the last real level across gaps and " +
    "null-valued hours, and resets per type") {
    val a = out.filter(_._1 == "A")
    // hour 10: observed 3.00; 11: observed, null sum -> fill carries 3.0;
    // 12/13: gaps -> 3.0; 14: new level 1.25
    assert(a.map(_._6) === Seq(3.0, 3.0, 3.0, 3.0, 1.25))
    assert(a.map(_._5).toSeq === Seq(3.0, null, null, null, 1.25))
    val b = out.filter(_._1 == "B")
    assert(b.map(_._6) === Seq(7.0), "B must not inherit A's level")
  }

  test("off-timeline rows (null ts or type) never reach the spine") {
    assert(!out.exists(r => r._5 != null &&
      (r._5 == 99.0 || r._5 == 88.0)))
    assert(out.map(_._1).toSet === Set("A", "B"))
  }
}
