package graft

import java.sql.Timestamp

/** Hand pins for `events_contrib_bounded`: the first-8 cut is by
  * (ts, event_id) order, values clip at ±100.00, null values consume the
  * event budget without contributing, null-user rows are excluded, and
  * the result's user-level sensitivity is the documented 8 × 100.00. */
class ContribBoundSpec extends SparkSpec {

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-01 10:$m%02d:00")

  private def run(rows: Seq[(Long, Timestamp, java.lang.Long, String,
      java.lang.Double, String)]): Map[String, (Long, Long, Long,
      Option[Double])] = {
    import spark.implicits._
    val d = TempLayouts.tracked("graft-contrib").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    graft.queries.Events.queries("events_contrib_bounded")(spark, d)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
  }

  private def ev(id: Long, m: Int, u: Long, t: String,
                 v: java.lang.Double) =
    (id, ts(m), java.lang.Long.valueOf(u), t, v, "{}")

  test("first-8 budget in (ts, event_id) order; overflow rows drop; " +
    "clipping bounds each event at +/-100.00") {
    // user 1: 10 events of type X, values escalating; events 9 and 10
    // (by time) must drop; values 250 and -300 clip to +/-100
    val rows = (1 to 10).map { i =>
      val v: java.lang.Double = i match {
        case 3 => 250.0   // clips to +100.00
        case 4 => -300.0  // clips to -100.00
        case n => n * 1.0
      }
      ev(i.toLong, i, 1L, "X", v)
    }
    val out = run(rows)
    val (nTotal, nKept, nDropped, sum) = out("X")
    assert((nTotal, nKept, nDropped) === ((10L, 8L, 2L)))
    // kept: minutes 1..8 -> values 1,2,clip(250)=100,clip(-300)=-100,
    // 5,6,7,8 -> 1+2+100-100+5+6+7+8 = 29.00
    assert(sum === Some(29.0))
  }

  test("a null value consumes the budget but adds nothing; null users " +
    "are excluded entirely") {
    val rows = Seq(
      ev(1, 1, 1L, "X", 10.0),
      (2L, ts(2), java.lang.Long.valueOf(1L), "X",
        null.asInstanceOf[java.lang.Double], "{}"), // budget slot 2
      ev(3, 3, 1L, "X", 20.0),
      (4L, ts(4), null.asInstanceOf[java.lang.Long], "X",
        java.lang.Double.valueOf(999.0), "{}"))
    val out = run(rows)
    val (nTotal, nKept, _, sum) = out("X")
    assert(nTotal === 3L, "null-user row must not be counted at all")
    assert(nKept === 3L)
    assert(sum === Some(30.0), "null value contributed")
  }

  test("sensitivity: removing any single user moves a type's bounded " +
    "sum by at most 8 x 100.00") {
    // user 2 has 50 events at value 100 (clip boundary): kept
    // contribution = 8 * 100 = the documented maximum
    val base = (1 to 6).map(i => ev(i.toLong, i, 1L, "X", 10.0))
    val hot = (1 to 50).map(i => ev(100L + i, i, 2L, "X", 5000.0))
    val withHot = run(base ++ hot)("X")._4.get
    val without = run(base)("X")._4.get
    assert(math.abs(withHot - without) <= 800.0 + 1e-9,
      s"one user moved the sum by ${withHot - without} > 800")
    assert(math.abs(withHot - without) === 800.0,
      "clip-boundary user should realize the exact maximum")
  }
}
