package graft

import java.sql.Timestamp

/** Hand-timeline pins for `events_seasonal_residual`: the baseline is the
  * same hour ONE DAY earlier on the dense spine (not 24 observations
  * back), the first 24 spine hours are excluded, silent hours are real
  * zeros, and the top-5 ranks by |residual| with the hour tie-break. */
class SeasonalResidualSpec extends SparkSpec {

  private def ts(day: Int, h: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-0$day $h%02d:00:00")

  private lazy val dir: String = {
    import spark.implicits._
    val d = TempLayouts.tracked("graft-seasonal").toString
    val rows = Seq.newBuilder[(Long, Timestamp, Long, String, Double, String)]
    // type A: day 1 hours 0..23 at 10.00 each; day 2 repeats at 10.00
    // except hour 5 spikes to 110.00 (+100) and hour 9 is SILENT
    // (zero level, residual -10)
    var id = 0L
    for (h <- 0 to 23) { id += 1; rows += ((id, ts(1, h), 1L, "A", 10.0, "{}")) }
    for (h <- 0 to 23 if h != 9) {
      id += 1
      rows += ((id, ts(2, h), 1L, "A", if (h == 5) 110.0 else 10.0, "{}"))
    }
    rows.result()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private lazy val out =
    graft.queries.Events.queries("events_seasonal_residual")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getAs[java.time.LocalDateTime](1),
        r.getLong(2), r.getDouble(3), r.getDouble(4)))

  test("the spike and the silent hour are ranks 1 and 2; the baseline " +
    "is hour-aligned, not observation-aligned") {
    assert(out.length == 5)
    val r1 = out.find(_._3 == 1L).get
    assert(r1._2.getHour == 5 && r1._2.getDayOfMonth == 2)
    assert(r1._5 == 100.0, s"spike residual ${r1._5} != +100 vs same hour")
    val r2 = out.find(_._3 == 2L).get
    assert(r2._2.getHour == 9 && r2._2.getDayOfMonth == 2)
    assert(r2._4 == 0.0 && r2._5 == -10.0,
      "silent hour must be a real zero against the 10.00 baseline")
  }

  test("first 24 spine hours never appear (no baseline), and flat hours " +
    "rank by the hour tie-break with residual 0") {
    assert(out.forall(_._2.getDayOfMonth == 2),
      "a day-1 hour leaked despite having no day-earlier baseline")
    val flats = out.filter(r => r._3 >= 3L)
    assert(flats.forall(_._5 == 0.0))
    assert(flats.map(_._2.getHour).toSeq ==
      flats.map(_._2.getHour).toSeq.sorted, "tie-break must be hour asc")
  }
}
