package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** k-anonymity release gate: a QI group is released iff backed by >= 5
  * distinct users; the boundary is inclusive; incomplete QIs (null ts or
  * type) are never releasable; and the released output itself satisfies
  * k-anonymity. */
class KanonSpec extends SparkSpec {

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-kanon").toString
    val rows = Seq.newBuilder[(Long, Timestamp, Long, String, Double, String)]
    // hour 10 / "view": exactly 5 distinct users (boundary -> released),
    // user 1 twice (distinct, not row, count)
    for ((u, i) <- Seq(1L, 1L, 2L, 3L, 4L, 5L).zipWithIndex)
      rows += ((100L + i, ts(10, i), u, "view", 1.0 * i, "{}"))
    // hour 11 / "view": 4 distinct users -> suppressed
    for ((u, i) <- Seq(1L, 2L, 3L, 4L).zipWithIndex)
      rows += ((200L + i, ts(11, i), u, "view", 2.0, "{}"))
    // hour 10 / "click": 1 user -> suppressed (QI includes the type)
    rows += ((300L, ts(10, 30), 9L, "click", 3.0, "{}"))
    // incomplete QIs: never releasable
    rows += ((400L, null.asInstanceOf[Timestamp], 1L, "view", 4.0, "{}"))
    rows += ((401L, ts(10, 40), 1L, null.asInstanceOf[String], 5.0, "{}"))
    rows.result()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private lazy val out =
    graft.queries.Events.queries("events_kanon_release")(spark, dir)
      .collect()

  test("the >= 5 distinct-user boundary is inclusive and counts users, " +
    "not rows") {
    assert(out.map(_.getLong(0)).toSet === Set(100L, 101L, 102L, 103L,
      104L, 105L))
    assert(out.forall(_.getLong(3) === 5L)) // n_users = 5, not 6 rows
  }

  test("rare QI groups and incomplete QIs are suppressed") {
    val ids = out.map(_.getLong(0)).toSet
    assert(!(200L to 203L).exists(ids.contains), "4-user group leaked")
    assert(!ids.contains(300L), "1-user group leaked")
    assert(!ids.contains(400L) && !ids.contains(401L),
      "incomplete QI leaked")
  }

  test("the released output itself satisfies k-anonymity on the fixture") {
    val released = graft.queries.Events
      .queries("events_kanon_release")(spark, "/root/testdata/sf0.01")
    val regroup = released
      .groupBy(col("event_type"), col("qhour"))
      .agg(min(col("n_users")).as("n"))
      .collect()
    assert(regroup.nonEmpty, "nothing released at sf0.01 — gate is vacuous")
    assert(regroup.forall(_.getLong(2) >= 5L))
    // and it actually suppresses: fewer rows out than eligible rows in
    val eligible = Tables.events(spark, "/root/testdata/sf0.01")
      .filter(col("ts").isNotNull && col("event_type").isNotNull).count()
    assert(released.count() < eligible, "suppression never fired at sf0.01")
  }
}
