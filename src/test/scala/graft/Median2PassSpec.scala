package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The two-pass histogram median must land bit-identically on the
  * window-sort median for every group shape: odd/even counts, medians on
  * and off bin boundaries, single-bin groups, and the null-type group
  * (which rides the NULL-SAFE bin join). */
class Median2PassSpec extends SparkSpec {

  private def corpus(rows: Seq[(String, Double)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-median2").toString
    rows.zipWithIndex.map { case ((t, v), i) =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-03-01 10:00:00"),
        i.toLong % 7, t, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("two-pass equals window-sort on adversarial group shapes") {
    val rows =
      // odd group, spread over many bins
      Seq.tabulate(31)(i => ("a", i * 7.13)) ++
      // even group: median = mean of two middles in DIFFERENT bins
      // (0.99 and 1.01 land in cent-bins 0 and 1)
      Seq(("b", 0.10), ("b", 0.99), ("b", 1.01), ("b", 9.50)) ++
      // single-bin group (all values within one 100-cent bin)
      Seq(("c", 0.11), ("c", 0.12), ("c", 0.13)) ++
      // null type is a group of its own
      Seq((null.asInstanceOf[String], 2.0),
        (null.asInstanceOf[String], 4.0),
        (null.asInstanceOf[String], 6.0)) ++
      // group with duplicate values at the median rank
      Seq(("d", 5.0), ("d", 5.0), ("d", 5.0), ("d", 8.0))
    val d = corpus(rows)
    def run(name: String): Map[Option[String], Double] =
      graft.queries.Events.queries(name)(spark, d).collect()
        .map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    val sorted = run("events_median_value")
    val twoPass = run("events_median_2pass")
    assert(twoPass === sorted)
    // spot-check the hand-computable medians
    assert(twoPass(Some("b")) === 1.0)  // (0.99 + 1.01) / 2
    assert(twoPass(Some("c")) === 0.12)
    assert(twoPass(None) === 4.0)
    assert(twoPass(Some("d")) === 5.0)
  }

  test("pass 2 prunes through a broadcast of the target bins") {
    val p = SparkEntry.queries("events_median_2pass")(
        spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("BroadcastHashJoin"),
      "target-bin pruning is not a broadcast join")
  }
}
