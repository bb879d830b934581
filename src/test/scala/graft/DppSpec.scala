package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** Dynamic-partition-pruning evidence for the gated `events_dpp_daily`:
  * the plan-shape pin (`ScalePatternsSpec`) shows the pruning subquery is
  * PLANNED; this spec EXECUTES the gated query and reads the fact scan's
  * own metrics to prove partitions were actually skipped — partitions
  * read == the dimension's surviving dates < partitions total. That is
  * the 100 TB claim in measurable form: the layout job pays once, every
  * dimension-filtered query after it scans only matching partitions. */
class DppSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val d = "/root/testdata/sf0.001"

  test("events_dpp_daily executes with a dynamic pruning subquery in the " +
    "fact scan and reads strictly fewer partitions than exist") {
    val df = SparkEntry.queries("events_dpp_daily")(spark, d)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // ground truth from the fixture: total distinct dates vs the
    // epoch-day-mod-7 survivors the dimension filter keeps
    val dates = Tables.events(spark, d).filter(col("ts").isNotNull)
      .select(to_date(col("ts")).as("dt")).distinct().collect()
      .map(_.getDate(0).toLocalDate)
    val total = dates.length.toLong
    val kept = dates.count(_.toEpochDay % 7 == 0).toLong
    assert(kept > 0 && kept < total,
      s"fixture must leave a strict date subset (kept $kept of $total)")
    val scans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case f: FileSourceScanExec if f.partitionFilters.nonEmpty => f
    }
    val pruned = scans.filter(
      _.partitionFilters.mkString.toLowerCase.contains("dynamicpruning"))
    assert(pruned.nonEmpty,
      s"no dynamic pruning filter reached a partitioned scan:\n" +
        df.queryExecution.executedPlan)
    // ALL dynamically-pruned scans must show the surviving-date count —
    // a head-pick would silently depend on plan layout if AQE reuse ever
    // duplicates or reorders the partitioned scan
    pruned.foreach { scan =>
      val read = scan.metrics("numPartitions").value
      assert(read == kept,
        s"fact scan read $read partitions, expected the $kept surviving " +
          s"dates:\n$scan")
      assert(read < total, s"no pruning: read $read of $total partitions")
    }
    // and the result carries exactly the surviving dates
    assert(rows.map(_.getString(0)).distinct.length.toLong == kept)
  }
}
