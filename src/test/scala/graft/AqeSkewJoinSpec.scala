package graft

import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanHelper}
import org.apache.spark.sql.functions._

/** AQE runtime skew-join handling — the evidence behind `q35_join_skew_aqe`
  * (the gated row pins RESULT parity with the salted q29 plan via a shared
  * oracle; this spec pins the MECHANISM): with broadcast off and the skew
  * thresholds scaled to the fixture, the unsalted shuffle join's oversized
  * partition is split at runtime by OptimizeSkewedJoin, visible as an
  * AQEShuffleRead with skewed-partition specs in the executed plan — no
  * query rewrite, no salt column. This is the boundary of the manual salt
  * tool (`ScaleOps.saltedJoin`): AQE covers shuffle-join skew; salting
  * remains for aggregation skew and streaming state (ScalePatternsSpec). */
class AqeSkewJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("AQE splits the skewed partition of an unsalted shuffle join") {
    val s = spark
    import s.implicits._
    val confs = Seq(
      // force a shuffle join: broadcast would dodge the skew entirely
      // (and IS the right plan for a dim this small — q35's point)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // scale the 256 MB production threshold to the test fixture
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      // ~95% of fact rows share one hot key; the payload gives the hot
      // partition real bytes
      val fact = (1 to 50000).map { i =>
        (if (i % 20 == 0) (i % 97).toLong else 7L, s"payload-$i-${"x" * 24}")
      }.toDF("k", "payload")
      val dim = (0L to 96L).map(k => (k, s"dim-$k")).toDF("k", "name")
      val joined = fact.join(dim, "k")
      val rows = joined.collect()
      // parity: every fact row matches exactly one dim row
      assert(rows.length === 50000)
      val skewReads = collectWithSubqueries(
        joined.queryExecution.executedPlan) {
        case r: AQEShuffleReadExec if r.hasSkewedPartition => r
      }
      assert(skewReads.nonEmpty,
        s"no skewed AQEShuffleRead in:\n${joined.queryExecution.executedPlan}")
    } finally saved.foreach { case (k, v) =>
      v.fold(s.conf.unset(k))(s.conf.set(k, _))
    }
  }
}
