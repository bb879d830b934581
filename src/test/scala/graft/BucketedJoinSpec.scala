package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** The bucketed co-located join (`q27_join_bucketed`): result equality
  * with the plain join, and the plan property that is its whole point —
  * join AND per-key aggregation without any data shuffle. */
class BucketedJoinSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("q27 equals the plain (unbucketed) join + aggregation") {
    val bucketed = SparkEntry.queries("q27_join_bucketed")(spark, d)
      .collect().toSeq
    val plain = Tables.orders(spark, d)
      .join(Tables.customer(spark, d),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        graft.queries.sumMoney(col("o_totalprice")).as("sum_spend"))
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"),
        col("n_orders"), col("sum_spend"))
      .orderBy(col("custkey"))
      .collect().toSeq
    assert(bucketed.nonEmpty)
    assert(bucketed == plain)
  }

  test("the bucketed join/agg plan shuffles nothing but the final " +
    "presentation sort") {
    val p = SparkEntry.queries("q27_join_bucketed")(spark, d)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("SortMergeJoin"), "merge-hinted bucketed join lost")
    assert(p.contains("Bucketed: true"),
      "scan did not use the bucketed layout")
    // the ONLY exchange in the whole plan is the final orderBy's range
    // partition; the join (bucket-co-located) and the aggregation
    // (grouping on the bucket key) both run on the scan partitioning
    val exchanges =
      p.linesIterator.count(_.trim.matches("""\(\d+\) Exchange"""))
    assert(exchanges == 1, s"expected 1 Exchange (final sort), got " +
      s"$exchanges:\n${p.linesIterator.filter(_.contains("Exchange"))
        .mkString("\n")}")
    assert(p.contains("rangepartitioning"),
      "the single exchange should be the presentation sort")
    assert(!p.contains("hashpartitioning("),
      "a data shuffle crept into the bucketed join/agg")
  }

  test("the bare bucketed join needs no exchange at all (its sorts are " +
    "partition-local)") {
    val p = graft.queries.Relational.bucketedCustomerOrders(spark, d)
      .queryExecution.explainString(FormattedMode)
    // Spark 3.0+ no longer propagates per-bucket sort metadata from the
    // scan (spark.sql.legacy.bucketedTableScan.outputOrdering), so the
    // SMJ re-sorts each co-located bucket IN PLACE — a partition-local,
    // spillable sort over one bucket's rows, never a shuffle. The layout
    // still pre-sorts (sortBy) so those sorts hit already-ordered runs.
    assert(p.contains("SortMergeJoin"))
    assert(!p.contains("Exchange"),
      s"bare bucketed join planned an exchange:\n$p")
  }
}
