package graft

import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

/** Pins for `q43_join_cbo_reorder` (cost-based join reordering): the
  * counterfactual plan shape with CBO off, the reordered shape the gate
  * require()s, and conf-scope hygiene around the planning window. */
class CboReorderSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def innermostLeafTables(
      df: org.apache.spark.sql.DataFrame): Set[String] = {
    val innermost = df.queryExecution.optimizedPlan.collect {
      case j: Join if j.collect { case jj: Join => jj }.length == 1 => j
    }
    assert(innermost.length === 1, "expected exactly one innermost Join")
    innermost.head.collectLeaves().flatMap {
      case lr: LogicalRelation => lr.catalogTable.map(_.identifier.table)
      case _ => None
    }.toSet
  }

  test("gated plan joins the dims innermost; the CBO-off counterfactual " +
    "joins the fact innermost — the reorder is real, not the written order") {
    val gated = graft.queries.Relational.cboReorderJoin(spark, d)
    val dims = innermostLeafTables(gated)
    assert(dims.forall(t => t.contains("orders") || t.contains("customer")),
      s"gated innermost join should touch only the dims, got $dims")
    assert(dims.size === 2)

    // counterfactual: identical query text over the SAME analyzed catalog
    // tables, CBO off → the optimizer keeps the written (pessimal) order
    assert(spark.conf.get("spark.sql.cbo.enabled") === "false",
      "gate must restore cbo.enabled after planning")
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(6).map(b => f"${b & 0xff}%02x").mkString
    val naive = spark.table(s"graft_cbo_lineitem_$tag")
      .join(spark.table(s"graft_cbo_orders_$tag"),
        col("l_orderkey") === col("o_orderkey"))
      .join(spark.table(s"graft_cbo_customer_$tag")
          .filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(count(lit(1)).as("n_items"))
    val naiveLeaves = innermostLeafTables(naive)
    assert(naiveLeaves.exists(_.contains("lineitem")),
      s"CBO-off innermost join should keep the written fact-first order, " +
        s"got $naiveLeaves")

    // and the reorder never changes the result: gated == counterfactual
    // aggregate on the shared (o_year, n_items) projection
    val g = gated.select(col("o_year"), col("n_items"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val n = naive.orderBy(col("o_year"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(g === n)
  }

  test("catalog registration is analyze-once per (session, dataset): a " +
    "second call reuses the stats-bearing tables and still reorders") {
    val again = graft.queries.Relational.cboReorderJoin(spark, d)
    assert(again.collect().nonEmpty)
    assert(spark.conf.get("spark.sql.cbo.enabled") === "false")
    assert(spark.conf.get("spark.sql.cbo.joinReorder.enabled") === "false")
  }
}
