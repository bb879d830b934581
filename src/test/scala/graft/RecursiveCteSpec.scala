package graft

import org.apache.spark.sql.functions._

/** Pins for `sql_recursive_chain` (WITH RECURSIVE through the SQL
  * frontend): the engine constraint that shaped the design, the
  * UnionLoopExec physical plan, and the per-vertex-once row bound on a
  * hand-built forest. */
class RecursiveCteSpec extends SparkSpec {

  test("Spark rejects UNION (dedup) recursion — the probed constraint " +
    "that forced the functional-parent design") {
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("""
        WITH RECURSIVE t(n) AS (
          SELECT 1 UNION SELECT n + 1 FROM t WHERE n < 5)
        SELECT * FROM t""").collect()
    }
    assert(ex.getErrorClass == "UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE",
      s"recursion-mode support changed: ${ex.getErrorClass} — " +
        "a UNION-dedup BFS gate may now be possible")
  }

  test("linear UNION ALL recursion works and plans a UnionLoop") {
    import spark.implicits._
    val dir = TempLayouts.tracked("graft-recspec").toString
    // forest: 1→2→3→4 and 1→5 (par: child→parent, one parent each)
    Seq((2L, 1L), (3L, 2L), (4L, 3L), (5L, 1L)).toDF("child", "parent")
      .write.mode("overwrite").parquet(s"$dir/par.parquet")
    spark.read.parquet(s"$dir/par.parquet").createOrReplaceTempView("rp")
    val df = spark.sql("""
      WITH RECURSIVE chain(v, d) AS (
        SELECT CAST(1 AS BIGINT), 0
        UNION ALL
        SELECT rp.child, chain.d + 1 FROM chain JOIN rp
          ON rp.parent = chain.v
        WHERE chain.d < 30)
      SELECT d, count(*) AS n FROM chain GROUP BY d ORDER BY d""")
    assert(df.queryExecution.executedPlan.toString.contains("UnionLoop"),
      "recursive CTE must plan as UnionLoopExec")
    val got = df.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    // every vertex exactly once: depths 0..3 with counts 1,2,1,1
    assert(got === Seq((0, 1L), (1, 2L), (2, 1L), (3, 1L)))
  }
}
