package graft

import org.apache.spark.sql.functions._

/** The SQL string surface must agree with the DataFrame surface — same
  * engine, two frontends. Each sql_* query is cross-checked against its
  * DataFrame twin (where one exists) on the smallest fixture; the DuckDB
  * oracle gate re-checks all of them independently at sf0.01. */
class SqlSurfaceSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, d).collect().toSeq

  test("sql_wordcount_topn == wordcount_topn (DataFrame)") {
    assert(rows("sql_wordcount_topn") == rows("wordcount_topn"))
  }

  test("sql_pricing_summary == q01_pricing_summary (DataFrame)") {
    assert(rows("sql_pricing_summary") == rows("q01_pricing_summary"))
  }

  test("sql_simhash == dedup_simhash (DataFrame)") {
    assert(rows("sql_simhash") == rows("dedup_simhash"))
  }

  test("sql_span_grams == dedup_span_grams (DataFrame)") {
    assert(rows("sql_span_grams") == rows("dedup_span_grams"))
  }

  test("sql_gapfill == events_gapfill (DataFrame)") {
    assert(rows("sql_gapfill") == rows("events_gapfill"))
  }

  test("sql_zorder_layout == events_zorder_layout (DataFrame)") {
    assert(rows("sql_zorder_layout") == rows("events_zorder_layout"))
  }

  test("sql_cosine_pairs == text_cosine_pairs (DataFrame)") {
    val eq = rows("sql_cosine_pairs") == rows("text_cosine_pairs")
    Caching.releaseAll(); spark.catalog.clearCache()
    assert(eq)
  }

  test("sql_top_orders_per_segment: 3 per segment, schema long-typed") {
    val df = SparkEntry.queries("sql_top_orders_per_segment")(spark, d)
    val out = df.collect()
    assert(out.nonEmpty)
    val bySeg = out.groupBy(_.getString(0))
    assert(bySeg.values.forall(_.length <= 3))
    assert(df.schema("rnk").dataType.typeName == "long")
  }

  test("registered views + native functions answer ad-hoc SQL") {
    graft.queries.SqlSurface.registerViews(spark, d)
    val n = spark.sql(
      "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .collect()(0).getLong(0)
    assert(n > 0)
    // events view carries the micros-truncated timestamp, not raw nanos
    assert(spark.sql("SELECT ts FROM events").schema("ts")
      .dataType.typeName.startsWith("timestamp"))
  }

  test("NOT IN null-poisoning: a single NULL purchase user empties the " +
    "whole result (three-valued logic, the nulls the gate corpora lack)") {
    import spark.implicits._
    val dir = TempLayouts.tracked("graft-notin").toString
    // customers 1..5; purchases by users 2 and 4 → NOT IN keeps {1,3,5}
    Seq((1L, "a", 0.0), (2L, "b", 0.0), (3L, "c", 0.0), (4L, "d", 0.0),
      (5L, "e", 0.0))
      .toDF("c_custkey", "c_name", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    def writeEvents(users: Seq[Option[Long]]): Unit =
      users.zipWithIndex.map { case (u, i) =>
        (i.toLong, u, "purchase",
          new java.sql.Timestamp(1704067200000L + i), 1.0, """{"k":1}""") }
        .toDF("event_id", "user_id", "event_type", "ts", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // the other driver tables just need to exist for registerViews
    for (t <- Seq("region", "nation", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings"))
      Seq(Tuple1(1L)).toDF("k").write.mode("overwrite")
        .parquet(s"$dir/$t.parquet")

    writeEvents(Seq(Some(2L), Some(4L)))
    // registerViews memoizes per (session, dir) — different dir rebinds
    val kept = SparkEntry.queries("sql_not_in_nullaware")(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(kept === Seq(1L, 3L, 5L))

    writeEvents(Seq(Some(2L), None, Some(4L)))
    graft.queries.SqlSurface.registerViews(spark,
      "/root/testdata/sf0.001") // force a rebind: same dir, new files
    val poisoned = SparkEntry.queries("sql_not_in_nullaware")(spark, dir)
      .collect()
    assert(poisoned.isEmpty,
      "one NULL in the NOT IN set must drop every row (UNKNOWN ≠ TRUE)")
  }

  test("sql_exists_correlated decorrelates to exactly one LeftSemi and " +
    "one LeftAnti join (RewritePredicateSubquery, no nested loops)") {
    import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val df = SparkEntry.queries("sql_exists_correlated")(spark, d)
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: Join => j.joinType
    }
    assert(joins.count(_ == LeftSemi) == 1, joins.toString)
    assert(joins.count(_ == LeftAnti) == 1, joins.toString)
    assert(joins.size == 2, joins.toString)
  }

  test("NOT EXISTS has NO null-poisoning (the contrast with NOT IN the " +
    "gate pair documents): a NULL correlation value simply fails") {
    import spark.implicits._
    val dir = TempLayouts.tracked("graft-exists").toString
    Seq((1L, "1-URGENT"), (2L, "2-HIGH"), (3L, "3-MEDIUM"))
      .toDF("o_orderkey", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // order 1: heavy + non-R line; order 2: heavy + NULL-returnflag line
    // (must be kept — NULL = 'R' is UNKNOWN, NOT EXISTS still true,
    // where a NOT IN over returnflags would drop the whole row set);
    // order 3: heavy + 'R' line (dropped by the anti half)
    Seq((1L, 50.0, Some("N")), (2L, 50.0, None), (3L, 50.0, Some("R")))
      .toDF("l_orderkey", "l_quantity", "l_returnflag")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
      "documents", "embeddings"))
      Seq(Tuple1(1L)).toDF("k").write.mode("overwrite")
        .parquet(s"$dir/$t.parquet")
    Seq((0L, Some(1L), "view",
      new java.sql.Timestamp(1704067200000L), 1.0, """{"k":1}"""))
      .toDF("event_id", "user_id", "event_type", "ts", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val kept = SparkEntry.queries("sql_exists_correlated")(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    graft.queries.SqlSurface.registerViews(spark, d) // rebind for peers
    assert(kept === Seq(1L, 2L))
  }

  test("sql_pipe_syntax lowers to the IDENTICAL logical plan as the " +
    "plain q01 text (canonicalized optimized-plan equality)") {
    graft.queries.SqlSurface.registerViews(spark, d)
    val pipe = spark.sql(graft.queries.SqlSurface.pipeText)
    val plain = spark.sql(graft.queries.SqlSurface.pipePlainText)
    assert(pipe.schema === plain.schema)
    assert(pipe.queryExecution.optimizedPlan.canonicalized ===
      plain.queryExecution.optimizedPlan.canonicalized,
      "pipe chain must be a pure parser-frontend rewrite")
    assert(pipe.collect().toSeq === plain.collect().toSeq)
  }

  test("sql_pipe_syntax == q01_pricing_summary (DataFrame)") {
    assert(rows("sql_pipe_syntax") === rows("q01_pricing_summary"))
  }

  test("UTF8_LCASE vs asciiLower: the documented agree/disagree edges " +
    "(İ, Kelvin K, ȧ/Ȧ, ligature ﬃ)") {
    import graft.operators.Tokenize.asciiLower
    // each: (left, right, lcaseEqual) — lcaseEqual probed on Spark 4.1
    val edges = Seq(
      // dotted capital İ (U+0130): NOT equal to 'i' under UTF8_LCASE
      // (its lowercase is i + combining dot, two codepoints) — and
      // asciiLower agrees (leaves both untouched, unequal)
      ("İ", "i", false),
      // Kelvin sign K (U+212A) = 'k' under UTF8_LCASE — asciiLower
      // DISAGREES (leaves U+212A untouched: unequal)
      ("K", "k", true),
      // non-ASCII case pair ȧ/Ȧ (U+0227/U+0226): equal under
      // UTF8_LCASE — asciiLower DISAGREES (folds neither)
      ("ȧ", "Ȧ", true),
      // ligature ﬃ (U+FB03): no full-fold expansion to "ffi" under
      // UTF8_LCASE — asciiLower agrees (unequal)
      ("ﬃ", "ffi", false),
      // plain ASCII case pair: both agree equal
      ("A", "a", true))
    for ((l, r, lcaseEq) <- edges) {
      val got = spark.sql(
        s"SELECT '$l' COLLATE UTF8_LCASE = '$r' COLLATE UTF8_LCASE")
        .collect().head.getBoolean(0)
      assert(got === lcaseEq, s"UTF8_LCASE '$l' = '$r'")
    }
    // asciiLower equivalence holds exactly on the ASCII edge — the
    // §5.7 fold the sql_collation_contract oracle leans on — and
    // breaks only on the non-ASCII folds UTF8_LCASE adds
    assert(asciiLower("A") === asciiLower("a"))
    assert(asciiLower("K") !== asciiLower("k"),
      "asciiLower must NOT fold the Kelvin sign")
    assert(asciiLower("ȧ") !== asciiLower("Ȧ"),
      "asciiLower must NOT fold the non-ASCII case pair")
    assert(asciiLower("İ") !== asciiLower("i"))
  }

  test("sql_collation_contract: UTF8_LCASE grouping merges the mixed-" +
    "case key variants (distinct groups = distinct lowercase keys)") {
    graft.queries.SqlSurface.registerViews(spark, d)
    val out = rows("sql_collation_contract")
    val plainKeys = spark.sql(
      "SELECT count(DISTINCT lower(coalesce(o_orderpriority, '~'))) " +
        "FROM orders").collect().head.getLong(0)
    assert(out.size.toLong === plainKeys,
      "one output group per lowercase key class")
    // every representative is already lowercase (deterministic rep)
    assert(out.forall(r => { val k = r.getString(0)
      k === k.toLowerCase }), out.map(_.getString(0)).toString)
  }

  test("every sql_* query has an oracle") {
    val sqlQueries = SparkEntry.queries.keySet.filter(_.startsWith("sql_"))
    assert(sqlQueries.nonEmpty)
    assert(sqlQueries.subsetOf(SparkEntry.oracleSql.keySet))
  }
}
