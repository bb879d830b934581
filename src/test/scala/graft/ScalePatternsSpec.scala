package graft

import graft.operators.ScaleOps
import org.apache.spark.sql.functions._

/** Scale patterns: salted aggregation equals the direct aggregation on a
  * skewed dataset, and bucketed tables join without any shuffle exchange
  * (the co-located join the engine would use for repeated 100 TB
  * fact-fact joins). */
class ScalePatternsSpec extends SparkSpec {

  test("salted two-phase sum equals direct sum on a skewed key") {
    import spark.implicits._
    // 90% of rows share one hot key
    val df = (1 to 10000).map { i =>
      (if (i % 10 == 0) s"key${i % 7}" else "hotkey", i.toLong)
    }.toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = ScaleOps.saltedSum(df, "k", col("v"), buckets = 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted === direct)
    // content-derived salt: bucket assignment (not just the sum) is
    // invariant under physical layout — the per-(key,salt) partials match
    // across different partitionings
    val partials = (d: org.apache.spark.sql.DataFrame) =>
      d.withColumn("__salt",
          pmod(xxhash64(col("k"), col("v"), lit(42L)), lit(16L)))
        .groupBy("k", "__salt").agg(sum("v").as("p"))
        .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
        .toMap
    val p3 = partials(df.repartition(3))
    assert(p3 === partials(df.repartition(17)))
    // and the hot key actually spreads over many buckets
    assert(p3.keys.count(_._1 == "hotkey") >= 12)
    val spread = ScaleOps.saltedSum(df.repartition(5), "k", col("v"), 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(spread === direct)
  }

  test("AQE splits a skewed join partition at runtime (skew-join path)") {
    import spark.implicits._
    // one hot join key carrying ~all the probe rows vs a flat build side:
    // with thresholds tuned down, AQE must recognize the skewed shuffle
    // partition and mark the join skew-handled — the runtime half of the
    // skew story (the static half is the salted aggregation above)
    val hot = (1 to 200000).map(i =>
      (if (i % 100 == 0) i.toLong % 97 else 7L, i.toLong)).toDF("k", "v")
    val dim = (0L until 97L).map(k => (k, s"d$k")).toDF("k", "name")
    val prev = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = hot.join(dim, "k")
      // execute THIS dataset's QueryExecution (count() would spawn its
      // own), so the AdaptiveSparkPlan below is the finalized one
      assert(joined.collect().length === 200000)
      // assert on the finalized plan TREE (isSkewJoin on the join node),
      // not a "skew=" plan-string marker — string rendering shifts across
      // Spark versions; the node flag is the semantic fact
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      // QueryStageExec nodes are leaves — walk into their materialized
      // subplans too, or the join node is invisible to collect
      def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          p +: allNodes(q.plan)
        case _ => p +: p.children.flatMap(allNodes)
      }
      val skewFlags = allNodes(finalPlan).collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
          j.isSkewJoin
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
          j.isSkewJoin
      }
      assert(skewFlags.nonEmpty, s"no shuffled join found:\n$finalPlan")
      assert(skewFlags.exists(identity),
        s"AQE did not mark the skewed join:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("dynamic partition pruning reaches a partitioned fact scan") {
    import spark.implicits._
    // the 100 TB layout: a fact table partitioned by a low-cardinality
    // key, joined to a dimension whose FILTER is only known at plan time
    // on the dim side — DPP must push a pruning subquery into the fact
    // scan's PartitionFilters so only the matching directories are read
    // (without it, a selective dim filter still scans every partition)
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    (1 to 50000).map(i => (i.toLong, i.toLong % 97, s"p${i % 20}"))
      .toDF("id", "v", "part")
      .write.mode("overwrite").partitionBy("part").parquet(dir)
    // the dim must be parquet-backed: a local Seq relation constant-folds
    // its filter into the LocalTableScan (ConvertToLocalRelation), and
    // with no Filter node left DPP sees nothing selective to derive the
    // pruning subquery from (the repo-wide plan-rewrite-test gotcha)
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim")
      .toString
    (0 until 20).map(i => (s"p$i", i % 4)).toDF("part", "grp")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = spark.read.parquet(dir)
      .join(dim.filter(col("grp") === 0), "part")
    val n = joined.count()
    assert(n === 12500L) // 5 of 20 partitions survive the dim filter
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning subquery in the fact scan:\n$plan")
  }

  test("bucketed tables sort-merge join without shuffle exchanges") {
    import spark.implicits._
    // warehouse dir is a temp dir set at session build time (SparkSpec)
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("id", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("id", "vb")
    a.write.mode("overwrite").bucketBy(8, "id").sortBy("id")
      .saveAsTable("graft_bucketed_a")
    b.write.mode("overwrite").bucketBy(8, "id").sortBy("id")
      .saveAsTable("graft_bucketed_b")
    // disable auto-broadcast: small tables would otherwise plan a
    // BroadcastHashJoin and pass vacuously with or without bucketing
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bucketed_a")
        .join(spark.table("graft_bucketed_b"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"expected a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() === 1000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_b")
    }
  }

  test("InjectRuntimeFilter: a selective dim filter becomes a runtime " +
    "bloom filter on the fact side of a shuffled join") {
    // the 100 TB read-reduction feature beside DPP: when a shuffled join's
    // small side carries a selective filter, Catalyst injects
    // bloom_filter_agg(small side) → BloomFilterMightContain(fact side) so
    // fact rows that cannot match die before the exchange. Thresholds are
    // sized for clusters; scale them down to make the mechanism observable
    // on fixture-sized parquet (the AqeSkewJoinSpec convention).
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val d = "/root/testdata/sf0.01"
      val fact = Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_quantity"))
      val dim = Tables.orders(spark, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("BloomFilter"),
        s"expected an injected runtime bloom filter on the fact side:\n$plan")
      assert(joined.count() > 0L)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("sim_ivf_rerank: query vectors broadcast onto the shortlist, " +
    "corpus grid joined by shuffled-hash (never sorted)") {
    val d = "/root/testdata/sf0.001"
    val plan = graft.queries.Similarity
      .ivfRerankTopK(spark, d, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the ≤5-row query side broadcast:\n$plan")
    assert(plan.contains("ShuffledHashJoin"),
      s"expected the hinted shuffle-hash corpus join (no sort of the " +
        s"array-carrying side):\n$plan")
    Caching.releaseAll(); spark.catalog.clearCache()
  }

  test("q39_join_incremental: the four leg joins reuse one exchange " +
    "per input (the co-partitioning is planned, not re-shuffled)") {
    val df = graft.queries.Relational
      .queries("q39_join_incremental")(spark, "/root/testdata/sf0.001")
    df.collect() // AQE finalizes reuse decisions at execution
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage")
        || plan.contains("TableCacheQueryStage"),
      s"expected the four delta-leg joins to reuse exchanges over the " +
        s"shared orders/lineitem scans:\n$plan")
    Caching.releaseAll(); spark.catalog.clearCache()
  }
}
