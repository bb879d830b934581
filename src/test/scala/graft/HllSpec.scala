package graft

import org.apache.spark.sql.functions._

/** Contract pins for the mergeable distinct-count maintenance gate
  * (`events_uniques_incremental`): the HLL sketch's merge property (the
  * reason the rollup never rescans history) and its error band at forced
  * estimation scale (the gate corpora sit in the sketch's exact regime,
  * so the ±5%+1 contract must also be exercised where the sketch genuinely
  * estimates). Band check mirrors the gate: |est − exact|·20 ≤ exact + 20,
  * all integers. */
class HllSpec extends SparkSpec {

  private def bound(est: Long, exact: Long): Boolean =
    math.abs(est - exact) * 20L <= exact + 20L

  test("sketch union over arbitrary splits estimates the union " +
    "cardinality within the gate band — never by rescanning") {
    import spark.implicits._
    // 60k values, 3-way skewed split with heavy overlap between parts
    val n = 60000L
    val df = spark.range(n)
      .select((col("id") * 2654435761L % 100000L).as("v"),
        (col("id") % 3L).as("part"))
    val parts = df.groupBy(col("part"))
      .agg(hll_sketch_agg(col("v")).as("sk"))
    val est = parts.agg(hll_union_agg(col("sk")).as("u"))
      .select(hll_sketch_estimate(col("u"))).collect().head.getLong(0)
    val exact = df.select(col("v")).distinct().count()
    assert(exact > 20000L, "fixture must force estimation mode")
    assert(bound(est, exact),
      s"merged estimate $est outside the gate band around $exact")
    // and the one-pass direct sketch agrees with the merged one within
    // the band too (merge ≈ rebuild, the mergeability contract)
    val direct = df.agg(hll_sketch_agg(col("v")).as("sk"))
      .select(hll_sketch_estimate(col("sk"))).collect().head.getLong(0)
    assert(bound(direct, exact) && math.abs(direct - est) * 20L <= exact + 20L)
    Caching.releaseAll(); spark.catalog.clearCache()
  }

  test("small-cardinality sketches are exact (the gate corpora's regime)") {
    import spark.implicits._
    val vs = (1L to 500L).map(i => (i % 97L, i % 10L))
    val df = vs.toDF("v", "g")
    val est = df.groupBy(col("g"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("v"))).as("est"),
        countDistinct(col("v")).as("exact"))
      .collect()
    est.foreach(r => assert(r.getLong(1) === r.getLong(2),
      s"group ${r.getLong(0)}: sketch ${r.getLong(1)} != ${r.getLong(2)}"))
    Caching.releaseAll(); spark.catalog.clearCache()
  }

  test("the gated snapshot⊕delta estimate matches the full-scan sketch " +
    "and the exact count at the fixture") {
    val out = SparkEntry.queries("events_uniques_incremental")(
      spark, SparkEntry.smokeDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(2) == 1L),
      "a fixture day violated the sketch bound contract")
    // the exact leg really is the distinct count
    val exact = Tables.events(spark, SparkEntry.smokeDir)
      .filter(col("ts").isNotNull)
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(_.getLong(1)).sorted
    assert(out.map(_.getLong(1)).sorted.toSeq === exact.toSeq)
    Caching.releaseAll(); spark.catalog.clearCache()
  }
}
