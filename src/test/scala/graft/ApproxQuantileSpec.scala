package graft

import org.apache.spark.sql.functions._

/** Error-bound properties of the mergeable-sketch quantile path
  * (`events_quantiles_sketch` / `Events.sketchQuantileBound`), in the
  * regime the fixture cannot reach: n ≫ accuracy, where the GK summary
  * genuinely compresses and the returned value is approximate. The gated
  * query proves the bound holds on the fixture; this spec proves it
  * holds under forced compression, under both extreme partition
  * layouts (merge order differs), and collapses to rank-exactness in
  * the degenerate regime (n/accuracy < 1).
  */
class ApproxQuantileSpec extends SparkSpec {

  // 100k values per group via a bijective multiplicative hash of the
  // index — deterministic, insertion order decorrelated from value
  // order (sorted input is the GK sketch's easiest case; hashed order
  // exercises real summary merges)
  private def bigGroups(parts: Int) = {
    import spark.implicits._
    val n = 100000
    (0 until 2 * n).map { i =>
      val g = if (i < n) "a" else "b"
      val v = ((i % n) * 2654435761L) % 1000003L
      (g, v)
    }.toDF("event_type", "v").repartition(parts)
  }

  private def boundViolations(df: org.apache.spark.sql.DataFrame): Long =
    df.filter(col("within_bound") =!= 1L).count()

  test("forced compression (n = 100k, accuracy = 100): every returned " +
    "quantile stays inside the ±n/accuracy rank band") {
    val out = graft.queries.Events.sketchQuantileBound(bigGroups(8), acc = 100)
    val rows = out.collect()
    assert(rows.length == 8, "2 groups x 4 percentiles")
    assert(boundViolations(out) == 0L)
    Caching.releaseAll(); spark.catalog.clearCache()
  }

  test("bound holds under both extreme partition layouts (merge-order " +
    "independence of the guarantee, not of the estimate)") {
    for (parts <- Seq(1, 32)) {
      val out = graft.queries.Events.sketchQuantileBound(
        bigGroups(parts), acc = 100)
      assert(boundViolations(out) == 0L, s"bound violated at parts=$parts")
      Caching.releaseAll(); spark.catalog.clearCache()
    }
  }

  test("degenerate-exact regime (n·eps < 1): the sketch's rank error " +
    "is at most one rank off the type-1 target") {
    import spark.implicits._
    val n = 500
    val df = (0 until n).map(i => ("a", ((i * 2654435761L) % 4999L)))
      .toDF("event_type", "v")
    // acc = 1000 > n → eps·n < 1: the summary holds every sample
    val out = graft.queries.Events.sketchQuantileBound(df, acc = 1000)
      .collect()
    assert(out.length == 4)
    assert(out.forall(_.getLong(2) == 1L))
    // and directly: the returned values' exact ranks sit within 1 of
    // ceil(p·n/100) (the gated exact path's rank convention)
    val sorted = (0 until n).map(i => ((i * 2654435761L) % 4999L)).sorted
    val approx = df.groupBy(col("event_type"))
      .agg(percentile_approx(col("v"),
        array(lit(0.25), lit(0.5), lit(0.75), lit(0.95)), lit(1000)).as("qs"))
      .select(explode(col("qs"))).collect().map(_.getLong(0))
    val targets = Seq(25, 50, 75, 95).map(p => (n * p + 99) / 100)
    approx.zip(targets).foreach { case (v, t) =>
      val lo = sorted.indexOf(v) + 1
      val hi = sorted.lastIndexOf(v) + 1
      assert(lo <= t + 1 && hi >= t - 1,
        s"exact-regime rank [$lo,$hi] not within 1 of target $t (v=$v)")
    }
    Caching.releaseAll(); spark.catalog.clearCache()
  }
}
