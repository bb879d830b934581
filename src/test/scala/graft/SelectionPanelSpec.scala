package graft

import org.apache.spark.sql.functions._

/** Consistency pins for the round-10 selection/planning readouts that are
  * derived from other gated plans: the quality sampler must partition and
  * thin EXACTLY the gated classifier output, the range boundaries must be
  * the exact type-1 cut points of the value multiset, and the fertility
  * panel must reconcile with the gated per-doc token counts. */
class SelectionPanelSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("quality sample partitions the classifier output; the high band " +
    "keeps everything; kept <= total per band") {
    val cls = graft.queries.Pipeline
      .queries("docs_classifier_score")(spark, sf).collect()
    val panel = graft.queries.Pipeline
      .queries("docs_quality_sample")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val nTotal = panel.values.map(_._2).sum
    assert(nTotal === cls.length.toLong,
      "bands must partition the scored docs")
    panel.foreach { case (band, (rate, total, kept, tokTot, tokKept)) =>
      assert(kept <= total && tokKept <= tokTot, s"$band over-kept")
      if (band == "high") {
        assert(rate == 100L && kept == total && tokKept == tokTot,
          "rate-100 band must keep everything")
      }
    }
    // band boundaries replay the integer rule from the classifier rows
    val expectHigh = cls.count(_.getLong(2) >= 0).toLong
    assert(panel.get("high").map(_._2).getOrElse(0L) === expectHigh)
    Caching.releaseAll(); spark.catalog.clearCache()
  }

  test("range boundaries are the exact type-1 cut points: nondecreasing, " +
    "cum >= target, and minimal at their rank") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_totalprice").isNotNull)
    val vs = orders.select(
        expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").as("v"))
      .collect().map(_.getLong(0)).sorted
    val n = vs.length.toLong
    val rows = graft.queries.Relational
      .queries("q38_range_boundaries")(spark, sf).collect()
    assert(rows.length == 31)
    var prev = Long.MinValue
    rows.foreach { r =>
      val (k, target, boundary, below) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
      assert(target == k * n / 32)
      val bc = math.round(boundary * 100)
      assert(bc >= prev, "boundaries must be nondecreasing"); prev = bc
      assert(below >= target, "cum at boundary must reach the target")
      // minimality: the value just below the boundary has cum < target
      val cumBelow = vs.count(_ < bc).toLong
      assert(cumBelow < target || target == 0L,
        s"k=$k boundary not minimal: $cumBelow rows strictly below " +
          s"already reach target $target")
    }
    Caching.releaseAll(); spark.catalog.clearCache()
  }

  test("fertility panel reconciles with the gated per-doc token counts " +
    "and the gated language guesses") {
    val toks = graft.queries.TextOps.queries("text_tokens")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val langs = graft.queries.TextOps.queries("text_langid")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    val expect = langs.groupBy(_._2).map { case (lang, docs) =>
      val ids = docs.keys.toSeq
      val ws = ids.map(toks(_)._1).sum
      val bpe = ids.map(toks(_)._2).sum
      (lang, (ids.size.toLong, ws, bpe,
        if (ws > 0) Some(bpe * 1000000L / ws) else None))
    }
    val got = graft.queries.TextOps
      .queries("text_token_fertility")(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    assert(got === expect, "fertility drifted from the gated counts")
    Caching.releaseAll(); spark.catalog.clearCache()
  }
}
