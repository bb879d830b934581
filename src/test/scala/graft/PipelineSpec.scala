package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Dataset-preparation operators: range-join semantics on hand-built
  * intervals (boundaries, overlap, multi-bucket spans), split/sample
  * properties, and the plan shape that keeps the range join scalable. */
class PipelineSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("pointInInterval: boundaries, overlap, multi-bucket spans") {
    import spark.implicits._
    // bucket = 10 us; intervals: A=[10,30) spans 2+ buckets, B=[25,45)
    // overlaps A, C=[100,101) single-point-wide far away
    val ivs = Seq(("A", 10L, 30L), ("B", 25L, 45L), ("C", 100L, 101L))
      .toDF("iv", "start_us", "end_us")
    val pts = Seq(9L, 10L, 25L, 29L, 30L, 44L, 45L, 100L, 101L)
      .toDF("pt_us")
    val got = graft.operators.RangeJoin
      .pointInInterval(pts, "pt_us", ivs, "start_us", "end_us", 10L)
      .select(col("pt_us"), col("iv"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = Set(
      10L -> "A", 25L -> "A", 29L -> "A",     // start inclusive
      25L -> "B", 29L -> "B", 30L -> "B", 44L -> "B", // overlap; end excl.
      100L -> "C")                             // width-1 interval
    assert(got == want)                        // 9, 45, 101 match nothing
  }

  test("pointInInterval joins on the bucket — no nested-loop/cartesian") {
    val p = SparkEntry.queries("events_range_join")(spark, d)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "range join fell back to a nested-loop inequality join")
  }

  test("split is a pure projection: 100 buckets, exhaustive and disjoint") {
    val out = SparkEntry.queries("docs_split_train_val")(spark, d)
    val byS = out.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS.keySet == Set("train", "val", "test"))
    // hash split at n=500: expect ~90/5/5 with slack
    assert(byS("train") > 400 && byS("val") < 60 && byS("test") < 60)
    // same doc always lands in the same split (pure function of doc_id)
    val twice = SparkEntry.queries("docs_split_train_val")(spark, d)
    assert(out.collect().toSeq == twice.collect().toSeq)
  }

  test("stratified sample: at most 50 per language, ranks contiguous") {
    val out = SparkEntry.queries("docs_stratified_sample")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byLang = out.groupBy(_._1)
    assert(byLang.nonEmpty)
    byLang.foreach { case (_, rows) =>
      val rns = rows.map(_._2).sorted.toSeq
      assert(rns.length <= 50)
      assert(rns == (1L to rns.length))
    }
  }

  test("tfidf: rn bounded by 5, score consistent with tf/df") {
    val rows = SparkEntry.queries("text_tfidf_top")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rn, tf, df, score) =
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(rn >= 1 && rn <= 5)
      assert(score == tf * 1000000L / df)
    }
  }
}
