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

  test("chunk_overlap: boundary counts, 16-token overlap, full coverage, " +
    "null text chunks to nothing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-chunk").toString
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    // token counts straddling every boundary: 1 and 64 (one chunk),
    // 65 (first two-chunk count), 112 (last two-chunk count: 64+48),
    // 113 (first three-chunk count), plus a null text
    Seq((1L, words(1)), (3L, words(64)), (4L, words(65)),
      (5L, words(112)), (6L, words(113)),
      (7L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("docs_chunk_overlap")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byDoc = out.groupBy(_._1)
    assert(byDoc(1L).length == 1 && byDoc(3L).length == 1)
    assert(byDoc(4L).length == 2 && byDoc(5L).length == 2)
    assert(byDoc(6L).length == 3)
    assert(!byDoc.contains(7L))
    // n_tokens always equals the chunk's actual token count
    out.foreach { case (_, _, nt, text) =>
      assert(text.split(" ").length == nt)
    }
    // doc 4 (65 tokens): chunk 0 = tokens 1..64, chunk 1 = tokens 49..65;
    // the 16-token overlap is bit-equal and concatenation re-covers the
    // document in order
    val c4 = byDoc(4L).sortBy(_._2)
    assert(c4(0)._3 == 64 && c4(1)._3 == 17)
    val t0 = c4(0)._4.split(" "); val t1 = c4(1)._4.split(" ")
    assert(t0.takeRight(16).sameElements(t1.take(16)))
    assert((t0 ++ t1.drop(16)).sameElements((1 to 65).map(i => s"w$i")))
    // every token of the three-chunk doc lands in at least one chunk
    assert(byDoc(6L).flatMap(_._4.split(" ")).toSet ==
      (1 to 113).map(i => s"w$i").toSet)
  }

  test("budget_sample: quotas sum to the budget, each within 1 of its " +
    "real-valued share, ranks contiguous") {
    val out = SparkEntry.queries("docs_budget_sample")(spark, d)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val quotas = out.groupBy(_._1).map { case (src, rows) =>
      assert(rows.map(_._2).distinct.length == 1, s"$src quota not constant")
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length),
        s"$src ranks not contiguous")
      // at sf0.001 every source has more docs than its quota, so the
      // quota is filled exactly and the global budget is hit exactly
      assert(rows.length == rows.head._2, s"$src quota underfilled")
      src -> rows.head._2
    }
    assert(quotas.values.sum == 100L)
    // largest-remainder apportionment: every quota is floor(share) or
    // floor(share)+1 of the real-valued proportional share
    val wt = Tables.documents(spark, d).filter(col("source").isNotNull)
      .select(col("source")).distinct()
      .withColumn("wt", lit(25L) +
        conv(substring(md5(col("source").cast("string").cast("binary")),
          1, 15), 16, 10).cast("long") % 51)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sw = wt.values.sum
    quotas.foreach { case (src, q) =>
      val base = 100L * wt(src) / sw
      assert(q == base || q == base + 1,
        s"$src quota $q outside [{$base}, ${base + 1}]")
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

  private def tempAlloc(counts: Map[String, Int], budget: Long) = {
    import spark.implicits._
    val docs = counts.toSeq.flatMap { case (src, n) =>
      (0 until n).map(i => (src, s"$src-$i"))
    }.toDF("source", "doc_id")
    graft.queries.Pipeline.temperatureAllocation(docs, budget)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
  }

  test("temperature allocation: exact isqrt weights at squares and " +
    "neighbors, quota sums to the budget") {
    // counts straddle perfect squares: isqrt must be exact on both sides
    val out = tempAlloc(
      Map("a" -> 1, "b" -> 3, "c" -> 4, "d" -> 99, "e" -> 100), 16L)
    assert(out("a")._2 === 1L) // isqrt(1)
    assert(out("b")._2 === 1L) // isqrt(3)
    assert(out("c")._2 === 2L) // isqrt(4)
    assert(out("d")._2 === 9L) // isqrt(99)
    assert(out("e")._2 === 10L) // isqrt(100)
    assert(out.values.map(_._5).sum === 16L, "largest-remainder quota " +
      "must sum exactly to the budget")
    // each quota within 1 of its real-valued share (apportionment bound)
    val sw = out.values.map(_._2).sum.toDouble
    out.values.foreach { case (_, wt, _, _, q) =>
      assert(math.abs(q - 16L * wt / sw) <= 1.0)
    }
  }

  test("temperature allocation upweights small sources: tempered share " +
    "exceeds natural share exactly for the below-average source") {
    val out = tempAlloc(Map("big" -> 400, "small" -> 4), 10L)
    val (bigN, _, bigShare, bigTemp, _) = out("big")
    val (smallN, _, smallShare, smallTemp, _) = out("small")
    assert(bigN === 400L && smallN === 4L)
    assert(smallTemp > smallShare, "α=1/2 must upweight the small source")
    assert(bigTemp < bigShare, "α=1/2 must damp the head source")
    // exact grid values: shares 400/404 and 4/404; weights 20 and 2
    assert(smallShare === 1000000L * 4 / 404)
    assert(smallTemp === 1000000L * 2 / 22)
  }

  test("training manifest conserves the curation pipeline's final docs " +
    "and tokens; packs are contiguous per shard") {
    val d = "/root/testdata/sf0.001"
    val manifest = graft.queries.Pipeline
      .queries("docs_training_manifest")(spark, d).collect()
    val pipe = graft.queries.Pipeline
      .queries("docs_curation_pipeline")(spark, d).collect()
    // Σ over manifest == the attrition panel's final row counts/tokens
    assert(manifest.map(_.getLong(2)).sum ==
      pipe.map(_.getLong(5)).sum, "doc counts diverge")
    assert(manifest.map(_.getLong(3)).sum ==
      pipe.map(_.getLong(6)).sum, "token counts diverge")
    // every non-empty shard's layout starts at pack 0 (the first doc's
    // offset is 0 by construction; packs may legitimately skip an index
    // when one document spans more than a whole 512-token pack)
    manifest.groupBy(_.getLong(0)).foreach { case (shard, rows) =>
      val packs = rows.map(_.getLong(1)).sorted
      assert(packs.head == 0L, s"shard $shard starts at pack ${packs.head}")
    }
    Caching.releaseAll(); spark.catalog.clearCache()
  }
}
