package graft

/** Readout-vs-source consistency for the two round-10 report operators:
  * the IVF cell histogram must account for exactly the assignable corpus
  * with exact ppm shares, and the quality-rule ablation must agree row
  * for row with flags recomputed from the gopher panel's own emitted
  * measures (the two queries share one measure projection — this pins
  * that the aggregation on top is right). */
class IndexHealthSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("sim_cell_histogram accounts for every assignable vector with " +
    "exact integer shares") {
    val cells = graft.queries.Similarity.queries("sim_cell_histogram")(
      spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(cells.nonEmpty)
    assert(cells.map(_._1).distinct.length === cells.length,
      "duplicate cent_id rows")
    val total = cells.map(_._2).sum
    val nAssignable = Tables.embeddings(spark, d)
      .filter(org.apache.spark.sql.functions.col("embedding").isNotNull)
      .count()
    assert(total === nAssignable,
      s"cell populations sum to $total, corpus has $nAssignable")
    cells.foreach { case (id, size, ppm) =>
      assert(size >= 1, s"cell $id emitted empty")
      assert(ppm === 1000000L * size / total, s"cell $id share off-grid")
    }
  }

  test("pq distortion is zero when every vector is its own code, and " +
    "non-negative with consistent integer averages on the fixture") {
    import spark.implicits._
    // <= PqK vectors: training seeds every vector as an init code, so
    // each subvector's nearest code is itself — distortion exactly 0
    val vecs = (0 until 10).map { i =>
      i.toLong -> (0 until 64).map(j =>
        math.sin(i * 64 + j + 1.0).toFloat).toArray
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val degen = graft.queries.Similarity.pqDistortionOf(emb).collect()
    assert(degen.length === 8)
    degen.foreach { r =>
      assert(r.getLong(1) === 10L)
      assert(r.getLong(2) === 0L, s"subspace ${r.getLong(0)} distorted")
      assert(r.getLong(3) === 0L)
    }
    val real = graft.queries.Similarity.queries("sim_pq_distortion")(
      spark, d).collect()
    assert(real.length === 8)
    real.foreach { r =>
      val (n, sumD2, avg) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(sumD2 >= 0L)
      assert(avg === sumD2 / n, "avg must be the floor integer average")
    }
  }

  test("langid confusion cells equal the per-doc langid output " +
    "aggregated driver-side") {
    val perDoc = graft.queries.TextOps.queries("text_langid")(spark, d)
      .collect().map(r => (r.getString(1), r.getString(5)))
    val expected = perDoc.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val labelTotals = perDoc.groupBy(_._1).view.mapValues(_.length.toLong)
      .toMap
    val got = graft.queries.TextOps.queries("text_langid_confusion")(
      spark, d).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet ===
      expected.keySet)
    got.foreach { r =>
      val cell = (r.getString(0), r.getString(1))
      assert(r.getLong(2) === expected(cell))
      assert(r.getLong(3) === labelTotals(cell._1))
      assert(r.getLong(4) === 1000000L * expected(cell) /
        labelTotals(cell._1))
    }
  }

  test("vocab growth curve: cumulative columns are monotone and close " +
    "on the exact corpus totals") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.TextOps.queries("text_vocab_growth")(
      spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_._1) === rows.map(_._1).sorted)
    Seq[((Long, Long, Long, Long)) => Long](_._2, _._3, _._4).foreach {
      f => assert(rows.map(f) === rows.map(f).sorted, "non-monotone") }
    val docs = Tables.documents(spark, d)
    val toks = docs.select(explode(
      graft.queries.TextOps.tokens(col("text"))).as("t"))
    assert(rows.last._2 === docs.count())
    assert(rows.last._3 === toks.count())
    assert(rows.last._4 === toks.distinct().count())
    // Heaps: vocabulary grows strictly slower than tokens after the
    // first decile on any natural-language-like corpus
    assert(rows.last._4 < rows.last._3)
  }

  test("docs_quality_ablation equals flags recomputed from the gopher " +
    "panel's emitted measures") {
    val panel = graft.queries.TextOps.queries("docs_gopher_quality")(
      spark, d).collect()
    // recompute the five fail flags from the panel's own grid columns
    val flags = panel.map { r =>
      val nWords = r.getLong(1)
      val mwl = r.getLong(3)
      val alpha = r.getLong(4)
      val sym = r.getLong(5)
      val nStop = r.getLong(6)
      Seq(
        "word_count" -> (nWords < 50 || nWords > 100000),
        "mean_word_len" -> (mwl < 300 || mwl > 1000),
        "alpha_words" -> (alpha < 80),
        "symbol_ratio" -> (sym >= 10),
        "stopwords" -> (nStop < 2))
    }
    val expected = flags.head.map(_._1).map { rule =>
      val per = flags.map(_.toMap)
      val nFail = per.count(_(rule))
      val nOnly = per.count(f => f(rule) && f.values.count(identity) == 1)
      rule -> ((nFail.toLong, nOnly.toLong))
    }.toMap
    val got = graft.queries.TextOps.queries("docs_quality_ablation")(
      spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    got.values.foreach { case (nFail, nOnly) => assert(nOnly <= nFail) }
  }
}
