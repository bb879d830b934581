package graft

import org.apache.spark.sql.functions._

/** Data-curation operators added on top of the similarity/dedup families:
  * k-means clustering, SemDeDup-style semantic dedup, corpus-boilerplate
  * fraction, and event debounce. Each query's cross-engine values are
  * pinned by the DuckDB oracle; these tests pin the SEMANTIC properties
  * the oracle can't express (blob separation, keep-flag invariants,
  * exact reimplementation of the debounce rule).
  */
class CurationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("kmeans separates two well-separated blobs") {
    import spark.implicits._
    // blob A around (+10, 0, ...), blob B around (0, +10, ...); seeds 0/1
    // land one per blob, so 2-means must recover blob membership exactly
    val rows = (0L until 40L).map { i =>
      val inA = i % 2 == 0
      val base = Array.fill(8)(0.0f)
      base(if (inA) 0 else 1) = 10.0f
      base(2 + (i % 5).toInt) = (0.1f * ((i % 7) - 3))
      (i, base)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val (asg, _) = graft.queries.Similarity.kmeansAssignOf(emb, k = 2)
    val got = asg.select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 40)
    // vec 0 is blob A's seed, vec 1 blob B's
    (0L until 40L).foreach { i =>
      val expected = if (i % 2 == 0) got(0L) else got(1L)
      assert(got(i) === expected, s"vec $i landed in ${got(i)}")
    }
    assert(got(0L) !== got(1L))
  }

  test("emb_kmeans fixture invariants: one row per vector, k-bounded " +
    "clusters, non-negative exact distances") {
    val out = graft.queries.Similarity.queries("emb_kmeans")(spark, dir)
      .collect()
    val nVec = Tables.embeddings(spark, dir).count()
    assert(out.length === nVec)
    assert(out.map(_.getLong(0)).distinct.length === nVec)
    out.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) < 8)
      assert(r.getLong(2) >= 0) // squared L2 on the integer grid
    }
  }

  test("dedup_semantic: full keep-list, binary flags, and the smallest " +
    "vector of every cell is always kept") {
    val out = graft.queries.Similarity.queries("dedup_semantic")(spark, dir)
      .collect()
    assert(out.length === Tables.embeddings(spark, dir).count())
    out.foreach(r => assert(r.getLong(2) == 0L || r.getLong(2) == 1L))
    // seniority rule: only a SMALLER same-cell neighbor can drop a vector,
    // so each cell's minimum vec_id has keep=1
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val minVec = rows.minBy(_.getLong(0))
      assert(minVec.getLong(2) === 1L,
        s"cell-min vec ${minVec.getLong(0)} was dropped")
    }
  }

  test("docs_boilerplate_ngrams: counts bounded and fraction consistent") {
    val out = graft.queries.TextOps.queries("docs_boilerplate_ngrams")(
      spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, nb, frac) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(n > 0 && nb >= 0 && nb <= n)
      assert(frac === nb.toDouble / n)
    }
    // a corpus-common signal must exist somewhere at this sf
    assert(out.exists(_.getLong(2) > 0))
  }

  test("sim_knn_label matches an exact reimplementation of the " +
    "10-NN majority vote") {
    val out = graft.queries.Similarity.queries("sim_knn_label")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.length === 50)
    val all = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).map(x => math.floor(x * 1e6 + 0.5).toLong)))
    val train = all.filter(t => t._1 >= 50 &&
      t._3.map(x => BigInt(x) * BigInt(x)).sum > 0)
    val expected = all.filter(_._1 < 50).sortBy(_._1).map {
      case (qid, _, qg) =>
        val key = train.map { case (vid, lab, xg) =>
          val dot = qg.zip(xg).map { case (a, b) => BigInt(a) * b }.sum
          val n2 = xg.map(x => BigInt(x) * BigInt(x)).sum
          val num = dot * dot.abs * 1000000
          // floorDiv for any sign of num
          val q = (num - (num.mod(n2))) / n2
          (vid, lab, q)
        }
        val nn = key.sortBy { case (vid, _, k) => (-k, vid) }.take(10)
        val (lab, votes) = nn.groupBy(_._2).view.mapValues(_.length).toSeq
          .minBy { case (l, v) => (-v, l) }
        (qid, lab, votes.toLong)
    }
    assert(out.toSeq === expected.toSeq)
  }

  test("events_debounce matches an exact reimplementation of the rule") {
    val kept = graft.queries.Events.queries("events_debounce")(spark, dir)
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    val raw = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = raw.groupBy(e => (e._2, e._3)).valuesIterator.flatMap {
      es =>
        val sorted = es.sortBy(e => (e._4, e._1))
        sorted.zipWithIndex.collect {
          case (e, 0) => e._1
          case (e, i) if e._4 - sorted(i - 1)._4 > 1800000000L => e._1
        }
    }.toSet
    assert(kept === expected)
    assert(kept.size < raw.length) // the rule actually drops something
  }

  test("curation disposition reconciles with the attrition panel: each " +
    "stage's per-doc drops sum to the panel's stage deltas") {
    val disp = graft.queries.Pipeline.queries("docs_curation_disposition")(
      spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(disp.nonEmpty)
    val byStage = disp.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      .withDefaultValue(0L)
    val panel = graft.queries.Pipeline.queries("docs_curation_pipeline")(
      spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    val (raw, exact, quality, decontam, fin) = panel
      .foldLeft((0L, 0L, 0L, 0L, 0L)) { case ((a, b, c, d0, e), p) =>
        (a + p._1, b + p._2, c + p._3, d0 + p._4, e + p._5) }
    assert(disp.length.toLong === raw, "one disposition row per raw doc")
    assert(byStage("exact_dup") === raw - exact)
    assert(byStage("quality") === exact - quality)
    assert(byStage("decontaminated") === quality - decontam)
    assert(byStage("near_dup") === decontam - fin)
    assert(byStage("kept") === fin)
    // every document classified by exactly the five labels
    assert(byStage.keys.toSet.subsetOf(Set("exact_dup", "quality",
      "decontaminated", "near_dup", "kept")))
  }
}
