package graft

import org.apache.spark.sql.functions._

/** The ANN recall readout (`sim_recall_ivf`) must agree with the set
  * intersection of its two independently-gated legs, leg for leg — it is a
  * derived metric, so its evidence is consistency, not a re-derivation. */
class RecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def topkSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("recall equals |brute ∩ ivf| / |brute| per query on the fixture") {
    val brute = topkSet(
      graft.queries.Similarity.queries("sim_topk")(spark, dir))
    val ivf = topkSet(
      graft.queries.Similarity.queries("sim_ivf_topk")(spark, dir))
    val got = graft.queries.Similarity.queries("sim_recall_ivf")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet === brute.keySet)
    got.foreach { case (qid, (nBrute, nHits, recall)) =>
      val b = brute(qid)
      val hits = b.intersect(ivf.getOrElse(qid, Set.empty))
      assert(nBrute === b.size.toLong, s"qid=$qid n_brute")
      assert(nHits === hits.size.toLong, s"qid=$qid n_hits")
      assert(recall === hits.size.toDouble / b.size, s"qid=$qid recall")
      assert(recall >= 0.0 && recall <= 1.0)
    }
  }

  test("pq recall equals |bruteL2 ∩ pq| / |bruteL2| per query") {
    // ground truth recomputed independently: exact squared-L2 ranks over
    // the gridded vectors (the same integers the query uses)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .filter(!_.isNullAt(1))
      .map(r => r.getLong(0) -> r.getSeq[Float](1)
        .map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray).toMap
    def d2(a: Array[Long], b: Array[Long]): BigInt =
      a.zip(b).map { case (x, y) => BigInt(x - y) * BigInt(x - y) }.sum
    val bruteL2 = emb.keys.filter(_ <= 4).map { qid =>
      qid -> emb.toSeq.sortBy { case (vid, v) => (d2(emb(qid), v), vid) }
        .take(10).map(_._1).toSet
    }.toMap
    val pq = topkSet(
      graft.queries.Similarity.queries("sim_pq_topk")(spark, dir))
    val got = graft.queries.Similarity.queries("sim_recall_pq")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet === bruteL2.keySet)
    got.foreach { case (qid, (nBrute, nHits, recall)) =>
      val truth = bruteL2(qid)
      val hits = truth.intersect(pq.getOrElse(qid, Set.empty))
      assert(nBrute === truth.size.toLong, s"qid=$qid n_brute")
      assert(nHits === hits.size.toLong, s"qid=$qid n_hits")
      assert(recall === hits.size.toDouble / truth.size, s"qid=$qid recall")
    }
  }

  test("with every cell probed, ivf is exhaustive and recall is 1") {
    // nprobe = number of labels (10 in the fixture): the probed-cell scan
    // degenerates to a full scan; ivf ranks by the exact-integer key and
    // brute by float cosine, but the fixture's rank gaps dwarf both
    // resolutions (the property the two gated legs already rely on)
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") <= 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val brute = topkSet(graft.queries.Similarity.bruteTopK(emb, q, 10))
    val full = topkSet(
      graft.queries.Similarity.ivfTopK(spark, dir, k = 10, nprobe = 10))
    assert(full === brute)
  }

  test("LSH banding recall agrees with its two gated legs' pair sets") {
    def pairSet(name: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(spark, dir).select(col("doc_a"), col("doc_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // independently re-derive the truth leg at 0.7 from the gated 0.6
    // jaccard pairs (a superset carrying the jaccard column)
    val truth = SparkEntry.queries("dedup_neardup_jaccard")(spark, dir)
      .filter(col("jaccard") >= 0.7).select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = pairSet("dedup_minhash_lsh")
    val row = SparkEntry.queries("dedup_recall_lsh")(spark, dir)
      .collect().head
    Caching.releaseAll(); spark.catalog.clearCache()
    assert(row.getLong(0) == truth.size.toLong, "n_true")
    assert(row.getLong(1) == lsh.size.toLong, "n_lsh")
    assert(row.getLong(2) == truth.intersect(lsh).size.toLong, "n_hit")
    if (truth.nonEmpty)
      assert(row.getDouble(3) == truth.intersect(lsh).size.toDouble / truth.size)
    assert(row.getLong(2) <= math.min(row.getLong(0), row.getLong(1)))
  }

  test("embed recall agrees with its two gated legs' pair sets") {
    def pairSet(name: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(spark, dir)
        .select(col("vec_a"), col("vec_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairSet("dedup_embed_cosine")
    val lsh = pairSet("dedup_embed_lsh")
    val row = SparkEntry.queries("dedup_recall_embed")(spark, dir)
      .collect().head
    Caching.releaseAll(); spark.catalog.clearCache()
    assert(row.getLong(0) == truth.size.toLong, "n_true")
    assert(row.getLong(1) == lsh.size.toLong, "n_lsh")
    assert(row.getLong(2) == truth.intersect(lsh).size.toLong, "n_hit")
    if (truth.nonEmpty)
      assert(row.getDouble(3) ==
        truth.intersect(lsh).size.toDouble / truth.size)
    assert(row.getLong(2) <= math.min(row.getLong(0), row.getLong(1)))
  }

  test("int8 recall is a well-formed per-query metric and is exact " +
    "when quantization preserves the brute ordering") {
    val brute = topkSet(
      graft.queries.Similarity.queries("sim_topk")(spark, dir))
    val got = graft.queries.Similarity.queries("sim_recall_int8")(
      spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet === brute.keySet)
    got.foreach { case (qid, (nBrute, nHits, recall)) =>
      assert(nBrute === brute(qid).size.toLong)
      assert(nHits >= 0 && nHits <= nBrute)
      assert(recall === nHits.toDouble / nBrute)
    }
    // 8-bit codes at 64 dims keep cosine ordering almost intact — the
    // whole point of scalar quantization; demand a non-degenerate recall
    val overall = got.values.map(_._2).sum.toDouble /
      got.values.map(_._1).sum
    assert(overall >= 0.5, s"int8 recall collapsed: $overall")
  }
}
