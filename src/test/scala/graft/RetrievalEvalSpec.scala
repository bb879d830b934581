package graft

import org.apache.spark.sql.functions._

/** Consistency pins for the two round-10 quality readouts that grade
  * other gated plans: `text_mrr_eval` must be derivable row-for-row from
  * the gated `text_bm25_topk` output, and `dedup_precision_lsh`'s
  * verified count must equal the gated `dedup_minhash_lsh` pair count —
  * the metrics cannot drift from the queries they grade. */
class RetrievalEvalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("MRR readout == recomputation from the gated bm25 top-10") {
    val top = graft.queries.TextOps.queries("text_bm25_topk")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    // fixture queries all have 2 terms; relevant = both matched
    val expect = top.groupBy(_._1).map { case (q, rows) =>
      val fr = rows.filter(_._3 == 2L).map(_._2).sorted.headOption
      (q, fr.getOrElse(0L), fr.map(1000000L / _).getOrElse(0L))
    }.toSet
    val got = graft.queries.TextOps.queries("text_mrr_eval")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet === expect, "MRR drifted from the ranking it grades")
    assert(got.map(_._1).toSeq.sorted === Seq(0L, 1L, 2L, 3L, 4L),
      "every query in the static set must appear")
    Caching.releaseAll(); spark.catalog.clearCache()
  }

  test("nDCG readout: DCG recomputes from the gated bm25 top-10 with the " +
    "pinned weights; weights are round(1e6/log2(r+1)); idcg dominates") {
    // the pinned rank-weight constants really are the rounded log grid
    val wts = Seq(1000000L, 630930L, 500000L, 430677L, 386853L, 356207L,
      333333L, 315465L, 301030L, 289065L)
    (1 to 10).foreach { r =>
      val w = math.round(1e6 / (math.log(r + 1.0) / math.log(2.0)))
      assert(wts(r - 1) === w, s"rank-$r weight drifted from the grid")
    }
    val top = graft.queries.TextOps.queries("text_bm25_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    val expectDcg = top.groupBy(_._1).map { case (q, rows) =>
      q -> rows.map { case (_, rn, gain) => gain * wts(rn.toInt - 1) }.sum
    }
    val got = graft.queries.TextOps.queries("text_ndcg_eval")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    got.foreach { case (q, dcg, idcg, ndcg) =>
      assert(dcg === expectDcg.getOrElse(q, 0L),
        s"query $q: DCG drifted from the ranking it grades")
      // the corpus-ideal ordering dominates any retrieval ordering over
      // the same relevance truth (rearrangement + best-docs selection)
      assert(idcg >= dcg, s"query $q: idcg $idcg < dcg $dcg")
      if (idcg > 0L) assert(ndcg === dcg * 1000000L / idcg)
      else assert(ndcg === 0L)
      assert(ndcg <= 1000000L)
    }
    Caching.releaseAll(); spark.catalog.clearCache()
  }

  test("rr_ppm is exactly 10^6 div first_rel_rank (0 when absent)") {
    val got = graft.queries.TextOps.queries("text_mrr_eval")(spark, sf)
      .collect()
    got.foreach { r =>
      val (fr, rr) = (r.getLong(1), r.getLong(2))
      if (fr == 0L) assert(rr == 0L)
      else assert(rr == 1000000L / fr)
    }
    Caching.releaseAll(); spark.catalog.clearCache()
  }

  test("SRP embedding precision's verified count == the gated SRP pair " +
    "set; verified is a candidate subset") {
    val pairs = graft.queries.Similarity
      .queries("dedup_embed_lsh")(spark, sf).count()
    val row = graft.queries.Similarity
      .queries("dedup_precision_embed")(spark, sf).collect().head
    val (nCand, nVer) = (row.getLong(0), row.getLong(1))
    assert(nVer === pairs, "embed precision drifted from the SRP plan")
    assert(nVer <= nCand)
    if (nCand > 0)
      assert(math.abs(row.getDouble(2) - nVer.toDouble / nCand) == 0.0)
    Caching.releaseAll(); spark.catalog.clearCache()
  }

  test("LSH precision's verified count == the gated verified pair set; " +
    "precision is a fraction of the candidate count") {
    val pairs = graft.queries.Dedup
      .queries("dedup_minhash_lsh")(spark, sf).count()
    val row = graft.queries.Dedup
      .queries("dedup_precision_lsh")(spark, sf).collect().head
    val (nCand, nVer) = (row.getLong(0), row.getLong(1))
    assert(nVer === pairs, "precision readout drifted from the LSH plan")
    assert(nVer <= nCand, "verified pairs must be a candidate subset")
    if (nCand > 0)
      assert(math.abs(row.getDouble(2) - nVer.toDouble / nCand) == 0.0)
    Caching.releaseAll(); spark.catalog.clearCache()
  }
}
