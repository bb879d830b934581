package graft

import org.apache.spark.sql.functions._

/** Similarity-search checks on the real embeddings fixture: identity is
  * its own nearest neighbor, brute-force ranks are sane, and the IVF probe
  * path recovers most of the brute-force top-k (it is approximate by
  * design; nprobe=3 of 10 cells). */
class SimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("sim_topk rank 1 is the query vector itself") {
    val out = graft.queries.Similarity.queries("sim_topk")(spark, dir)
      .filter(col("rank") === 1).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getLong(0) === r.getLong(2)))
  }

  test("IVF top-k recovers most of brute-force top-k") {
    val brute = graft.queries.Similarity.queries("sim_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivfRows = graft.queries.Similarity
      .ivfTopK(spark, dir, k = 10, nprobe = 3).collect()
    val ivf = ivfRows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall $recall too low")
    // rank 1 (the vector itself) must always survive probing
    ivfRows.filter(_.getLong(1) === 1L)
      .foreach(r => assert(r.getLong(0) === r.getLong(2)))
  }

  test("nn_per_label is symmetric-free and within-label") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label")).as[(Long, Int)].collect().toMap
    val out = graft.queries.Similarity.queries("sim_nn_per_label")(spark, dir)
      .collect()
    out.foreach { r =>
      assert(r.getLong(1) !== r.getLong(2)) // never its own neighbor
      assert(emb(r.getLong(1)) === emb(r.getLong(2))) // same block
    }
  }
}
