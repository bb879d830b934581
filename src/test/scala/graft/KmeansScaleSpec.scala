package graft

import org.apache.spark.sql.functions._

/** The SemDeDup cell-sizing rule validated ON DATA, not just arithmetic
  * (round-7 verdict item): `recommendedK(n, target)` must yield a k whose
  * REALIZED k-means cells stay within a small multiple of the target, so
  * the within-cell candidate join in `dedup_semantic` is genuinely
  * O(N · targetCellSize). A ~100k-vector deterministic synthetic corpus
  * is the data point; `SimilaritySpec` keeps the pure-arithmetic pins. */
class KmeansScaleSpec extends SparkSpec {

  test("recommendedK bounds the realized max cell on a 100k-vector corpus") {
    val n = 100000L
    val target = 2048L
    val k = graft.queries.Similarity.recommendedK(n, target)
    assert(k == 49) // ceil(100000 / 2048)
    // deterministic synthetic corpus, generated distributed (no driver
    // materialization): 16-dim sin-lattice vectors, dense 0-based ids
    val emb = spark.range(0, n, 1, 8)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(15)),
          j => sin(col("id") * lit(16) + j + lit(1)).cast("float"))
          .as("embedding"))
    val (asg, _) = graft.queries.Similarity.kmeansAssignOf(emb, k)
    val cells = asg.groupBy(col("cluster")).count()
      .agg(max(col("count")).as("mx"), count(lit(1)).as("ncells"))
      .collect().head
    val (maxCell, nCells) = (cells.getLong(0), cells.getLong(1))
    Caching.releaseAll()
    // every vector assigned, into at most k cells
    assert(asg.count() == n)
    assert(nCells <= k)
    // the operating claim: the realized hottest cell stays within a small
    // multiple of the target, so pair-join cost is bounded as designed
    assert(maxCell <= 4 * target,
      s"hottest cell $maxCell exceeds 4x target $target (k=$k, cells=$nCells)")
  }
}
