package graft

import graft.queries.Dedup
import org.apache.spark.sql.functions._

/** Leakage-safe grouped split (`docs_split_grouped`): the property that
  * justifies its existence — no near-duplicate pair may straddle the
  * train/val/test boundary, ever. */
class GroupedSplitSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("no jaccard>=0.6 pair straddles the split") {
    val splits = SparkEntry.queries("docs_split_grouped")(spark, d)
      .select(col("doc_id"), col("split"))
    val pairs = Dedup.jaccardPairsUnsorted(Tables.documents(spark, d), 0.6)
      .select(col("doc_a"), col("doc_b"))
    val straddling = pairs
      .join(splits.select(col("doc_id").as("doc_a"),
        col("split").as("split_a")), "doc_a")
      .join(splits.select(col("doc_id").as("doc_b"),
        col("split").as("split_b")), "doc_b")
      .filter(col("split_a") =!= col("split_b"))
      .count()
    assert(straddling === 0L)
    // the check must not pass vacuously: the fixture has real pairs
    assert(pairs.count() > 0)
  }

  test("every document gets exactly one split and the shares are sane") {
    val out = SparkEntry.queries("docs_split_grouped")(spark, d).collect()
    val nDocs = Tables.documents(spark, d).count()
    assert(out.length.toLong === nDocs)
    assert(out.map(_.getLong(0)).distinct.length === out.length)
    val bydocSplit = out.groupBy(_.getString(3)).view.mapValues(_.length)
    assert(bydocSplit.keySet.subsetOf(Set("train", "val", "test")))
    // cluster-granular hashing still lands near 90/5/5 on a corpus of
    // mostly-singleton clusters — train strictly dominates
    assert(bydocSplit.getOrElse("train", 0) > bydocSplit.getOrElse("val", 0))
    assert(bydocSplit.getOrElse("train", 0) > bydocSplit.getOrElse("test", 0))
    // members of one component share a split BY CONSTRUCTION — pin it
    // anyway so a refactor cannot re-key the bucket hash onto the doc id
    val comps = out.groupBy(_.getLong(1)).view
      .mapValues(_.map(_.getString(3)).toSet)
    assert(comps.values.forall(_.size == 1))
  }
}
