package graft

/** Storage hygiene: every internal persist goes through the tracked
  * registry ([[Caching]]), so an application embedding the library in a
  * long-lived session can release exactly the library's caches. Pins the
  * round-4/5 review item: persists in dedup_semantic / srpCosinePairs /
  * kmeansAssignOf (and the dedup postings/edges) must not leak storage
  * once a query round is over. */
class CacheHygieneSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("a materialize-then-releaseAll round leaves no tracked RDD cached") {
    // baseline: whatever earlier suites left behind (localCheckpoint RDDs
    // are persistent but outside the CacheManager — they are NOT ours to
    // release here)
    spark.catalog.clearCache()
    Caching.releaseAll()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // the queries whose builders persist shared intermediates
    for (name <- Seq("dedup_semantic", "dedup_embed_lsh", "emb_kmeans",
        "dedup_neardup_jaccard", "docs_lm_bigram_score")) {
      SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
    }
    assert(spark.sparkContext.getPersistentRDDs.size > before.size,
      "expected the query round to have persisted intermediates")
    Caching.releaseAll()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(after.subsetOf(before),
      s"tracked persists leaked RDDs: ${after -- before}")
  }

  test("releaseAll is idempotent and safe on an empty registry") {
    Caching.releaseAll()
    Caching.releaseAll()
  }
}
