package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** Concurrent-session robustness: an application embedding the library
  * runs queries from multiple threads against ONE SparkSession. The
  * shared mutable pieces — the graft function registration
  * (`ensureRegistered`), the tracked-persist registry ([[Caching]]), and
  * Spark's own CacheManager — must tolerate that. Results must equal the
  * sequential runs bit-for-bit (every query is deterministic). */
class ConcurrencySpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  // a mix that exercises the racy pieces: native-kernel registration
  // (simhash/shingles), tracked persists (lsh/kmeans/jaccard), typed
  // paths (debounce_kept), and plain relational
  private val names = Seq("dedup_simhash", "dedup_embed_lsh", "emb_kmeans",
    "dedup_neardup_jaccard", "events_debounce_kept", "q01_pricing_summary",
    "text_tokens", "sim_topk")

  test("eight queries running concurrently match their sequential results") {
    val sequential = names.map { n =>
      n -> SparkEntry.queries(n)(spark, d).collect().map(_.toString).toSeq
    }.toMap
    Caching.releaseAll()
    spark.catalog.clearCache()
    val futures = names.map { n =>
      Future(n -> SparkEntry.queries(n)(spark, d)
        .collect().map(_.toString).toSeq)
    }
    val concurrent = Await.result(Future.sequence(futures), 10.minutes).toMap
    for (n <- names) {
      assert(concurrent(n) === sequential(n), s"$n diverged under concurrency")
    }
    Caching.releaseAll()
  }

  test("concurrent releaseAll and persistTracked do not corrupt the registry") {
    val fs = (0 until 16).map { i =>
      Future {
        if (i % 3 == 0) Caching.releaseAll()
        else SparkEntry.queries("dedup_embed_lsh")(spark, d).count()
      }
    }
    // no exceptions is the assertion; state ends clean
    Await.result(Future.sequence(fs), 10.minutes)
    Caching.releaseAll()
  }
}
