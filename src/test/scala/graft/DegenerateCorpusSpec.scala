package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Adversarial-corpus sweep: ALL documents identical (maximal dedup skew
  * — every shingle's posting list is the whole corpus), ALL embeddings
  * zero (zero norms, cosine undefined, every distance tied), all events
  * on one (user, type) key at one timestamp (total timestamp ties). This
  * is the worst realistic shape for the inverted-index/banding/argmin
  * operators; the suite pins that every query still EXECUTES and that the
  * key degenerate invariants hold (one dup group, one component, ties
  * broken by the documented id conventions, zero-norm vectors filtered
  * rather than surfacing NaN ranks). */
class DegenerateCorpusSpec extends SparkSpec {

  private val nDocs = 200
  private val nVecs = 100
  private val dims = 64

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-degenerate").toString
    // identical text everywhere; ids dense 0-based
    val text = "the same boilerplate sentence repeated in every single " +
      "document of this corpus for maximal inverted index pressure"
    (0L until nDocs.toLong)
      .map(i => (i, text, "en", "web", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "length")
      .write.parquet(s"$d/documents.parquet")
    // all-zero embeddings; labels all 0
    (0L until nVecs.toLong)
      .map(i => (i, Array.fill(dims)(0.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    // one user, one type, one instant (raw nanos long, as Tables.events
    // expects under nanosAsLong), identical value/props
    (0L until 500L)
      .map(i => (i, 1704067200000000000L, 7L, "click", 1.0, """{"k":1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    // remaining relational tables: tiny real copies
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem")) {
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .write.parquet(s"$d/$t.parquet")
    }
    d
  }

  test("every query executes on the degenerate corpus without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
        }
    }
    Caching.releaseAll()
    assert(failures.isEmpty,
      s"queries failed on the degenerate corpus:\n${failures.mkString("\n")}")
  }

  test("identical documents collapse to one dup group and one component") {
    val exact = graft.queries.Dedup.queries("dedup_exact")(spark, dir)
      .collect()
    assert(exact.length === 1)
    assert(exact.head.getLong(0) === 0L)          // min-id representative
    assert(exact.head.getLong(2) === nDocs.toLong)
    val comp = graft.queries.Dedup.queries("dedup_components")(spark, dir)
      .collect().map(r => r.getLong(1)).distinct
    assert(comp.toSeq === Seq(0L))                // one cluster, labeled 0
  }

  test("zero-norm embeddings are filtered, never surfaced as NaN ranks " +
    "or ANSI divide-by-zero errors") {
    // zero vectors have no cosine: every similarity path must FILTER them
    // (the round-6 sweep caught sim_topk/dedup_embed_cosine raising
    // DIVIDE_BY_ZERO here under ANSI mode) — all-zero corpus → empty
    // results, not exceptions, not NaN rankings
    for (q <- Seq("sim_topk", "dedup_embed_cosine", "sim_nn_per_label",
        "sim_ivf_topk", "dedup_embed_lsh")) {
      assert(SparkEntry.queries(q)(spark, dir).count() === 0L,
        s"$q should produce no rows on an all-zero-embedding corpus")
    }
    // all-tied k-means: every vector lands in cluster 0 at distance 0
    // (argmin tie broken toward the smallest cent_id by the packed key)
    val km = graft.queries.Similarity.queries("emb_kmeans")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2))).distinct
    assert(km.toSeq === Seq((0L, 0L)))
    Caching.releaseAll()
  }

  test("total timestamp ties resolve by event_id in both debounce variants") {
    import spark.implicits._
    // 500 events at the same instant on one key: exactly one survivor —
    // the smallest event_id — under both gap semantics
    for (q <- Seq("events_debounce", "events_debounce_kept")) {
      val kept = SparkEntry.queries(q)(spark, dir)
        .select("event_id").as[Long].collect().toSeq
      assert(kept === Seq(0L), s"$q kept $kept")
    }
  }
}
