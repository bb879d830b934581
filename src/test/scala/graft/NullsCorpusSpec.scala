package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Null-row robustness sweep: real ingest pipelines produce null text
  * (failed extraction), null embeddings (failed encode), and null event
  * values/props. Every query must EXECUTE against a corpus salted with
  * such rows — null-safety bugs (NPEs in kernels, null keys joining,
  * ANSI errors on null arithmetic) surface here, not on the clean driver
  * fixture. */
class NullsCorpusSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-nulls").toString
    val docs = (0 until 60).map { i =>
      val text: String =
        if (i % 6 == 0) null
        else if (i % 6 == 1) ""
        else if (i % 6 == 2) "   "
        else s"some document body number $i with enough words to shingle " +
          "the quick brown fox jumps over the lazy dog"
      val lang: String = if (i % 7 == 0) null else "en"
      (i.toLong, text, lang, "web",
        Option(text).map(_.length.toLong).getOrElse(0L))
    }
    docs.toDF("doc_id", "text", "lang", "source", "length")
      .write.parquet(s"$d/documents.parquet")
    val emb = (0 until 40).map { i =>
      val v: Array[Float] =
        if (i % 8 == 0) null
        else Array.tabulate(64)(j => math.sin(i * 64 + j + 1.0).toFloat)
      (i.toLong, v, i % 3)
    }
    emb.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val events = (0 until 300).map { i =>
      val value: java.lang.Double =
        if (i % 9 == 0) null else java.lang.Double.valueOf(i % 200)
      val props: String = if (i % 11 == 0) null else s"""{"k":${i % 5}}"""
      // null ts = an event with no position on any timeline (failed
      // ingest parse) — the debounce/window/as-of family must not throw
      val ts: java.lang.Long = if (i % 13 == 0) null
        else java.lang.Long.valueOf(1704067200000000000L + i * 60000000000L)
      (i.toLong, ts,
        (i % 5).toLong, Seq("click", "view")(i % 2), value, props)
    }
    events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem")) {
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .write.parquet(s"$d/$t.parquet")
    }
    d
  }

  test("every query executes on a null-salted corpus without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
        }
    }
    Caching.releaseAll()
    assert(failures.isEmpty,
      s"queries failed on the null-salted corpus:\n${failures.mkString("\n")}")
  }

  test("null and blank text share one fingerprint group; null embeddings " +
    "never pair") {
    // fingerprint coalesces null text to empty — null and "" dedup into
    // one group; whitespace-only normalizes to a single space (the \s+
    // collapse does not trim), which is a DIFFERENT group by design
    val exact = graft.queries.Dedup.queries("dedup_exact")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(exact(0L) === 20L) // 10 null + 10 empty
    assert(exact(2L) === 10L) // the 10 whitespace-only docs
    // a null embedding can never appear in pair output
    val lsh = graft.queries.Similarity.queries("dedup_embed_lsh")(spark, dir)
      .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1)))
    assert(lsh.forall(_ % 8 != 0))
    Caching.releaseAll()
  }
}
