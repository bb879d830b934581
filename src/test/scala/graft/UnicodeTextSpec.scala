package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Unicode robustness: the native text kernels contract "every byte >=
  * 0x80 delimits" (TextHash.scala object doc) — because UTF-8 multi-byte
  * sequences never overlap [a-z], the byte-level kernels and the
  * char-level declarative regex forms must produce IDENTICAL [a-z] token
  * runs even on emoji / CJK / combining-mark / RTL text. This suite pins
  * that equivalence beyond the ASCII corpus the driver ships, and sweeps
  * the text/dedup queries for execution on a unicode-salted corpus. */
class UnicodeTextSpec extends SparkSpec {

  private val samples = Seq(
    "hello 世界 world",                       // CJK between words
    "café naïve résumé words",    // latin-1 accents
    "emoji 😀🚀 burst here",      // surrogate pairs
    "مرحبا mixed rtl text",  // arabic + latin
    "combining á marks é tokens",         // combining acute
    "ééé",                             // no ascii letters
    "tabs\tand nbsp and zero​width",        // odd whitespace
    // the two codepoints whose full-Unicode lower() maps INTO [a-z]
    // ('İ' U+0130 → "i̇", 'K' U+212A → "k") — under the ASCII
    // case-fold contract both delimit, identically in kernels /
    // declarative / oracle
    "WİTH İ and ı and Kelvin K signs",
    "ok")

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-unicode").toString
    samples.zipWithIndex.map { case (t, i) =>
      (i.toLong, t + " the quick brown fox jumps over the lazy dog again",
        "xx", "web", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "length")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("byte-level kernel tokenization matches char-level declarative " +
    "tokenization on non-ASCII text") {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val df = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // declarative: char-level regex split of lowercased text
    val decl = df.select(col("doc_id"),
      filter(split(graft.queries.asciiLower(col("text")), "[^a-z]+"),
        w => w =!= "").as("ws"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // kernel: shingle over 1-word windows is the token stream when we
    // compare via graft_term_counts' keys; use term_counts map keys sorted
    val kern = df.select(col("doc_id"),
      map_keys(graft.functions.GraftFunctions.termCounts(col("text")))
        .as("ws"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    for (i <- samples.indices.map(_.toLong)) {
      assert(kern(i).sorted === decl(i).distinct.sorted,
        s"doc $i tokens diverge: kernel=${kern(i)} decl=${decl(i)}")
    }
  }

  test("text and dedup queries execute on the unicode corpus") {
    val textQueries = graft.queries.TextOps.queries.keys ++
      graft.queries.Dedup.queries.keys
    val failures = textQueries.toSeq.sorted.flatMap { name =>
      try { SparkEntry.queries(name)(spark, dir).count(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    Caching.releaseAll()
    assert(failures.isEmpty,
      s"queries failed on the unicode corpus:\n${failures.mkString("\n")}")
  }
}
