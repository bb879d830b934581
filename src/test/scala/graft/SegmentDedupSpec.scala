package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Hand-built pins for the corpus-common segment removal
  * (`text_segment_dedup`) and the distinct-n diversity readout
  * (`text_ngram_diversity`). */
class SegmentDedupSpec extends SparkSpec {

  /** Corpus: docs 0–3 share an identical 3-token segment at different
    * positions; docs 4–5 share another segment (only 2 docs — below the
    * ≥3 threshold); doc 6 has two tokens (one short segment); doc 7 has
    * empty text; doc 8 null text. */
  private lazy val dir: String = {
    import spark.implicits._
    val d = TempLayouts.tracked("graft-segdedup").toString
    val docs: Seq[(java.lang.Long, String)] = Seq(
      (0L, "alpha beta gamma uniq zero tail"),
      (1L, "one uniq two alpha beta gamma"),
      (2L, "alpha beta gamma three uniq four"),
      (3L, "five uniq six alpha beta gamma"),
      (4L, "shared pair seg seven uniq eight"),
      (5L, "shared pair seg nine uniq ten"),
      (6L, "tiny doc"),
      (7L, ""),
      (8L, null)).map { case (i, t) => (java.lang.Long.valueOf(i), t) }
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("web"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private lazy val rows =
    SparkEntry.queries("text_segment_dedup")(spark, dir)
      .collect().map(r => r.get(0).asInstanceOf[Long] -> r).toMap

  test("a segment in >= 3 docs is dropped from every holder") {
    for (id <- 0L to 3L) {
      val r = rows(id)
      assert(r.getLong(1) == 2, s"doc $id n_segments")
      assert(r.getLong(2) == 1, s"doc $id n_dropped")
      assert(!r.getString(3).contains("alpha beta gamma"), s"doc $id kept")
    }
    // reassembly preserves original segment order
    assert(rows(0L).getString(3) == "uniq zero tail")
    assert(rows(1L).getString(3) == "one uniq two")
  }

  test("a segment in only 2 docs is kept (threshold is >= 3 docs)") {
    for (id <- Seq(4L, 5L)) {
      val r = rows(id)
      assert(r.getLong(2) == 0, s"doc $id n_dropped")
      assert(r.getString(3).startsWith("shared pair seg"), s"doc $id kept")
    }
  }

  test("short tail segment, empty text, and null text") {
    assert(rows(6L).getLong(1) == 1)
    assert(rows(6L).getString(3) == "tiny doc")
    assert(rows(7L).isNullAt(1) && rows(7L).isNullAt(3))
    assert(rows(8L).isNullAt(1) && rows(8L).isNullAt(3))
  }

  test("diversity legs: totals, distincts, and the ppm grid by hand") {
    import spark.implicits._
    val d = TempLayouts.tracked("graft-diversity").toString
    // "a b a b" + "a a a": unigrams 7 total {a, b} 2 distinct;
    // bigrams 5 total {"a b","b a","a a"} 3 distinct;
    // trigrams 3 total {"a b a","b a b","a a a"} 3 distinct
    Seq((0L, "a b a b"), (1L, "a a a"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("web"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("text_ngram_diversity")(spark, d)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((7L, 2L, 2L * 1000000 / 7)))
    assert(out(2L) == ((5L, 3L, 3L * 1000000 / 5)))
    assert(out(3L) == ((3L, 3L, 1000000L)))
  }
}
