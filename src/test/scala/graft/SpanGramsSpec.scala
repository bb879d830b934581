package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Behavioral pins for the exact-substring (positional 8-gram) duplication
  * profile: shared verbatim spans count, within-doc repetition alone does
  * not, short/null docs degrade to zero grams with a NULL fraction. */
class SpanGramsSpec extends SparkSpec {

  // ten distinct filler words so gram counts are easy to reason about
  private val span = "alpha bravo charlie delta echo foxtrot golf hotel"

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-span").toString
    val docs = Seq(
      // A and B share the 8-token span verbatim (1 shared gram each),
      // embedded in otherwise-disjoint text
      (0L, s"one two three $span nine ten eleven twelve", "en", "w", 0L),
      (1L, s"aaa bbb ccc $span xxx yyy zzz www", "en", "w", 0L),
      // C: disjoint content, no shared grams
      (2L, "mike november oscar papa quebec romeo sierra tango uniform " +
        "victor whiskey xray", "en", "w", 0L),
      // D: repeats ITS OWN 8-gram twice — multiplicity 2 under one doc,
      // df = 1, so it must NOT count as duplicated
      (3L, s"$span $span", "en", "w", 0L),
      // E: fewer than 8 tokens -> zero grams, NULL fraction
      (4L, "short text here", "en", "w", 0L),
      // F: null text -> zero grams
      (5L, null.asInstanceOf[String], "en", "w", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private lazy val rows: Map[Long, (Long, Long, Option[Double])] =
    graft.queries.Dedup.queries("dedup_span_grams")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap

  test("every document gets a row") {
    assert(rows.keySet === Set(0L, 1L, 2L, 3L, 4L, 5L))
  }

  test("a verbatim cross-doc span marks exactly its grams as duplicated") {
    // A: 15 tokens -> 8 grams, exactly one (the shared span) duplicated
    assert(rows(0L) === ((8L, 1L, Some(1.0 / 8.0))))
    // B: same
    assert(rows(1L) === ((8L, 1L, Some(1.0 / 8.0))))
  }

  test("disjoint content has zero duplicated grams") {
    val (n, dup, frac) = rows(2L)
    assert(n === 5L && dup === 0L && frac === Some(0.0))
  }

  test("within-doc repetition alone is not cross-doc duplication") {
    // D: 16 tokens -> 9 grams; the pure span-gram occurs at positions 1
    // and 9 (multiplicity 2) AND in docs A/B -> those 2 positions are
    // duplicated; the 7 wrap-around grams (crossing the repeat seam) exist
    // nowhere else -> not duplicated
    val (n, dup, _) = rows(3L)
    assert(n === 9L && dup === 2L)
  }

  test("short and null docs have zero grams and a NULL fraction") {
    assert(rows(4L) === ((0L, 0L, None)))
    assert(rows(5L) === ((0L, 0L, None)))
  }

  test("the profile is symmetric in doc order (re-partitioned run agrees)") {
    val re = graft.queries.Dedup
      .spanGramProfile(spark.read.parquet(s"$dir/documents.parquet")
        .repartition(7), k = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(re === rows.view.mapValues(_._2).toMap)
  }

  // ---- novelty attribution over the same corpus: duplication is
  // symmetric, novelty is ingest-ordered — the first holder keeps it

  private lazy val novelty: Map[Long, (Long, Long, Option[Double])] =
    graft.queries.Dedup.queries("dedup_gram_novelty")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap

  test("novelty: the first document introduces everything") {
    assert(novelty(0L) === ((8L, 8L, Some(1.0))))
  }

  test("novelty: a later doc sharing a span is novel except that span") {
    // B repeats the span A introduced; its other 7 grams are its own
    assert(novelty(1L) === ((8L, 7L, Some(7.0 / 8.0))))
  }

  test("novelty: within-doc repetition credits the repeating doc once " +
    "per position only when IT introduced the gram") {
    // D's pure-span gram (2 positions) was introduced by doc 0 -> not
    // novel; its 7 seam grams exist nowhere earlier -> novel
    assert(novelty(3L) === ((9L, 7L, Some(7.0 / 9.0))))
  }

  test("novelty: gram-less docs have zero grams and a NULL fraction") {
    assert(novelty(4L) === ((0L, 0L, None)))
    assert(novelty(5L) === ((0L, 0L, None)))
  }

  test("novelty: totals conserve — every gram position has exactly one " +
    "novel holder across the corpus") {
    val totalNovel = novelty.values.map(_._2).sum
    // distinct gram contents across the corpus, each counted at its
    // holder's multiplicity: compute independently from the span profile
    // corpus via the kernel
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val gc = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        explode(coalesce(
          graft.functions.GraftFunctions.gramHashes(col("text"), 8),
          array().cast("array<long>"))).as("h"))
      .groupBy(col("doc_id"), col("h")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = gc.groupBy(_._2).map { case (_, rows) =>
      rows.minBy(_._1)._3
    }.sum
    assert(totalNovel === expected)
  }
}
