package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pins every native text-hash kernel (graft_shingles / graft_simhash /
  * graft_minhash_sig / graft_winnow) to its declarative built-in-function
  * formulation, row for row on the real corpus — the native expressions
  * are pure performance rewrites, so ANY divergence from the declarative
  * semantics (which the DuckDB oracles replicate independently) is a bug.
  * Edge cases (empty text, no tokens, short text, nulls) are covered with
  * literal rows.
  */
class TextHashSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private lazy val docs = {
    GraftFunctions.ensureRegistered(spark)
    Tables.documents(spark, d).select(col("doc_id"), col("text"))
  }

  private lazy val edgeDocs = {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, ""),                          // empty text
      (3L, "12345 67890 !!!"),           // no alpha tokens
      (4L, "one two"),                   // < 3 tokens -> no shingles
      (5L, "UPPER lower MiXeD case runs"),
      (6L, "short"),                     // < 11 chars -> no winnow window
      (7L, "exactly11ch"),               // 11 chars -> one winnow window
      (8L, "a b a b a b repeated bigram tokens a b"),
      (9L, null.asInstanceOf[String]),   // null text
      // unicode: the kernels' byte-level walk must equal the declarative
      // codepoint forms — multi-byte delimiters, and the two codepoints
      // whose full-Unicode lower() maps INTO [a-z] ('İ'→i̇, 'K'→k) must
      // NOT tokenize as letters under the ASCII case-fold contract
      (10L, "MiXeD CaSe WİTH turkish İ and ı plus Kelvin K marks"),
      (11L, "日本語テキスト emoji 🎉 mixed ascii words here okay")
    ).toDF("doc_id", "text")
  }

  // ---- declarative reference formulations (the pre-kernel plans) ----

  private def declWords(c: Column): Column =
    filter(split(graft.queries.asciiLower(c), "[^a-z]+"), w => length(w) > 0)

  private def declShingles(ws: Column): Column = {
    val n = greatest(size(ws) - 2, lit(0))
    array_distinct(zip_with(
      zip_with(slice(ws, lit(1), n), slice(ws, lit(2), n),
        (a, b) => concat_ws(" ", a, b)),
      slice(ws, lit(3), n),
      (ab, c) => concat_ws(" ", ab, c)))
  }

  private def declSimhash(df: DataFrame): DataFrame = {
    val hash60 = (c: Column) =>
      conv(substring(md5(concat(lit("99|"), c).cast("binary")), 1, 15),
        16, 10).cast("long")
    df.select(col("doc_id"), explode(declWords(col("text"))).as("w"))
      .select(col("doc_id"), hash60(col("w")).as("h"))
      .select(col("doc_id"), col("h"),
        explode(sequence(lit(0), lit(59))).as("j"))
      .groupBy(col("doc_id"), col("j"))
      .agg(sum(expr("CASE WHEN shiftright(h, j) % 2 = 1 THEN 1 ELSE -1 END"))
        .as("sgn"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("sgn") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(lit(0L)))
        .cast("long").as("simhash"))
  }

  private def declMinhashSig(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
        explode(declShingles(declWords(col("text")))).as("s"))
      .select(col("doc_id"),
        conv(substring(md5(col("s").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("h1"),
        conv(substring(md5(col("s").cast("binary")), 16, 8), 16, 10)
          .cast("long").as("h2"))
      .groupBy(col("doc_id"))
      .agg(min(col("h1")).as("m0"),
        (1 until 16).map(i => min(col("h1") + lit(i) * col("h2"))
          .as(s"m$i")): _*)
      .select(col("doc_id"), array((0 until 16).map(i => col(s"m$i")): _*)
        .as("ms"))

  private def declWinnow(df: DataFrame): DataFrame = {
    def dbl(x: Column, off: Int, f: (Column, Column) => Column): Column = {
      val n = greatest(size(x) - off, lit(0))
      zip_with(slice(x, lit(1), n), slice(x, lit(off + 1), n), f)
    }
    df.filter(col("text").isNotNull)
      .select(col("doc_id"), graft.queries.asciiLower(col("text")).as("t"))
      .select(col("doc_id"),
        slice(split(col("t"), ""), lit(1), length(col("t"))).as("cs"))
      .withColumn("g2", dbl(col("cs"), 1, concat(_, _)))
      .withColumn("g4", dbl(col("g2"), 2, concat(_, _)))
      .withColumn("g8", dbl(col("g4"), 4, concat(_, _)))
      .withColumn("hs", transform(col("g8"), g =>
        conv(substring(md5(g.cast("binary")), 1, 8), 16, 10).cast("long")))
      .withColumn("m2", dbl(col("hs"), 1, least(_, _)))
      .select(col("doc_id"),
        array_distinct(dbl(col("m2"), 2, least(_, _))).as("fps"))
  }

  // ---- equivalence on corpus + edge rows ----

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    val left = a.collect().toSeq
    val right = b.collect().toSeq
    assert(left == right)
  }

  test("corpus is ASCII — the kernels' byte-level contract holds") {
    assert(docs.filter(col("text").rlike("[^\\x00-\\x7F]")).isEmpty)
  }

  for ((name, df) <- Seq(("corpus", () => docs), ("edge", () => edgeDocs))) {

    test(s"graft_shingles == declarative shingles ($name)") {
      assertSameRows(
        df().select(col("doc_id"),
          GraftFunctions.shingles(col("text")).as("sh"))
          .orderBy(col("doc_id")),
        df().select(col("doc_id"),
          declShingles(declWords(col("text"))).as("sh"))
          .orderBy(col("doc_id")))
    }

    test(s"graft_shingle_hashes == hashed declarative shingles ($name)") {
      val hash60 = (c: Column) =>
        conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
      assertSameRows(
        df().select(col("doc_id"),
          GraftFunctions.shingleHashes(col("text")).as("hs"))
          .orderBy(col("doc_id")),
        df().select(col("doc_id"),
          array_distinct(transform(declShingles(declWords(col("text"))),
            s => hash60(s))).as("hs"))
          .orderBy(col("doc_id")))
    }

    test(s"graft_gram_hashes == hashed positional 8-grams ($name)") {
      val hash60 = (c: Column) =>
        conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
      // null text: kernel yields null (unary null propagation), the
      // declarative when() yields empty — align via coalesce, exactly as
      // spanGramProfile consumes the kernel
      assertSameRows(
        df().select(col("doc_id"),
          coalesce(GraftFunctions.gramHashes(col("text"), 8),
            array().cast("array<long>")).as("hs"))
          .orderBy(col("doc_id")),
        df().select(col("doc_id"), declWords(col("text")).as("ws"))
          .select(col("doc_id"),
            when(size(col("ws")) >= 8,
              transform(sequence(lit(1), size(col("ws")) - lit(7)),
                i => hash60(concat_ws(" ", slice(col("ws"), i, lit(8))))))
              .otherwise(array().cast("array<long>")).as("hs"))
          .orderBy(col("doc_id")))
    }

    test(s"graft_simhash == declarative simhash ($name)") {
      assertSameRows(
        df().select(col("doc_id"),
          GraftFunctions.simhash(col("text")).as("simhash"))
          .filter(col("simhash").isNotNull)
          .orderBy(col("doc_id")),
        declSimhash(df()).orderBy(col("doc_id")))
    }

    test(s"graft_minhash_sig == declarative signature ($name)") {
      assertSameRows(
        df().select(col("doc_id"),
          GraftFunctions.minhashSig(
            GraftFunctions.shingles(col("text"))).as("ms"))
          .filter(col("ms").isNotNull)
          .orderBy(col("doc_id")),
        declMinhashSig(df()).orderBy(col("doc_id")))
    }

    test(s"graft_term_counts == explode+groupBy term frequencies ($name)") {
      val native = df()
        .select(col("doc_id"),
          explode(GraftFunctions.termCounts(col("text"))))
        .toDF("doc_id", "term", "tf")
        .orderBy(col("doc_id"), col("term"))
      val decl = df()
        .select(col("doc_id"), explode(declWords(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
        .orderBy(col("doc_id"), col("term"))
      assertSameRows(native, decl)
    }

    test(s"graft_bigram_counts == explode+groupBy bigram frequencies ($name)") {
      val native = df()
        .select(col("doc_id"),
          explode(GraftFunctions.bigramCounts(col("text"))))
        .toDF("doc_id", "bigram", "n")
        .orderBy(col("doc_id"), col("bigram"))
      val ws = declWords(col("text"))
      val n1 = greatest(size(ws) - 1, lit(0))
      val decl = df()
        .select(col("doc_id"), explode(zip_with(
          slice(ws, lit(1), n1), slice(ws, lit(2), n1),
          (a, b) => concat_ws(" ", a, b))).as("bigram"))
        .groupBy(col("doc_id"), col("bigram"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("doc_id"), col("bigram"))
      assertSameRows(native, decl)
    }

    test(s"graft_top_bigram == explode+argmax over bigrams ($name)") {
      val native = df()
        .select(col("doc_id"),
          GraftFunctions.topBigram(col("text")).as("top"))
        .filter(col("top").isNotNull)
        .select(col("doc_id"), col("top.bigram").as("bigram"),
          col("top.cnt").as("cnt"))
        .orderBy(col("doc_id"))
      val ws = declWords(col("text"))
      val n1 = greatest(size(ws) - 1, lit(0))
      val decl = df()
        .select(col("doc_id"), explode(zip_with(
          slice(ws, lit(1), n1), slice(ws, lit(2), n1),
          (a, b) => concat_ws(" ", a, b))).as("bigram"))
        .groupBy(col("doc_id"), col("bigram"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg(max(struct(col("cnt"), col("bigram"))).as("b"))
        .select(col("doc_id"), col("b.bigram").as("bigram"),
          col("b.cnt").as("cnt"))
        .orderBy(col("doc_id"))
      assertSameRows(native, decl)
    }

    test(s"graft_winnow == declarative winnow ($name)") {
      assertSameRows(
        df().filter(col("text").isNotNull)
          .select(col("doc_id"),
            GraftFunctions.winnow(col("text")).as("fps"))
          .orderBy(col("doc_id")),
        declWinnow(df()).orderBy(col("doc_id")))
    }
  }

  test("null text yields null shingles/simhash/winnow") {
    val r = edgeDocs.filter(col("doc_id") === 9)
      .select(GraftFunctions.shingles(col("text")).as("sh"),
        GraftFunctions.simhash(col("text")).as("si"),
        GraftFunctions.winnow(col("text")).as("wi"))
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("kernels run inside whole-stage codegen (non-interpreted path)") {
    import org.apache.spark.sql.execution.FormattedMode
    val p = docs.select(GraftFunctions.shingles(col("text")),
        GraftFunctions.simhash(col("text")),
        GraftFunctions.winnow(col("text")))
      .queryExecution.explainString(FormattedMode)
    // FormattedMode tags every node inside a codegen stage with its id —
    // the projection carrying the kernels must be in one
    assert(p.contains("[codegen id :"), p)
  }
}
