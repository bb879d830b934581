package graft

import graft.queries.TextOps
import org.apache.spark.sql.functions._

/** Merge-table-driven BPE (`text_bpe_merges` / `text_bpe_tokens`):
  * encode∘decode identity, piece-count bounds, and the determinism of the
  * learned rank table. */
class BpeSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("merge ranks are a deterministic total order and actually learned") {
    val m = SparkEntry.queries("text_bpe_merges")(spark, d).collect()
    assert(m.length === 50)
    assert(m.map(_.getLong(0)).toSeq === (1L to 50L))
    // (cnt desc, a asc, b asc) strictly ordered
    val keys = m.map(r => (-r.getLong(3), r.getString(1), r.getString(2)))
    assert(keys.toSeq === keys.sortBy(identity).toSeq)
    // single-char pair alphabet from the [a-z] tokenizer
    assert(m.forall(r => r.getString(1).length == 1 &&
      r.getString(2).length == 1))
    // and the driver-collected table the encoder compiles is the same
    assert(TextOps.bpeMerges(spark, d, 50).toSeq ===
      m.map(r => (r.getString(1), r.getString(2))).toSeq)
  }

  test("encode∘decode identity and piece-count bounds over the vocabulary") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val merges = TextOps.bpeMerges(spark, d, 50)
    val vocab = Tables.documents(spark, d)
      .select(explode(graft.functions.GraftFunctions
        .termCounts(col("text")))).toDF("word", "tf")
      .select(col("word")).distinct()
      .withColumn("s", TextOps.bpeEncodeCol(col("word"), merges))
    val rows = vocab.select(col("word"), col("s"),
      size(split(col("s"), " ")).as("np")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (word, s, np) = (r.getString(0), r.getString(1), r.getInt(2))
      // decode = drop separators: the pieces concatenate to the word
      assert(s.replace(" ", "") === word, s"decode($s) != $word")
      assert(np >= 1 && np <= word.length, s"$word -> $s")
      // every piece is a nonempty substring of the word
      assert(s.split(" ").forall(p => p.nonEmpty && word.contains(p)))
    }
    // the merge table does real work: frequent words compress below
    // their character count
    assert(rows.exists(r => r.getInt(2) < r.getString(0).length))
  }

  test("per-doc BPE token counts are bounded by words below and chars above") {
    val out = SparkEntry.queries("text_bpe_tokens")(spark, d).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nWords, nBpe) = (r.getLong(1), r.getLong(2))
      assert(nBpe >= nWords, s"doc ${r.getLong(0)}: $nBpe < $nWords")
    }
    // and compression is visible in aggregate: strictly fewer BPE tokens
    // than characters-in-words (the no-merge upper bound)
    val totBpe = out.map(_.getLong(2)).sum
    val totChars = Tables.documents(spark, d)
      .select(explode(graft.queries.TextOps.tokens(col("text"))).as("w"))
      .agg(sum(length(col("w")))).collect().head.getLong(0)
    assert(totBpe < totChars)
  }
}
