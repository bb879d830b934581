package graft

import org.apache.spark.sql.functions._

/** Tokenizer semantics from SURVEY.md §1: a word is a maximal alpha run,
  * any non-alpha byte delimits, empty tokens never surface, folding is
  * lowercase. */
class TokenizerSpec extends SparkSpec {

  // exercises the PRODUCTION tokenizer (TextOps.tokens), not a copy
  private def tokens(text: String): Seq[String] = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(explode(graft.queries.TextOps.tokens(col("text"))).as("word"))
      .as[String].collect().toSeq
  }

  test("maximal alpha runs, any non-alpha delimits") {
    assert(tokens("ab1cd--ef  gh") === Seq("ab", "cd", "ef", "gh"))
  }

  test("consecutive delimiters yield no empty tokens") {
    assert(tokens(",,a,,,b,,") === Seq("a", "b"))
    assert(tokens("!!!") === Seq.empty)
    assert(tokens("") === Seq.empty)
  }

  test("case folds to lowercase before splitting") {
    assert(tokens("Foo BAR bAz") === Seq("foo", "bar", "baz"))
  }

  test("digits and unicode punctuation delimit") {
    assert(tokens("a1b2c") === Seq("a", "b", "c"))
    assert(tokens("naïve") === Seq("na", "ve")) // non-ascii delimits: [^a-z]
  }
}
