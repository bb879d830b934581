package graft

import org.apache.spark.sql.functions._

/** Golden end-to-end check of the flagship pipeline over the reference's
  * own input file (read-only), reproducing its observable query with clean
  * tokenization semantics (SURVEY.md §1, §5.4): word = maximal alpha run.
  * Expected values were computed independently from `input.txt`
  * (964,538 bytes; 151,715 words; 13,173 distinct — BASELINE.md). */
class GoldenWordcountSpec extends SparkSpec {

  private val inputTxt = "/root/reference/input.txt"

  test("flagship wordcount over input.txt matches the golden top-5") {
    val top5 = spark.read.text(inputTxt)
      .select(explode(graft.queries.TextOps.tokens(col("value"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(5)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(top5.toSeq === Seq(
      ("flight", 4667L), ("unit", 4020L), ("usairway", 3001L),
      ("americanair", 2960L), ("southwestair", 2459L)))
  }

  test("total and distinct word counts match the measured corpus stats") {
    val words = spark.read.text(inputTxt)
      .select(explode(graft.queries.TextOps.tokens(col("value"))).as("word"))
    assert(words.count() === 151715L)
    assert(words.distinct().count() === 13173L)
  }

  test("typed MapReduce top-k equals the declarative plan on input.txt") {
    import spark.implicits._
    val declarative = spark.read.text(inputTxt)
      .select(explode(graft.queries.TextOps.tokens(col("value"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(20)
      .as[(String, Long)].collect().toSeq
    val counts = spark.read.text(inputTxt)
      .select(col("value")).as[String]
      .flatMap(_.toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
      .groupByKey(identity).mapValues(_ => 1L).reduceGroups(_ + _)
      .map { case (w, c) => graft.operators.MapReduce.WordCount(w, c) }
    val typed = counts
      .select(new graft.operators.MapReduce.TopKWords(20).toColumn)
      .flatMap(_.iterator)
      .map(wc => (wc.word, wc.cnt)).collect().toSeq
    assert(typed === declarative)
  }

  test("RDD wordcount equals the declarative flagship on the corpus") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val declarative = graft.queries.TextOps.wordcountTopN(spark, dir, 20)
      .as[(String, Long)].collect().toSeq
    val viaRdd = graft.operators.MapReduce.wordcountRdd(spark, dir, 20)
      .as[(String, Long)].collect().toSeq
    assert(viaRdd === declarative)
  }
}
