package graft.operators

import graft.Tables
import graft.queries.Q
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.col
import scala.collection.mutable

/** The reference's pluggable map/reduce surface, verbatim, as typed Dataset
  * operations (SURVEY.md §7 step 5):
  *
  *  - the *map* function (tokenize + emit, `/root/reference/slave.cc:77-98`)
  *    is a literal user lambda in `Dataset.flatMap`;
  *  - the *reduce* function (sum-by-key, `/root/reference/slave.cc:101-152`)
  *    is a literal user lambda in `groupByKey(...).mapValues(...)
  *    .reduceGroups(_ + _)` — which Spark plans as a typed aggregate with
  *    map-side partial merge, i.e. the reference's combiner
  *    (`slave.cc:155-203`) for free;
  *  - the master's global top-N bounded heap
  *    (`/root/reference/master.cc:630-637`) is [[TopKWords]], a typed
  *    `Aggregator` holding a size-capped min-heap per partition and merging
  *    heaps — the identical algorithm, distributed.
  *
  * The result is bit-identical to the declarative `wordcount_topn` plan, so
  * it shares that query's DuckDB oracle.
  *
  * Scale note: the lambda path loses whole-stage codegen relative to the
  * declarative flagship — it exists to prove the UDF/UDAF surface, and the
  * docs point users at the declarative form for hot paths.
  */
/** The tokenizer's case fold for plain-Scala (typed/RDD) user lambdas:
  * ASCII-only A–Z → a–z, everything else untouched — the same contract as
  * [[graft.queries.asciiLower]] and the byte-level kernels. `toLowerCase`
  * would apply Unicode full case mapping ('İ' → "i̇"), silently diverging
  * from every other tokenizer path on non-ASCII text. */
object Tokenize {
  def asciiLower(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      b.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      i += 1
    }
    b.toString
  }
}

object MapReduce {

  final case class WordCount(word: String, cnt: Long)

  /** "Better" word = higher count, then lexicographically smaller word —
    * the presentation order of the reference's top-N. */
  private val better: Ordering[WordCount] = (a: WordCount, b: WordCount) =>
    if (a.cnt != b.cnt) java.lang.Long.compare(a.cnt, b.cnt)
    else Ordering.String.compare(b.word, a.word)

  /** Bounded min-heap top-k, as a typed UDAF. Buffer = the heap (worst on
    * top, evicted when size exceeds k) — constant memory per partition,
    * associative merge, exactly `priority_queue<WordCount>` in the
    * reference master. */
  final class TopKWords(k: Int)
      extends Aggregator[WordCount, mutable.PriorityQueue[WordCount],
        Seq[WordCount]] {
    def zero: mutable.PriorityQueue[WordCount] =
      mutable.PriorityQueue.empty(better.reverse) // worst element on top
    def reduce(h: mutable.PriorityQueue[WordCount], w: WordCount)
        : mutable.PriorityQueue[WordCount] = {
      h.enqueue(w)
      if (h.size > k) h.dequeue()
      h
    }
    def merge(a: mutable.PriorityQueue[WordCount],
              b: mutable.PriorityQueue[WordCount])
        : mutable.PriorityQueue[WordCount] = {
      b.foreach { w => a.enqueue(w); if (a.size > k) a.dequeue() }
      a
    }
    def finish(h: mutable.PriorityQueue[WordCount]): Seq[WordCount] =
      h.toSeq.sorted(better).reverse // ascending goodness, then best first
    def bufferEncoder: Encoder[mutable.PriorityQueue[WordCount]] =
      Encoders.kryo[mutable.PriorityQueue[WordCount]]
    def outputEncoder: Encoder[Seq[WordCount]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[WordCount]]()
  }

  /** map → reduce → top-k, all through user lambdas / typed Aggregator. */
  def wordcountTyped(spark: SparkSession, dir: String, n: Int): DataFrame = {
    import spark.implicits._
    val counts = Tables.documents(spark, dir)
      .select(col("text")).as[String]
      // null text contributes no words (typed lambdas see raw nulls —
      // no automatic null propagation as in the declarative form)
      .filter((t: String) => t != null)
      .flatMap(Tokenize.asciiLower(_).split("[^a-z]+")
        .filter(_.nonEmpty)) // user map
      .groupByKey(identity)
      .mapValues(_ => 1L)
      .reduceGroups(_ + _) // user reduce (partial-aggregated)
      .map { case (w, c) => WordCount(w, c) }
    counts
      .select(new TopKWords(n).toColumn)
      .flatMap(_.iterator)
      .toDF("word", "cnt")
      .orderBy(col("cnt").desc, col("word").asc)
  }

  /** The same pipeline on the low-level RDD API — the classic
    * `flatMap → reduceByKey → takeOrdered` wordcount. `reduceByKey` does
    * map-side combining (the reference's combiner), and `takeOrdered` keeps
    * a size-n bounded heap per partition and merges the heaps at the
    * driver — algorithmically identical to the reference master's
    * `priority_queue` drain (`/root/reference/master.cc:630-637`). The
    * driver only ever sees n rows (n=20), so this is NOT an unbounded
    * collect. Exists to demonstrate the RDD surface next to the typed
    * Dataset and declarative forms; hot paths should prefer those (codegen,
    * Catalyst). */
  def wordcountRdd(spark: SparkSession, dir: String, n: Int): DataFrame = {
    import spark.implicits._
    val top = Tables.documents(spark, dir)
      .select(col("text")).as[String].rdd
      // null text (failed extraction) contributes no words — the same
      // behavior the declarative form gets for free from null propagation
      .filter(_ != null)
      .flatMap(Tokenize.asciiLower(_).split("[^a-z]+")
        .filter(_.nonEmpty)) // user map
      .map(w => (w, 1L))
      .reduceByKey(_ + _) // user reduce, map-side combined
      .map { case (w, c) => WordCount(w, c) }
      .takeOrdered(n)(better.reverse) // bounded heaps, best-first merge
    spark.createDataFrame(top.toIndexedSeq)
      .orderBy(col("cnt").desc, col("word").asc)
  }

  private val wordcountSql = """
      SELECT word, count(*) AS cnt FROM (
        SELECT unnest(string_split_regex(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+')) AS word
        FROM documents) t
      WHERE word <> ''
      GROUP BY word
      ORDER BY cnt DESC, word ASC
      LIMIT 20"""

  val queries: Map[String, Q] = Map(
    "wordcount_typed" -> ((s, d) => wordcountTyped(s, d, 20)),
    "wordcount_rdd" -> ((s, d) => wordcountRdd(s, d, 20))
  )

  // both forms are bit-identical to the declarative flagship, so they share
  // its oracle SQL
  val oracles: Map[String, String] = Map(
    "wordcount_typed" -> wordcountSql,
    "wordcount_rdd" -> wordcountSql
  )
}
