package graft

import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._

/** The Levenshtein-threshold optimizer rule: the rewrite must fire on the
  * natural predicate, preserve boundary semantics exactly, and leave
  * projected distance VALUES untouched. Fixtures are parquet-backed —
  * local relations are constant-folded before the rewrite is observable. */
class OptimizerRuleSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def hasThresholded(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists(_.expressions.exists(_.exists {
      case l: Levenshtein => l.threshold.isDefined
      case _ => false
    }))

  private def corpus = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    Tables.part(spark, d).select(col("p_name").as("s")).distinct()
  }

  /** Ground truth through the projection path, which test 3 proves is NOT
    * rewritten — so thresholded and full DP are compared end to end. */
  private def expected(maxDist: Int): Seq[String] =
    corpus.select(col("s"), expr("levenshtein(s, 'small ring')").as("dd"))
      .collect().filter(_.getInt(1) <= maxDist).map(_.getString(0))
      .sorted.toSeq

  test("levenshtein <= k rewrites to the banded thresholded form") {
    val df = corpus.filter(expr("levenshtein(s, 'small ring') <= 2"))
    assert(hasThresholded(df), df.queryExecution.optimizedPlan.toString)
    val got = df.collect().map(_.getString(0)).sorted.toSeq
    assert(got === expected(2))
    assert(got.nonEmpty) // 'small ring' itself is a part name: dist 0
  }

  test("strict levenshtein < k rewrites with bound k-1") {
    val df = corpus.filter(expr("levenshtein(s, 'small ring') < 2"))
    assert(hasThresholded(df))
    assert(df.collect().map(_.getString(0)).sorted.toSeq === expected(1))
  }

  test("a projected distance value is NOT rewritten") {
    val df = corpus.select(expr("levenshtein(s, 'small ring')").as("dd"))
    assert(!hasThresholded(df))
    assert(df.collect().forall(_.getInt(0) != -1))
  }

  test("the SQL-text fuzzy query's plan carries the thresholded kernel") {
    val df = SparkEntry.queries("sql_fuzzy_pair_count")(spark, d)
    assert(hasThresholded(df), df.queryExecution.optimizedPlan.toString)
  }

  test("edit distance is CODEPOINT-based, full and thresholded alike") {
    import spark.implicits._
    // the engine contract: one substituted é / 日 / 🎉 is distance 1.
    // (DuckDB's levenshtein counts BYTES — 'é'→'e' = 2 there — so the
    // fuzzy oracles can only replay ASCII fixtures; the engine-side
    // unicode semantics are pinned HERE instead.)
    val pairs = Seq(("é", "e", 1), ("日本", "日木", 1), ("🎉a", "🎉b", 1),
      ("naïve", "naive", 1), ("WİTH", "WITH", 1))
    val df = pairs.map(p => (p._1, p._2, p._3)).toDF("a", "b", "want")
      .repartition(1).cache()
    df.count() // parquet-free is fine: no rewrite needed for the full call
    val full = df.select(expr("levenshtein(a, b)").as("d"), col("want"))
      .collect()
    assert(full.forall(r => r.getInt(0) == r.getInt(1)),
      full.map(_.toString).mkString(","))
    val banded = df.select(expr("levenshtein(a, b, 2)").as("d"), col("want"))
      .collect()
    assert(banded.forall(r => r.getInt(0) == r.getInt(1)),
      banded.map(_.toString).mkString(","))
  }
}
