package graft

import org.apache.spark.sql.functions._
import graft.operators.Bloom

/** The bloom-prefiltered semi-join: exact equality with the plain semi-join
  * (the property that makes `docs_decontam_bloom` oracle-able), empty/null
  * edges, and the sketch-sizing rule. */
class BloomSpec extends SparkSpec {

  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("bloomSemiJoin equals the plain left-semi join, nulls dropped") {
    val left = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (null, "n"), (2L, "b2"))
      .toDF("k", "v")
    val right = Seq[java.lang.Long](2L, 4L, 4L, 99L, null).toDF("k")
    val viaBloom = Bloom.bloomSemiJoin(left, right, "k", expectedItems = 16)
      .orderBy("k", "v").collect().toSeq
    val exact = left.join(right, Seq("k"), "left_semi")
      .orderBy("k", "v").collect().toSeq
    assert(viaBloom == exact)
    assert(viaBloom.map(_.getString(1)) == Seq("b", "b2", "d"))
  }

  test("bloomSemiJoin equality holds under a deliberately undersized " +
    "sketch (fpp degrades, result does not)") {
    val left = (1L to 500L).toDF("k")
    val right = (1L to 500L by 7).toDF("k")
    // expectedItems=1 forces a tiny sketch with massive fpp: the exact
    // confirm join must still remove every false positive
    val viaBloom = Bloom.bloomSemiJoin(left, right, "k", expectedItems = 1)
      .orderBy("k").as[Long].collect().toSeq
    assert(viaBloom == (1L to 500L by 7).toSeq)
  }

  test("empty key set yields an empty semi-join (null sketch handled)") {
    val left = Seq(1L, 2L).toDF("k")
    val empty = Seq.empty[Long].toDF("k")
    assert(Bloom.bloomSemiJoin(left, empty, "k", expectedItems = 16).isEmpty)
    val allNull = Seq[java.lang.Long](null, null).toDF("k")
    assert(
      Bloom.bloomSemiJoin(left, allNull, "k", expectedItems = 16).isEmpty)
  }

  test("optimalNumBits follows the -n ln p / ln²2 rule and clamps") {
    // 1e6 keys at 1% fpp ≈ 9.59e6 bits (~1.2 MB)
    val bits = Bloom.optimalNumBits(1000000L, 0.01)
    assert(bits > 9500000L && bits < 9700000L)
    // monotone in n, clamped at Spark's 8 MB runtime-filter ceiling
    assert(Bloom.optimalNumBits(100L, 0.01) < bits)
    assert(Bloom.optimalNumBits(100000000L, 0.01) == 67108864L)
    intercept[IllegalArgumentException](Bloom.optimalNumBits(0L, 0.01))
    intercept[IllegalArgumentException](Bloom.optimalNumBits(10L, 1.5))
  }

  test("docs_decontam_bloom equals docs_decontaminate (the two plans " +
    "share one contract and one oracle)") {
    val viaBloom = SparkEntry.queries("docs_decontam_bloom")(spark, d)
      .collect().toSeq
    val viaBroadcast = SparkEntry.queries("docs_decontaminate")(spark, d)
      .collect().toSeq
    assert(viaBloom.nonEmpty, "fixture should have contaminated docs")
    assert(viaBloom == viaBroadcast)
  }

  test("the sketch probe is registered for SQL too") {
    Bloom.ensureRegistered(spark)
    val row = spark.sql(
      """SELECT graft_bloom_contains(
        |  (SELECT graft_bloom_agg(k, CAST(8 AS BIGINT), CAST(1024 AS BIGINT))
        |   FROM (VALUES (CAST(7 AS BIGINT)), (9)) t(k)),
        |  CAST(7 AS BIGINT)) AS hit""".stripMargin).head()
    assert(row.getBoolean(0))
  }
}
