package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter membership prefilter — the semi-join pattern for a key set
  * too large to broadcast EXACTLY but compact as a sketch.
  *
  * The broadcast semi-join (`docs_decontaminate`) is the right plan while
  * the benchmark key set fits an exact in-memory hash set per executor.
  * Past that (every eval suite's shingles — 10⁸+ distinct keys, GBs as an
  * exact set), the exact semi-join must SHUFFLE both sides, including the
  * 100 TB corpus. A Bloom sketch stays broadcastable at any key-set size
  * (~1.2 MB per 10⁶ keys at 1% fpp, and it can be capped: a smaller
  * sketch only raises the false-positive rate, never breaks correctness),
  * so the corpus is prefiltered MAP-SIDE and only true matches plus the
  * fpp tail reach the shuffled exact-confirm join. The confirm join makes
  * the final result EXACTLY the plain semi-join — false positives cannot
  * survive — which is also what makes the operator oracle-able.
  *
  * Implementation is Spark's own runtime-filter machinery
  * ([[BloomFilterAggregate]] / [[BloomFilterMightContain]], the codegen'd
  * expressions behind `spark.sql.optimizer.runtime.bloomFilter.enabled`),
  * registered under graft names so the pattern is available explicitly —
  * from the Column API and from SQL — rather than only when the optimizer
  * happens to inject it. Keys must be LongType (hash non-long keys with
  * `xxhash64` first, on both sides).
  */
object Bloom {

  private val aggInfo: (FunctionIdentifier, ExpressionInfo,
    Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom_agg"),
    new ExpressionInfo(classOf[BloomFilterAggregate].getName,
      "graft_bloom_agg"),
    (children: Seq[Expression]) => children match {
      case Seq(c)       => new BloomFilterAggregate(c)
      case Seq(c, n)    => new BloomFilterAggregate(c, n)
      case Seq(c, n, m) => new BloomFilterAggregate(c, n, m)
      case other => throw new IllegalArgumentException(
        s"graft_bloom_agg takes 1-3 arguments, got ${other.length}")
    })

  private val containsInfo: (FunctionIdentifier, ExpressionInfo,
    Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom_contains"),
    new ExpressionInfo(classOf[BloomFilterMightContain].getName,
      "graft_bloom_contains"),
    (children: Seq[Expression]) =>
      BloomFilterMightContain(children(0), children(1)))

  /** Idempotent per-session registration (same contract as
    * [[graft.functions.GraftFunctions.ensureRegistered]]). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    Seq(aggInfo, containsInfo).foreach { info =>
      if (!reg.functionExists(info._1)) {
        reg.registerFunction(info._1, info._2, info._3)
      }
    }
  }

  /** Optimal sketch size in bits for `expectedItems` keys at false-positive
    * rate `fpp` (the standard m = -n·ln p / (ln 2)² rule), clamped to
    * Spark's runtime-filter creation ceiling (67,108,864 bits = 8 MB —
    * `BloomFilterAggregate` itself clamps to the session's
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` at eval time;
    * matching the default here keeps the requested and realized sizes in
    * sync). An undersized sketch degrades fpp, never correctness. */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")
    val bits = math.ceil(-expectedItems * math.log(fpp) /
      (math.log(2.0) * math.log(2.0))).toLong
    math.min(math.max(bits, 64L), 67108864L)
  }

  /** Aggregate the (LongType) `key` column of `keys` into a serialized
    * Bloom sketch. One distributed job (map-side partial sketches OR-merged
    * by the final agg — bitwise, order-independent, so the bytes are
    * deterministic under any partitioning); the driver receives only the
    * compact sketch, the same contract as `df.stat.bloomFilter` — never a
    * row collect. Returns None for an empty/all-null key set. */
  def buildBloom(keys: DataFrame, key: Column, expectedItems: Long,
                 fpp: Double = 0.01): Option[Array[Byte]] = {
    ensureRegistered(keys.sparkSession)
    val bits = optimalNumBits(expectedItems, fpp)
    val row = keys
      .select(call_function("graft_bloom_agg", key, lit(expectedItems),
        lit(bits)).as("bf"))
      .head()
    if (row.isNullAt(0)) None else Some(row.getAs[Array[Byte]](0))
  }

  /** Membership probe of a built sketch — codegen'd, null key → null
    * (dropped by a filter, matching equi-join null semantics). */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    call_function("graft_bloom_contains", lit(bloom), key)

  /** Exact semi-join of `left` against `right`'s `key` set (both LongType),
    * bloom-prefiltered: build the sketch over the right side, filter the
    * left side map-side, then exact-confirm with a plain (un-hinted) semi
    * join — AQE broadcasts the right side while it is small and falls back
    * to a shuffle join when it is not, but by then the left side is already
    * reduced to candidates. The result is EXACTLY
    * `left.join(right, key, "left_semi")` for any fpp: false positives are
    * removed by the confirm join, and null keys are dropped by both paths.
    * `expectedItems` sizes the sketch (pass the right side's catalog
    * estimate; over-estimating wastes sketch bytes, under-estimating only
    * raises fpp). */
  def bloomSemiJoin(left: DataFrame, right: DataFrame, key: String,
                    expectedItems: Long, fpp: Double = 0.01): DataFrame =
    buildBloom(right.select(col(key)), col(key), expectedItems, fpp) match {
      case None => left.filter(lit(false)) // empty key set: empty semi-join
      case Some(bloom) =>
        left.filter(mightContain(bloom, col(key)))
          .join(right.select(col(key)), Seq(key), "left_semi")
    }
}
