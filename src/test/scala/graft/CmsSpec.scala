package graft

import org.apache.spark.sql.functions._

/** Count-min sketch (`text_cms_counts`) contracts:
  *
  *  1. one-sided error — est ≥ true for EVERY vocabulary term (the
  *     deterministic CMS guarantee: each counter sums its own term plus
  *     colliders, and min-over-rows never drops below the true count);
  *  2. mergeability — counters built on two corpus halves and summed
  *     bucket-wise equal the counters built on the union (the property
  *     that makes the sketch a partial aggregate: map-side combine,
  *     cross-batch accumulation, and distributed merge are all the same
  *     addition);
  *  3. conservation — every row's counters sum to the total token count
  *     (each occurrence lands in exactly one bucket per row).
  */
class CmsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def tf = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    graft.queries.TextOps.cmsTermCounts(
      Tables.documents(spark, dir))
  }

  private def counterMap(
      counters: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] =
    counters.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("est >= true for every vocabulary term, not just the top 20") {
    val t = tf
    val counters = counterMap(graft.queries.TextOps.cmsCounters(t))
    val truth = t.groupBy(col("term"))
      .agg(sum(col("tf")).cast("long").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(truth.nonEmpty)
    val est = t.sparkSession.createDataFrame(
      t.sparkSession.sparkContext.parallelize(
        truth.map(p => org.apache.spark.sql.Row(p._1)).toSeq),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("term",
          org.apache.spark.sql.types.StringType))))
      .select(col("term"), explode(expr("sequence(0, 3)")).as("r"))
      .withColumn("bucket",
        graft.queries.TextOps.cmsBucket(col("r"), col("term")))
      .collect()
      .groupBy(_.getString(0))
      .map { case (term, rows) =>
        term -> rows.map(r =>
          counters((r.getInt(1), r.getLong(2)))).min
      }
    for ((term, n) <- truth)
      assert(est(term) >= n, s"CMS underestimated '$term': ${est(term)} < $n")
    // the 16-bucket grid forces collisions on this vocabulary: the
    // overcount path must be LIVE, not vacuously zero
    assert(truth.exists { case (term, n) => est(term) > n })
  }

  test("counters merge by addition across corpus halves") {
    val docs = Tables.documents(spark, dir)
    val a = graft.queries.TextOps.cmsCounters(
      graft.queries.TextOps.cmsTermCounts(
        docs.filter(col("doc_id") % 2 === 0)))
    val b = graft.queries.TextOps.cmsCounters(
      graft.queries.TextOps.cmsTermCounts(
        docs.filter(col("doc_id") % 2 === 1)))
    val whole = counterMap(graft.queries.TextOps.cmsCounters(
      graft.queries.TextOps.cmsTermCounts(docs)))
    val ma = counterMap(a)
    val mb = counterMap(b)
    val merged = (ma.keySet ++ mb.keySet).map(k =>
      k -> (ma.getOrElse(k, 0L) + mb.getOrElse(k, 0L))).toMap
    assert(merged == whole)
  }

  test("each row's counters sum to the total token count") {
    val t = tf
    val total = t.agg(sum(col("tf")).cast("long")).collect()(0).getLong(0)
    val perRow = graft.queries.TextOps.cmsCounters(t)
      .groupBy(col("r")).agg(sum(col("c")).cast("long").as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perRow.keySet == Set(0, 1, 2, 3))
    assert(perRow.values.forall(_ == total))
  }
}
