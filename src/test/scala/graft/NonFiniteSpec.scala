package graft

import org.apache.spark.sql.functions._

/** Non-finite input handling: the oracled queries contract FINITE,
  * grid-bounded measures (a NaN breaks cross-engine ranking determinism;
  * a 1e308 overflows the decimal(38) cent grid — both probed for real in
  * round 6). [[graft.queries.Pipeline.scrubNonFinite]] and
  * [[graft.queries.Pipeline.scrubEmbeddings]] are the sanctioned ingest
  * step that converts violations to NULL, where the engine-wide null
  * conventions take over. */
class NonFiniteSpec extends SparkSpec {

  test("scrubNonFinite nulls NaN, infinities, and grid-overflow values") {
    import spark.implicits._
    val df = Seq(
      (0L, Double.NaN), (1L, Double.PositiveInfinity),
      (2L, Double.NegativeInfinity), (3L, 1e308), (4L, -1e13),
      (5L, 5.25), (6L, 0.0), (7L, -999999.99))
      .toDF("id", "value")
      // a genuinely null measure must pass through unchanged
      .union(Seq((8L, Option.empty[Double])).toDF("id", "value"))
    val out = graft.queries.Pipeline.scrubNonFinite(df, Seq("value"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(0L).isEmpty && out(1L).isEmpty && out(2L).isEmpty)
    assert(out(3L).isEmpty && out(4L).isEmpty) // beyond the 1e12 grid bound
    assert(out(5L) === Some(5.25) && out(6L) === Some(0.0))
    assert(out(7L) === Some(-999999.99))
    assert(out(8L).isEmpty)
  }

  test("scrubEmbeddings quarantines vectors with any non-finite element") {
    import spark.implicits._
    val good = Array.tabulate(8)(i => math.sin(i + 1.0).toFloat)
    val withNan = good.updated(3, Float.NaN)
    val withInf = good.updated(5, Float.PositiveInfinity)
    val df = Seq((0L, good), (1L, withNan), (2L, withInf))
      .toDF("vec_id", "embedding")
      .union(Seq((3L, Option.empty[Array[Float]])).toDF("vec_id", "embedding"))
    val out = graft.queries.Pipeline.scrubEmbeddings(df)
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out === Map(0L -> false, 1L -> true, 2L -> true, 3L -> true))
  }

  test("scrubbed embeddings flow through k-means without ANSI errors") {
    import spark.implicits._
    val rows = (0 until 24).map { i =>
      val v = Array.tabulate(8)(j => math.sin(i * 8 + j + 1.0).toFloat)
      (i.toLong, if (i % 5 == 0) v.updated(2, Float.NaN) else v)
    }
    val emb = graft.queries.Pipeline.scrubEmbeddings(
      rows.toDF("vec_id", "embedding"))
    // unscrubbed, the NaN elements grid to NaN and the int64 cast raises
    // under ANSI; scrubbed, the bad vectors are null and excluded
    val (asg, _) = graft.queries.Similarity.kmeansAssignOf(emb, k = 4)
    val ids = asg.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids === (0 until 24).filter(_ % 5 != 0).map(_.toLong).toSet)
    Caching.releaseAll()
  }

  test("events_scrub_stats counts survivors and sums them on the exact " +
    "grid on a NaN-salted frame") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-nonfinite")
      .toString
    val vals: Seq[java.lang.Double] = Seq(
      1.0, Double.NaN, 2.5, Double.PositiveInfinity, 4.0, 1e308, null)
    vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, 1704067200000000000L + i * 1000000000L, 1L, "click", v,
        """{"k":1}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")
    val out = SparkEntry.queries("events_scrub_stats")(spark, tmp).collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 7L)   // n_rows
    assert(out.head.getLong(2) === 3L)   // 1.0, 2.5, 4.0 survive
    assert(out.head.getDouble(3) === 7.5)
  }
}
