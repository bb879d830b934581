package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}

/** Pins for the exact-ntile-without-a-global-sort machinery
  * (`Relational.rankBoundaries` + `ntileScored`) that replaced the
  * partitionless ntile windows in q32/q33 (and the distinct-value
  * running sum in q38). The DuckDB gate owns cross-engine equality of
  * the gated outputs; these pin
  *
  *  1. EQUIVALENCE: bucket-by-broadcast-boundaries == Spark's own
  *     ntile window under the same (v asc, id asc) total order, on
  *     adversarial value distributions (heavy ties, N < k, N ≡ k±1);
  *  2. the scale contract: no gated quantile-segmentation plan carries
  *     a partitionless Window over a corpus-growing dimension.
  */
class RankBoundariesSpec extends SparkSpec {

  private def frame(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  /** ntile via the two-pass boundary machinery vs the window builtin. */
  private def check(rows: Seq[(Long, Long)], k: Int, vStep: Long,
                    idStep: Long): Unit = {
    val df = frame(rows)
    val bounds = graft.queries.Relational.rankBoundaries(
      df.select(lit("t").as("s"), col("id"), col("v"),
        expr(s"v div $vStep").as("vbin"),
        expr(s"id div $idStep").as("ibin")),
      k)
    val got = graft.queries.Relational
      .ntileScored(df, "id", bounds, Seq(("v", "bucket", "t")))
      .select(col("id"), col("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("bucket",
        ntile(k).over(Window.orderBy(col("v").asc, col("id").asc))
          .cast("long"))
      .select(col("id"), col("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want,
      s"ntile($k) mismatch on ${rows.size} rows (vStep=$vStep): " +
        s"${got.toSeq.sorted.take(8)} vs ${want.toSeq.sorted.take(8)}")
    Caching.releaseAll()
  }

  test("matches ntile on unique values") {
    check((1L to 100L).map(i => (i, (i * 37) % 101)), 5, 8L, 16L)
  }

  test("matches ntile under heavy ties (tie-break by id crosses cuts)") {
    // 3 distinct values over 100 rows: every cut lands inside a tie run
    check((1L to 100L).map(i => (i, i % 3)), 5, 1L, 8L)
    check((1L to 100L).map(i => (i, i % 3)), 10, 4L, 16L)
  }

  test("matches ntile when one value owns almost everything") {
    check((1L to 90L).map(i => (i, 7L)) ++ Seq((91L, 1L), (92L, 99L)),
      5, 16L, 8L)
  }

  test("matches ntile when N < k, N == k, N == k +/- 1") {
    for (n <- Seq(3, 4, 5, 6, 9)) {
      check((1L to n.toLong).map(i => (i, 100L - i)), 5, 8L, 4L)
    }
  }

  test("matches ntile on negative values (desc-as-negated convention)") {
    check((1L to 80L).map(i => (i, -((i * 13) % 7))), 5, 3L, 16L)
  }

  test("randomized equivalence across k and tie density") {
    val rnd = new scala.util.Random(41)
    for (trial <- 0 until 6) {
      val n = 20 + rnd.nextInt(180)
      val dom = 1 + rnd.nextInt(20)         // small domain → dense ties
      val rows = (1L to n.toLong).map(i => (i, rnd.nextInt(dom).toLong))
      check(rows, 2 + rnd.nextInt(9), 1L + rnd.nextInt(8),
        1L + rnd.nextInt(32))
    }
  }

  test("no gated quantile-segmentation plan has a partitionless Window") {
    val d = "/root/testdata/sf0.001"
    for (q <- Seq("q32_rfm_segments", "q33_pareto_deciles",
      "q38_range_boundaries")) {
      val plan = SparkEntry.queries(q)(spark, d).queryExecution.optimizedPlan
      val bad = plan.collect {
        case w: LogicalWindow if w.partitionSpec.isEmpty => w
      }
      // the only partitionless windows allowed are BIN-level (domain-
      // constant row counts); those run over the `vbin` histogram (the
      // constant-folded single-score partition key leaves a partitionless
      // full-range window whose CHILD is still the bin aggregate) — a
      // partitionless window over anything else fails here
      val nonBin = bad.filterNot(w =>
        w.orderSpec.exists(_.child.references.exists(_.name == "vbin")) ||
          w.child.output.exists(_.name == "vbin"))
      assert(nonBin.isEmpty,
        s"$q: partitionless non-bin Window in plan:\n${nonBin.mkString}")
      Caching.releaseAll()
    }
  }

  test("no gated quantile-segmentation plan has a CartesianProduct " +
    "(the bucket-spine cross is broadcast by convention)") {
    val d = "/root/testdata/sf0.001"
    for (q <- Seq("q32_rfm_segments", "q33_pareto_deciles",
      "q38_range_boundaries")) {
      val phys = SparkEntry.queries(q)(spark, d).queryExecution.executedPlan
      val cart = phys.collect {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      }
      assert(cart.isEmpty,
        s"$q: CartesianProductExec in physical plan:\n${cart.mkString}")
      Caching.releaseAll()
    }
  }
}
