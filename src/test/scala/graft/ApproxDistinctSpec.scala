package graft

/** The HLL++ sketch is engine-specific (hence exercised here, not in the
  * DuckDB oracle gate): bound its relative error against the exact
  * distinct count. The hash-gated q20 query carries only `n_exact`. */
class ApproxDistinctSpec extends SparkSpec {

  test("approx_count_distinct is within 5% of exact at sf0.01") {
    val rows = queries.Relational.approxDistinct(
      spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }
}
