package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Pins for the snapshot⊕delta join-view maintenance algebra
  * (`Relational.joinViewIncremental` / `q39_join_incremental`). The
  * DuckDB gate proves the merged view equals the direct join aggregate
  * on the fixture; these pin the algebra's edge cases on hand frames:
  * every delta term populated, the exact-partition property (no pair
  * counted twice, none missed), and null new-flags landing old-side. */
class JoinIncrementalSpec extends SparkSpec {

  private val dec = DecimalType(38, 0)

  private def aFrame(rows: Seq[(Long, String, java.lang.Boolean)])
      : DataFrame = {
    import spark.implicits._
    rows.toDF("k", "month", "a_new")
  }

  private def bFrame(rows: Seq[(Long, Long, java.lang.Boolean)])
      : DataFrame = {
    import spark.implicits._
    rows.toDF("k", "rev0", "b_new")
      .select(col("k"), col("rev0").cast(dec).as("rev"), col("b_new"))
  }

  private def run(a: DataFrame, b: DataFrame): Seq[(String, Long, Long)] =
    graft.queries.Relational.joinViewIncremental(a, b)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("all four legs live: pair counts equal the direct join, " +
    "delta pairs = pairs touching any new side") {
    // key 1: old order, old+new lineitems; key 2: new order, old+new;
    // key 3: old order, old only; key 4: new order, new only
    val a = aFrame(Seq((1L, "m1", false), (2L, "m1", true),
      (3L, "m2", false), (4L, "m2", true)))
    val b = bFrame(Seq(
      (1L, 100L, false), (1L, 10L, true),
      (2L, 100L, false), (2L, 10L, true),
      (3L, 100L, false), (4L, 10L, true)))
    // m1: 4 pairs, deltas = all but (1, old): 3. m2: 2 pairs, deltas =
    // (3,old)=stored? no — order 3 old + lineitem old → stored; order 4
    // new + new → delta. so 1 delta.
    assert(run(a, b).toSet == Set(("m1", 4L, 3L), ("m2", 2L, 1L)))
  }

  test("null new-flags land old-side (a row is in exactly one slice)") {
    val a = aFrame(Seq((1L, "m", null), (2L, "m", true)))
    val b = bFrame(Seq((1L, 100L, null), (2L, 200L, false)))
    // (1,1): both null → stored, not delta, not dropped, not doubled;
    // (2,2): new order × old item → delta
    assert(run(a, b) == Seq(("m", 2L, 1L)))
  }

  test("the merged revenue equals the direct join's grid sum") {
    val a = aFrame(Seq((1L, "m", false), (2L, "m", true)))
    val b = bFrame(Seq((1L, 12345L, true), (2L, 55L, false),
      (2L, 45L, true)))
    val got = graft.queries.Relational.joinViewIncremental(a, b).collect()
    assert(got.length == 1)
    assert(got(0).getDouble(3) == (12345L + 55L + 45L) / 10000.0)
  }

  test("a month present only in the stored slice reports zero deltas") {
    val a = aFrame(Seq((1L, "m0", false)))
    val b = bFrame(Seq((1L, 7L, false)))
    assert(run(a, b) == Seq(("m0", 1L, 0L)))
  }
}
