package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Pins for `q46_window_distribution`: the percent_rank/cume_dist
  * arithmetic identities under the gate's unique ordering, and the
  * explicit NULLS LAST placement on the nullable price key (SURVEY §5
  * item 6 — Spark ASC defaults nulls FIRST, DuckDB ASC nulls LAST;
  * inside a distribution window that divergence re-ranks every row). */
class WindowDistributionSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("percent_rank = (rn-1)/(n-1) and cume_dist = rn/n under the " +
    "gate's unique (price, orderkey) ordering") {
    // the gate's ordering tuple is unique per partition, so every row is
    // its own peer group: pr and cd collapse to row_number arithmetic —
    // recompute both from rn/n and demand bit-equality (IEEE division of
    // the same two integers)
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").asc_nulls_last, col("o_orderkey").asc)
    val wp = Window.partitionBy(col("o_orderpriority"))
    val chk = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderpriority"), col("o_orderkey"),
        col("o_totalprice"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .withColumn("rn", row_number().over(w).cast("double"))
      .withColumn("n", count(lit(1)).over(wp).cast("double"))
      .filter(col("pr") =!= (col("rn") - 1.0) / (col("n") - 1.0) ||
        col("cd") =!= col("rn") / col("n"))
    assert(chk.count() == 0L)
    // and the gate output is the keyed sample of exactly those values
    val gate = graft.queries.Relational
      .queries("q46_window_distribution")(spark, sf).collect()
    assert(gate.nonEmpty)
  }

  test("NULL o_totalprice ranks LAST in both engines (explicit NULLS " +
    "LAST on the Spark side, DuckDB's ASC default)") {
    val dir = TempLayouts.tracked("graft-wdist").toString
    // keys are multiples of 97 so the gate's sample keeps them
    Seq((97L, "P", Some(10.0)), (194L, "P", Some(5.0)),
        (291L, "P", Option.empty[Double]))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.queries.Relational
      .queries("q46_window_distribution")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    // expected order: 194 (5.0), 97 (10.0), 291 (NULL last);
    // pr = (rn-1)/2, cd = rn/3 — the null row carries pr=1.0, NOT 0.0
    // (which a default Spark ASC would have produced)
    assert(got === Seq(
      (97L, 0.5, 2.0 / 3.0),
      (194L, 0.0, 1.0 / 3.0),
      (291L, 1.0, 1.0)))
  }
}
