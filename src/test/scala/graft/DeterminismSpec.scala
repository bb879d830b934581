package graft

import graft.queries.{cents, gridSum}
import org.apache.spark.sql.functions._

/** The determinism machinery the whole oracle contract rests on: grid
  * sums must be exactly invariant under row order and partitioning, and
  * the grid must be a pure function of the input double. */
class DeterminismSpec extends SparkSpec {

  private val values: Seq[Double] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(5000)(rnd.nextDouble() * 100000.0 - 1000.0)
  }

  test("gridSum is bit-identical across partitioning and row order") {
    import spark.implicits._
    def total(parts: Int, vs: Seq[Double]): Double =
      vs.toDF("x").repartition(parts)
        .agg(gridSum(col("x"), 100.0).as("s"))
        .head().getDouble(0)
    val base = total(1, values)
    for (p <- Seq(2, 7, 32)) {
      assert(java.lang.Double.doubleToLongBits(total(p, values)) ===
        java.lang.Double.doubleToLongBits(base))
    }
    val shuffled = new scala.util.Random(7).shuffle(values)
    assert(java.lang.Double.doubleToLongBits(total(7, shuffled)) ===
      java.lang.Double.doubleToLongBits(base))
  }

  test("cents grid matches the floor(x*100+0.5) reference per value") {
    import spark.implicits._
    val out = values.toDF("x")
      .select(col("x"), cents(col("x")).as("c"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(1) === math.floor(r.getDouble(0) * 100.0 + 0.5).toLong)
    }
  }

  test("every query is run-to-run deterministic (row-for-row, bit-for-bit)") {
    // the driver hash gate re-runs queries across rounds — any tie an
    // ordering doesn't break, or nondeterministic aggregation, shows up
    // as a hash flap there; catch it here first. Binary cells compare by
    // content (Array[Byte].equals is reference equality).
    val d = "/root/testdata/sf0.001"
    def canon(name: String): Seq[Seq[Any]] =
      SparkEntry.queries(name)(spark, d).collect().toSeq.map(_.toSeq.map {
        case b: Array[Byte] => b.toSeq
        case x => x
      })
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      assert(canon(name) == canon(name), s"$name differs between runs")
    }
  }
}
