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

  private def canon(name: String, d: String): Seq[Seq[Any]] =
    SparkEntry.queries(name)(spark, d).collect().toSeq.map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq
      case x => x
    })

  test("every query is run-to-run deterministic (row-for-row, bit-for-bit)") {
    // the driver hash gate re-runs queries across rounds — any tie an
    // ordering doesn't break, or nondeterministic aggregation, shows up
    // as a hash flap there; catch it here first. Binary cells compare by
    // content (Array[Byte].equals is reference equality).
    val d = "/root/testdata/sf0.001"
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      assert(canon(name, d) == canon(name, d), s"$name differs between runs")
    }
  }

  test("every query is invariant to shuffle partition count (4 vs 32)") {
    // the strongest cheap evidence that no result depends on physical
    // layout: a different partition count changes every exchange's row
    // routing, per-partition order, and partial-agg grouping — outputs
    // must not move. Cache is cleared between runs so internal persists
    // can't serve one layout's blocks to the other.
    val d = "/root/testdata/sf0.001"
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    def canonAt(parts: Int, name: String): Seq[Seq[Any]] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      spark.catalog.clearCache()
      canon(name, d)
    }
    try {
      SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
        assert(canonAt(4, name) == canonAt(32, name),
          s"$name differs between 4 and 32 shuffle partitions")
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", before)
      spark.catalog.clearCache()
    }
  }
}
