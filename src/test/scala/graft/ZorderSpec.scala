package graft

/** Pins for the Morton/z-order clustering key
  * (`Events.zorderKey` / `events_zorder_layout`). The DuckDB gate owns
  * cross-engine equality of the full layout census; these pin the
  * interleave arithmetic against a reference implementation and the
  * LOCALITY GUARANTEE that makes z-clustering a data-skipping layout:
  * fixing the top 5 z-bits (one layout block) constrains x to a
  * 128-wide and y to a 256-wide window — the per-file min/max bound a
  * scan planner prunes with. */
class ZorderSpec extends SparkSpec {

  /** Reference interleave: x bit i → z bit 2i+1, y bit i → z bit 2i. */
  private def zRef(x: Long, y: Long): Long =
    (0 until 10).map { i =>
      (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i))
    }.sum

  private def zEngine(pts: Seq[(Long, Long)]): Seq[Long] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    pts.toDF("x", "y")
      .select(graft.queries.Events.zorderKey(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
  }

  test("interleave matches the reference on corners and alternating bits") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1023L, 1023L),
      (682L, 341L), (341L, 682L), (512L, 0L), (0L, 512L))
    assert(zEngine(pts) == pts.map((zRef _).tupled))
    // closed forms: x=1,y=0 → bit 1; x=0,y=1 → bit 0; all-ones → 2^20−1;
    // x=0b1010101010, y=0b0101010101 interleave to 0b1001100110...
    assert(zRef(1, 0) == 2L && zRef(0, 1) == 1L)
    assert(zRef(1023, 1023) == (1L << 20) - 1)
  }

  test("interleave is a bijection on a deterministic sample") {
    val pts = for (x <- 0L until 1024L by 41; y <- 0L until 1024L by 37)
      yield (x, y)
    val zs = pts.map((zRef _).tupled)
    assert(zs.distinct.size == pts.size)
  }

  test("block locality: fixing the top 5 z-bits bounds x within 128 " +
    "and y within 256") {
    // exhaustive 32x32 coarse grid through the engine expression: every
    // (x, y) pair on a 32-step lattice, grouped by z >> 15
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pts = for (x <- 0L until 1024L by 8; y <- 0L until 1024L by 8)
      yield (x, y)
    val spans = pts.toDF("x", "y")
      .withColumn("blk",
        shiftright(graft.queries.Events.zorderKey(col("x"), col("y")), 15))
      .groupBy(col("blk"))
      .agg((max(col("x")) - min(col("x"))).as("xs"),
        (max(col("y")) - min(col("y"))).as("ys"))
      .collect()
    assert(spans.length == 32)
    assert(spans.forall(r => r.getLong(1) < 128L && r.getLong(2) < 256L))
  }
}
