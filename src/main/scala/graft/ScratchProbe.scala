package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway decomposition probe for the round-16 optimization pass
  * (guide §1: measure first). Not part of the driver contract. */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[scratch] $label%-44s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def steps(withDeg: DataFrame, nodes: DataFrame): DataFrame = {
      val nn = nodes.agg(count(lit(1)).as("n"))
      val r0 = nodes.crossJoin(broadcast(nn))
        .select(col("node"), col("n"),
          expr("1000000000000 div n").as("rank"))
      def step(r: DataFrame): DataFrame = {
        val mass = withDeg
          .join(r.select(col("node").as("a"), col("rank"))
            .hint("shuffle_hash"), "a")
          .select(col("b").as("node"), expr("rank div deg").as("contrib"))
          .groupBy(col("node")).agg(sum(col("contrib")).as("in_mass"))
        nodes.crossJoin(broadcast(nn))
          .join(mass.hint("shuffle_hash"), Seq("node"), "left_outer")
          .select(col("node"), col("n"), (
            expr("((1000000000000 div n) * 15) div 100") +
              expr("(85 * coalesce(in_mass, 0)) div 100")).as("rank"))
      }
      step(step(step(r0)))
    }

    (1 to 2).foreach { iter =>
      println(s"[scratch] ===== q28 variants iter $iter")
      // ---- variant A: current shape (persist edges + persist withDeg)
      Caching.releaseAll(); spark.catalog.clearCache()
      time("A total (current)") {
        val e0 = Tables.lineitem(s, d)
          .select((col("l_partkey") * 2).as("a"),
            (col("l_suppkey") * 2 + 1).as("b"))
          .distinct()
        val edges = graft.Caching.persistTracked(
          e0.union(e0.select(col("b").as("a"), col("a").as("b"))))
        val withDeg = graft.Caching.persistTracked(
          edges.join(
            edges.groupBy(col("a")).agg(count(lit(1)).as("deg")), "a"))
        val nodes = graft.Caching.persistTracked(
          Tables.part(s, d)
            .select((col("p_partkey") * 2).as("node"))
            .union(Tables.supplier(s, d)
              .select((col("s_suppkey") * 2 + 1).as("node"))))
        noop(steps(withDeg, nodes))
      }
      // ---- variant B: persist e0 only; withDeg via window over
      // repartition(a); single cached copy, hash(a) partitioning kept
      Caching.releaseAll(); spark.catalog.clearCache()
      time("B total (e0 cache + window deg)") {
        val e0 = graft.Caching.persistTracked(Tables.lineitem(s, d)
          .select((col("l_partkey") * 2).as("a"),
            (col("l_suppkey") * 2 + 1).as("b"))
          .distinct())
        val edges = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
        val withDeg = graft.Caching.persistTracked(
          edges.withColumn("deg",
            count(lit(1)).over(Window.partitionBy(col("a")))))
        val nodes = graft.Caching.persistTracked(
          Tables.part(s, d)
            .select((col("p_partkey") * 2).as("node"))
            .union(Tables.supplier(s, d)
              .select((col("s_suppkey") * 2 + 1).as("node"))))
        noop(steps(withDeg, nodes))
      }
      // ---- variant C: keep join-deg shape but with shuffle_hash
      // self-join + only withDeg persisted
      Caching.releaseAll(); spark.catalog.clearCache()
      time("C total (join deg, shuffle_hash, 1 cache)") {
        val e0 = graft.Caching.persistTracked(Tables.lineitem(s, d)
          .select((col("l_partkey") * 2).as("a"),
            (col("l_suppkey") * 2 + 1).as("b"))
          .distinct())
        val edges = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
        val withDeg = graft.Caching.persistTracked(
          edges.hint("shuffle_hash").join(
            edges.groupBy(col("a")).agg(count(lit(1)).as("deg")), "a"))
        val nodes = graft.Caching.persistTracked(
          Tables.part(s, d)
            .select((col("p_partkey") * 2).as("node"))
            .union(Tables.supplier(s, d)
              .select((col("s_suppkey") * 2 + 1).as("node"))))
        noop(steps(withDeg, nodes))
      }
    }
    spark.stop()
  }
}
