package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage-level timing probe (Test/runMain graft.StageTiming).
  * Times individual sub-pipelines of the slow bench queries so
  * optimization targets measurement, not guesswork. Not shipped. */
object StageTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = f
      println(f"[stage] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (rows=$n)")
    }

    val docs = graft.Tables.documents(spark, sfDir)

    // warm up scan + JIT
    docs.count(); docs.count()

    val tok = docs.select(col("doc_id"),
      graft.queries.TextOps.tokens(col("text")).as("ws"))
    time("tokenize (materialize arrays)") {
      tok.select(sum(size(col("ws")))).collect()(0).getLong(0)
    }

    // components = pairs pipeline + label-propagation rounds; time the
    // iteration alone over pre-materialized pairs
    val pairsCached = graft.queries.Dedup
      .jaccardPairs(docs, 0.6)
      .select(col("doc_a"), col("doc_b"))
      .persist()
    pairsCached.count()
    val t0 = System.nanoTime()
    val n0 = graft.queries.Dedup
      .components(docs.select(col("doc_id")), pairsCached).count()
    println(f"[stage] components iteration only          ${(System.nanoTime() - t0) / 1e9}%8.3f s  (rows=$n0)")
    pairsCached.unpersist()

    for (round <- 1 to 2) {
      time(s"r$round dedup_exact") {
        graft.queries.Dedup.queries("dedup_exact")(spark, sfDir).count()
      }
      time(s"r$round jaccardPairs full") {
        graft.queries.Dedup.queries("dedup_neardup_jaccard")(spark, sfDir).count()
      }
      time(s"r$round minhashLshPairs full") {
        graft.queries.Dedup.queries("dedup_minhash_lsh")(spark, sfDir).count()
      }
      time(s"r$round components full") {
        graft.queries.Dedup.queries("dedup_components")(spark, sfDir).count()
      }
      time(s"r$round simhash signatures") {
        graft.queries.Dedup.queries("dedup_simhash")(spark, sfDir).count()
      }
      time(s"r$round simhash pairs") {
        graft.queries.Dedup.queries("dedup_simhash_pairs")(spark, sfDir).count()
      }
      time(s"r$round winnow full") {
        graft.queries.TextOps.queries("text_winnow_fingerprint")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
