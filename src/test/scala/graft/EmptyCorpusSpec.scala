package graft

import java.nio.file.Files

/** Robustness sweep: every declared query must EXECUTE (not just plan)
  * against a zero-row corpus without throwing. At 100 TB, empty
  * partitions, empty cells, and empty join sides are the normal case
  * somewhere in the cluster — an operator that NPEs or divides by zero on
  * an empty input is a production incident, and this is the cheapest
  * harness that exercises that path for the full 90-query surface at
  * once. (Row counts are not asserted beyond >= 0: several queries
  * legitimately emit rows from generated grids, e.g. events_resample's
  * 720-slot hour grid with zero-filled measures.) */
class EmptyCorpusSpec extends SparkSpec {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Zero-row copies of every driver table, schemas preserved (events.ts
    * stays the raw nanos long that Tables.events expects — SparkSpec sets
    * nanosAsLong, so the bare read/write round-trip keeps the column a
    * plain BIGINT and the `ts div 1000` path still applies). */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-empty").toString
    for (t <- tables) {
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .limit(0)
        .write.mode("overwrite").parquet(s"$d/$t.parquet")
    }
    d
  }

  test("every query executes on a zero-row corpus without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
        }
    }
    Caching.releaseAll()
    assert(failures.isEmpty,
      s"queries failed on the empty corpus:\n${failures.mkString("\n")}")
  }
}
