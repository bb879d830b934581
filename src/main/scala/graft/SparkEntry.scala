package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine is a query library over the driver's parquet tables: each
  * entry in [[queries]] is a declarative DataFrame plan (Catalyst optimizes
  * and picks physical operators), and each entry in [[oracleSql]] is the
  * equivalent ANSI SQL the driver runs in DuckDB for the hash-compare.
  */
object SparkEntry {

  /** Smallest scale-factor fixture: flagship smoke checks and bench
    * warm-up both point here. */
  val smokeDir = "/root/testdata/sf0.001"

  /** Flagship query (reference's word count + top-N, SURVEY §2.1) on
    * sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.TextOps.wordcountTopN(spark, smokeDir, 20)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.TextOps.queries ++
      graft.queries.Events.queries ++
      graft.queries.Dedup.queries ++
      graft.queries.Similarity.queries ++
      graft.queries.Multimodal.queries ++
      graft.queries.SqlSurface.queries ++
      graft.queries.Pipeline.queries ++
      graft.operators.MapReduce.queries ++
      graft.streaming.StreamingRun.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.TextOps.oracles ++
      graft.queries.Events.oracles ++
      graft.queries.Dedup.oracles ++
      graft.queries.Similarity.oracles ++
      graft.queries.Multimodal.oracles ++
      graft.queries.SqlSurface.oracles ++
      graft.queries.Pipeline.oracles ++
      graft.operators.MapReduce.oracles ++
      graft.streaming.StreamingRun.oracles
}
