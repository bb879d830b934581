package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink coverage beyond parquet (SURVEY.md §2.2 row 1): text, csv
  * and json round-trips with explicit schemas, and the flagship pipeline
  * running directly off a text source. */
class SourcesSpec extends SparkSpec {

  test("csv round-trip preserves schema and values") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-csv").toString
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", -2.25), (3L, "g,amma", 0.0))
      .toDF("id", "name", "score")
    df.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("score", DoubleType)))
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(back.orderBy("id").collect().toSeq ===
      df.orderBy("id").collect().toSeq)
  }

  test("json round-trip preserves schema and values") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-json").toString
    val df = Seq((1L, "alpha", Seq(1.0, 2.0)), (2L, "beta", Seq.empty[Double]))
      .toDF("id", "name", "xs")
    df.write.mode("overwrite").json(dir)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType),
      StructField("xs", ArrayType(DoubleType))))
    val back = spark.read.schema(schema).json(dir)
    assert(back.orderBy("id").collect().toSeq ===
      df.orderBy("id").collect().toSeq)
  }

  test("orc round-trip preserves schema and values") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-orc").toString
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", -2.25))
      .toDF("id", "name", "score")
    df.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    // nullability is not carried by the file format — names/types are
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq ===
      df.orderBy("id").collect().toSeq)
  }

  test("partitioned parquet write prunes partitions at read time") {
    import org.apache.spark.sql.execution.FormattedMode
    val dir = Files.createTempDirectory("graft-part").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    // one directory per lang value on disk
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("lang=")).map(_.getName).sorted
    assert(parts.nonEmpty)
    val q = spark.read.parquet(dir).filter(col("lang") === "en")
      .select(col("doc_id"))
    val p = q.queryExecution.explainString(FormattedMode)
    // the lang predicate must prune directories, not filter rows post-scan
    assert(p.contains("PartitionFilters: [isnotnull(lang"),
      s"lang filter did not reach PartitionFilters:\n$p")
    val expected = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("lang") === "en").count()
    assert(q.count() === expected)
  }

  test("text source feeds the flagship pipeline (line-aligned splits)") {
    val dir = Files.createTempDirectory("graft-text").toString
    Files.writeString(java.nio.file.Paths.get(dir, "in.txt"),
      "red green blue\nred GREEN\nred!\n")
    val counts = spark.read.text(dir)
      .select(explode(graft.queries.TextOps.tokens(col("value"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(counts === Map("red" -> 3L, "green" -> 2L, "blue" -> 1L))
  }
}
