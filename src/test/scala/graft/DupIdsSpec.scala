package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Duplicate-ID handling: the oracled queries contract UNIQUE row ids
  * (rank tie-breaks, min-id representatives, and as-of keys are
  * undefined otherwise — a round-6 probe showed 14 queries diverge on
  * colliding ids). [[graft.queries.Pipeline.canonicalizeIds]] and the
  * `docs_unique_ids` query are the sanctioned repair step. */
class DupIdsSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-dupids").toString
    val base = (0 until 20).map(i =>
      (i.toLong, s"document number $i the quick brown fox", "en", "web", 0L))
    val dups = Seq(
      // retried write: same id, same content
      (3L, "document number 3 the quick brown fox", "en", "web", 0L),
      // collision: same id, different content
      (7L, "totally different colliding content here", "en", "web", 0L))
    (base ++ dups).toDF("doc_id", "text", "lang", "source", "length")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("docs_unique_ids keeps one deterministic survivor per id and " +
    "counts the claims") {
    val out = SparkEntry.queries("docs_unique_ids")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(out.size === 20)                 // one row per distinct id
    assert(out(3L)._2 === 2L)               // retry counted
    assert(out(7L)._2 === 2L)               // collision counted
    assert(out.filterNot(kv => kv._1 == 3L || kv._1 == 7L)
      .forall(_._2._2 == 1L))
    // survivor for the collision is the smaller fingerprint — recompute
    val fps = Seq("document number 7 the quick brown fox",
      "totally different colliding content here")
      .map(t => java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(out(7L)._1 === fps.min)
  }

  test("canonicalizeIds repairs a colliding corpus so downstream " +
    "contracts hold") {
    val docs = Tables.documents(spark, dir)
    val fixed = graft.queries.Pipeline.canonicalizeIds(
      docs, "doc_id", graft.queries.Dedup.fingerprint)
    assert(fixed.count() === 20L)
    assert(fixed.select("doc_id").distinct().count() === 20L)
    // idempotent
    val again = graft.queries.Pipeline.canonicalizeIds(
      fixed, "doc_id", graft.queries.Dedup.fingerprint)
    assert(again.collect().map(_.getLong(0)).sorted ===
      fixed.collect().map(_.getLong(0)).sorted)
  }
}
