package graft

import graft.queries.Dedup
import org.apache.spark.sql.functions._

/** MERGE/upsert snapshot maintenance (`dedup_upsert_snapshot`): action
  * semantics and the idempotence contract — re-upserting the same batch
  * against the emitted snapshot must be a pure no-op. */
class UpsertSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("the demo batch exercises every MERGE arm and ids stay unique") {
    val out = SparkEntry.queries("dedup_upsert_snapshot")(spark, d).collect()
    assert(out.nonEmpty)
    val actions = out.map(_.getString(2)).toSet
    assert(actions.subsetOf(Set("insert", "keep", "noop", "update")))
    // the % 3 derivation guarantees all three batch arms fire on any
    // fixture with >= 3 consecutive ids
    assert(Set("insert", "noop", "update").subsetOf(actions), actions)
    // exactly one output row per canonical id — the output IS a snapshot
    val ids = out.map(_.getLong(0))
    assert(ids.distinct.length === ids.length)
    // synthetic inserts carry the shifted ids, and nothing else does
    val inserted = out.filter(_.getString(2) == "insert").map(_.getLong(0))
    assert(inserted.forall(_ >= 10000000L))
    assert(out.filterNot(_.getString(2) == "insert")
      .forall(_.getLong(0) < 10000000L))
  }

  test("re-upserting the same batch is all keep/noop (idempotence)") {
    val docs = Tables.documents(spark, d)
    val batch = Dedup.upsertDemoBatch(docs)
    val next = Dedup.upsert(
      docs.select(col("doc_id"), Dedup.fingerprint.as("fp")), batch)
      .select(col("doc_id"), col("fp"))
    val again = Dedup.upsert(next, batch).collect()
    val actions = again.map(_.getString(2)).toSet
    assert(actions.subsetOf(Set("keep", "noop")), actions)
    // and the snapshot is unchanged row-for-row
    val snap2 = again.map(r => (r.getLong(0), r.getString(1))).sorted
    val snap1 = next.collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(snap2.toSeq === snap1.toSeq)
  }
}
