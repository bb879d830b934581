package graft

import org.apache.spark.sql.functions._

/** Pins for rendezvous/HRW shard assignment
  * (`Pipeline.rendezvousAssign` / `docs_shard_rendezvous`). The DuckDB
  * gate owns cross-engine equality of the census; these pin the
  * properties that make HRW the consistent-placement discipline:
  *
  *  1. STABILITY (the theorem): removing one shard relocates ONLY that
  *     shard's documents — every other document's argmax over the
  *     remaining set is unchanged;
  *  2. totality: every non-null-id document gets exactly one shard;
  *  3. determinism: re-running assigns identically.
  */
class RendezvousSpec extends SparkSpec {

  private def docsFrame(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, s"text$i")).toDF("doc_id", "text")
  }

  private def assign(n: Int, shards: Int): Map[Long, Long] =
    graft.queries.Pipeline.rendezvousAssign(docsFrame(n), shards)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("removing the last shard relocates only its own documents") {
    val with8 = assign(400, 8)
    val with7 = assign(400, 7)
    assert(with8.keySet == with7.keySet)
    // every shard 0..7 should be hit at 400 docs — the test is vacuous
    // otherwise
    assert(with8.values.toSet == (0L until 8L).toSet)
    with8.foreach { case (doc, s8) =>
      if (s8 != 7L)
        assert(with7(doc) == s8,
          s"doc $doc moved from shard $s8 to ${with7(doc)} although its " +
            "shard survived")
      else
        assert(with7(doc) != 7L)
    }
  }

  test("every document gets exactly one shard; null ids are excluded") {
    import spark.implicits._
    val docs = Seq((java.lang.Long.valueOf(1L), "a"),
      (null.asInstanceOf[java.lang.Long], "b"),
      (java.lang.Long.valueOf(2L), "c")).toDF("doc_id", "text")
    val got = graft.queries.Pipeline.rendezvousAssign(docs, 8).collect()
    assert(got.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("assignment is deterministic across runs") {
    assert(assign(100, 8) == assign(100, 8))
  }

  test("assignment plan is a pure projection: no window, no join, no " +
    "exchange") {
    val plan = graft.queries.Pipeline.rendezvousAssign(docsFrame(10), 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window node in HRW plan:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"join in HRW plan:\n$plan")
    assert(!plan.contains("Exchange"), s"exchange in HRW plan:\n$plan")
  }
}
