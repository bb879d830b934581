package graft

import org.apache.spark.sql.functions._

/** Pins for `q42_label_communities` (deterministic synchronous label
  * propagation): the 4-round walk on a hand-computed graph, and the
  * scale-shape audit (the per-round argmax is the struct-extremum
  * map-side aggregate — no Window node anywhere in the plan). */
class LpaSpec extends SparkSpec {
  import spark.implicits._

  // two triangles bridged by (3,4) — hand-walked 4-round trace:
  // l1: 1→2 2→1 3→1 4→3 5→4 6→4
  // l2: 1→1 2→1 3→1 4→4 5→3 6→3
  // l3: 1→1 2→1 3→1 4→3 5→3 6→3
  // l4: fixpoint of l3 → communities {1,2,3} and {4,5,6}
  private def bridgedTriangles = Seq(
    (1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    .toDF("a", "b")

  test("4-round walk on the bridged triangles matches the hand trace") {
    val got = graft.queries.Relational
      .labelCommunities(bridgedTriangles, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("ties resolve to the SMALLEST label (round-1 trace)") {
    val got = graft.queries.Relational
      .labelCommunities(bridgedTriangles, rounds = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq(1L -> 2L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 4L, 6L -> 4L))
  }

  test("plan shape: the argmax is an aggregate, never a Window") {
    val plan = graft.queries.Relational
      .labelCommunities(bridgedTriangles, rounds = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "LPA argmax must ride the struct-extremum map-side aggregate, " +
        "not a window")
  }

  test("the argmax is closed over the full long label domain (the " +
    "scale-curve corpus offsets ids by 10^9 per copy)") {
    // a two-vertex graph with ids far outside any 2^20 pack domain:
    // each adopts the other's (only) neighbor label in round 1
    val big = (1L << 40) + 7L
    val gr = Seq((big, big + 1L)).toDF("a", "b")
    val got = graft.queries.Relational.labelCommunities(gr, rounds = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq(big -> (big + 1L), (big + 1L) -> big))
  }
}
