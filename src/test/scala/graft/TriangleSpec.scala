package graft

import org.apache.spark.sql.functions._

/** Hand-graph pins for the degree-oriented triangle enumeration
  * (`Relational.triangleStats` / `q34_triangle_stats`). The DuckDB gate
  * owns cross-engine equality on the fixture; these pin the counting
  * semantics on graphs with known closed forms. */
class TriangleSpec extends SparkSpec {

  private def stats(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    val row = graft.queries.Relational
      .triangleStats(edges.toDF("a", "b")).collect().head
    Caching.releaseAll(); spark.catalog.clearCache()
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      if (row.isNullAt(4)) -1L else row.getLong(4))
  }

  test("K4: 4 triangles, 12 wedges, transitivity exactly 1") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val (n, m, w, t, trans) = stats(k4)
    assert((n, m, w, t) == (4L, 6L, 12L, 4L))
    assert(trans == 1000000L, "K4 is perfectly transitive")
  }

  test("star hub: max wedges, zero triangles — the shape the degree " +
    "orientation exists for") {
    // hub 0 with 6 leaves: deg(0)=6 → 15 wedges, no closure anywhere;
    // oriented, the hub is every edge's DESTINATION (largest degree), so
    // its out-degree is 0 and the wedge expansion never touches deg²
    val star = (1L to 6L).map(l => (0L, l))
    val (n, m, w, t, trans) = stats(star.map { case (a, b) =>
      (math.min(a, b), math.max(a, b)) })
    assert((n, m, w, t) == (7L, 6L, 15L, 0L))
    assert(trans == 0L)
  }

  test("triangle plus pendant: counts one triangle and the pendant's " +
    "wedges, matches the closed form") {
    // nodes 1-2-3 form a triangle; 4 hangs off 1
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L))
    val (n, m, w, t, trans) = stats(g)
    assert((n, m, w, t) == (4L, 4L, 5L, 1L))
    // 3·1·10⁶ div 5 wedges
    assert(trans == 600000L)
  }

  test("empty edge set: zero row counts, null transitivity") {
    import spark.implicits._
    val row = graft.queries.Relational
      .triangleStats(Seq.empty[(Long, Long)].toDF("a", "b"))
      .collect().head
    Caching.releaseAll(); spark.catalog.clearCache()
    assert(row.getLong(0) == 0L && row.getLong(1) == 0L)
    assert(row.isNullAt(4), "transitivity of an empty graph must be NULL")
  }
}
