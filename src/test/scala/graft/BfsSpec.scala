package graft

/** Hand-graph pins for the BFS layer census
  * (`Relational.bfsLayers` / `q40_bfs_layers`). The DuckDB gate owns
  * cross-engine equality on the fixture; these pin the frontier
  * semantics — min-hop distance (not any-path depth), the layer cap,
  * disconnected-component exclusion, early stop, and the empty graph —
  * on graphs with closed forms. */
class BfsSpec extends SparkSpec {

  private def layers(edges: Seq[(Long, Long)],
                     maxDepth: Int = 6): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    val rows = graft.queries.Relational
      .bfsLayers(edges.toDF("a", "b"), maxDepth)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    Caching.releaseAll(); spark.catalog.clearCache()
    rows
  }

  test("path graph: one vertex per layer, seed = smallest vertex") {
    // 0-1-2-3: layers are singletons at dist 0..3
    assert(layers(Seq((0L, 1L), (1L, 2L), (2L, 3L))) ==
      Seq((0L, 1L, 0L, 0L), (1L, 1L, 1L, 1L), (2L, 1L, 2L, 2L),
        (3L, 1L, 3L, 3L)))
  }

  test("cycle: BFS takes the SHORTER way around (min-hop, not any-path)") {
    // 5-cycle 0-1-2-3-4-0: dist(3) = 2 via 4, never 3 via 1-2
    val c5 = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 4L))
    assert(layers(c5) ==
      Seq((0L, 1L, 0L, 0L), (1L, 2L, 1L, 4L), (2L, 2L, 2L, 3L)))
  }

  test("a second component is unreachable and absent from every layer") {
    val g = Seq((0L, 1L), (10L, 11L), (11L, 12L))
    assert(layers(g) == Seq((0L, 1L, 0L, 0L), (1L, 1L, 1L, 1L)))
  }

  test("the layer cap truncates: a 9-path stops at maxDepth layers") {
    val p9 = (0L until 9L).map(i => (i, i + 1))
    val got = layers(p9, maxDepth = 3)
    assert(got.map(_._1) == Seq(0L, 1L, 2L, 3L))
    assert(got.forall(_._2 == 1L))
  }

  test("empty graph: no seed, no layers") {
    assert(layers(Seq.empty).isEmpty)
  }

  test("star graph: everything lands in layer 1 with the full id span") {
    val star = (1L to 5L).map(i => (0L, i))
    assert(layers(star) == Seq((0L, 1L, 0L, 0L), (1L, 5L, 1L, 5L)))
  }
}
