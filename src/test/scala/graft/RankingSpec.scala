package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Round-8 ranking/link-analysis operators: BM25 retrieval, fixed-
  * iteration PageRank, the salted skew join, and the Gram-matrix
  * sufficient statistics. Correctness vs the DuckDB oracle is the gate's
  * job; these pin the SEMANTIC invariants and the plan shapes that keep
  * each operator scalable. */
class RankingSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, d)
      .queryExecution.explainString(FormattedMode)

  // ------------------------------------------------------------- BM25

  test("bm25: per-query ranks are dense 1..k with non-increasing scores") {
    val rows = SparkEntry.queries("text_bm25_topk")(spark, d).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq)
      val scores = sorted.map(_.getLong(3)).toSeq
      assert(scores == scores.sorted.reverse, "scores not non-increasing")
      assert(scores.forall(_ > 0))
      assert(sorted.map(_.getLong(4)).forall(n => n == 1L || n == 2L))
    }
  }

  test("bm25: every returned document contains a term of its query") {
    val top = SparkEntry.queries("text_bm25_topk")(spark, d)
      .select(col("query_id"), col("doc_id"))
    val qterms = Map(0L -> Seq("scan", "column"), 1L -> Seq("window",
      "order"), 2L -> Seq("hash", "join"), 3L -> Seq("stream", "filter"),
      4L -> Seq("spark", "merge"))
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"),
        graft.queries.TextOps.tokens(col("text")).as("toks"))
    val joined = top.join(docs, "doc_id").collect()
    joined.foreach { r =>
      val toks = r.getSeq[String](2).toSet
      val qid = r.getLong(1)
      assert(qterms(qid).exists(toks.contains),
        s"doc ${r.getLong(0)} ranked for query $qid without any term")
    }
  }

  test("bm25: length normalization — equal tf, shorter doc scores higher") {
    // tfn6 = (44·tf·Ā·1e6) div (20·tf·Ā + 6·Ā + 18·dl) is strictly
    // decreasing in dl for fixed tf — check the algebra at a few points
    def tfn(tf: Long, dl: Long, avg: Long): Long =
      (44L * tf * avg * 1000000L) / (20L * tf * avg + 6L * avg + 18L * dl)
    assert(tfn(3, 50, 100) > tfn(3, 100, 100))
    assert(tfn(3, 100, 100) > tfn(3, 500, 100))
    // and increasing, saturating, in tf for fixed dl
    assert(tfn(1, 100, 100) < tfn(2, 100, 100))
    assert(tfn(50, 100, 100) < (2200000L))  // < k1+1 = 2.2 ceiling
  }

  test("bm25 plan: query terms broadcast onto postings; top-k is a " +
    "bounded group limit") {
    val p = plan("text_bm25_topk")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("WindowGroupLimit"))
  }

  // --------------------------------------------------------- PageRank

  test("pagerank plan: global top-50 is a bounded heap, not a " +
    "single-partition window over all nodes") {
    assert(plan("q28_pagerank_parts").contains("TakeOrderedAndProject"))
  }

  test("pagerank: supplier hubs dominate, ranks positive, mass bounded") {
    val rows = SparkEntry.queries("q28_pagerank_parts")(spark, d).collect()
    assert(rows.length == 50)
    // sf0.001: 10 suppliers × ~200 parts — suppliers are the hubs and
    // must out-rank every part node
    assert(rows.head.getString(1).startsWith("s:"),
      s"top node ${rows.head.getString(1)} is not a supplier hub")
    assert(rows.take(10).forall(_.getString(1).startsWith("s:")))
    assert(rows.forall(_.getLong(2) > 0))
    // total mass never exceeds the initial 1e12 (dangling leak only
    // removes mass; the grid divisions only round down)
    val total = SparkEntry.queries("q28_pagerank_parts")(spark, d)
      .agg(sum(col("rank_grid"))).collect()(0).getLong(0)
    assert(total <= 1000000000000L)
  }

  test("pagerank: a hand-built 3-node chain propagates as computed") {
    // a <-> b <-> c (undirected): degrees a=1, b=2, c=1, n=3.
    // r0 = 333333333333 each.
    // in_mass(a) = r0(b) div 2 = 166666666666; in_mass(b) = r0(a) +
    // r0(c) = 666666666666; base = (333333333333*15) div 100 =
    // 49999999999 (floor); r1(a) = base + (85*166666666666) div 100
    import spark.implicits._
    val nodes = Seq("a", "b", "c").toDF("node")
    val e0 = Seq(("a", "b"), ("b", "c")).toDF("a", "b")
    val edges = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
    val deg = edges.groupBy(col("a")).agg(count(lit(1)).as("deg"))
    val withDeg = edges.join(deg, "a")
    val nn = nodes.agg(count(lit(1)).as("n"))
    val r0 = nodes.crossJoin(broadcast(nn))
      .select(col("node"), col("n"), expr("1000000000000 div n").as("rank"))
    val mass = withDeg
      .join(r0.select(col("node").as("a"), col("rank")), "a")
      .select(col("b").as("node"), expr("rank div deg").as("contrib"))
      .groupBy(col("node")).agg(sum(col("contrib")).as("in_mass"))
    val r1 = nodes.crossJoin(broadcast(nn))
      .join(mass, Seq("node"), "left_outer")
      .select(col("node"),
        (expr("((1000000000000 div n) * 15) div 100") +
          expr("(85 * coalesce(in_mass, 0)) div 100")).as("rank"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = (1000000000000L / 3 * 15) / 100
    assert(r1("a") == base + 85L * (1000000000000L / 3 / 2) / 100)
    assert(r1("b") == base + 85L * (2 * (1000000000000L / 3)) / 100)
    assert(r1("c") == r1("a"))
  }

  // ------------------------------------------------------ salted join

  test("salted join equals the plain join (any bucket count)") {
    val fact = Tables.lineitem(spark, d)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    val dim = Tables.supplier(spark, d)
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    for (buckets <- Seq(1, 7, 16)) {
      val salted = graft.operators.ScaleOps
        .saltedJoin(fact, dim, "l_suppkey", buckets)
        .select(col("l_orderkey"), col("l_linenumber"), col("s_name"))
      val plain = fact.join(dim, "l_suppkey")
        .select(col("l_orderkey"), col("l_linenumber"), col("s_name"))
      assert(salted.exceptAll(plain).isEmpty &&
        plain.exceptAll(salted).isEmpty,
        s"salted join diverges from plain join at buckets=$buckets")
    }
  }

  test("salted join query plans the shuffled hash join it exists for") {
    val p = plan("q29_join_salted_skew")
    assert(p.contains("ShuffledHashJoin"),
      "salted join fell back to broadcast — the salt would be pointless")
    assert(!p.contains("__salt "), "salt column leaked into the output")
  }

  // ------------------------------------------------------- covariance

  test("gram matrix: upper triangle only, constant n, exact diagonal") {
    val out = SparkEntry.queries("emb_covariance")(spark, d).collect()
    val dim = out.map(_.getLong(0)).max
    assert(out.length == dim * (dim + 1) / 2)
    assert(out.forall(r => r.getLong(1) >= r.getLong(0)))
    assert(out.map(_.getLong(2)).distinct.length == 1, "n_vecs varies")
    // diagonal entries are sums of squares: non-negative
    out.filter(r => r.getLong(0) == r.getLong(1))
      .foreach(r => assert(r.getDouble(3) >= 0.0))
    // spot-check S_11 against a direct gridded computation
    val direct = Tables.embeddings(spark, d)
      .select((floor(element_at(col("embedding"), 1).cast("double")
        * 1000000.0 + 0.5).cast("long") *
        floor(element_at(col("embedding"), 1).cast("double")
          * 1000000.0 + 0.5).cast("long")).as("sq"))
      .agg(sum(col("sq"))).collect()(0).getLong(0)
    val s11 = out.find(r => r.getLong(0) == 1 && r.getLong(1) == 1).get
      .getDouble(3)
    assert(s11 == direct.toDouble / 1e12)
  }
}
