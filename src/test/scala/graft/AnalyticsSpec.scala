package graft

import org.apache.spark.sql.functions._

/** Round-8 analytics operators: funnel progression, the time-RANGE
  * moving aggregate, the exact-integer chi-square panel, and the
  * total-variation drift monitor. The DuckDB gate owns cross-engine
  * equality; these pin the semantics. */
class AnalyticsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("funnel: stage times are monotone and stages only narrow") {
    val rows = SparkEntry.queries("events_funnel")(spark, d).collect()
    assert(rows.nonEmpty)
    var nView = 0; var nClick = 0; var nPurchase = 0
    rows.foreach { r =>
      // timestamp_ntz surfaces as LocalDateTime
      val v = r.getAs[java.time.LocalDateTime](1)
      val c = r.getAs[java.time.LocalDateTime](2)
      val p = r.getAs[java.time.LocalDateTime](3)
      assert(v != null, "funnel row without a view stage")
      nView += 1
      if (c != null) { nClick += 1; assert(!c.isBefore(v)) }
      else assert(p == null, "purchase stage reached without click")
      if (p != null) { nPurchase += 1; assert(!p.isBefore(c)) }
    }
    assert(nView >= nClick && nClick >= nPurchase)
    assert(nPurchase > 0, "fixture never converts — funnel untestable")
  }

  test("funnel: stage entry is at-or-after the previous stage " +
    "(hand-built timeline)") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-funnel").toString
    // user 1: click BEFORE first view must not count; the click at t=30
    //         (same instant as nothing) enters; purchase at t=30 equals
    //         click time → same-instant progression counts (>=)
    // user 2: view only
    val base = 1704067200000000L
    Seq(
      (1L, base + 10L, 1L, "click", 1.0, "{}"),   // pre-view click: ignored
      (2L, base + 20L, 1L, "view", 1.0, "{}"),
      (3L, base + 30L, 1L, "click", 1.0, "{}"),
      (4L, base + 30L, 1L, "purchase", 1.0, "{}"), // same instant as click
      (5L, base + 40L, 2L, "view", 1.0, "{}")
    ).toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("events_funnel")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[java.time.LocalDateTime](1),
          r.getAs[java.time.LocalDateTime](2),
          r.getAs[java.time.LocalDateTime](3))).toMap
    val u1 = out(1L)
    assert(u1._2 != null && u1._2.isAfter(u1._1),
      "pre-view click leaked into the funnel")
    assert(u1._3 != null && u1._3.equals(u1._2),
      "same-instant purchase after click must count (>= contract)")
    val u2 = out(2L)
    assert(u2._2 == null && u2._3 == null)
  }

  test("moving sum: frame is trailing one hour inclusive, peers included") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-movsum").toString
    val base = 1704067200000000L
    val hour = 3600000000L
    Seq(
      (1L, base, 1L, "view", 1.00, "{}"),
      (2L, base + hour, 1L, "view", 2.00, "{}"),        // exactly 1h later
      (3L, base + hour, 1L, "view", 4.00, "{}"),        // peer of event 2
      (4L, base + 2 * hour + 1L, 1L, "view", 8.00, "{}") // just past frame
    ).toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("events_moving_sum")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getDouble(3), r.getLong(4)))
      .toMap
    assert(out(1L) == (1.0, 1L))
    // frame start is INCLUSIVE (RANGE 1h PRECEDING): event 1 still in;
    // peers 2 and 3 both in each other's frame
    assert(out(2L) == (7.0, 3L))
    assert(out(3L) == (7.0, 3L))
    // event 4 is 1h+1µs after events 2/3 — outside the trailing hour,
    // so its frame holds only itself
    assert(out(4L) == (8.0, 1L))
  }

  test("chi2: cells are exhaustive, margins consistent, statistic " +
    "matches a direct computation") {
    val rows = SparkEntry.queries("events_chi2")(spark, d).collect()
    val t = rows.map(_.getLong(2)).sum
    assert(t > 0)
    // recompute margins from the cells and check each chi2_grid
    val byType = rows.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    val byBucket = rows.groupBy(_.getString(1)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    rows.foreach { row =>
      val o = BigInt(row.getLong(2))
      val r = BigInt(byType(row.getString(0)))
      val c = BigInt(byBucket(row.getString(1)))
      val dev = o * t - r * c
      assert(BigInt(row.getLong(4)) == dev * dev * 1000 / (r * c * t))
      assert(BigInt(row.getLong(3)) == r * c * 1000 / t)
    }
  }

  test("quantiles: non-decreasing in p, values exist in the data, " +
    "p50 matches the rank-median for odd groups") {
    val rows = SparkEntry.queries("events_quantiles")(spark, d).collect()
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1)).map(_.getDouble(2)).toSeq
      assert(sorted == sorted.sorted, "quantiles not monotone in p")
    }
    // every quantile is a value that exists for its type (type-1 contract)
    val vals = Tables.events(spark, d).filter(col("value").isNotNull)
      .select(col("event_type"),
        (floor(col("value") * 100.0 + 0.5) / 100.0).as("v"))
      .collect().groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(1)).toSet).toMap
    rows.foreach(r => assert(vals(r.getString(0)).contains(r.getDouble(2))))
  }

  test("transitions: per-row probabilities sum to ~1e6 and pair counts " +
    "equal events minus chain starts") {
    val rows = SparkEntry.queries("events_transitions")(spark, d).collect()
    val byFrom = rows.groupBy(_.getString(0))
    byFrom.foreach { case (from, rs) =>
      val psum = rs.map(_.getLong(3)).sum
      // each cell floors individually: total in (1e6 - k, 1e6]
      assert(psum <= 1000000L && psum > 1000000L - rs.length,
        s"$from probabilities sum to $psum")
    }
    val nPairs = rows.map(_.getLong(2)).sum
    val base = Tables.events(spark, d)
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_type").isNotNull)
    val nEvents = base.count()
    val nUsers = base.select(col("user_id")).distinct().count()
    assert(nPairs == nEvents - nUsers,
      "every non-final event must contribute exactly one transition")
  }

  test("cohort retention: offsets non-negative and offset-0 covers the " +
    "whole cohort") {
    val rows = SparkEntry.queries("q30_cohort_retention")(spark, d)
      .collect()
    assert(rows.forall(_.getLong(1) >= 0L))
    // offset 0 row of each cohort counts every customer whose first
    // order is in that month
    val first = Tables.orders(spark, d)
      .groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate")).as("f"))
      .select(date_trunc("month", col("f")).as("m"))
      .groupBy(col("m")).count()
      .collect().map(r => r.getTimestamp(0).toInstant -> r.getLong(1))
      .toMap
    val zero = rows.filter(_.getLong(1) == 0L)
    assert(zero.nonEmpty)
    zero.foreach { r =>
      val m = r.getAs[java.time.LocalDateTime](0)
        .toInstant(java.time.ZoneOffset.UTC)
      assert(first(m) == r.getLong(2),
        s"cohort $m offset-0 count ${r.getLong(2)} != cohort size")
    }
  }

  test("inverted index: heads are the 20 smallest postings, df " +
    "consistent, and a term's head matches a direct scan") {
    val rows = SparkEntry.queries("text_inverted_index")(spark, d)
      .collect()
    // postings_head is string-serialized for the driver gate (house
    // convention, see GateSchemaSpec) — decode before asserting
    def head(r: org.apache.spark.sql.Row): Seq[Long] =
      r.getString(2).split(",").toSeq.map(_.toLong)
    rows.foreach { r =>
      val h = head(r)
      assert(h.length <= 20 && h.nonEmpty)
      assert(h == h.sorted, "posting head not sorted")
      assert(r.getLong(1) >= h.length)
      if (r.getLong(1) <= 20) assert(r.getLong(1) == h.length)
    }
    val term = rows.head.getString(0)
    val direct = Tables.documents(spark, d)
      .select(col("doc_id"),
        graft.queries.TextOps.tokens(col("text")).as("toks"))
      .filter(array_contains(col("toks"), term))
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.take(20)
    assert(head(rows.head) == direct.toSeq)
  }

  test("sparse cosine pairs: near-dups surface, disjoint docs don't, " +
    "cosine bounded and threshold respected") {
    val rows = SparkEntry.queries("text_cosine_pairs")(spark, d).collect()
    assert(rows.nonEmpty, "fixture has dup clusters — pairs must surface")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pair not in a < b form")
      val cos = r.getDouble(3)
      // ≥ the documented 0.5 threshold (integer cross-multiplied gate),
      // ≤ 1 + float headroom (Cauchy–Schwarz on the exact integers)
      assert(cos >= 0.5 - 1e-9 && cos <= 1.0 + 1e-9, s"cosine $cos")
      assert(r.getLong(2) >= 1, "pair with no shared terms")
    }
    // an exact-dup pair (identical raw text, both docs tokenized) must
    // score cosine ≈ 1 — identical vectors survive any df cap identically
    val dup = Tables.documents(spark, d)
      .filter(col("text").rlike("[a-zA-Z]"))
      .groupBy(col("text"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"),
        count(lit(1)).as("n"))
      .filter(col("n") >= 2).orderBy(col("ids")).limit(1).collect()
    if (dup.nonEmpty) {
      val ids = dup.head.getSeq[Long](1).take(2)
      val hit = rows.find(r =>
        r.getLong(0) == ids(0) && r.getLong(1) == ids(1))
      assert(hit.isDefined, s"exact-dup pair $ids missing")
      assert(hit.get.getDouble(3) > 0.999)
    }
    // drop the query's tracked persists: a still-cached postings frame
    // would make PlanAuditSpec's rebuild of the same plan collapse into
    // an InMemoryRelation scan, hiding the join shape it audits
    Caching.releaseAll(); spark.catalog.clearCache()
  }

  test("curation pipeline: attrition is monotone per source and totals " +
    "shrink at quality/decontam/near-dup stages") {
    val rows = SparkEntry.queries("docs_curation_pipeline")(spark, d)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val seq = (1 to 5).map(r.getLong)
      assert(seq.zip(seq.tail).forall { case (a, b) => a >= b },
        s"${r.getString(0)} attrition not monotone: $seq")
      assert(r.getLong(6) >= r.getLong(5) * 20,
        "final docs must carry >= 20 tokens each (the quality gate)")
    }
    val tot = (1 to 5).map(i => rows.map(_.getLong(i)).sum)
    assert(tot.head > tot.last, "no stage removed anything")
  }

  test("length histogram: bucket k bounds [2^(k-1), 2^k)") {
    val rows = SparkEntry.queries("docs_length_histogram")(spark, d)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getLong(0)
      val lo = 1L << (k - 1).toInt; val hi = 1L << k.toInt
      assert(r.getLong(3) >= lo && r.getLong(4) < hi,
        s"bucket $k holds [${r.getLong(3)}, ${r.getLong(4)}]")
    }
  }

  test("pareto deciles: balanced, shares non-increasing, summing to " +
    "~1e6 on the grid") {
    val rows = SparkEntry.queries("q33_pareto_deciles")(spark, d).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    val n = rows.map(_.getLong(1))
    assert(n.max - n.min <= 1)
    val shares = rows.map(_.getLong(3)).toSeq
    assert(shares == shares.sorted.reverse, "shares must decrease")
    val sum = shares.sum
    assert(sum <= 1000000L && sum > 1000000L - 10)
  }

  test("cluster-size histogram accounts for every document") {
    val rows = SparkEntry.queries("dedup_cluster_sizes")(spark, d)
      .collect()
    val nDocs = Tables.documents(spark, d).count()
    val covered = rows.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(covered == nDocs,
      s"histogram covers $covered of $nDocs docs")
    // singletons exist and some true cluster (size >= 2) exists at sf0.001
    assert(rows.exists(_.getLong(0) == 1L))
    assert(rows.exists(_.getLong(0) >= 2L))
  }

  test("vocab OOV: rates in [0, 1e6], and a doc of only top terms " +
    "scores zero") {
    val rows = SparkEntry.queries("docs_vocab_oov")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
      assert(r.getLong(2) <= r.getLong(1))
    }
    // the sf0.001 synthetic vocabulary is smaller than the 100-term cut,
    // so coverage must be TOTAL (every rate exactly zero) — the
    // convergent sanity; a corpus with a >100-term vocabulary must leak
    val nDistinct = Tables.documents(spark, d)
      .select(explode(graft.queries.TextOps.tokens(col("text"))))
      .distinct().count()
    if (nDistinct <= 100) assert(rows.forall(_.getLong(3) == 0L))
    else assert(rows.map(_.getLong(2)).sum > 0)
    // and a hand corpus with >100 distinct terms leaks exactly the rare
    // word: 150 fillers (faa..ffr, all alphabetically before zzyzzx)
    // fill the vocab cut; zzyzzx at count 1 falls outside the top-100
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-oov").toString
    val abc = "abcdefghijklmnopqrstuvwxyz"
    val fillers = (0 until 150)
      .map(i => s"f${abc(i / 26)}${abc(i % 26)}").mkString(" ")
    Seq((1L, "alpha beta zzyzzx"),
      (2L, ("alpha beta " * 5) + fillers))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("docs_vocab_oov")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == 1L, s"rare-term OOV: got ${out(1L)}")
  }

  test("sql bm25 equals the DataFrame twin row for row") {
    val sqlR = SparkEntry.queries("sql_bm25_topk")(spark, d).collect()
    val dfR = SparkEntry.queries("text_bm25_topk")(spark, d).collect()
    assert(sqlR.map(_.toString).toSeq == dfR.map(_.toString).toSeq)
  }

  test("winnow pairs: a shared long span surfaces; fragmented overlap " +
    "does not") {
    import spark.implicits._
    val span = "the quick brown fox jumps over the lazy dog again and " +
      "again until the very end of the shared passage block here"
    val pad1 = "completely unrelated preamble text for document one " * 3
    val pad2 = "entirely different trailing content for document two " * 3
    val docs = Seq(
      (1L, s"$pad1 $span"),
      (2L, s"$span $pad2"),
      (3L, pad1 + " " + pad2)).toDF("doc_id", "text")
    // replicate the gated query's shape over a hand corpus
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val fps = docs.select(col("doc_id"),
      explode(graft.functions.GraftFunctions.winnow(col("text"))).as("fp"))
    val shared = fps.select(col("doc_id").as("a"), col("fp"))
      .join(fps.select(col("doc_id").as("b"), col("fp")), "fp")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // the 1-2 pair shares the long span's fingerprints; any 1-3/2-3
    // overlap is incidental single-gram noise, far below it
    val spanShared = shared((1L, 2L))
    assert(spanShared >= 10, s"span pair only shares $spanShared fps")
    assert(shared.getOrElse((1L, 3L), 0L) < spanShared / 2)
  }

  test("containment catches a quote-inclusion pair Jaccard misses") {
    import spark.implicits._
    // B embeds A verbatim plus 3x more text: containment(A in B) = 1.0
    // but Jaccard ~ |A|/|B| ~ 0.25 — below any sane Jaccard threshold
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // all-letter filler words (the tokenizer strips digits, so numbered
    // filler would collapse to one repeated bigram)
    val abc = "abcdefghijklmnopqrstuvwxyz"
    val filler = (0 until 30)
      .map(i => s"f${abc(i / 26)}${abc(i % 26)}x").mkString(" ")
    val docs = Seq((1L, a), (2L, s"$a $filler"))
      .toDF("doc_id", "text")
    val cont = graft.queries.Dedup.containmentPairs(docs, 0.8).collect()
    assert(cont.length == 1)
    assert(cont.head.getLong(0) == 1L && cont.head.getLong(1) == 2L)
    assert(cont.head.getDouble(3) == 1.0, "A fully contained in B")
    assert(cont.head.getDouble(4) < 0.5)
    val jac = graft.queries.Dedup.jaccardPairs(docs, 0.6).collect()
    assert(jac.isEmpty, "Jaccard at 0.6 should miss the inclusion pair")
  }

  test("anomaly: flags exactly the >3-sigma outlier, strict at the " +
    "boundary") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-anom").toString
    // group 'a': ten 10.00s and one 110.00 — the outlier's z is huge;
    // group 'b': constant values — zero variance, nothing flagged
    val rows = (1L to 10L).map(i => (i, 1704067200000000L + i, 1L, "a",
      10.0, "{}")) ++ Seq((11L, 1704067200000011L, 1L, "a", 110.0, "{}")) ++
      (20L to 24L).map(i => (i, 1704067200000000L + i, 2L, "b", 7.0, "{}"))
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("events_anomaly")(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(11L),
      s"expected only the outlier, got ${out.map(_.getLong(0)).toSeq}")
  }

  test("basket lift: hand-checked co-occurrence arithmetic") {
    val rows = SparkEntry.queries("q31_basket_lift")(spark, d).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    // support non-increasing down the list
    val support = rows.map(_.getLong(2)).toSeq
    assert(support == support.sorted.reverse)
    // recompute lift_grid for the top pair from its own row's margins
    val items = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nOrders = items.select(col("l_orderkey")).distinct().count()
    rows.take(5).foreach { r =>
      val expect = r.getLong(2) * nOrders * 1000000L /
        (r.getLong(3) * r.getLong(4))
      assert(r.getLong(5) == expect)
    }
  }

  test("rfm: scores are balanced quintiles over the customer dimension") {
    val rows = SparkEntry.queries("q32_rfm_segments")(spark, d).collect()
    val n = rows.length
    assert(n > 0)
    for (idx <- Seq(4, 5, 6)) {
      val hist = rows.groupBy(_.getLong(idx)).view.mapValues(_.length)
      assert(hist.keySet == Set(1L, 2L, 3L, 4L, 5L))
      assert(hist.values.max - hist.values.min <= 1,
        s"ntile buckets unbalanced: $hist")
    }
    // monetary quintile 1 really is the highest-spend fifth
    val byScore = rows.groupBy(_.getLong(6))
    val top = byScore(1L).map(_.getDouble(3)).min
    val bottom = byScore(5L).map(_.getDouble(3)).max
    assert(top >= bottom)
  }

  test("tvd: zero for an identically-mixed corpus, bounded by the grid, " +
    "and positive when a source deviates") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tvd").toString
    // srcA and srcB share the corpus mix exactly (1:1 en/de) → tvd 0;
    // srcC is all-en → tvd strictly positive
    Seq(
      (1L, "t", "en", "srcA", 1L), (2L, "t", "de", "srcA", 1L),
      (3L, "t", "en", "srcB", 1L), (4L, "t", "de", "srcB", 1L),
      (5L, "t", "en", "srcC", 1L), (6L, "t", "en", "srcC", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("docs_source_tvd")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // corpus: srcA 1en/1de, srcB 1en/1de, srcC 2en → mix 4en:2de
    // srcA p=(.5,.5) vs q=(2/3,1/3): tv=1/6 → 166666
    assert(out("srcA") == 166666L)
    assert(out("srcB") == 166666L)
    // srcC p=(1,0) vs q=(2/3,1/3): tv=1/3 → 333333
    assert(out("srcC") == 333333L)
    // fixture sweep: every tvd in [0, 1e6]
    val fix = SparkEntry.queries("docs_source_tvd")(spark, d).collect()
    assert(fix.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= 1000000L))
  }
}
