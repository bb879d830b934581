package graft

import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

/** The Misra–Gries sketch's contract: candidates are a SUPERSET of every
  * item with true count > N/(k+1) — under forced evictions (k far below
  * the vocabulary) and forced merges (many partitions) — and the full
  * two-pass heavyHitters() lands on exactly the groupBy-count-filter
  * answer. */
class HeavyHittersSpec extends SparkSpec {

  /** A skewed synthetic stream: a few hot items + a long uniform tail,
    * shuffled deterministically. */
  private def stream(seed: Int, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val hot = Seq.fill(n / 4)("hot1") ++ Seq.fill(n / 8)("hot2") ++
      Seq.fill(n / 16)("hot3")
    val tail = Seq.fill(n - hot.size)(s"w${rnd.nextInt(500)}")
    rnd.shuffle(hot ++ tail)
  }

  private def mgCandidates(items: Seq[String], k: Int,
                           partitions: Int): Set[String] = {
    import spark.implicits._
    val ds = spark.createDataset(items).repartition(partitions)
    ds.select(new HeavyHitters.MisraGries(k).toColumn).toDF("m", "n")
      .select(explode(map_keys(col("m"))).as("w"))
      .as[String].collect().toSet
  }

  test("sketch candidates are a superset of true heavy hitters under " +
    "evictions and merges") {
    for (seed <- 1 to 3; k <- Seq(8, 32, 100)) {
      val items = stream(seed, 4000)
      val n = items.size.toLong
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val mustSurvive = exact.collect {
        case (w, c) if c * (k + 1) > n => w
      }.toSet
      val cands = mgCandidates(items, k, partitions = 7)
      assert(cands.size <= k, s"summary exceeded k=$k: ${cands.size}")
      val lost = mustSurvive -- cands
      assert(lost.isEmpty,
        s"seed=$seed k=$k lost true heavy hitters: $lost")
    }
  }

  test("two-pass heavyHitters equals the exact groupBy-count-filter form") {
    import spark.implicits._
    val items = stream(seed = 42, n = 5000)
    val ds = spark.createDataset(items).repartition(5)
    val support = 50L // threshold = N/50 = 100 occurrences
    val got = HeavyHitters.heavyHitters(ds, support, sketchK = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val n = items.size.toLong
    val expect = items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * support >= n }
      .toSeq.map { case (w, c) => (w, c, c.toDouble / n) }
      .sortBy { case (w, c, _) => (-c, w) }
    assert(got.toSeq === expect)
    assert(got.nonEmpty) // the skewed stream must actually produce hitters
  }

  test("the sketch pass carries the exact stream length") {
    import spark.implicits._
    val items = stream(seed = 7, n = 3000)
    val ds = spark.createDataset(items).repartition(6)
    val n = ds.select(new HeavyHitters.MisraGries(16).toColumn)
      .toDF("m", "n").select(col("n")).as[Long].head()
    assert(n === items.size.toLong)
  }

  test("empty input yields an empty result") {
    import spark.implicits._
    val ds = spark.emptyDataset[String]
    assert(HeavyHitters.heavyHitters(ds, 1000L, 2000).collect().isEmpty)
  }

  test("sketchK below support is rejected loudly") {
    import spark.implicits._
    val ds = spark.createDataset(Seq("a"))
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(ds, support = 1000L, sketchK = 10)
    }
    assert(e.getMessage.contains("sketchK"))
  }

  test("gated query matches its oracle semantics on a controlled corpus") {
    // tiny corpus where the exact answer is hand-checkable: 'the' is 25%
    // of the stream, everything else is far below any 0.1% threshold only
    // if vocabulary is large — here all words pass; the point is exactness
    // of counts and shares, not selectivity (the fixture corpus pins that)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-hh").toString
    Seq(
      (0L, "the cat the dog", "en", "web", 0L),
      (1L, "the bird", "en", "web", 0L),
      (2L, null.asInstanceOf[String], "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextOps.queries("text_heavy_hitters")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out === Seq(("the", 3L), ("bird", 1L), ("cat", 1L), ("dog", 1L)))
  }
}
