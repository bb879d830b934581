package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Frequent-item (heavy-hitter) detection at corpus scale: a bounded-memory
  * Misra–Gries sketch generates a small candidate set in one pass, then an
  * exact recount over ONLY the candidates produces the exact answer.
  *
  * Why not `groupBy(word).count()` directly? At 100 TB the token vocabulary
  * is ~10⁹ keys, so the full-count shuffle carries the entire vocabulary —
  * almost all of it destined to be filtered out by the support threshold.
  * The two-pass sketch plan shuffles (a) k-bounded sketch buffers (k ≈ 2000
  * entries per partition regardless of data size) and (b) the recount of
  * candidate tokens only — a broadcast semi-join keeps every non-candidate
  * token out of the second shuffle entirely. The FINAL OUTPUT IS EXACT: the
  * sketch only proposes candidates, the recount decides.
  *
  * Guarantee (Misra–Gries '82; merge form per Agarwal et al., "Mergeable
  * Summaries", PODS'12): a k-counter summary undercounts any item by at most
  * N/(k+1), and merging two summaries (sum counts, then subtract the
  * (k+1)-th largest count and drop non-positives) adds the errors — still
  * ≤ N/(k+1) over the union. Hence every item with true count > N/(k+1)
  * survives in the merged summary. With support threshold N/s (s = 1000
  * below) and k ≥ s, the candidate set is a PROVEN superset of the true
  * heavy hitters (pinned by property test in `HeavyHittersSpec`), so the
  * recount misses nothing.
  */
object HeavyHitters {

  /** Sketch buffer: the ≤ k-entry Misra–Gries counter map PLUS the exact
    * stream length — one extra Long per buffer buys the support
    * denominator without a third pass over the corpus. */
  final case class MgBuf(counts: mutable.Map[String, Long], var n: Long)

  /** Misra–Gries summary as a typed partial aggregate: `reduce` is the
    * classic counter update, `merge` the mergeable-summaries combination.
    * Spark plans `select(toColumn)` as ObjectHashAggregate with
    * per-partition partial buffers — the sketch never sees more than one
    * partition's stream at a time and every shuffled buffer is
    * k-bounded. Output: (candidate counts, exact total). */
  final class MisraGries(k: Int)
      extends Aggregator[String, MgBuf, (Map[String, Long], Long)] {
    require(k >= 1, s"k must be >= 1, got $k")

    def zero: MgBuf = MgBuf(mutable.Map.empty, 0L)

    def reduce(b: MgBuf, w: String): MgBuf = {
      b.n += 1
      val m = b.counts
      m.get(w) match {
        case Some(c) => m.update(w, c + 1)
        case None if m.size < k => m.update(w, 1L)
        case None =>
          // decrement-all: charges 1 to each of k counters plus the new
          // item — each such step retires k+1 stream occurrences, bounding
          // total decrements by N/(k+1). O(k) here, amortized O(1)/item.
          val dead = mutable.ArrayBuffer.empty[String]
          m.foreach { case (key, c) =>
            if (c == 1L) dead += key else m.update(key, c - 1)
          }
          dead.foreach(m.remove)
      }
      b
    }

    def merge(a: MgBuf, b: MgBuf): MgBuf = {
      a.n += b.n
      val m = a.counts
      b.counts.foreach { case (w, c) => m.update(w, m.getOrElse(w, 0L) + c) }
      if (m.size > k) {
        // subtract the (k+1)-th largest count from everything and drop the
        // non-positive rest: ≤ k survivors, error grows by exactly that
        // subtracted value (which the PODS'12 bound pays for)
        val t = m.values.toArray.sortInPlaceWith(_ > _).apply(k)
        val dead = mutable.ArrayBuffer.empty[String]
        m.foreach { case (w, c) =>
          if (c - t <= 0L) dead += w else m.update(w, c - t)
        }
        dead.foreach(m.remove)
      }
      a
    }

    def finish(b: MgBuf): (Map[String, Long], Long) = (b.counts.toMap, b.n)

    def bufferEncoder: Encoder[MgBuf] = Encoders.kryo[MgBuf]
    def outputEncoder: Encoder[(Map[String, Long], Long)] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(Map[String, Long], Long)]()
  }

  /** Exact heavy hitters of a token stream: every token whose count ≥
    * total/`support`, found via a k=`sketchK` Misra–Gries candidate pass +
    * exact recount. Requires `sketchK >= support` (the superset guarantee
    * above); the result is exactly `groupBy.count.filter` — pinned against
    * that form in `HeavyHittersSpec` — at a fraction of its shuffle, in
    * exactly TWO corpus passes (the sketch pass also carries the exact
    * stream length, and the one-row sketch frame is persisted so the
    * candidate explode and the total read it, not the corpus).
    * Output: (word, cnt, share), count-descending then word. */
  def heavyHitters(tokens: Dataset[String], support: Long,
                   sketchK: Int): DataFrame = {
    require(support >= 1,
      s"support ($support) must be >= 1 — a non-positive support makes" +
        " the cnt*support >= total threshold unsatisfiable")
    require(sketchK >= support,
      s"sketchK ($sketchK) must be >= support ($support) or the sketch may" +
        " drop a true heavy hitter")
    // one row: (≤ k-entry candidate map, exact total) — computed on
    // executors (never collected to the driver) and persisted so its two
    // consumers cost one corpus pass, not two
    val sketch = graft.Caching.persistTracked(
      tokens.select(new MisraGries(sketchK).toColumn).toDF("m", "total"))
    val cands = sketch.select(explode(map_keys(col("m"))).as("word"))
    val total = sketch.select(col("total"))
    tokens.toDF("word")
      .join(broadcast(cands), Seq("word"), "left_semi")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * lit(support) >= col("total"))
      .select(col("word"), col("cnt"),
        (col("cnt").cast("double") / col("total")).as("share"))
      .orderBy(col("cnt").desc, col("word").asc)
  }
}
