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

  /** Misra–Gries summary as a typed partial aggregate: the buffer is a
    * ≤ k-entry count map; `reduce` is the classic counter update, `merge`
    * the mergeable-summaries combination. Spark plans `select(toColumn)`
    * as ObjectHashAggregate with per-partition partial buffers — the
    * sketch never sees more than one partition's stream at a time and
    * every shuffled buffer is k-bounded. */
  final class MisraGries(k: Int)
      extends Aggregator[String, mutable.Map[String, Long],
        Map[String, Long]] {
    require(k >= 1, s"k must be >= 1, got $k")

    def zero: mutable.Map[String, Long] = mutable.Map.empty

    def reduce(m: mutable.Map[String, Long],
               w: String): mutable.Map[String, Long] = {
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
      m
    }

    def merge(a: mutable.Map[String, Long],
              b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
      b.foreach { case (w, c) => a.update(w, a.getOrElse(w, 0L) + c) }
      if (a.size > k) {
        // subtract the (k+1)-th largest count from everything and drop the
        // non-positive rest: ≤ k survivors, error grows by exactly that
        // subtracted value (which the PODS'12 bound pays for)
        val t = a.values.toArray.sortInPlaceWith(_ > _).apply(k)
        val dead = mutable.ArrayBuffer.empty[String]
        a.foreach { case (w, c) =>
          if (c - t <= 0L) dead += w else a.update(w, c - t)
        }
        dead.foreach(a.remove)
      }
      a
    }

    def finish(m: mutable.Map[String, Long]): Map[String, Long] = m.toMap

    def bufferEncoder: Encoder[mutable.Map[String, Long]] =
      Encoders.kryo[mutable.Map[String, Long]]
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Map[String, Long]]()
  }

  /** Exact heavy hitters of a token stream: every token whose count ≥
    * total/`support`, found via a k=`sketchK` Misra–Gries candidate pass +
    * exact recount. Requires `sketchK >= support` (the superset guarantee
    * above); the result is exactly `groupBy.count.filter` — pinned against
    * that form in `HeavyHittersSpec` — at a fraction of its shuffle.
    * Output: (word, cnt, share), count-descending then word. */
  def heavyHitters(tokens: Dataset[String], support: Long,
                   sketchK: Int): DataFrame = {
    require(sketchK >= support,
      s"sketchK ($sketchK) must be >= support ($support) or the sketch may" +
        " drop a true heavy hitter")
    val spark = tokens.sparkSession
    import spark.implicits._
    // one row, ≤ k entries — computed on executors, exploded to a frame
    // (never collected to the driver). The typed select is mandatory for
    // a TypedColumn; toDF then names the summary column for the explode.
    val cands = tokens.select(new MisraGries(sketchK).toColumn).toDF("m")
      .select(explode(map_keys(col("m"))).as("word"))
    val toks = tokens.toDF("word")
    // total BEFORE the candidate filter: the support threshold is relative
    // to the full stream
    val total = toks.agg(count(lit(1)).as("total"))
    toks
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
