package graft

import graft.operators.MapReduce.{TopKWords, WordCount}
import org.scalacheck.{Gen, Prop, Properties}

/** Properties of the bounded-heap top-k Aggregator (pure heap logic — no
  * cluster needed): agreement with sort-take, prefix stability, and merge
  * correctness over arbitrary partition splits. */
object TopKPropertySpec extends Properties("TopKWords") {

  private val genWords: Gen[List[WordCount]] = Gen.listOf(for {
    w <- Gen.choose('a', 'f').map(_.toString)
    s <- Gen.choose('a', 'f').map(_.toString)
    c <- Gen.choose(1L, 50L)
  } yield WordCount(w + s, c))

  private def ref(xs: List[WordCount], k: Int): Seq[WordCount] =
    xs.sortBy(wc => (-wc.cnt, wc.word)).take(k)

  private def viaAgg(xs: List[WordCount], k: Int, splitAt: Int)
      : Seq[WordCount] = {
    val agg = new TopKWords(k)
    val (l, r) = xs.splitAt(splitAt min xs.length)
    val hl = l.foldLeft(agg.zero)(agg.reduce)
    val hr = r.foldLeft(agg.zero)(agg.reduce)
    agg.finish(agg.merge(hl, hr))
  }

  property("equals sort-take under every partition split") =
    Prop.forAll(genWords, Gen.choose(1, 8), Gen.choose(0, 100)) {
      (xs: List[WordCount], k: Int, split: Int) =>
        viaAgg(xs, k, split) == ref(xs, k)
    }

  property("top-k(n) is a prefix of top-k(n+1)") =
    Prop.forAll(genWords, Gen.choose(1, 8)) { (xs: List[WordCount], k: Int) =>
      viaAgg(xs, k, xs.length / 2) ==
        viaAgg(xs, k + 1, xs.length / 2).take(k)
    }
}
