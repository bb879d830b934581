package graft

import graft.queries.Similarity

/** Integer power-iteration PCA (`emb_pca_project`): component shape,
  * sign-pin canonicalization, and the variance semantics — the first
  * direction must capture at least as much uncentered second moment per
  * unit norm (Rayleigh quotient) as the deflated second. */
class PcaSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("components are d-length, max-grid-normalized, and sign-pinned") {
    val (v1, v2) = Similarity.pcaComponents(spark, d)
    assert(v1.length === 64 && v2.length === 64)
    // renormalization maps the max-|w| component to exactly the 1e6 grid
    assert(v1.map(math.abs).max === 1000000L)
    assert(v2.map(math.abs).max === 1000000L)
    // canonical sign: first nonzero component positive
    assert(v1.find(_ != 0L).forall(_ > 0L))
    assert(v2.find(_ != 0L).forall(_ > 0L))
  }

  test("leg 1 dominates leg 2 in Rayleigh quotient over the projections") {
    val (v1, v2) = Similarity.pcaComponents(spark, d)
    val rows = SparkEntry.queries("emb_pca_project")(spark, d).collect()
    assert(rows.nonEmpty)
    def sumSq(i: Int): BigInt =
      rows.foldLeft(BigInt(0))((a, r) => a + BigInt(r.getLong(i)).pow(2))
    val n1 = v1.foldLeft(BigInt(0))((a, x) => a + BigInt(x).pow(2))
    val n2 = v2.foldLeft(BigInt(0))((a, x) => a + BigInt(x).pow(2))
    // Σp1²/‖v1‖² >= Σp2²/‖v2‖², exact integer cross-multiplication
    assert(sumSq(1) * n2 >= sumSq(2) * n1,
      s"rayleigh1=${sumSq(1) / n1} < rayleigh2=${sumSq(2) / n2}")
    // deflation produced a genuinely different direction (|cos| bounded
    // away from 1; near-degenerate top eigenvalues keep it from being
    // near-orthogonal on this isotropic fixture)
    val dot = (0 until 64).foldLeft(BigInt(0))((a, j) =>
      a + BigInt(v1(j)) * BigInt(v2(j)))
    assert(dot * dot * 4 < n1 * n2, s"|cos(v1,v2)| >= 0.5 (dot=$dot)")
  }

  test("isqrtSeeded is the exact integer sqrt at squares, neighbors, " +
    "and large values; the 1e30 guard fails loudly") {
    for (n <- Seq(BigInt(0), BigInt(1), BigInt(2), BigInt(3), BigInt(4),
        BigInt(99), BigInt(100), BigInt(101),
        BigInt("123456789012345678"), BigInt(10).pow(29))) {
      val r = Similarity.isqrtSeeded(n)
      assert(r * r <= n.max(1), s"isqrt($n)=$r overshoots")
      assert((r + 1) * (r + 1) > n, s"isqrt($n)=$r undershoots")
    }
    // divisor use: isqrt(0) is floored at 1
    assert(Similarity.isqrtSeeded(BigInt(0)) === BigInt(1))
    intercept[IllegalArgumentException] {
      Similarity.isqrtSeeded(BigInt(10).pow(30))
    }
  }

  test("whitening divides each projection by its direction's integer " +
    "eigenvalue sqrt — replayable from pcaSolve exactly") {
    val (_, _, u1, u2) = Similarity.pcaSolve(spark, d)
    val r1 = Similarity.isqrtSeeded(u1)
    val r2 = Similarity.isqrtSeeded(u2)
    assert(u1 >= u2, "leg-1 Rayleigh must dominate on the original Gram")
    val proj = SparkEntry.queries("emb_pca_project")(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val whit = SparkEntry.queries("emb_whiten_project")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(whit.nonEmpty)
    def floorDiv(p: BigInt, r: BigInt): Long = {
      val m = ((p % r) + r) % r
      ((p - m) / r).toLong
    }
    whit.foreach { case (id, w1, w2) =>
      val (p1, p2) = proj(id)
      assert(w1 === floorDiv(BigInt(p1), r1), s"w1 diverged for vec $id")
      assert(w2 === floorDiv(BigInt(p2), r2), s"w2 diverged for vec $id")
    }
  }
}
