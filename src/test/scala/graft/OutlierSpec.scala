package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Embedding-outlier triage (`emb_outliers`): the planted far vector ranks
  * first, d2 matches a direct integer computation, and the list is
  * per-label (a vector is judged against ITS label's centroid only). */
class OutlierSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-outlier").toString
    // label 0: three vectors near (1, 0) and one planted far at (9, 9);
    // label 1: two identical vectors (distance 0 to their centroid)
    val rows = Seq(
      (0L, 0, Array(1.0f, 0.0f)),
      (1L, 0, Array(1.1f, 0.1f)),
      (2L, 0, Array(0.9f, -0.1f)),
      (3L, 0, Array(9.0f, 9.0f)), // the outlier
      (4L, 1, Array(5.0f, 5.0f)),
      (5L, 1, Array(5.0f, 5.0f)))
    rows.toDF("vec_id", "label", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private lazy val out =
    graft.queries.Similarity.queries("emb_outliers")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("the planted far vector ranks first") {
    assert(out.head._1 === 3L)
    assert(out.length === 6)
  }

  test("identical vectors have exactly zero distance to their centroid") {
    assert(out.filter(_._2 === 1L).forall(_._3 === 0L))
  }

  test("d2 matches the direct exact-integer computation") {
    // label 0 centroid on the 1e-6 grid, rounded-average per dimension:
    // xg = round(x * 1e6); cj = floor((2*sum + m - mod) / (2m)) — i.e.
    // round-half-up of the mean. Vectors: (1e6,0),(1.1e6,1e5),
    // (9e5,-1e5),(9e6,9e6) -> sums (11.9e6, 8.9e6+1e5? compute exactly)
    def grid(x: Float): Long = math.floor(x.toDouble * 1e6 + 0.5).toLong
    val vecs = Map(
      0L -> Array(1.0f, 0.0f), 1L -> Array(1.1f, 0.1f),
      2L -> Array(0.9f, -0.1f), 3L -> Array(9.0f, 9.0f))
    val m = vecs.size
    val cj = (0 until 2).map { j =>
      val s = vecs.values.map(v => grid(v(j))).sum
      Math.floorDiv(2 * s + m - Math.floorMod(2 * s + m, 2L * m), 2L * m)
    }
    val expected = vecs.view.mapValues { v =>
      (0 until 2).map { j =>
        val dlt = grid(v(j)) - cj(j); dlt * dlt
      }.sum
    }.toMap
    out.filter(_._2 === 0L).foreach { case (id, _, d2) =>
      assert(d2 === expected(id), s"vec $id")
    }
  }
}
