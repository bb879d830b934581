package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Packed-key domain guards fail LOUDLY on hostile frames (round-7 verdict
  * item): a label outside [0, 2^20) or a non-dense vec_id keyspace used to
  * corrupt the packed-decimal argmax/argmin silently — now each raises a
  * runtime error naming the repair, while every sanctioned edge (valid
  * labels, partial null under-seed, empty corpus) stays green. */
class PackGuardSpec extends SparkSpec {

  /** Temp corpus dir holding only an embeddings table. */
  private def embDir(rows: Seq[(Long, Array[Float], Long)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-packguard").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    d
  }

  private def vec(seed: Int): Array[Float] =
    Array.tabulate(8)(j => math.sin(seed * 8 + j + 1.0).toFloat)

  test("sim_knn_label raises on a label outside [0, 2^20)") {
    val d = embDir((0L, vec(0), 0L) +: (50 until 70).map { i =>
      (i.toLong, vec(i), if (i == 55) -3L else (i % 3).toLong)
    })
    val e = intercept[Exception] {
      graft.queries.Similarity.queries("sim_knn_label")(spark, d).collect()
    }
    assert(e.getMessage != null &&
      e.toString.contains("packed-key domain") ||
      Option(e.getCause).exists(_.toString.contains("packed-key domain")),
      s"expected the packed-key guard to fire, got: $e")
  }

  test("sim_knn_label raises on a label >= 2^20") {
    // exactly 10 train rows: every label enters the top-10 vote, so the
    // guard provably sees the hostile one (it fires only where a label is
    // actually consumed by the pack — unranked rows never reach it)
    val d = embDir((0L, vec(0), 0L) +: (50 until 60).map { i =>
      (i.toLong, vec(i), if (i == 55) (1L << 21) else (i % 3).toLong)
    })
    val e = intercept[Exception] {
      graft.queries.Similarity.queries("sim_knn_label")(spark, d).collect()
    }
    assert(e.toString.contains("packed-key domain") ||
      Option(e.getCause).exists(_.toString.contains("packed-key domain")),
      s"expected the packed-key guard to fire, got: $e")
  }

  test("sim_knn_label still answers on in-domain labels") {
    val d = embDir((0L, vec(0), 0L) +: (50 until 70).map { i =>
      (i.toLong, vec(i), (i % 3).toLong)
    })
    val rows = graft.queries.Similarity.queries("sim_knn_label")(spark, d)
      .collect()
    assert(rows.length == 1 && rows.head.getLong(1) >= 0)
  }

  test("kmeansAssignOf raises on non-dense vec_ids (no id < k)") {
    import spark.implicits._
    val emb = (1000 until 1040).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      graft.queries.Similarity.kmeansAssignOf(emb, k = 8)
    }
    assert(e.getMessage.contains("dense 0-based"))
    Caching.releaseAll()
  }

  test("kmeansAssignOf tolerates a partial null under-seed and an empty " +
    "corpus (sanctioned edges)") {
    import spark.implicits._
    // vec_id 0 failed to encode: 7 of 8 init centroids remain — sanctioned
    val emb = (0 until 40).map { i =>
      (i.toLong, if (i == 0) null else vec(i))
    }.toDF("vec_id", "embedding")
    val (asg, _) = graft.queries.Similarity.kmeansAssignOf(emb, k = 8)
    assert(asg.count() == 39)
    Caching.releaseAll()
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val (asgE, _) = graft.queries.Similarity.kmeansAssignOf(empty, k = 8)
    assert(asgE.count() == 0)
    Caching.releaseAll()
  }
}
