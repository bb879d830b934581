package graft

import graft.multimodal.{Media, MediaRecord}

/** Multimodal plumbing: typed binary-payload records flow through
  * mapPartitions feature extraction with a deterministic stub decoder. */
class MediaSpec extends SparkSpec {

  test("extractFeatures is deterministic and schema-complete") {
    val ds = Media.fromDocuments(spark, "/root/testdata/sf0.001")
    val a = Media.extractFeatures(ds).collect().sortBy(_.media_id)
    val b = Media.extractFeatures(ds).collect().sortBy(_.media_id)
    assert(a.length === ds.count())
    assert(a.map(_.media_id).toSeq === b.map(_.media_id).toSeq)
    a.zip(b).foreach { case (x, y) =>
      assert(x.feature.toSeq === y.feature.toSeq)
      assert(x.n_bytes > 0)
      assert(x.frames_sampled >= 1)
      assert(x.feature.length === 8)
    }
  }

  test("stub decode derives frame counts from kind and payload size") {
    val img = Media.stubDecode(MediaRecord(1, "image",
      Array.fill(4096)(1.toByte), 64, 0))
    val vid = Media.stubDecode(MediaRecord(2, "video",
      Array.fill(4096)(1.toByte), 64, 0))
    assert(img.frames_sampled === 1)
    assert(vid.frames_sampled === 4)
  }
}
