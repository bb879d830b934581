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

  test("sampleFrames emits ceil(frames/N) rows per record, frame 0 first") {
    import spark.implicits._
    val ds = Seq(
      MediaRecord(1, "video", Array.fill(10240)(1.toByte), 64, 0), // 10 frames
      MediaRecord(2, "audio", Array.fill(1024)(1.toByte), 0, 16000), // 4
      MediaRecord(3, "image", Array.fill(500)(1.toByte), 64, 0)    // 1
    ).toDS()
    val out = Media.sampleFrames(ds, everyN = 4).collect()
      .groupBy(_.media_id).map { case (k, v) =>
        k -> v.map(_.frame_idx).sorted.toSeq }
    assert(out(1L) === Seq(0, 4, 8)) // ceil(10/4) = 3 frames
    assert(out(2L) === Seq(0))       // ceil(4/4) = 1
    assert(out(3L) === Seq(0))
  }

  test("resize bounds payloads to the target and passes small ones " +
    "through untouched") {
    import spark.implicits._
    val big = Array.tabulate(10000)(i => (i % 251).toByte)
    val small = Array.tabulate(100)(i => i.toByte)
    val ds = Seq(
      MediaRecord(1, "image", big, 64, 0),
      MediaRecord(2, "image", small, 64, 0)).toDS()
    val out = Media.resize(ds, targetBytes = 1000).collect()
      .map(r => r.media_id -> r.payload).toMap
    assert(out(1L).length <= 1000 && out(1L).length > 0)
    assert(out(2L).toSeq === small.toSeq) // under budget: byte-identical
    // metadata travels untouched and the subsample is deterministic
    val again = Media.resize(ds, targetBytes = 1000).collect()
      .map(r => r.media_id -> r.payload).toMap
    assert(again(1L).toSeq === out(1L).toSeq)
  }
}
