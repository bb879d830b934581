package graft

import graft.multimodal.{Decoder, ImageIoDecoder, Media, MediaFeatures, MediaRecord}

/** [[ImageIoDecoder]] with open/close accounting (static counters — the
  * instance is serialized into task closures, local mode shares the JVM). */
class CountingImageIoDecoder extends ImageIoDecoder {
  override def open(): Unit = {
    CountingImageIoDecoder.opens.incrementAndGet(); super.open()
  }
  override def close(): Unit = {
    CountingImageIoDecoder.closes.incrementAndGet(); super.close()
  }
}
object CountingImageIoDecoder {
  import java.util.concurrent.atomic.AtomicInteger
  val opens = new AtomicInteger(0)
  val closes = new AtomicInteger(0)
}

/** A second, structurally different [[Decoder]]: fixed two-frame count,
  * constant 2-dim feature, head-truncation resize, and open/close
  * accounting — proves the operators are decoder-generic (nothing in the
  * plumbing is stub-specific) and that the per-partition resource
  * lifecycle really runs once per partition. */
object TwoFrameDecoder extends Decoder {
  import java.util.concurrent.atomic.AtomicInteger
  val opens = new AtomicInteger(0)
  val closes = new AtomicInteger(0)
  override def open(): Unit = { opens.incrementAndGet(); () }
  override def close(): Unit = { closes.incrementAndGet(); () }
  def frameCount(r: MediaRecord): Int = 2
  def decode(r: MediaRecord): MediaFeatures =
    MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, 2,
      Array(1f, 2f))
  override def resize(r: MediaRecord, targetBytes: Int): MediaRecord =
    if (r.payload == null || r.payload.length <= targetBytes) r
    else r.copy(payload = r.payload.take(targetBytes))
}

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

  test("a second decoder drops into every operator unchanged, and " +
    "open/close run once per partition") {
    import spark.implicits._
    val ds = Seq(
      MediaRecord(1, "video", Array.fill(10240)(1.toByte), 64, 0),
      MediaRecord(2, "audio", Array.fill(1024)(1.toByte), 0, 16000),
      MediaRecord(3, "image", Array.fill(500)(1.toByte), 64, 0)
    ).toDS().repartition(2)
    val opens0 = TwoFrameDecoder.opens.get()
    val closes0 = TwoFrameDecoder.closes.get()
    val feats = Media.extractFeatures(ds, TwoFrameDecoder).collect()
    assert(feats.length === 3)
    assert(feats.forall(f => f.frames_sampled == 2 &&
      f.feature.toSeq == Seq(1f, 2f)))
    // per-partition resource lifecycle: exactly one open and one close
    // per partition (local mode shares the singleton across tasks)
    assert(TwoFrameDecoder.opens.get() - opens0 === 2)
    assert(TwoFrameDecoder.closes.get() - closes0 === 2)
    // frame sampling follows the decoder's frameCount, not the stub's
    val frames = Media.sampleFrames(ds, everyN = 1, TwoFrameDecoder)
      .collect().groupBy(_.media_id)
    assert(frames.keySet === Set(1L, 2L, 3L))
    assert(frames.values.forall(_.map(_.frame_idx).sorted.toSeq == Seq(0, 1)))
    // resize follows the decoder's strategy (head-truncate, not stride)
    val rs = Media.resize(ds, targetBytes = 100, TwoFrameDecoder).collect()
      .map(r => r.media_id -> r.payload).toMap
    assert(rs(1L).length === 100 && rs(1L).toSeq === Seq.fill(100)(1.toByte))
    assert(rs(3L).length === 100)
  }

  test("partial consumption cannot leak decoder resources: opens == " +
    "closes after a limit abandons the iterator mid-partition") {
    import spark.implicits._
    val ds = Seq.tabulate(64)(i =>
      MediaRecord(i.toLong, "video", Array.fill(2048)(1.toByte), 64, 0))
      .toDS().repartition(4)
    val opens0 = TwoFrameDecoder.opens.get()
    val closes0 = TwoFrameDecoder.closes.get()
    // limit(1) abandons every launched partition's iterator before
    // exhaustion — only the task-completion listener can close these
    val got = Media.extractFeatures(ds, TwoFrameDecoder).limit(1).collect()
    assert(got.length === 1)
    val opened = TwoFrameDecoder.opens.get() - opens0
    val closedN = TwoFrameDecoder.closes.get() - closes0
    assert(opened >= 1)
    assert(closedN === opened,
      s"decoder leak: $opened opens vs $closedN closes")
  }

  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (((x * 31 + y * 17) % 256) << 16) |
        (((x ^ y) % 256) << 8) | ((x + y) % 256))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("REAL codec: imageio decoder parses PNG payloads inside the " +
    "per-partition reader lifecycle and features are the pixel histogram") {
    import spark.implicits._
    val payloads = Seq.tabulate(6)(i => png(8 + i * 4, 8 + i * 4))
    val ds = payloads.zipWithIndex.map { case (p, i) =>
      MediaRecord(i.toLong, "image", p, 64, 0) }.toDS().repartition(2)
    val opens0 = CountingImageIoDecoder.opens.get()
    val closes0 = CountingImageIoDecoder.closes.get()
    val feats = Media.extractFeatures(ds, new CountingImageIoDecoder)
      .collect().sortBy(_.media_id)
    assert(feats.length === 6)
    feats.foreach { f =>
      assert(f.frames_sampled === 1)
      assert(f.n_bytes === payloads(f.media_id.toInt).length.toLong)
      assert(math.abs(f.feature.sum - 1f) < 1e-5f,
        "histogram must be normalized over the decoded pixels")
    }
    // the features really came from the pixels: recompute one histogram
    // from an independent static decode of the same payload
    val img0 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payloads(0)))
    val expected0 = {
      val bins = new Array[Float](8)
      for (y <- 0 until img0.getHeight; x <- 0 until img0.getWidth) {
        val rgb = img0.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        bins(lum >> 5) += 1f
      }
      bins.map(_ / (img0.getWidth * img0.getHeight))
    }
    assert(feats(0).feature.toSeq === expected0.toSeq)
    val opened = CountingImageIoDecoder.opens.get() - opens0
    assert(opened === 2) // one reader per partition
    assert(CountingImageIoDecoder.closes.get() - closes0 === opened)
  }

  test("REAL codec: a non-PNG payload fails the decode, and the " +
    "task-completion close still runs (no reader leak on exception)") {
    import spark.implicits._
    val ds = Seq(
      MediaRecord(1, "image", png(8, 8), 64, 0),
      MediaRecord(2, "image", Array.tabulate(256)(_.toByte), 64, 0))
      .toDS().coalesce(1)
    val opens0 = CountingImageIoDecoder.opens.get()
    val closes0 = CountingImageIoDecoder.closes.get()
    intercept[org.apache.spark.SparkException] {
      Media.extractFeatures(ds, new CountingImageIoDecoder).collect()
    }
    val opened = CountingImageIoDecoder.opens.get() - opens0
    assert(opened >= 1)
    assert(CountingImageIoDecoder.closes.get() - closes0 === opened,
      "decode exception leaked the imageio reader")
  }

  test("REAL codec: resize is an actual image downscale — the result is " +
    "a smaller, still-decodable PNG; small payloads pass through") {
    import spark.implicits._
    val big = png(64, 64)
    val small = png(4, 4)
    assert(big.length > 1200,
      s"fixture PNG too small (${big.length}) to exercise the downscale")
    val ds = Seq(
      MediaRecord(1, "image", big, 64, 0),
      MediaRecord(2, "image", small, 4, 0)).toDS()
    val out = Media.resize(ds, targetBytes = 1200, new ImageIoDecoder)
      .collect().map(r => r.media_id -> r.payload).toMap
    assert(out(1L).length <= 1200)
    val resized = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L)))
    assert(resized != null, "resized payload is not a decodable PNG")
    assert(resized.getWidth < 64 && resized.getWidth >= 1)
    assert(out(2L).toSeq === small.toSeq) // under budget: byte-identical
  }

  test("stub resize bounds payloads to the target and passes small ones " +
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
