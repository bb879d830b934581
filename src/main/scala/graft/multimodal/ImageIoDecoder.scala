package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** A REAL [[Decoder]] over the JDK's `javax.imageio` PNG codec — no new
  * dependency, an honest-to-goodness decode: payload bytes are parsed as a
  * PNG container, pixels are decoded, and the feature vector is an 8-bin
  * luminance histogram of the actual image content. This is the instance
  * that proves the [[Decoder]] seam against a codec which allocates real
  * resources: [[open]] acquires a reusable `ImageReader` from the imageio
  * service registry (the per-partition object a native codec would make a
  * context of), [[close]] `dispose()`s it, and a payload that is not a
  * decodable PNG throws from [[decode]] — exactly the failure mode the
  * task-completion-listener close path in [[Media.extractFeatures]]
  * exists for (pinned in `MediaSpec`).
  *
  * [[resize]] is a real image resize: halve the pixel dimensions and
  * re-encode until the PNG fits `targetBytes`, flooring at 1×1 — so the
  * result is always itself a decodable PNG. Deviation from the stub
  * contract, stated honestly: a PNG cannot shrink below its container
  * overhead (~70 bytes), so a target under the 1×1 encoding returns the
  * 1×1 image rather than corrupt truncated bytes. `resize`/`frameCount`
  * run outside the open/close lifecycle (they are called from stateless
  * `map`/`flatMap` paths), so they use the static `ImageIO` entry points
  * and touch no per-partition state.
  *
  * Instances are serializable (the reader is `@transient`, re-acquired by
  * [[open]] on each executor); `media_frames` and the other oracled
  * queries stay on [[StubDecoder]] — real pixel decoding is not
  * DuckDB-replayable, which is the documented reason the default is a
  * stub in this environment. */
class ImageIoDecoder extends Decoder {

  @transient private var reader: javax.imageio.ImageReader = _

  override def open(): Unit = {
    val it = ImageIO.getImageReadersByFormatName("png")
    require(it.hasNext, "JDK png ImageReader missing from the registry")
    reader = it.next()
  }

  override def close(): Unit =
    if (reader != null) { reader.dispose(); reader = null }

  /** PNG is single-frame; a multi-image container codec would parse the
    * header here (no pixel decode, so no reader needed). */
  def frameCount(r: MediaRecord): Int = 1

  def decode(r: MediaRecord): MediaFeatures = {
    require(reader != null,
      "decode outside the open()/close() lifecycle — extractFeatures is " +
        "the sanctioned driver")
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(r.payload))
    val img =
      try { reader.setInput(iis, true, true); reader.read(0) }
      finally { reader.setInput(null); iis.close() }
    MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, 1,
      ImageIoDecoder.lumaHistogram(img))
  }

  override def resize(r: MediaRecord, targetBytes: Int): MediaRecord =
    if (r.payload == null || r.payload.length <= targetBytes) r
    else {
      var img = ImageIO.read(new ByteArrayInputStream(r.payload))
      require(img != null,
        s"payload of media ${r.media_id} is not a decodable image")
      var out = ImageIoDecoder.encodePng(img)
      while (out.length > targetBytes &&
          (img.getWidth > 1 || img.getHeight > 1)) {
        val w = math.max(1, img.getWidth / 2)
        val h = math.max(1, img.getHeight / 2)
        val scaled = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val g = scaled.createGraphics()
        try { g.drawImage(img, 0, 0, w, h, null); () } finally g.dispose()
        img = scaled
        out = ImageIoDecoder.encodePng(img)
      }
      r.copy(payload = out)
    }
}

object ImageIoDecoder {

  /** 8-bin luminance histogram over the decoded pixels, normalized to sum
    * to 1 — integer Rec.601 luma (299/587/114 per mille) so the binning is
    * exactly reproducible from the pixel values. */
  private[multimodal] def lumaHistogram(img: BufferedImage): Array[Float] = {
    val bins = new Array[Float](8)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        bins(lum >> 5) += 1f
        x += 1
      }
      y += 1
    }
    val n = (img.getWidth.toLong * img.getHeight).toFloat
    var i = 0
    while (i < 8) { bins(i) /= n; i += 1 }
    bins
  }

  private[multimodal] def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
