package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}

/** A media record as it travels through the engine: an opaque binary
  * payload plus typed metadata. At 100 TB the payload column dominates
  * storage; everything here is designed so Spark never interprets the
  * bytes until an explicit decode step. */
final case class MediaRecord(
    media_id: Long,
    kind: String, // "image" | "audio" | "video"
    payload: Array[Byte],
    width_hint: Int,
    sample_rate_hint: Int)

/** Features extracted from a decoded payload. */
final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    frames_sampled: Int,
    feature: Array[Float])

/** One sampled frame/window of a media payload — the one-to-many decode
  * output shape (video → frames, audio → windows, image → itself). */
final case class MediaFrame(
    media_id: Long,
    kind: String,
    frame_idx: Int,
    frame_bytes: Long)

/** The pluggable codec seam: everything a media operator asks of a codec
  * lives behind this trait, so a REAL decoder (JavaCV, TwelveMonkeys,
  * a JNI ffmpeg binding…) drops in without touching any operator — swap
  * the instance, keep the plans. Instances must be [[Serializable]]
  * (they ship to executors); per-partition resource lifecycles hang off
  * [[Decoder.open]]/[[Decoder.close]], which [[Media.extractFeatures]]
  * calls exactly once per partition around the record stream.
  *
  * [[StubDecoder]] is the default instance: deterministic byte-length
  * arithmetic standing in for container parsing (codec libraries are not
  * available in this build environment), which keeps the `media_frames`
  * query oracle-replayable in DuckDB. `MediaSpec` exercises a second,
  * structurally different decoder through the same operators to pin that
  * nothing in the plumbing is stub-specific.
  */
trait Decoder extends Serializable {
  /** Acquire per-partition resources (codec contexts, model weights).
    * Called once per partition before the first record. */
  def open(): Unit = ()

  /** Release per-partition resources. Called once per partition after the
    * last record has been consumed. */
  def close(): Unit = ()

  /** Number of frames/windows in a payload (>= 1 for non-null payloads) —
    * a real decoder parses the container header here. */
  def frameCount(r: MediaRecord): Int

  /** Full decode of one record into its feature row. */
  def decode(r: MediaRecord): MediaFeatures

  /** Resize a payload to at most `targetBytes`; must preserve metadata
    * columns and pass already-small payloads through unchanged. Default:
    * deterministic byte-stride subsample. */
  def resize(r: MediaRecord, targetBytes: Int): MediaRecord =
    if (r.payload == null || r.payload.length <= targetBytes) r
    else {
      val stride = math.ceil(r.payload.length.toDouble / targetBytes).toInt
      val out = Array.newBuilder[Byte]
      var i = 0
      while (i < r.payload.length) { out += r.payload(i); i += stride }
      r.copy(payload = out.result())
    }
}

/** Default [[Decoder]]: deterministic fake decode derived purely from
  * payload bytes — the oracle-replayable stand-in for the real
  * `decode → resize → frame-sample → embed` chain. */
object StubDecoder extends Decoder {
  def frameCount(r: MediaRecord): Int = Media.stubFrameCount(r)
  def decode(r: MediaRecord): MediaFeatures = Media.stubDecode(r)
}

/** Decode / feature-extract plumbing for opaque media columns.
  *
  * The actual codec call is STUBBED ([[Media.stubDecode]]) — image/audio
  * libraries are not available in this build environment — but the
  * Spark-side shape is the real one: a typed `Dataset[MediaRecord]`
  * processed with `mapPartitions`, so a real decoder can
  * (a) amortize per-partition init (codec contexts, model weights) and
  * (b) stream record-at-a-time without collecting to the driver.
  * Every operator takes a [[Decoder]] (default [[StubDecoder]]) — the
  * codec is an argument, not a hardwired call.
  * Partitioning guidance at scale: repartition by a size-balanced key
  * (e.g. `media_id % N`) before decode so skewed payload sizes do not
  * stall single tasks.
  */
object Media {

  /** Stub frame count: derives purely from payload length — a real
    * decoder swaps this for container parsing. Shared by [[stubDecode]]
    * and [[sampleFrames]] so the two paths can never disagree. */
  def stubFrameCount(r: MediaRecord): Int = r.kind match {
    case "video" => math.max(1, r.payload.length / 1024)
    case "audio" => math.max(1, r.payload.length / 256)
    case _       => 1
  }

  /** Deterministic fake decode: derives a fixed-length feature vector and
    * a frame count purely from the payload bytes. Stands in for the real
    * `decode → resize → frame-sample → embed` chain. */
  def stubDecode(r: MediaRecord): MediaFeatures = {
    val dim = 8
    val feature = new Array[Float](dim)
    var i = 0
    while (i < r.payload.length) {
      feature(i % dim) += (r.payload(i) & 0xff).toFloat / 255f
      i += 1
    }
    MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
      stubFrameCount(r), feature)
  }

  /** Frame sampling: every `everyN`-th frame of each record becomes its
    * own row — the one-to-many decode shape. Iterator-based flatMap, so
    * per-record memory stays one frame regardless of payload size; frame
    * 0 is always emitted (frames >= 1 by the stub). A real decoder
    * replaces the arithmetic with container seeking — the row shape,
    * typed encoder, and bounded-memory contract stay. */
  def sampleFrames(ds: Dataset[MediaRecord], everyN: Int,
                   decoder: Decoder = StubDecoder): Dataset[MediaFrame] = {
    require(everyN >= 1, "everyN must be >= 1")
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      if (r.payload == null) Iterator.empty // failed fetch: no frames
      else {
        val frames = decoder.frameCount(r)
        val perFrame = math.max(1L, r.payload.length.toLong / frames)
        (0 until frames by everyN).iterator
          .map(i => MediaFrame(r.media_id, r.kind, i, perFrame))
      }
    }
  }

  /** Resize stub: deterministic byte-stride subsample of the payload down
    * to at most `targetBytes` — stands in for an image/video resize. A
    * schema-preserving projection with bounded per-row output, which is
    * the Spark-side contract a real resizer must also honor (metadata
    * columns travel untouched; payloads already within budget pass
    * through identically). */
  def resize(ds: Dataset[MediaRecord], targetBytes: Int,
             decoder: Decoder = StubDecoder): Dataset[MediaRecord] = {
    require(targetBytes >= 1, "targetBytes must be >= 1")
    import ds.sparkSession.implicits._
    ds.map(r => decoder.resize(r, targetBytes))
  }

  /** Per-partition decode: the one place codec resources are acquired and
    * released — `decoder.open()` before the first record of a partition,
    * `decoder.close()` exactly once per partition. The close is registered
    * as a task-completion listener, which Spark fires on EVERY task exit —
    * normal exhaustion, partial consumption (a `limit`/`take` that abandons
    * the iterator mid-stream), and decode exceptions alike — so a real
    * codec's native contexts can never leak; the iterator's own
    * exhaustion-time close stays as the eager path (resources drop as soon
    * as the stream ends, not when the whole task does), guarded idempotent.
    * Null payloads (failed fetch) decode to nothing — typed lambdas see
    * raw nulls, so the guard is explicit here rather than free as in the
    * declarative paths. */
  def extractFeatures(ds: Dataset[MediaRecord],
                      decoder: Decoder = StubDecoder): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      decoder.open()
      val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
      def closeOnce(): Unit =
        if (closed.compareAndSet(false, true)) decoder.close()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
      val mapped = it.filter(_.payload != null).map(decoder.decode)
      new Iterator[MediaFeatures] {
        def hasNext: Boolean = {
          val h = mapped.hasNext
          if (!h) closeOnce()
          h
        }
        def next(): MediaFeatures = mapped.next()
      }
    }
  }

  /** Demo corpus: documents re-framed as opaque media payloads. */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .selectExpr("doc_id AS media_id",
        "CASE WHEN doc_id % 3 = 0 THEN 'image' " +
          "WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind",
        "CAST(text AS BINARY) AS payload",
        "CAST(64 AS INT) AS width_hint",
        "CAST(16000 AS INT) AS sample_rate_hint")
      .as[MediaRecord]
  }
}
