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

/** Decode / feature-extract plumbing for opaque media columns.
  *
  * The actual codec call is STUBBED ([[Media.stubDecode]]) — image/audio
  * libraries are not available in this build environment — but the
  * Spark-side shape is the real one: a typed `Dataset[MediaRecord]`
  * processed with `mapPartitions`, so a real decoder can
  * (a) amortize per-partition init (codec contexts, model weights) and
  * (b) stream record-at-a-time without collecting to the driver.
  * Partitioning guidance at scale: repartition by a size-balanced key
  * (e.g. `media_id % N`) before decode so skewed payload sizes do not
  * stall single tasks.
  */
object Media {

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
    val frames = r.kind match {
      case "video" => math.max(1, r.payload.length / 1024)
      case "audio" => math.max(1, r.payload.length / 256)
      case _       => 1
    }
    MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, frames, feature)
  }

  /** Per-partition decode: one place to open/close codec resources. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // real impl: init codec context here, close via iterator completion
      it.map(stubDecode)
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
