package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Multimodal-column surface: media payloads ride through the engine as
  * opaque `binary` columns with typed scalar metadata alongside — exactly
  * how image/audio/video blobs travel in a training-data pipeline. The
  * oracle-checked query below exercises BinaryType end-to-end (cast,
  * byte-length, fingerprint, byte-slice) on the `documents` corpus (whose
  * text is pure ASCII, so char-slices and byte-slices coincide and DuckDB
  * can replicate via `encode()`).
  *
  * The decode/feature-extract step itself (the part that would call an
  * image/audio codec) lives in [[graft.multimodal.Media]] as typed
  * `mapPartitions` plumbing with a deterministic stub decoder — the codec
  * libraries are not available in this environment, but the Spark-side
  * schema, batching, and partitioning are real and tested.
  */
object Multimodal {

  val queries: Map[String, Q] = Map(
    // ---- binary payload + metadata: byte length, content fingerprint,
    // head-of-payload sample (the "frame sample" access pattern)
    "docs_binary_features" -> ((s, d) => {
      val bin = col("text").cast("binary")
      Tables.documents(s, d)
        .select(col("doc_id"),
          octet_length(bin).cast("long").as("n_bytes"),
          md5(bin).as("fp_md5"),
          base64(substring(bin, 1, 8)).as("head_b64"))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "docs_binary_features" -> """
      SELECT doc_id,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        md5(text) AS fp_md5,
        base64(encode(substring(text, 1, 8))) AS head_b64
      FROM documents
      ORDER BY doc_id"""
  )
}
