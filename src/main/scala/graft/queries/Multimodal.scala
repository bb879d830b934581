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
    }),

    // ---- frame sampling through the typed media path: documents framed
    // as opaque payloads, every 4th frame sampled ([[Media.sampleFrames]]
    // — the one-to-many decode shape), then per-kind frame accounting.
    // The stub's frame arithmetic is pure byte-length math, so DuckDB
    // replays the whole typed flatMap exactly — the mapPartitions seam is
    // oracle-gated, not just smoke-tested.
    "media_frames" -> ((s, d) => {
      graft.multimodal.Media.sampleFrames(
          graft.multimodal.Media.fromDocuments(s, d), everyN = 4)
        .groupBy(col("kind"))
        .agg(countDistinct(col("media_id")).as("n_media"),
          count(lit(1)).as("n_frames_sampled"),
          sum(col("frame_bytes")).as("sum_frame_bytes"))
        .orderBy(col("kind"))
    }),

    // ---- payload resize through the typed media path ([[Media.resize]]
    // — the byte-budget normalization every multimodal ingest runs
    // before decode): stride-subsample each payload to ≤ 64 bytes,
    // already-small payloads pass through IDENTICALLY, null payloads
    // (failed fetch) travel untouched. The stub's stride arithmetic is
    // pure integer math, so the oracle replays every byte: the gate
    // emits the resized payload itself as hex (≤ 128 chars — byte-exact,
    // no fingerprint needed; DuckDB's md5 is VARCHAR-only so a hash
    // would shear on non-UTF-8 subsample boundaries). Scale shape: a
    // schema-preserving typed map with bounded per-row output — no
    // shuffle, no driver collection; a real resizer swaps the Decoder
    // instance, the plan stays.
    "media_resize" -> ((s, d) => {
      graft.multimodal.Media.resize(
          graft.multimodal.Media.fromDocuments(s, d), targetBytes = 64)
        .toDF()
        .select(col("media_id"), col("kind"),
          octet_length(col("payload")).cast("long").as("n_resized"),
          hex(col("payload")).as("payload_hex"))
        .orderBy(col("media_id").asc_nulls_last,
          col("payload_hex").asc_nulls_last)
    })
  )

  val oracles: Map[String, String] = Map(
    // head_b64 is the first 8 BYTES of the payload (Spark's substring on
    // BINARY is byte-sliced); DuckDB has no blob substring, so the oracle
    // slices 16 hex chars — char substring would shear on multi-byte UTF-8
    "docs_binary_features" -> """
      SELECT doc_id,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        md5(text) AS fp_md5,
        base64(unhex(substr(hex(encode(text)), 1, 16))) AS head_b64
      FROM documents
      ORDER BY doc_id""",

    // replays the stub frame arithmetic: frames = max(1, bytes // k) per
    // kind, sampled = ceil(frames / 4), per-frame bytes = max(1,
    // bytes // frames) — pure integer math on octet_length
    "media_frames" -> """
      WITH m AS (
        SELECT doc_id AS media_id,
          CASE WHEN doc_id % 3 = 0 THEN 'image'
               WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
          octet_length(encode(text)) AS n_bytes
        FROM documents
        WHERE text IS NOT NULL),
      f AS (
        SELECT media_id, kind, n_bytes,
          CASE kind WHEN 'video' THEN greatest(1, n_bytes // 1024)
                    WHEN 'audio' THEN greatest(1, n_bytes // 256)
                    ELSE 1 END AS frames
        FROM m)
      SELECT kind, count(*) AS n_media,
        CAST(sum((frames + 3) // 4) AS BIGINT) AS n_frames_sampled,
        CAST(sum(((frames + 3) // 4) * greatest(1, n_bytes // frames))
          AS BIGINT) AS sum_frame_bytes
      FROM f
      GROUP BY kind
      ORDER BY kind""",

    // byte-exact stride replay on hex pairs (char slicing would shear on
    // multi-byte UTF-8 — the docs_binary_features rule): stride =
    // ceil(n/64.0), indices 0, stride, 2·stride…; payloads ≤ 64 bytes
    // (incl. empty) and null payloads pass through the small branch
    "media_resize" -> """
      WITH m AS (
        SELECT doc_id AS media_id,
          CASE WHEN doc_id % 3 = 0 THEN 'image'
               WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
          hex(encode(text)) AS h,
          octet_length(encode(text)) AS n
        FROM documents),
      small AS (
        SELECT media_id, kind, n, h FROM m WHERE n <= 64 OR n IS NULL),
      big AS (
        SELECT m.media_id, m.kind,
          string_agg(substr(m.h, CAST(u.i*2 + 1 AS INT), 2),
            '' ORDER BY u.i) AS h
        FROM m, unnest(range(0, CAST(m.n AS BIGINT),
          CAST(ceil(m.n / 64.0) AS BIGINT))) u(i)
        WHERE m.n > 64
        GROUP BY m.media_id, m.kind),
      r AS (
        SELECT media_id, kind, CAST(n AS BIGINT) AS n_resized, h
        FROM small
        UNION ALL
        SELECT media_id, kind,
          CAST(octet_length(unhex(h)) AS BIGINT) AS n_resized, h
        FROM big)
      SELECT media_id, kind, n_resized, h AS payload_hex
      FROM r
      ORDER BY media_id NULLS LAST, payload_hex NULLS LAST"""
  )
}
