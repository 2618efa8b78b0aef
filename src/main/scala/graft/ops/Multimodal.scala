package graft.ops

import graft.{GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One opaque media payload: binary content + typed identity columns.
  * At 100 TB the `content` column is the dominant storage; it stays
  * opaque to Catalyst, and every metadata predicate (modality, mime,
  * doc_id) prunes at the parquet scan without touching blob pages.
  */
final case class MediaAsset(
    doc_id: Long,
    modality: String,
    mime: String,
    content: Array[Byte])

/** Decoded per-asset features (flat, columnar-friendly). */
final case class MediaFeatures(
    doc_id: Long,
    modality: String,
    n_bytes: Long,
    width: Long,
    height: Long,
    n_frames: Long,
    sample_rate: Long)

/** Multimodal-column support (SURVEY.md §2.8): image/audio/video payloads
  * modeled as opaque `binary` columns with typed metadata, plus the
  * decode / feature-extract / frame-sample plumbing a training-data
  * pipeline needs.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * DETERMINISTIC FAKE decoder (arithmetic over byte length and the first
  * byte) — clearly marked below. Everything around it is real Spark
  * plumbing: a typed `Dataset[MediaAsset]`, a `mapPartitions` decode with
  * per-partition decoder initialization and bounded-size batches (the
  * Scala analogue of `mapInPandas` arrow batches), and a columnar
  * feature schema out. Swapping in a real codec changes only the body
  * of `decodeStub`.
  *
  * Scale notes (100 TB):
  *  - Blobs never shuffle: decode is a narrow mapPartitions directly on
  *    the scan, and every downstream agg/join uses the flat feature
  *    columns. `spark.sql.files.maxPartitionBytes` sizes blob scans.
  *  - Decoder state (codec context, model weights) is initialized once
  *    per partition inside mapPartitions, not per row; rows stream
  *    through in batches of 64 so peak memory is bounded by
  *    batch_size × max_blob, independent of partition size.
  *  - The assets here are synthesized from `documents.text` bytes (the
  *    testdata ships no media); payload synthesis is itself a narrow
  *    per-row projection.
  */
object Multimodal extends QueryModule {

  private val BatchSize = 64

  /** documents → typed media assets: modality round-robins by doc_id,
    * content is the utf-8 text payload standing in for media bytes.
    */
  def assets(s: SparkSession, d: String): Dataset[MediaAsset] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        expr("""CASE doc_id % 3 WHEN 0 THEN 'image'
                                WHEN 1 THEN 'audio'
                                ELSE 'video' END""").as("modality"),
        expr("""CASE doc_id % 3 WHEN 0 THEN 'image/png'
                                WHEN 1 THEN 'audio/wav'
                                ELSE 'video/mp4' END""").as("mime"),
        encode(col("text"), "utf-8").as("content"))
      .as[MediaAsset]
  }

  /** STUB decoder — deterministic fake standing in for a real codec.
    * Replace the arithmetic with actual decode calls in production; the
    * signature (bytes in, features out) and the call pattern (batched,
    * per-partition init) are the real contract.
    */
  private def decodeStub(a: MediaAsset): MediaFeatures = {
    val nBytes = a.content.length.toLong
    // first CHARACTER's code point (not first byte): keeps the stub
    // aligned with the SQL twin's ascii(substr(text,1,1)) for non-ASCII
    val decoded = new String(a.content, "UTF-8")
    val first   = if (decoded.isEmpty) 0L else decoded.codePointAt(0).toLong
    val isImg  = a.modality == "image"
    val isVid  = a.modality == "video"
    val isAud  = a.modality == "audio"
    MediaFeatures(
      doc_id = a.doc_id,
      modality = a.modality,
      n_bytes = nBytes,
      width = if (isImg || isVid) 16L + nBytes % 640 else 0L,
      height = if (isImg || isVid) 16L + first % 480 else 0L,
      n_frames = if (isVid) 1L + nBytes % 24 else if (isImg) 1L else 0L,
      sample_rate = if (isAud) 8000L + 100L * (first % 80) else 0L)
  }

  /** Batched decode: the mapPartitions plumbing around the stub. */
  def decodeFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaFeatures]
    assets.mapPartitions { rows =>
      // real pipeline: initialize the codec/model ONCE per partition here
      rows.grouped(BatchSize).flatMap { batch =>
        // real pipeline: one vectorized decode call per batch
        batch.map(decodeStub)
      }
    }
  }

  override def queries: Seq[GraftQuery] = Seq(

    // ───── binary column + typed metadata (schema pattern) ─────
    GraftQuery(
      "mm_binary_meta",
      (s, d) =>
        assets(s, d).toDF()
          .select(
            col("doc_id"), col("modality"), col("mime"),
            length(col("content")).cast("long").as("n_bytes"),
            sha2(col("content"), 256).as("sha256"),
            substring(sha2(col("content"), 256), 1, 8).as("magic"))
          .orderBy(col("doc_id")),
      Some("""
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                               ELSE 'video' END AS modality,
               CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
                               ELSE 'video/mp4' END AS mime,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               sha256(text) AS sha256,
               substr(sha256(text), 1, 8) AS magic
        FROM documents ORDER BY doc_id
      """)),

    // ───── batched feature extraction over binary payloads ─────
    GraftQuery(
      "mm_decode_features",
      (s, d) =>
        decodeFeatures(assets(s, d)).toDF().orderBy(col("doc_id")),
      Some("""
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                               ELSE 'video' END AS modality,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CASE WHEN doc_id % 3 IN (0, 2)
                    THEN 16 + octet_length(encode(text)) % 640
                    ELSE 0 END AS width,
               CASE WHEN doc_id % 3 IN (0, 2)
                    THEN 16 + ascii(substr(text, 1, 1)) % 480
                    ELSE 0 END AS height,
               CASE WHEN doc_id % 3 = 2 THEN 1 + octet_length(encode(text)) % 24
                    WHEN doc_id % 3 = 0 THEN 1
                    ELSE 0 END AS n_frames,
               CASE WHEN doc_id % 3 = 1
                    THEN 8000 + 100 * (ascii(substr(text, 1, 1)) % 80)
                    ELSE 0 END AS sample_rate
        FROM documents ORDER BY doc_id
      """)),

    // ───── per-modality feature statistics over decoded features ─────
    GraftQuery(
      "mm_modality_stats",
      (s, d) =>
        decodeFeatures(assets(s, d)).toDF()
          .groupBy(col("modality"))
          .agg(
            count(lit(1)).as("n_assets"),
            sum(col("n_bytes")).as("total_bytes"),
            (sum(col("width")).cast("double") / count(lit(1))).as("avg_width"),
            max(col("n_frames")).as("max_frames"))
          .orderBy(col("modality")),
      Some("""
        WITH f AS (
          SELECT doc_id,
                 CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                                 ELSE 'video' END AS modality,
                 CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                 CASE WHEN doc_id % 3 IN (0, 2)
                      THEN 16 + octet_length(encode(text)) % 640
                      ELSE 0 END AS width,
                 CASE WHEN doc_id % 3 = 2 THEN 1 + octet_length(encode(text)) % 24
                      WHEN doc_id % 3 = 0 THEN 1
                      ELSE 0 END AS n_frames
          FROM documents)
        SELECT modality, COUNT(*) AS n_assets, CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
               SUM(width)::DOUBLE / COUNT(*) AS avg_width,
               MAX(n_frames) AS max_frames
        FROM f GROUP BY modality ORDER BY modality
      """)),

    // ───── frame sampling: every 4th frame of each video payload ─────
    GraftQuery(
      "mm_frame_sample",
      (s, d) =>
        decodeFeatures(assets(s, d)).toDF()
          .filter(col("modality") === "video")
          .select(col("doc_id"), col("n_frames"),
            explode(expr("sequence(0, n_frames - 1, 4)")).as("frame_idx"),
            col("n_bytes"))
          .select(col("doc_id"), col("n_frames"), col("frame_idx"),
            (col("frame_idx") * expr("n_bytes div n_frames")).as("byte_offset"))
          .orderBy(col("doc_id"), col("frame_idx")),
      Some("""
        WITH vids AS (
          SELECT doc_id,
                 CAST(1 + octet_length(encode(text)) % 24 AS BIGINT) AS n_frames,
                 CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
          FROM documents WHERE doc_id % 3 = 2)
        SELECT doc_id, n_frames, frame_idx,
               frame_idx * (n_bytes // n_frames) AS byte_offset
        FROM (
          SELECT doc_id, n_frames, n_bytes,
                 UNNEST(generate_series(0, n_frames - 1, 4)) AS frame_idx
          FROM vids) t
        ORDER BY doc_id, frame_idx
      """))
  )
}
