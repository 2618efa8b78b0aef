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

/** Features decoded from REAL media bytes by the genuine codecs below
  * (P6 PPM, PCM WAV). Image fields are zero for audio and vice versa so
  * both codecs share one columnar schema.
  */
final case class DecodedMedia(
    doc_id: Long,
    codec: String,
    width: Long,
    height: Long,
    maxval: Long,
    plane_r: Long,
    plane_g: Long,
    plane_b: Long,
    sample_rate: Long,
    n_samples: Long,
    pcm_checksum: Long,
    pcm_energy: Long)

/** Per-image perceptual hash decoded from real P6 bytes: a 12-bit
  * (4×3-block) average-hash plus the dimensions it was computed at.
  */
final case class PhashMedia(
    doc_id: Long,
    w: Long,
    h: Long,
    ahash: Long)

/** `mm_image_resize` row: a fixed 4×4 nearest-neighbor RGB thumbnail of
  * a decoded P6 raster, reported as exact integer folds OVER the
  * materialized thumbnail (per-plane sums + a position-weighted luma
  * sum that pins pixel ARRANGEMENT, not just content).
  */
final case class ResizedMedia(
    doc_id: Long,
    width: Long,
    height: Long,
    thumb_r: Long,
    thumb_g: Long,
    thumb_b: Long,
    thumb_wsum: Long)

/** One 16-sample PCM frame decoded from real WAV bytes: exact integer
  * sum and energy — the framing step every audio featurizer starts
  * with (the last frame may be partial; n_in_frame says so).
  */
final case class WavFrame(
    doc_id: Long,
    frame_idx: Long,
    n_in_frame: Long,
    f_sum: Long,
    f_energy: Long)

/** Multimodal-column support (SURVEY.md §2.8): image/audio/video payloads
  * modeled as opaque `binary` columns with typed metadata, plus the
  * decode / feature-extract / frame-sample plumbing a training-data
  * pipeline needs.
  *
  * Two decode tiers coexist:
  *  - `decodeStub` is a DETERMINISTIC FAKE (arithmetic over byte length
  *    and the first byte) standing in for heavyweight codecs (PNG/MP4)
  *    this container doesn't ship; it exercises the plumbing contract.
  *  - `decodePpm` / `decodeWav` are GENUINE decoders for two trivial
  *    self-describing formats — binary P6 PPM (header tokenizer with
  *    comment/whitespace handling, per-plane raster checksums) and PCM
  *    RIFF/WAVE (chunk walker, fmt parse, little-endian sample math).
  *    `mm_decode_real` stages real files on disk, ingests them through
  *    the `binaryFile` on-ramp (same path as `src_binaryfile_ingest`),
  *    sniffs the magic bytes, and decodes — so actual byte decoding
  *    executes under the hash gate against a closed-form oracle.
  * Both tiers share the real Spark plumbing: a typed Dataset, a
  * `mapPartitions` decode with per-partition decoder initialization and
  * bounded-size batches (the Scala analogue of `mapInPandas` arrow
  * batches), and a columnar feature schema out.
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

  // ───────────── real codecs: binary P6 PPM and PCM WAV ─────────────

  /** Encode a real binary P6 PPM image. Dimensions derive from doc_id
    * (w∈[4,16], h∈[3,9]); pixel byte i is (doc_id·131 + i·7) mod 256 so
    * the oracle can state the per-plane checksums in closed form while
    * the decoder still has to genuinely parse the header and raster.
    * The `#`-comment line exercises the parser's comment handling.
    */
  private[graft] def ppmBytes(docId: Long): Array[Byte] = {
    val w = (4 + docId % 13).toInt
    val h = (3 + docId % 7).toInt
    val header = s"P6\n# graft synthetic asset $docId\n$w $h\n255\n"
      .getBytes("US-ASCII")
    val n = w * h * 3
    val out = new Array[Byte](header.length + n)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < n) {
      out(header.length + i) = ((docId * 131 + i * 7) % 256).toByte
      i += 1
    }
    out
  }

  /** Encode a real 16-bit PCM mono RIFF/WAVE file. Sample i is
    * ((doc_id·7 + i·13) mod 65536) − 32768 — again closed-form for the
    * oracle, real little-endian bytes for the decoder.
    */
  private[graft] def wavBytes(docId: Long): Array[Byte] = {
    val sr = (8000 + (docId % 8) * 1000).toInt
    val n = (64 + docId % 100).toInt
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1)            // PCM
    bb.putShort(1)            // mono
    bb.putInt(sr)             // sample rate
    bb.putInt(sr * 2)         // byte rate
    bb.putShort(2)            // block align
    bb.putShort(16)           // bits per sample
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    var i = 0
    while (i < n) {
      bb.putShort((((docId * 7 + i * 13) % 65536) - 32768).toShort)
      i += 1
    }
    bb.array()
  }

  /** GENUINE P6 PPM decoder: validates the magic, tokenizes the header
    * (arbitrary whitespace, `#`-to-newline comments, per the netpbm
    * spec), reads width/height/maxval, then walks the raster computing
    * unsigned per-plane byte checksums. Works on any spec-compliant
    * 8-bit P6 file, not just the synthetic ones above.
    */
  /** Parse a binary P6 header — magic, whitespace/`#`-comment tokens
    * (netpbm spec), `w h maxval` — returning (w, h, maxval,
    * rasterStart). Shared by the plane-checksum decoder and the
    * perceptual-hash decoder.
    */
  private def ppmHeader(docId: Long, bytes: Array[Byte]): (Int, Int, Int, Int) = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      s"not a P6 PPM (doc $docId)")
    var pos = 2
    def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'
    def nextInt(): Int = {
      // skip whitespace and comments
      var skipping = true
      while (skipping) {
        while (pos < bytes.length && isWs(bytes(pos))) pos += 1
        if (pos < bytes.length && bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else skipping = false
      }
      var v = 0
      require(pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9',
        s"malformed PPM header (doc $docId)")
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    require(maxval > 0 && maxval < 256, s"only 8-bit PPM supported (doc $docId)")
    // exactly one whitespace byte separates header from raster
    (w, h, maxval, pos + 1)
  }

  private[graft] def decodePpm(docId: Long, bytes: Array[Byte]): DecodedMedia = {
    val (w, h, maxval, start) = ppmHeader(docId, bytes)
    val n = w * h * 3
    require(bytes.length - start >= n, s"truncated PPM raster (doc $docId)")
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    while (i < n) {
      val v = (bytes(start + i) & 0xff).toLong
      (i % 3: @annotation.switch) match {
        case 0 => r += v
        case 1 => g += v
        case _ => b += v
      }
      i += 1
    }
    DecodedMedia(docId, "ppm", w, h, maxval, r, g, b, 0L, 0L, 0L, 0L)
  }

  /** Decode a P6 raster into a 4×3 block average-hash: per-block luma
    * sums (luma = r+g+b of a pixel), one bit per block set when the
    * block's MEAN luma exceeds the image mean — compared by integer
    * cross-multiplication (bsum·n_pixels > tsum·block_pixels), so the
    * hash is exact on any engine (no division ever happens). Block
    * (rb, cb) of pixel (x, y) is rb = y·3 div h, cb = x·4 div w — the
    * standard resize-free block partition; bit index = rb·4 + cb.
    * Headroom: bsum·n ≤ 765·(w·h)² stays in int64 to ~10⁸ pixels.
    */
  private[graft] def decodePpmGrid(docId: Long, bytes: Array[Byte]): PhashMedia = {
    val (w, h, _, start) = ppmHeader(docId, bytes)
    val n = w * h * 3
    require(bytes.length - start >= n, s"truncated PPM raster (doc $docId)")
    val bsum = new Array[Long](12)
    val bn = new Array[Long](12)
    var tsum = 0L
    var p = 0
    while (p < w * h) {
      val x = p % w; val y = p / w
      val luma = (bytes(start + 3 * p) & 0xff) +
        (bytes(start + 3 * p + 1) & 0xff) +
        (bytes(start + 3 * p + 2) & 0xff)
      val blk = (y * 3 / h) * 4 + (x * 4 / w)
      bsum(blk) += luma; bn(blk) += 1; tsum += luma
      p += 1
    }
    val tn = (w.toLong * h)
    var hash = 0L
    var j = 0
    while (j < 12) {
      if (bsum(j) * tn > tsum * bn(j)) hash |= 1L << j
      j += 1
    }
    PhashMedia(docId, w.toLong, h.toLong, hash)
  }

  /** Nearest-neighbor resample of a P6 raster to a fixed 4×4 RGB
    * thumbnail. The REAL 48-byte thumbnail array is materialized (at
    * scale it is what lands in a sink's binary column; the checksums
    * in [[ResizedMedia]] are folds over it, so the resample genuinely
    * happens). Source pixel for destination (dx, dy) is the standard
    * floor-index map (⌊dx·w/4⌋, ⌊dy·h/4⌋) — pure integer division,
    * so the oracle states every thumbnail pixel in closed form.
    * Upsampling rows is well-defined too (h ≥ 3 < 4 repeats rows),
    * and a 4×4 source is the identity.
    */
  private[graft] def resizePpm(docId: Long, bytes: Array[Byte]): ResizedMedia = {
    val (w, h, _, start) = ppmHeader(docId, bytes)
    val n = w * h * 3
    require(bytes.length - start >= n, s"truncated PPM raster (doc $docId)")
    val thumb = new Array[Byte](48)
    var g = 0
    while (g < 16) {
      val dx = g % 4; val dy = g / 4
      val sx = dx * w / 4; val sy = dy * h / 4
      val k = 3 * (sy * w + sx)
      thumb(3 * g) = bytes(start + k)
      thumb(3 * g + 1) = bytes(start + k + 1)
      thumb(3 * g + 2) = bytes(start + k + 2)
      g += 1
    }
    var r = 0L; var gg = 0L; var b = 0L; var ws = 0L
    var i = 0
    while (i < 16) {
      val rv = (thumb(3 * i) & 0xff).toLong
      val gv = (thumb(3 * i + 1) & 0xff).toLong
      val bv = (thumb(3 * i + 2) & 0xff).toLong
      r += rv; gg += gv; b += bv
      ws += (i + 1L) * (rv + gv + bv)
      i += 1
    }
    ResizedMedia(docId, w.toLong, h.toLong, r, gg, b, ws)
  }

  /** GENUINE PCM WAV decoder: validates RIFF/WAVE magics, walks the
    * chunk list (skipping unknown chunks with even-byte padding, per
    * the RIFF spec), parses the fmt chunk (PCM, 16-bit required), and
    * folds the data chunk into sample count / checksum / energy.
    */
  private[graft] def decodeWav(docId: Long, bytes: Array[Byte]): DecodedMedia = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourCC(): String = {
      val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
    }
    require(fourCC() == "RIFF", s"not a RIFF file (doc $docId)")
    bb.getInt // riff payload size (unused; chunk walk is bounds-checked)
    require(fourCC() == "WAVE", s"not a WAVE file (doc $docId)")
    var sampleRate = 0L; var channels = 0; var bits = 0
    var nSamples = 0L; var checksum = 0L; var energy = 0L
    var sawFmt = false; var sawData = false
    while (bb.remaining >= 8) {
      val id = fourCC(); val size = bb.getInt
      require(size >= 0 && size <= bb.remaining,
        s"truncated $id chunk (doc $docId)")
      id match {
        case "fmt " =>
          val fmtEnd = bb.position() + size
          val audioFormat = bb.getShort.toInt
          require(audioFormat == 1, s"only PCM supported (doc $docId)")
          channels = bb.getShort.toInt
          sampleRate = bb.getInt.toLong
          bb.getInt   // byte rate
          bb.getShort // block align
          bits = bb.getShort.toInt
          require(bits == 16, s"only 16-bit PCM supported (doc $docId)")
          bb.position(fmtEnd) // tolerate fmt extensions
          sawFmt = true
        case "data" =>
          require(sawFmt, s"data chunk before fmt (doc $docId)")
          nSamples = size / (2L * channels)
          var i = 0L
          while (i < nSamples * channels) {
            val s = bb.getShort.toLong
            checksum += s; energy += s * s
            i += 1
          }
          if (size % 2 == 1) bb.get // RIFF even-byte padding
          sawData = true
        case _ =>
          bb.position(bb.position() + size + (size % 2))
      }
    }
    require(sawData, s"no data chunk (doc $docId)")
    DecodedMedia(docId, "wav", 0L, 0L, 0L, 0L, 0L, 0L,
      sampleRate, nSamples, checksum, energy)
  }

  /** Decode a PCM WAV into 16-sample frames with exact integer sum and
    * energy per frame — the framing pass a real audio featurizer (MFCC,
    * VAD) starts from. Same chunk-walk contract as [[decodeWav]]
    * (RIFF/WAVE magics, unknown chunks skipped with even-byte padding,
    * 16-bit mono PCM); the last frame is partial when the sample count
    * is not a multiple of 16.
    */
  private[graft] def decodeWavFrames(docId: Long,
                                     bytes: Array[Byte]): Seq[WavFrame] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourCC(): String = {
      val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
    }
    require(fourCC() == "RIFF", s"not a RIFF file (doc $docId)")
    bb.getInt
    require(fourCC() == "WAVE", s"not a WAVE file (doc $docId)")
    var channels = 0
    var sawFmt = false
    val out = Seq.newBuilder[WavFrame]
    var sawData = false
    while (bb.remaining >= 8) {
      val id = fourCC(); val size = bb.getInt
      require(size >= 0 && size <= bb.remaining,
        s"truncated $id chunk (doc $docId)")
      id match {
        case "fmt " =>
          val fmtEnd = bb.position() + size
          require(bb.getShort.toInt == 1, s"only PCM supported (doc $docId)")
          channels = bb.getShort.toInt
          require(channels == 1, s"only mono framing supported (doc $docId)")
          bb.getInt; bb.getInt; bb.getShort
          require(bb.getShort.toInt == 16,
            s"only 16-bit PCM supported (doc $docId)")
          bb.position(fmtEnd)
          sawFmt = true
        case "data" =>
          require(sawFmt, s"data chunk before fmt (doc $docId)")
          val n = size / 2L
          var i = 0L
          var fSum = 0L; var fEnergy = 0L; var inFrame = 0L
          while (i < n) {
            val s = bb.getShort.toLong
            fSum += s; fEnergy += s * s; inFrame += 1
            i += 1
            if (inFrame == 16 || i == n) {
              out += WavFrame(docId, (i - 1) / 16, inFrame, fSum, fEnergy)
              fSum = 0L; fEnergy = 0L; inFrame = 0L
            }
          }
          if (size % 2 == 1) bb.get
          sawData = true
        case _ =>
          bb.position(bb.position() + size + (size % 2))
      }
    }
    require(sawData, s"no data chunk (doc $docId)")
    out.result()
  }

  /** Content sniffer: dispatch on magic bytes, never on metadata — a
    * real ingest can't trust file extensions.
    */
  private[graft] def decodeMedia(docId: Long, bytes: Array[Byte]): DecodedMedia =
    if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6')
      decodePpm(docId, bytes)
    else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I'
      && bytes(2) == 'F' && bytes(3) == 'F')
      decodeWav(docId, bytes)
    else sys.error(s"unrecognized media magic (doc $docId)")

  /** Batched decode: the mapPartitions plumbing around the stub.
    *
    * SYNTHETIC feature contract — `decodeStub` derives deterministic fake
    * features from the blob bytes so the batching/schema/partitioning
    * plumbing is testable without image/audio libs. Real decoding lives in
    * the `mm_decode_real` / `mm_phash` / `mm_audio_frames` queries, which
    * parse genuine P6 PPM and RIFF/WAVE bytes via `decodeMedia` above.
    */
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

    // ───── REAL decode: genuine PPM/WAV codecs over staged files ─────
    // Stages one real media file per asset (even doc_id → binary P6
    // PPM, odd → 16-bit PCM WAV), ingests the directory through the
    // `binaryFile` on-ramp (the src_binaryfile_ingest path — bytes
    // round-trip through the filesystem, so the decoder can share no
    // state with the encoder), sniffs each file's magic, and decodes
    // with the real parsers above. The oracle states the same features
    // in closed form from the generation arithmetic; matching hashes
    // prove the parse (header tokenization, chunk walk, endianness,
    // plane interleave) is byte-correct. Corpus capped at doc_id < 200
    // to match the one-file-per-record small-corpus layout of the
    // binaryFile source; at scale blobs ride parquet binary columns
    // and only the decode call sites change.
    GraftQuery(
      "mm_decode_real",
      (s, d) => {
        import s.implicits._
        val tmp = graft.pipeline.Sources.scratch(d, "mmreal_")
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmp))
        Tables.documents(s, d)
          .filter(col("doc_id") < 200)
          .select(col("doc_id"))
          .repartition(4)
          .as[Long]
          .foreachPartition { (ids: Iterator[Long]) =>
            // executor-side file writes: each doc_id lands in exactly
            // one partition, so no two tasks touch the same file; a
            // retried task rewrites identical deterministic bytes
            ids.foreach { id =>
              val (ext, bytes) =
                if (id % 2 == 0) ("ppm", ppmBytes(id)) else ("wav", wavBytes(id))
              java.nio.file.Files.write(
                java.nio.file.Paths.get(s"$tmp/asset_$id.$ext"), bytes)
            }
          }
        implicit val enc = org.apache.spark.sql.Encoders.product[DecodedMedia]
        s.read.format("binaryFile")
          .option("pathGlobFilter", "asset_*")
          .load(tmp)
          .select(
            regexp_extract(col("path"), "asset_(\\d+)\\.", 1)
              .cast("long").as("doc_id"),
            col("content"))
          .as[(Long, Array[Byte])]
          .mapPartitions { rows =>
            // per-partition decoder init would go here for stateful codecs
            rows.grouped(BatchSize).flatMap(_.map { case (id, bytes) =>
              decodeMedia(id, bytes)
            })
          }
          .toDF().orderBy(col("doc_id"))
      },
      Some("""
        WITH img AS (
          SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
          FROM documents WHERE doc_id < 200 AND doc_id % 2 = 0),
        img_k AS (
          SELECT doc_id, w, h,
                 UNNEST(generate_series(0, w * h * 3 - 1)) AS k
          FROM img),
        img_f AS (
          SELECT doc_id, MAX(w) AS width, MAX(h) AS height,
                 CAST(SUM(CASE WHEN k % 3 = 0
                          THEN (doc_id * 131 + k * 7) % 256 ELSE 0 END) AS BIGINT) AS plane_r,
                 CAST(SUM(CASE WHEN k % 3 = 1
                          THEN (doc_id * 131 + k * 7) % 256 ELSE 0 END) AS BIGINT) AS plane_g,
                 CAST(SUM(CASE WHEN k % 3 = 2
                          THEN (doc_id * 131 + k * 7) % 256 ELSE 0 END) AS BIGINT) AS plane_b
          FROM img_k GROUP BY doc_id),
        wav AS (
          SELECT doc_id, 8000 + (doc_id % 8) * 1000 AS sr, 64 + doc_id % 100 AS n
          FROM documents WHERE doc_id < 200 AND doc_id % 2 = 1),
        wav_k AS (
          SELECT doc_id, sr, n,
                 UNNEST(generate_series(0, n - 1)) AS i
          FROM wav),
        wav_f AS (
          SELECT doc_id, MAX(sr) AS sample_rate, CAST(MAX(n) AS BIGINT) AS n_samples,
                 CAST(SUM((doc_id * 7 + i * 13) % 65536 - 32768) AS BIGINT) AS pcm_checksum,
                 CAST(SUM(((doc_id * 7 + i * 13) % 65536 - 32768)
                        * ((doc_id * 7 + i * 13) % 65536 - 32768)) AS BIGINT) AS pcm_energy
          FROM wav_k GROUP BY doc_id)
        SELECT doc_id, 'ppm' AS codec,
               CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
               CAST(255 AS BIGINT) AS maxval, plane_r, plane_g, plane_b,
               CAST(0 AS BIGINT) AS sample_rate, CAST(0 AS BIGINT) AS n_samples,
               CAST(0 AS BIGINT) AS pcm_checksum, CAST(0 AS BIGINT) AS pcm_energy
        FROM img_f
        UNION ALL
        SELECT doc_id, 'wav' AS codec,
               CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
               CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
               CAST(sample_rate AS BIGINT), n_samples, pcm_checksum, pcm_energy
        FROM wav_f
        ORDER BY doc_id
      """)),

    // ───── perceptual-hash near-dup over really-decoded image bytes ─────
    // The image half of the dedup family: every PPM asset (staged and
    // ingested through the binaryFile on-ramp exactly like
    // mm_decode_real) is DECODED — header tokenizer + raster walk — into
    // a 4×3 block average-hash, and each image reports its nearest
    // same-shape neighbor within Hamming distance ≤ 3 (NULL when none).
    // The hash is pure integer math (block-vs-image mean compared by
    // cross-multiplication, never a division), so the oracle can state
    // every bit in closed form from the synthetic raster formula while
    // the engine still genuinely parses bytes.
    //
    // Scale: blobs never shuffle (decode is a narrow mapPartitions on
    // the scan); what exchanges is (doc_id, w, h, 12-bit hash) — 4
    // columns, corpus-cardinality. The candidate join is equi on the
    // (w, h) shape class with the doc_id≠ residual — at production
    // scale the class key would extend with hash BANDS (the simhash
    // pattern) to keep per-bucket fan-out bounded; here classes are
    // ≤ |corpus|/91. TakeOrdered-free: the per-doc argmin is a rank
    // window over the ≤class-size candidate rows.
    GraftQuery(
      "mm_phash",
      (s, d) => {
        import s.implicits._
        val tmp = graft.pipeline.Sources.scratch(d, "mmphash_")
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmp))
        Tables.documents(s, d)
          .filter(col("doc_id") < 200 && col("doc_id") % 2 === 0)
          .select(col("doc_id"))
          .repartition(4)
          .as[Long]
          .foreachPartition { (ids: Iterator[Long]) =>
            // deterministic bytes, disjoint files per partition — a
            // retried task rewrites identical content (mm_decode_real's
            // idempotence argument)
            ids.foreach { id =>
              java.nio.file.Files.write(
                java.nio.file.Paths.get(s"$tmp/asset_$id.ppm"), ppmBytes(id))
            }
          }
        implicit val enc = org.apache.spark.sql.Encoders.product[PhashMedia]
        val hashes = graft.Materialize.stage(s.read.format("binaryFile")
          .option("pathGlobFilter", "asset_*")
          .load(tmp)
          .select(
            regexp_extract(col("path"), "asset_(\\d+)\\.", 1)
              .cast("long").as("doc_id"),
            col("content"))
          .as[(Long, Array[Byte])]
          .mapPartitions { rows =>
            rows.grouped(BatchSize).flatMap(_.map { case (id, b) =>
              decodePpmGrid(id, b)
            })
          }
          .toDF())
        val nn = hashes.as("l").join(hashes.as("r"),
            col("l.w") === col("r.w") && col("l.h") === col("r.h") &&
              col("l.doc_id") =!= col("r.doc_id"))
          .select(col("l.doc_id").as("doc_id"), col("r.doc_id").as("other"),
            col("l.ahash").bitwiseXOR(col("r.ahash")).as("xh"))
          .withColumn("ham", expr("bit_count(xh)"))
          .filter(col("ham") <= 3)
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
              .orderBy(col("ham").asc, col("other").asc)))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("other").as("nn_doc"),
            col("ham").as("nn_ham"))
        hashes.join(nn, Seq("doc_id"), "left")
          .select(col("doc_id"), col("w"), col("h"), col("ahash"),
            col("nn_doc"), col("nn_ham"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH img AS (
          SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
          FROM documents WHERE doc_id < 200 AND doc_id % 2 = 0),
        px AS (
          SELECT doc_id, w, h, UNNEST(generate_series(0, w * h - 1)) AS p
          FROM img),
        lum AS (
          SELECT doc_id, w, h,
                 (doc_id*131 + (3*p)*7) % 256 + (doc_id*131 + (3*p+1)*7) % 256
                   + (doc_id*131 + (3*p+2)*7) % 256 AS luma,
                 ((p // w) * 3) // h AS rb, ((p % w) * 4) // w AS cb
          FROM px),
        blk AS (
          SELECT doc_id, w, h, rb, cb, CAST(SUM(luma) AS BIGINT) AS bsum,
                 CAST(COUNT(*) AS BIGINT) AS bn
          FROM lum GROUP BY 1, 2, 3, 4, 5),
        tot AS (
          SELECT doc_id, CAST(SUM(luma) AS BIGINT) AS tsum,
                 CAST(COUNT(*) AS BIGINT) AS tn
          FROM lum GROUP BY 1),
        hsh AS (
          SELECT b.doc_id, CAST(MAX(b.w) AS BIGINT) AS w,
                 CAST(MAX(b.h) AS BIGINT) AS h,
                 CAST(SUM(CASE WHEN b.bsum * t.tn > t.tsum * b.bn
                          THEN CAST(1 AS BIGINT) << (b.rb * 4 + b.cb)
                          ELSE 0 END) AS BIGINT) AS ahash
          FROM blk b JOIN tot t ON t.doc_id = b.doc_id
          GROUP BY b.doc_id),
        pr AS (
          SELECT a.doc_id, b.doc_id AS other,
                 bit_count(xor(a.ahash, b.ahash)) AS ham
          FROM hsh a JOIN hsh b
            ON a.w = b.w AND a.h = b.h AND a.doc_id <> b.doc_id),
        nn AS (
          SELECT doc_id, other AS nn_doc, ham AS nn_ham FROM (
            SELECT doc_id, other, ham,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                     ORDER BY ham, other) AS rn
            FROM pr WHERE ham <= 3) t WHERE rn = 1)
        SELECT s.doc_id, s.w, s.h, s.ahash, nn.nn_doc, nn.nn_ham
        FROM hsh s LEFT JOIN nn ON nn.doc_id = s.doc_id
        ORDER BY s.doc_id
      """)),

    // ───── image resize: fixed 4×4 NN thumbnail over real PPM bytes ─────
    // The resize step of a multimodal ingest (every vision pipeline
    // normalizes to a fixed input resolution before feature extraction):
    // each staged P6 asset is decoded and nearest-neighbor-resampled to
    // a REAL 4×4 RGB thumbnail (`resizePpm` materializes the 48-byte
    // array; at scale that array is the sink column and these checksums
    // are its integrity fold). The NN map ⌊d·src/4⌋ is pure integer
    // division, so the oracle reconstructs every thumbnail pixel in
    // closed form from the generator arithmetic — matching hashes prove
    // the resample (index map, plane interleave, row stride) is
    // pixel-correct, and the position-weighted luma sum pins pixel
    // ARRANGEMENT (a transposed thumbnail would pass plane sums alone).
    //
    // Scale shape: identical to mm_decode_real — blobs never shuffle,
    // the decode+resample is a narrow mapPartitions on the binaryFile
    // scan, and the output is 7 integers per image.
    GraftQuery(
      "mm_image_resize",
      (s, d) => {
        import s.implicits._
        val tmp = graft.pipeline.Sources.scratch(d, "mmresize_")
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmp))
        Tables.documents(s, d)
          .filter(col("doc_id") < 200 && col("doc_id") % 2 === 0)
          .select(col("doc_id"))
          .repartition(4)
          .as[Long]
          .foreachPartition { (ids: Iterator[Long]) =>
            // deterministic bytes, disjoint files per partition — a
            // retried task rewrites identical content (mm_decode_real's
            // idempotence argument)
            ids.foreach { id =>
              java.nio.file.Files.write(
                java.nio.file.Paths.get(s"$tmp/asset_$id.ppm"), ppmBytes(id))
            }
          }
        implicit val enc = org.apache.spark.sql.Encoders.product[ResizedMedia]
        s.read.format("binaryFile")
          .option("pathGlobFilter", "asset_*")
          .load(tmp)
          .select(
            regexp_extract(col("path"), "asset_(\\d+)\\.", 1)
              .cast("long").as("doc_id"),
            col("content"))
          .as[(Long, Array[Byte])]
          .mapPartitions { rows =>
            rows.grouped(BatchSize).flatMap(_.map { case (id, b) =>
              resizePpm(id, b)
            })
          }
          .toDF().orderBy(col("doc_id"))
      },
      Some("""
        WITH img AS (
          SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
          FROM documents WHERE doc_id < 200 AND doc_id % 2 = 0),
        grid AS (
          SELECT doc_id, w, h, UNNEST(generate_series(0, 15)) AS g
          FROM img),
        px AS (
          SELECT doc_id, w, h, g,
                 3 * ((((g // 4) * h) // 4) * w + ((g % 4) * w) // 4) AS k
          FROM grid),
        vals AS (
          SELECT doc_id, w, h, g,
                 (doc_id*131 + k*7) % 256 AS r,
                 (doc_id*131 + (k+1)*7) % 256 AS gr,
                 (doc_id*131 + (k+2)*7) % 256 AS b
          FROM px)
        SELECT doc_id, CAST(MAX(w) AS BIGINT) AS width,
               CAST(MAX(h) AS BIGINT) AS height,
               CAST(SUM(r) AS BIGINT) AS thumb_r,
               CAST(SUM(gr) AS BIGINT) AS thumb_g,
               CAST(SUM(b) AS BIGINT) AS thumb_b,
               CAST(SUM((g + 1) * (r + gr + b)) AS BIGINT) AS thumb_wsum
        FROM vals GROUP BY doc_id ORDER BY doc_id
      """)),

    // ───── frame-level audio features from really-decoded PCM ─────
    // The framing pass every audio featurizer (MFCC, VAD, diarization)
    // starts with: each staged WAV asset is decoded — RIFF chunk walk,
    // fmt parse, little-endian sample math — into 16-sample frames with
    // EXACT integer sum and energy (the last frame partial when sample
    // count % 16 ≠ 0). The oracle states every frame in closed form
    // from the synthetic sample formula while the engine genuinely
    // parses bytes — mm_decode_real's contract extended from per-asset
    // checksums to a per-frame feature table, the row shape a training
    // pipeline actually emits.
    //
    // Scale: blobs never shuffle — framing is a narrow mapPartitions
    // flatMap on the binaryFile scan; what leaves the decode is
    // (doc_id, frame_idx, 3 ints) per frame. The final orderBy is the
    // gate's determinism sort, not part of the production plan.
    GraftQuery(
      "mm_audio_frames",
      (s, d) => {
        import s.implicits._
        val tmp = graft.pipeline.Sources.scratch(d, "mmframes_")
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmp))
        Tables.documents(s, d)
          .filter(col("doc_id") < 200 && col("doc_id") % 2 === 1)
          .select(col("doc_id"))
          .repartition(4)
          .as[Long]
          .foreachPartition { (ids: Iterator[Long]) =>
            ids.foreach { id =>
              java.nio.file.Files.write(
                java.nio.file.Paths.get(s"$tmp/asset_$id.wav"), wavBytes(id))
            }
          }
        implicit val enc = org.apache.spark.sql.Encoders.product[WavFrame]
        s.read.format("binaryFile")
          .option("pathGlobFilter", "asset_*")
          .load(tmp)
          .select(
            regexp_extract(col("path"), "asset_(\\d+)\\.", 1)
              .cast("long").as("doc_id"),
            col("content"))
          .as[(Long, Array[Byte])]
          .mapPartitions { rows =>
            rows.grouped(BatchSize).flatMap(_.flatMap { case (id, b) =>
              decodeWavFrames(id, b)
            })
          }
          .toDF().orderBy(col("doc_id"), col("frame_idx"))
      },
      Some("""
        WITH wav AS (
          SELECT doc_id, 64 + doc_id % 100 AS n
          FROM documents WHERE doc_id < 200 AND doc_id % 2 = 1),
        fr AS (
          SELECT doc_id, n,
                 UNNEST(generate_series(0, (n - 1) // 16)) AS frame_idx
          FROM wav),
        si AS (
          SELECT doc_id, frame_idx,
                 UNNEST(generate_series(16 * frame_idx,
                   LEAST(16 * frame_idx + 15, n - 1))) AS i
          FROM fr)
        SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
               CAST(COUNT(*) AS BIGINT) AS n_in_frame,
               CAST(SUM((doc_id * 7 + i * 13) % 65536 - 32768) AS BIGINT)
                 AS f_sum,
               CAST(SUM(((doc_id * 7 + i * 13) % 65536 - 32768)
                      * ((doc_id * 7 + i * 13) % 65536 - 32768)) AS BIGINT)
                 AS f_energy
        FROM si GROUP BY doc_id, frame_idx
        ORDER BY doc_id, frame_idx
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
