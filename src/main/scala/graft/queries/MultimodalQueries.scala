package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.MultimodalOps

/** Multimodal-plumbing queries: documents' text packed as binary payloads
  * with typed metadata, decoded partition-wise. The geometry gates
  * (m02/m03/m04/m06/m07) round-trip REAL image containers — each doc's
  * text is wrapped in a valid PNG / GIF89a / baseline-JPEG by
  * [[MultimodalOps.ImageCodec]] and the decode step genuinely parses the
  * binary headers back (chunk walk + CRC, LSD + block walk, marker walk
  * to SOF). The dims/frames written at pack time are deterministic
  * functions of the text byte length, so DuckDB oracles the whole
  * round-trip: any endianness/offset slip in the parser breaks the
  * hash. */
object MultimodalQueries {

  private def packed(s: SparkSession, d: String): DataFrame =
    MultimodalOps.packPayload(Tables.documents(s, d), "doc_id", "text",
      "text/plain", Seq("lang", "source"))

  /** Documents wrapped in real image containers: fmt cycles png/gif/jpeg
    * by doc_id, dims/frames derive from the text byte length (the same
    * functions the oracle computes), text bytes ride as the payload. */
  private def imaged(s: SparkSession, d: String): DataFrame =
    imagedFrom(Tables.documents(s, d))

  private def imagedFrom(docs: DataFrame): DataFrame = {
    val bytes = encode(col("text"), "UTF-8")
    val n = length(bytes)
    val fmtNo = pmod(col("doc_id"), lit(3))
    MultimodalOps.encodeImages(docs.select(
      col("doc_id"),
      when(fmtNo === 0, "png").when(fmtNo === 1, "gif")
        .otherwise("jpeg").as("fmt"),
      (lit(1) + pmod(n, lit(640))).as("width"),
      (lit(1) + pmod(n * 7, lit(480))).as("height"),
      when(fmtNo === 1, lit(1) + pmod(n, lit(30))).otherwise(lit(1))
        .as("frames"),
      bytes.as("payload")))
  }

  /** Documents wrapped in real RIFF/WAVE containers: sample rate cycles
    * the classic rates by doc_id, channels/bits are small deterministic
    * functions of doc_id, text bytes ride as the PCM data chunk. */
  private def waved(s: SparkSession, d: String): DataFrame =
    wavedFrom(Tables.documents(s, d))

  private def wavedFrom(docs: DataFrame): DataFrame = {
    val id4 = pmod(col("doc_id"), lit(4))
    MultimodalOps.encodeWavs(docs.select(
      col("doc_id"),
      when(id4 === 0, 8000).when(id4 === 1, 16000)
        .when(id4 === 2, 22050).otherwise(44100).as("sample_rate"),
      (lit(1) + pmod(col("doc_id"), lit(2))).as("channels"),
      when(pmod(col("doc_id"), lit(3)) === 0, 8).otherwise(16).as("bits"),
      encode(col("text"), "UTF-8").as("payload")))
  }

  /** Documents wrapped in real MP4 containers: timescale cycles the
    * classic clocks by doc_id, duration ticks derive from the byte
    * length, text bytes ride as the mdat payload. */
  private def mp4ed(s: SparkSession, d: String): DataFrame =
    mp4edFrom(Tables.documents(s, d))

  private def mp4edFrom(docs: DataFrame): DataFrame = {
    val id4 = pmod(col("doc_id"), lit(4))
    val n = length(encode(col("text"), "UTF-8"))
    MultimodalOps.encodeMp4s(docs.select(
      col("doc_id"),
      when(id4 === 0, 600L).when(id4 === 1, 1000L)
        .when(id4 === 2, 90000L).otherwise(25L).as("timescale"),
      (n.cast("long") * 3L).as("duration_ticks"),
      encode(col("text"), "UTF-8").as("payload")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // MIXED-CORPUS capstone: one corpus whose payloads are a third each
    // real PNG / WAV / MP4, routed through ONE sniff-and-parse manifest
    // decode — the three genuine header walkers composed behind a
    // single dispatcher, each branch's fields hash-gated.
    "m12_media_router" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val m3 = pmod(col("doc_id"), lit(3))
      val mixed = imagedFrom(docs.filter(m3 === 0))
        .unionByName(wavedFrom(docs.filter(m3 === 1)))
        .unionByName(mp4edFrom(docs.filter(m3 === 2)))
      MultimodalOps.decodeMediaManifest(mixed, "doc_id")
        .toDF().orderBy("doc_id")
    }),

    // Typed video-metadata decode through the REAL ISO BMFF box walker:
    // timescale/duration come from walking ftyp→moov→mvhd (big-endian
    // box chain), data_bytes from summing mdat payloads — the third
    // modality's genuine header parse.
    "m11_mp4_meta" -> ((s, d) =>
      MultimodalOps.decodeVideoMeta(mp4ed(s, d), "doc_id")
        .toDF().orderBy("doc_id")),

    // Typed audio-metadata decode through the REAL RIFF/WAVE parser:
    // sample rate / channels / bits come from walking the actual chunk
    // chain (little-endian fmt fields), durations from the declared
    // data size — any endianness/offset slip breaks the hash.
    "m09_wav_meta" -> ((s, d) =>
      MultimodalOps.decodeAudioMeta(waved(s, d), "doc_id")
        .toDF().orderBy("doc_id")),

    // STFT-style frame windows whose geometry is GENUINELY DECODED per
    // row: 25 ms frames / 10 ms hop × the parsed sample rate × block
    // align, framing the parsed data chunk only (m08 frames raw bytes at
    // fixed widths; this is the time-based production shape).
    "m10_audio_frames" -> ((s, d) =>
      MultimodalOps.audioFrames(waved(s, d), "doc_id",
          frameMs = 25, hopMs = 10)
        .select(col("doc_id"), col("sample_rate"), col("frame_bytes"),
          col("frame_idx"), col("offset"), col("nbytes"),
          md5(col("frame")).as("fp"))
        .orderBy("doc_id", "frame_idx")),
    // Payload construction: binary content + mime + metadata map; verify
    // byte length, content hash, and metadata round-trip.
    "m01_pack_payload" -> ((s, d) =>
      packed(s, d).select(
        col("doc_id"),
        col("payload.mime").as("mime"),
        length(col("payload.content")).as("nbytes"),
        md5(col("payload.content")).as("fp"),
        col("payload.meta")("lang").as("lang"))
        .orderBy("doc_id")),

    // Partition-wise decode through the REAL header parser: dims/frames
    // come from parsing the PNG/GIF/JPEG container bytes, nbytes is the
    // payload the container carries (IDAT / comment blocks / COM).
    "m02_decode_features" -> ((s, d) =>
      MultimodalOps.decodeFeatures(imaged(s, d), "doc_id",
          MultimodalOps.HeaderDecoder)
        .toDF().orderBy("doc_id")),

    // Frame-sampling fan-out over genuinely parsed frame counts (GIF
    // image descriptors; still formats = 1): every 5th frame per doc.
    "m03_frame_sample" -> ((s, d) =>
      MultimodalOps.sampleFrames(
          MultimodalOps.decodeFeatures(imaged(s, d), "doc_id",
            MultimodalOps.HeaderDecoder).toDF(),
          step = 5)
        .orderBy("doc_id", "frame_no")),

    // Typed image-metadata decode: format sniff + header parse, the
    // mixed-corpus manifest a multimodal pipeline builds first.
    "m07_image_meta" -> ((s, d) =>
      MultimodalOps.decodeImageMeta(imaged(s, d), "doc_id")
        .toDF().orderBy("doc_id")),

    // REAL TIFF round-trip: II header + one IFD with the dim LONG tags,
    // payload past the terminator — the fifth genuinely-parsed image
    // format (the parser also walks big-endian MM and SHORT dims;
    // OpsSpec covers those).
    "m14_tiff_meta" -> ((s, d) => {
      val n = length(encode(col("text"), "UTF-8"))
      val specs = Tables.documents(s, d).select(
        col("doc_id"), lit("tiff").as("fmt"),
        (lit(1) + pmod(n * 5, lit(2048))).as("width"),
        (lit(1) + pmod(n * 11, lit(1536))).as("height"),
        lit(1).as("frames"),
        encode(col("text"), "UTF-8").as("payload"))
      MultimodalOps.decodeImageMeta(
          MultimodalOps.encodeImages(specs), "doc_id")
        .toDF().orderBy("doc_id")
    }),

    // Corrupt-payload degradation: every 7th container truncated to 10
    // bytes mid-header — the parse must REJECT cleanly (None, never a
    // throw) and degrade those rows to the deterministic fallback
    // features with fmt='unknown' while every healthy row still parses:
    // one poisoned shard can't fail a 100 TB decode job.
    "m18_corrupt_degrade" -> ((s, d) => {
      val img = imaged(s, d)
      val corrupted = img.select(col("doc_id"), struct(
        when(pmod(col("doc_id"), lit(7)) === 0,
          expr("substring(payload.content, 1, 10)"))
          .otherwise(col("payload.content")).as("content"),
        col("payload.mime").as("mime"),
        col("payload.meta").as("meta")).as("payload"))
      MultimodalOps.decodeImageMeta(corrupted, "doc_id")
        .toDF().orderBy("doc_id")
    }),

    // FIVE-WAY router capstone: one corpus mixing WebP, PNG, WAV, FLAC
    // and MP4 payloads through the single sniff-and-parse manifest —
    // m12 extended with the two newest walkers (RIFF/VP8X and the
    // bit-packed STREAMINFO); every branch's fields hash-gated.
    "m17_router_all" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val m5 = pmod(col("doc_id"), lit(5))
      val n = length(encode(col("text"), "UTF-8"))
      val id4 = pmod(col("doc_id"), lit(4))
      val imgs = MultimodalOps.encodeImages(docs.filter(m5 <= 1).select(
        col("doc_id"),
        when(m5 === 0, "webp").otherwise("png").as("fmt"),
        (lit(1) + pmod(n, lit(640))).as("width"),
        (lit(1) + pmod(n * 7, lit(480))).as("height"),
        lit(1).as("frames"),
        encode(col("text"), "UTF-8").as("payload")))
      val flacs = MultimodalOps.encodeFlacs(docs.filter(m5 === 3).select(
        col("doc_id"),
        when(id4 === 0, 8000).when(id4 === 1, 16000)
          .when(id4 === 2, 44100).otherwise(96000).as("sample_rate"),
        (lit(1) + pmod(col("doc_id"), lit(2))).as("channels"),
        when(pmod(col("doc_id"), lit(3)) === 0, 16).otherwise(24)
          .as("bits"),
        (n.cast("long") * 21L).as("n_samples"),
        encode(col("text"), "UTF-8").as("payload")))
      val mixed = imgs
        .unionByName(wavedFrom(docs.filter(m5 === 2)))
        .unionByName(flacs)
        .unionByName(mp4edFrom(docs.filter(m5 === 4)))
      MultimodalOps.decodeMediaManifest(mixed, "doc_id")
        .toDF().orderBy("doc_id")
    }),

    // REAL FLAC container round-trip: the first BIT-PACKED header in
    // the codec family — sample rate (20 bits), channels−1 (3),
    // bits−1 (5), total samples (36) shift-masked out of STREAMINFO's
    // big-endian 64-bit field; payload rides a spec-legal APPLICATION
    // block. Durations from the DECLARED totals (floored long
    // arithmetic, engine-portable).
    "m16_flac_meta" -> ((s, d) => {
      val id4 = pmod(col("doc_id"), lit(4))
      val n = length(encode(col("text"), "UTF-8"))
      MultimodalOps.decodeFlacMeta(
          MultimodalOps.encodeFlacs(Tables.documents(s, d).select(
            col("doc_id"),
            when(id4 === 0, 8000).when(id4 === 1, 16000)
              .when(id4 === 2, 44100).otherwise(96000).as("sample_rate"),
            (lit(1) + pmod(col("doc_id"), lit(2))).as("channels"),
            when(pmod(col("doc_id"), lit(3)) === 0, 16).otherwise(24)
              .as("bits"),
            (n.cast("long") * 21L).as("n_samples"),
            encode(col("text"), "UTF-8").as("payload"))), "doc_id")
        .toDF().orderBy("doc_id")
    }),

    // REAL WebP container round-trip: RIFF/WEBP form with a VP8X
    // extended header (24-bit canvas dims, stored dim−1) and the text
    // bytes riding an XMP metadata chunk — the sixth genuinely-parsed
    // image format, and the first RIFF-framed one (the AudioCodec chunk
    // walk discipline applied to an image container; odd payloads
    // exercise RIFF even-alignment padding on every second row).
    "m15_webp_meta" -> ((s, d) => {
      val n = length(encode(col("text"), "UTF-8"))
      val specs = Tables.documents(s, d).select(
        col("doc_id"), lit("webp").as("fmt"),
        (lit(1) + pmod(n * 13, lit(4096))).as("width"),
        (lit(1) + pmod(n * 17, lit(3072))).as("height"),
        lit(1).as("frames"),
        encode(col("text"), "UTF-8").as("payload"))
      MultimodalOps.decodeImageMeta(
          MultimodalOps.encodeImages(specs), "doc_id")
        .toDF().orderBy("doc_id")
    }),

    // REAL BMP container round-trip: 14-byte file header + 40-byte
    // BITMAPINFOHEADER encoded per doc, then the header walk recovers
    // dims/payload — the fourth genuinely-parsed image format (the m07
    // family extended; declared-file-size and plane-count sanity checks
    // exercised on every row).
    "m13_bmp_meta" -> ((s, d) => {
      val n = length(encode(col("text"), "UTF-8"))
      val specs = Tables.documents(s, d).select(
        col("doc_id"), lit("bmp").as("fmt"),
        (lit(1) + pmod(n, lit(1024))).as("width"),
        (lit(1) + pmod(n * 3, lit(768))).as("height"),
        lit(1).as("frames"),
        encode(col("text"), "UTF-8").as("payload"))
      MultimodalOps.decodeImageMeta(
          MultimodalOps.encodeImages(specs), "doc_id")
        .toDF().orderBy("doc_id")
    }),

    // Fixed-size binary chunking: 64-byte segments with offsets — the
    // audio/video windowing shape; md5 per chunk so the oracle hashes
    // bytes, not a big blob column.
    "m05_chunk_payload" -> ((s, d) =>
      MultimodalOps.chunkPayload(packed(s, d), "doc_id", chunkBytes = 64)
        .select(col("doc_id"), col("chunk_idx"), col("offset"),
          col("nbytes"), md5(col("chunk")).as("fp"))
        .orderBy("doc_id", "chunk_idx")),

    // Overlapping byte frames (96-byte frame, 64-byte hop — the STFT
    // framing shape; m05 is the no-overlap special case): staged frame
    // array -> posexplode, per-partition fan-out only.
    "m08_audio_frames" -> ((s, d) =>
      MultimodalOps.frameWindows(packed(s, d), "doc_id",
          frameBytes = 96, hopBytes = 64)
        .select(col("doc_id"), col("frame_idx"), col("offset"),
          col("nbytes"), md5(col("frame")).as("fp"))
        .orderBy("doc_id", "frame_idx")),

    // ViT patch-grid manifest: 16px patches over genuinely header-parsed
    // geometry — the image-token budget (patches + CLS) multimodal
    // packing plans around.
    "m06_patch_grid" -> ((s, d) =>
      MultimodalOps.patchGrid(
          MultimodalOps.decodeFeatures(imaged(s, d), "doc_id",
            MultimodalOps.HeaderDecoder).toDF(),
          patch = 16)
        .orderBy("doc_id")),

    // Aspect-preserving resize-to-fit geometry (256x256 box, no upscale)
    // over genuinely header-parsed dimensions.
    "m04_resize" -> ((s, d) =>
      MultimodalOps.resizeToFit(
          MultimodalOps.decodeFeatures(imaged(s, d), "doc_id",
            MultimodalOps.HeaderDecoder).toDF(),
          maxW = 256, maxH = 256)
        .select("doc_id", "width", "height", "scale", "out_w", "out_h")
        .orderBy("doc_id"))
  )

  val oracles: Map[String, String] = Map(
    // m09/m10: the WAV headers are written from deterministic functions
    // of doc_id + text length, so the oracle recomputes what the Spark
    // side must PARSE back out of the binary container. All sample/
    // duration math is integer division on both sides.
    // m12: the three branch formulas (m07's image geometry restricted to
    // png, m09's wav fields with bits pinned to 16 by the routing
    // residue, m11's clocks) unioned per doc_id % 3.
    "m12_media_router" ->
      """WITH base AS (SELECT doc_id,
             CAST(octet_length(encode(text)) AS INTEGER) AS n
           FROM documents),
         img AS (SELECT doc_id, 'image' AS modality, 'png' AS fmt,
             CAST(1 + n % 640 AS INTEGER) AS width,
             CAST(1 + (n * 7) % 480 AS INTEGER) AS height,
             CAST(1 AS INTEGER) AS frames,
             CAST(0 AS INTEGER) AS sample_rate,
             CAST(0 AS BIGINT) AS duration_ms, n AS data_bytes
           FROM base WHERE doc_id % 3 = 0),
         aud AS (SELECT doc_id, 'audio' AS modality, 'wav' AS fmt,
             CAST(0 AS INTEGER) AS width, CAST(0 AS INTEGER) AS height,
             CAST(0 AS INTEGER) AS frames,
             CAST(CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
               WHEN 2 THEN 22050 ELSE 44100 END AS INTEGER)
               AS sample_rate,
             CAST(n // ((1 + doc_id % 2) * 2) * 1000
               // (CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                 WHEN 2 THEN 22050 ELSE 44100 END) AS BIGINT)
               AS duration_ms,
             n AS data_bytes
           FROM base WHERE doc_id % 3 = 1),
         vid AS (SELECT doc_id, 'video' AS modality, 'mp4' AS fmt,
             CAST(0 AS INTEGER) AS width, CAST(0 AS INTEGER) AS height,
             CAST(0 AS INTEGER) AS frames,
             CAST(0 AS INTEGER) AS sample_rate,
             CAST(CAST(n AS BIGINT) * 3 * 1000
               // (CASE doc_id % 4 WHEN 0 THEN 600 WHEN 1 THEN 1000
                 WHEN 2 THEN 90000 ELSE 25 END) AS BIGINT)
               AS duration_ms,
             n AS data_bytes
           FROM base WHERE doc_id % 3 = 2)
         SELECT * FROM img UNION ALL SELECT * FROM aud
         UNION ALL SELECT * FROM vid ORDER BY doc_id""",
    "m11_mp4_meta" ->
      """WITH f AS (SELECT doc_id,
             CAST(CASE doc_id % 4 WHEN 0 THEN 600 WHEN 1 THEN 1000
               WHEN 2 THEN 90000 ELSE 25 END AS BIGINT) AS timescale,
             CAST(octet_length(encode(text)) * 3 AS BIGINT)
               AS duration_ticks,
             CAST(octet_length(encode(text)) AS INTEGER) AS data_bytes
           FROM documents)
         SELECT doc_id, 'mp4' AS fmt, timescale, duration_ticks,
           CAST(duration_ticks * 1000 // timescale AS BIGINT)
             AS duration_ms,
           data_bytes
         FROM f ORDER BY doc_id""",
    "m09_wav_meta" ->
      """WITH f AS (SELECT doc_id,
             CAST(CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
               WHEN 2 THEN 22050 ELSE 44100 END AS INTEGER) AS sample_rate,
             CAST(1 + doc_id % 2 AS INTEGER) AS channels,
             CAST(CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS INTEGER)
               AS bits,
             CAST(octet_length(encode(text)) AS INTEGER) AS data_bytes
           FROM documents)
         SELECT doc_id, 'wav' AS fmt, sample_rate, channels, bits,
           data_bytes,
           CAST(data_bytes // (channels * bits // 8) AS BIGINT)
             AS n_samples,
           CAST(data_bytes // (channels * bits // 8) * 1000 // sample_rate
             AS BIGINT) AS duration_ms
         FROM f ORDER BY doc_id""",
    "m10_audio_frames" ->
      """WITH f AS (SELECT doc_id, text AS b,
             CAST(CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
               WHEN 2 THEN 22050 ELSE 44100 END AS INTEGER) AS sr,
             CAST((1 + doc_id % 2)
               * (CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END) // 8
               AS INTEGER) AS ba
           FROM documents),
         g AS (SELECT doc_id, b, sr,
             greatest(sr * ba * 25 // 1000, 1) AS fr,
             greatest(sr * ba * 10 // 1000, 1) AS hp
           FROM f),
         n AS (SELECT doc_id, b, sr, fr, hp,
             1 + CAST(ceil(greatest(length(b) - fr, 0) / (1.0 * hp))
               AS BIGINT) AS m
           FROM g)
         SELECT doc_id, sr AS sample_rate, CAST(fr AS INTEGER)
             AS frame_bytes,
           CAST(u.i AS INTEGER) AS frame_idx,
           CAST(u.i * hp AS INTEGER) AS offset,
           CAST(length(substring(b, CAST(u.i * hp + 1 AS INTEGER), fr))
             AS INTEGER) AS nbytes,
           md5(substring(b, CAST(u.i * hp + 1 AS INTEGER), fr)) AS fp
         FROM n, LATERAL unnest(range(0, m)) AS u(i)
         ORDER BY doc_id, frame_idx""",
    "m01_pack_payload" ->
      """SELECT doc_id, 'text/plain' AS mime,
           CAST(octet_length(encode(text)) AS INTEGER) AS nbytes,
           md5(text) AS fp, lang
         FROM documents ORDER BY doc_id""",
    "m02_decode_features" ->
      """SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS nbytes,
           CAST(1 + octet_length(encode(text)) % 640 AS INTEGER) AS width,
           CAST(1 + (octet_length(encode(text)) * 7) % 480 AS INTEGER) AS height,
           CAST(CASE WHEN doc_id % 3 = 1
                THEN 1 + octet_length(encode(text)) % 30
                ELSE 1 END AS INTEGER) AS frames
         FROM documents ORDER BY doc_id""",
    "m03_frame_sample" ->
      """SELECT doc_id, CAST(u.f AS INTEGER) AS frame_no
         FROM (SELECT doc_id,
                 CASE WHEN doc_id % 3 = 1
                 THEN 1 + octet_length(encode(text)) % 30
                 ELSE 1 END AS frames
               FROM documents) t,
         LATERAL unnest(range(0, t.frames, 5)) AS u(f)
         ORDER BY doc_id, frame_no""",
    // m14: the encoder's dim formulas recomputed; nbytes = the payload
    // past the IFD terminator.
    "m14_tiff_meta" ->
      """SELECT doc_id, 'tiff' AS fmt,
           CAST(1 + (octet_length(encode(text)) * 5) % 2048 AS INTEGER)
             AS width,
           CAST(1 + (octet_length(encode(text)) * 11) % 1536 AS INTEGER)
             AS height,
           CAST(1 AS INTEGER) AS frames,
           CAST(octet_length(encode(text)) AS INTEGER) AS nbytes
         FROM documents ORDER BY doc_id""",
    // m18: m07's field recomputation with the 10-byte-truncation rows
    // overridden by the fallback features of n = 10.
    "m18_corrupt_degrade" ->
      """SELECT doc_id,
           CASE WHEN doc_id % 7 = 0 THEN 'unknown'
             ELSE CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
               ELSE 'jpeg' END END AS fmt,
           CAST(CASE WHEN doc_id % 7 = 0 THEN 11
             ELSE 1 + octet_length(encode(text)) % 640 END AS INTEGER)
             AS width,
           CAST(CASE WHEN doc_id % 7 = 0 THEN 71
             ELSE 1 + (octet_length(encode(text)) * 7) % 480 END
             AS INTEGER) AS height,
           CAST(CASE WHEN doc_id % 7 = 0 THEN 11
             WHEN doc_id % 3 = 1
               THEN 1 + octet_length(encode(text)) % 30
             ELSE 1 END AS INTEGER) AS frames,
           CAST(CASE WHEN doc_id % 7 = 0 THEN 10
             ELSE octet_length(encode(text)) END AS INTEGER) AS nbytes
         FROM documents ORDER BY doc_id""",
    // m17: m12's branch recomputation extended to five formats; wav
    // block align = channels × bits/8 (both vary on this subset).
    "m17_router_all" ->
      """WITH base AS (SELECT doc_id,
             CAST(octet_length(encode(text)) AS INTEGER) AS n
           FROM documents),
         img AS (SELECT doc_id, 'image' AS modality,
             CASE WHEN doc_id % 5 = 0 THEN 'webp' ELSE 'png' END AS fmt,
             CAST(1 + n % 640 AS INTEGER) AS width,
             CAST(1 + (n * 7) % 480 AS INTEGER) AS height,
             CAST(1 AS INTEGER) AS frames,
             CAST(0 AS INTEGER) AS sample_rate,
             CAST(0 AS BIGINT) AS duration_ms, n AS data_bytes
           FROM base WHERE doc_id % 5 <= 1),
         aud AS (SELECT doc_id, 'audio' AS modality, 'wav' AS fmt,
             CAST(0 AS INTEGER) AS width, CAST(0 AS INTEGER) AS height,
             CAST(0 AS INTEGER) AS frames,
             CAST(CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
               WHEN 2 THEN 22050 ELSE 44100 END AS INTEGER)
               AS sample_rate,
             CAST(n // ((1 + doc_id % 2)
                 * (CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 2 END)) * 1000
               // (CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                 WHEN 2 THEN 22050 ELSE 44100 END) AS BIGINT)
               AS duration_ms,
             n AS data_bytes
           FROM base WHERE doc_id % 5 = 2),
         flc AS (SELECT doc_id, 'audio' AS modality, 'flac' AS fmt,
             CAST(0 AS INTEGER) AS width, CAST(0 AS INTEGER) AS height,
             CAST(0 AS INTEGER) AS frames,
             CAST(CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
               WHEN 2 THEN 44100 ELSE 96000 END AS INTEGER)
               AS sample_rate,
             CAST(CAST(n AS BIGINT) * 21 * 1000
               // (CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                 WHEN 2 THEN 44100 ELSE 96000 END) AS BIGINT)
               AS duration_ms,
             n AS data_bytes
           FROM base WHERE doc_id % 5 = 3),
         vid AS (SELECT doc_id, 'video' AS modality, 'mp4' AS fmt,
             CAST(0 AS INTEGER) AS width, CAST(0 AS INTEGER) AS height,
             CAST(0 AS INTEGER) AS frames,
             CAST(0 AS INTEGER) AS sample_rate,
             CAST(CAST(n AS BIGINT) * 3 * 1000
               // (CASE doc_id % 4 WHEN 0 THEN 600 WHEN 1 THEN 1000
                 WHEN 2 THEN 90000 ELSE 25 END) AS BIGINT)
               AS duration_ms,
             n AS data_bytes
           FROM base WHERE doc_id % 5 = 4)
         SELECT * FROM img UNION ALL SELECT * FROM aud
         UNION ALL SELECT * FROM flc UNION ALL SELECT * FROM vid
         ORDER BY doc_id""",
    // m16: the encoder's field formulas recomputed; duration =
    // n_samples·1000/sample_rate in floored integer arithmetic.
    "m16_flac_meta" ->
      """WITH t AS (SELECT doc_id,
           octet_length(encode(text)) AS n,
           CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
             WHEN 2 THEN 44100 ELSE 96000 END AS sr,
           CAST(1 + doc_id % 2 AS INTEGER) AS channels,
           CASE WHEN doc_id % 3 = 0 THEN 16 ELSE 24 END AS bits
         FROM documents)
         SELECT doc_id, 'flac' AS fmt,
           CAST(sr AS INTEGER) AS sample_rate, channels,
           CAST(bits AS INTEGER) AS bits,
           CAST(n * 21 AS BIGINT) AS n_samples,
           CAST(n AS INTEGER) AS data_bytes,
           CAST((n * 21 * 1000) // sr AS BIGINT) AS duration_ms
         FROM t ORDER BY doc_id""",
    // m15: the encoder's dim formulas recomputed; nbytes = the XMP
    // chunk's declared size (= the payload byte length, pad excluded).
    "m15_webp_meta" ->
      """SELECT doc_id, 'webp' AS fmt,
           CAST(1 + (octet_length(encode(text)) * 13) % 4096 AS INTEGER)
             AS width,
           CAST(1 + (octet_length(encode(text)) * 17) % 3072 AS INTEGER)
             AS height,
           CAST(1 AS INTEGER) AS frames,
           CAST(octet_length(encode(text)) AS INTEGER) AS nbytes
         FROM documents ORDER BY doc_id""",
    // m13: the encoder's dim formulas recomputed; nbytes = the payload
    // stashed after the 54-byte header pair.
    "m13_bmp_meta" ->
      """SELECT doc_id, 'bmp' AS fmt,
           CAST(1 + octet_length(encode(text)) % 1024 AS INTEGER)
             AS width,
           CAST(1 + (octet_length(encode(text)) * 3) % 768 AS INTEGER)
             AS height,
           CAST(1 AS INTEGER) AS frames,
           CAST(octet_length(encode(text)) AS INTEGER) AS nbytes
         FROM documents ORDER BY doc_id""",
    "m07_image_meta" ->
      """SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
             ELSE 'jpeg' END AS fmt,
           CAST(1 + octet_length(encode(text)) % 640 AS INTEGER) AS width,
           CAST(1 + (octet_length(encode(text)) * 7) % 480 AS INTEGER)
             AS height,
           CAST(CASE WHEN doc_id % 3 = 1
                THEN 1 + octet_length(encode(text)) % 30
                ELSE 1 END AS INTEGER) AS frames,
           CAST(octet_length(encode(text)) AS INTEGER) AS nbytes
         FROM documents ORDER BY doc_id""",
    "m05_chunk_payload" ->
      // DuckDB has no BLOB substring; the fixture text is pure ASCII
      // (octet_length(encode(text)) == length(text), both SFs), so VARCHAR
      // chunks are byte-identical to the Spark side's binary chunks.
      """WITH n AS (SELECT doc_id, text AS b,
             greatest(CAST(ceil(length(text) / 64.0) AS BIGINT), 1) AS m
           FROM documents)
         SELECT doc_id, CAST(u.i AS INTEGER) AS chunk_idx,
           CAST(u.i * 64 AS INTEGER) AS offset,
           CAST(length(substring(b, CAST(u.i * 64 + 1 AS INTEGER), 64))
             AS INTEGER) AS nbytes,
           md5(substring(b, CAST(u.i * 64 + 1 AS INTEGER), 64)) AS fp
         FROM n, LATERAL unnest(range(0, m)) AS u(i)
         ORDER BY doc_id, chunk_idx""",
    "m08_audio_frames" ->
      """WITH n AS (SELECT doc_id, text AS b,
             1 + CAST(ceil(greatest(length(text) - 96, 0) / 64.0)
               AS BIGINT) AS m
           FROM documents)
         SELECT doc_id, CAST(u.i AS INTEGER) AS frame_idx,
           CAST(u.i * 64 AS INTEGER) AS offset,
           CAST(length(substring(b, CAST(u.i * 64 + 1 AS INTEGER), 96))
             AS INTEGER) AS nbytes,
           md5(substring(b, CAST(u.i * 64 + 1 AS INTEGER), 96)) AS fp
         FROM n, LATERAL unnest(range(0, m)) AS u(i)
         ORDER BY doc_id, frame_idx""",
    "m06_patch_grid" ->
      """WITH f AS (
           SELECT doc_id,
             CAST(1 + octet_length(encode(text)) % 640 AS INTEGER) AS width,
             CAST(1 + (octet_length(encode(text)) * 7) % 480 AS INTEGER)
               AS height
           FROM documents),
         g AS (
           SELECT doc_id, width, height,
             CAST(ceil(width / 16.0) AS INTEGER) AS patches_x,
             CAST(ceil(height / 16.0) AS INTEGER) AS patches_y
           FROM f)
         SELECT doc_id, width, height, patches_x, patches_y,
           patches_x * patches_y AS n_patches,
           patches_x * patches_y + 1 AS vis_tokens
         FROM g ORDER BY doc_id""",
    "m04_resize" ->
      """WITH f AS (
           SELECT doc_id,
             CAST(1 + octet_length(encode(text)) % 640 AS INTEGER) AS width,
             CAST(1 + (octet_length(encode(text)) * 7) % 480 AS INTEGER) AS height
           FROM documents),
         s AS (
           SELECT *, least(256.0 / width, 256.0 / height, 1.0) AS sc FROM f)
         SELECT doc_id, width, height, round(sc, 6) AS scale,
           CAST(greatest(floor(width * sc), 1) AS INTEGER) AS out_w,
           CAST(greatest(floor(height * sc), 1) AS INTEGER) AS out_h
         FROM s ORDER BY doc_id"""
  )
}
