package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * with decode/feature-extraction run as typed partition-wise functions.
  *
  * Real image/audio/video codecs are not available in this environment, so
  * the DECODE STEP IS A STUB — [[FakeDecoder]] derives deterministic
  * pseudo-features from the bytes. Everything around it is the real
  * production shape: a `struct(content BINARY, mime STRING, meta MAP)`
  * payload column, partition-batched decoding through `mapPartitions`
  * (one decoder instance per partition, the pattern a JNI/FFmpeg/libvips
  * binding needs), and explode-based frame sampling. Swap [[FakeDecoder]]
  * for a real codec and nothing else changes.
  */
object MultimodalOps {

  /** Typed decoded-media record (the decoder's batch output shape). */
  final case class MediaFeatures(doc_id: Long, nbytes: Int, width: Int,
                                 height: Int, frames: Int)

  /** Decoder contract: bytes → features. One instance per partition. */
  trait Decoder extends Serializable {
    def decode(id: Long, bytes: Array[Byte]): MediaFeatures
  }

  /** Deterministic stand-in for a real codec (???-equivalent, but runnable
    * and testable): features are pure functions of the byte length. */
  object FakeDecoder extends Decoder {
    def decode(id: Long, bytes: Array[Byte]): MediaFeatures = {
      val n = bytes.length
      MediaFeatures(id, n, 1 + n % 640, 1 + (n * 7) % 480, 1 + n % 30)
    }
  }

  /** Pack a text column as a multimodal payload:
    * struct(content BINARY, mime STRING, meta MAP<STRING,STRING>). */
  def packPayload(df: DataFrame, idCol: String, textCol: String,
                  mime: String, metaCols: Seq[String]): DataFrame =
    df.select(col(idCol),
      struct(
        encode(col(textCol), "UTF-8").as("content"),
        lit(mime).as("mime"),
        map(metaCols.flatMap(m => Seq(lit(m), col(m).cast("string"))): _*)
          .as("meta")).as("payload"))

  /** Decode payloads partition-wise: one [[Decoder]] per partition (the
    * shape that amortizes per-process codec init), typed rows out. The
    * decode itself is an optimization barrier by nature (opaque bytes);
    * keep it LAST in the pipeline, after all pruning/filtering. */
  def decodeFeatures(packed: DataFrame, idCol: String,
                     decoder: Decoder): Dataset[MediaFeatures] = {
    implicit val enc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
    implicit val inEnc: Encoder[(Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    packed.select(col(idCol).cast("long"), col("payload.content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val d = decoder // per-partition instance
        it.map { case (id, bytes) => d.decode(id, bytes) }
      }
  }

  /** Resize plumbing: aspect-preserving fit of each media item into a
    * `maxW`×`maxH` box, never upscaling — the geometry every image
    * pipeline computes before the resample. Pure native expressions over
    * the decoded feature frame (the pixel resample itself belongs in the
    * partition-wise [[Decoder]], next to the codec). Adds
    * `scale` (6dp), `out_w`, `out_h` (floored, min 1). */
  def resizeToFit(features: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW).cast("double") / col("width"),
      lit(maxH).cast("double") / col("height"), lit(1.0))
    features
      .withColumn("scale", round(scale, 6))
      .withColumn("out_w",
        greatest(floor(col("width") * scale), lit(1)).cast("int"))
      .withColumn("out_h",
        greatest(floor(col("height") * scale), lit(1)).cast("int"))
  }

  /** ViT patch-grid manifest: the ⌈w/p⌉ × ⌈h/p⌉ patch layout a vision
    * transformer tokenizes per image, plus the visual token count
    * (patches + 1 CLS) — the budget planner image-token packing reads
    * before interleaving images into a text shard. Pure integer
    * arithmetic over the decoded feature frame; at 100 TB this is a
    * projected scan, no shuffle. */
  def patchGrid(features: DataFrame, patch: Int): DataFrame = {
    require(patch >= 1, "patch size must be >= 1")
    val px = ceil(col("width") / lit(patch.toDouble)).cast("int")
    val py = ceil(col("height") / lit(patch.toDouble)).cast("int")
    features.select(col("doc_id"), col("width"), col("height"),
      px.as("patches_x"), py.as("patches_y"),
      (px * py).as("n_patches"),
      (px * py + lit(1)).as("vis_tokens"))
  }

  /** Frame sampling plumbing: every `step`-th frame index per document,
    * exploded to (doc_id, frame_no) rows — the fan-out a video pipeline
    * feeds to per-frame feature extraction. */
  def sampleFrames(features: DataFrame, step: Int): DataFrame =
    features.select(col("doc_id"),
      explode(sequence(lit(0), col("frames") - 1, lit(step))).as("frame_no"))

  /** Segment each payload's binary content into fixed-size chunks — the
    * audio/video windowing shape (constant-duration segments feeding a
    * per-chunk decoder). Pure expressions: the chunk array is staged in a
    * Project BEFORE posexplode (Generate evaluates its generator input
    * interpreted), then fans out to (id, chunk_idx, offset, nbytes, chunk)
    * rows — per-partition, no shuffle, no driver state. The final chunk is
    * short (`len mod chunkBytes`), like a trailing audio frame; empty
    * content yields one empty chunk row. */
  def chunkPayload(packed: DataFrame, idCol: String,
                   chunkBytes: Int): DataFrame = {
    require(chunkBytes >= 1, "chunkBytes must be >= 1")
    val content = col("payload.content")
    val n = ceil(length(content).cast("double") / chunkBytes).cast("int")
    val chunks = transform(
      sequence(lit(0), greatest(n, lit(1)) - 1),
      i => content.substr(i * chunkBytes + 1, lit(chunkBytes)))
    packed
      .select(col(idCol), chunks.as("__chunks"))
      .select(col(idCol), posexplode(col("__chunks")))
      .toDF(idCol, "chunk_idx", "chunk")
      .select(col(idCol), col("chunk_idx"),
        (col("chunk_idx") * chunkBytes).as("offset"),
        length(col("chunk")).cast("int").as("nbytes"), col("chunk"))
  }
}
