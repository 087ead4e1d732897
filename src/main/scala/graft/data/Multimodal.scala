package graft.data

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: media (image/audio/video) as opaque `binary`
 * columns with typed metadata, plus decode / feature-extract / frame-sample
 * stages.
 *
 * The container has no codec libraries, so the *decode* step is a
 * clearly-marked deterministic stub ([[StubCodec]]); everything Spark-side
 * — schema, binary expressions, batch-shaped `mapPartitions` pipeline,
 * partitioning — is real. In production, swap `StubCodec.decodeImage` for
 * a JNI/javacv call; the plan shape does not change.
 *
 * Column-level ops stay native (codegen'd binary/hex expressions); the
 * per-row decode runs as a typed `mapPartitions` so the (expensive) codec
 * amortizes any per-partition init, mirroring `mapInPandas` batch
 * semantics on the JVM.
 */
object Multimodal {

  /** Typed row for the media pipeline. */
  case class MediaRow(media_id: Long, format: String, content: Array[Byte])

  /** Extracted features (fixed-dim, like an image-encoder output). */
  case class MediaFeatures(media_id: Long, format: String, byte_len: Int,
      features: Array[Double])

  /** Deterministic stand-in for the real codec: in production this calls
   * the native decoder; here it derives a fixed-dim feature vector from
   * byte statistics so tests are reproducible. */
  object StubCodec {
    val FeatureDim = 8

    /** STUB — replace with real image decode + model encode. */
    def decodeImage(bytes: Array[Byte]): Array[Double] = {
      val f = new Array[Double](FeatureDim)
      var i = 0
      while (i < bytes.length) {
        f(i % FeatureDim) += (bytes(i) & 0xff) / 255.0
        i += 1
      }
      if (bytes.length > 0) { var j = 0; while (j < FeatureDim) { f(j) /= math.max(1, (bytes.length + FeatureDim - 1 - j) / FeatureDim); j += 1 } }
      f
    }
  }

  /** Opaque binary from a UTF-8 string (test-data synthesizer: stands in
   * for reading real media bytes). */
  def asBinary(text: Column): Column = encode(text, "UTF-8")

  /** Typed metadata for a binary media column. */
  def mediaMetadata(bin: Column, format: Column): Column =
    struct(
      length(bin).as("byte_len"),
      format.as("format"),
      TextFunctions.hash60(lower(hex(bin))).as("checksum"))

  /** "Frame sampling": every `stride`-th byte of the payload as an int
   * 0..255 — the binary analogue of video frame striding. Engine-portable
   * (hex + substring + hex-to-int only). */
  def sampleBytes(bin: Column, stride: Int, maxFrames: Int): Column = {
    val hexStr = lower(hex(bin))
    val nBytes = length(bin)
    val nFrames = least(ceil(nBytes / lit(stride.toDouble)).cast("int"), lit(maxFrames))
    when(nBytes > 0,
      transform(sequence(lit(0), nFrames - 1), f =>
        conv(hexStr.substr(f * (2 * stride) + 1, lit(2)), 16, 10).cast("int")))
      .otherwise(array().cast("array<int>"))
  }

  /** Batch decode via typed mapPartitions — the JVM mirror of a
   * `mapInPandas` decode stage. One codec "session" per partition. */
  def decodeFeatures(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here (expensive in real life)
      rows.map { r =>
        MediaFeatures(r.media_id, r.format, r.content.length,
          StubCodec.decodeImage(r.content))
      }
    }
  }

  /** End-to-end demo source: documents table → media rows (binary payload
   * + format tag derived from the source column). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      concat(lit("img/"), col("source")).as("format"),
      asBinary(col("text")).as("content"))
}
