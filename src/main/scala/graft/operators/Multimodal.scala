package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines — north-star ops, no counterpart in the reference.
  *
  * Media travel as opaque `binary` columns plus typed metadata, the pattern
  * used by large-scale multimodal corpora (WebDataset/Parquet-BLOB style):
  * the engine never interprets pixels on the hot path, only routes bytes and
  * metadata through narrow per-partition transformations.
  *
  * ==STUBBED DECODERS==
  * This container has no image/audio codecs, so `decodeImageStub` /
  * `sampleFramesStub` produce *deterministic fake features* derived from the
  * bytes (documented below). The Spark-side plumbing — schema, batching,
  * partition-parallel map, output shape — is real and tested; swapping the
  * stub body for a JNI/Pandas-UDF decoder changes no plan shape.
  */
object Multimodal {

  /** Canonical media schema: (media_id, kind, bytes, width, height,
    * sample_rate, duration_ms). */
  val mediaColumns: Seq[String] =
    Seq("media_id", "kind", "bytes", "width", "height", "sample_rate", "duration_ms")

  /** Wrap a text/doc table into a synthetic media table (bytes = UTF-8 of
    * text) — fixture generator for tests; mirrors how a real pipeline would
    * carry parquet BLOB columns. */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      (when(pmod(col("doc_id"), lit(3)) === 0, "image")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
        .otherwise("video")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      (pmod(col("doc_id"), lit(4)) * 160 + 320).cast("int").as("width"),
      (pmod(col("doc_id"), lit(4)) * 90 + 180).cast("int").as("height"),
      lit(16000).as("sample_rate"),
      (col("n_chars") * 10).cast("long").as("duration_ms"))

  case class MediaFeature(media_id: Long, kind: String, n_bytes: Int,
      feature: Array[Float])

  /** Per-item feature extraction over binary media, partition-parallel.
    *
    * STUB: the "decoder" hashes fixed-size byte windows into a `dim`-float
    * vector (deterministic in the bytes). A real deployment replaces ONLY
    * the window-hash with codec + model inference; the `mapPartitions`
    * batching, schema, and parallelism are exactly what that deployment
    * uses. */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.select(col("media_id").cast("long"), col("kind"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, kind, bytes) =>
          // --- STUB DECODE: deterministic byte-window hash "features" ---
          val feat = new Array[Float](dim)
          var i = 0
          while (i < bytes.length) {
            val slot = i % dim
            feat(slot) = feat(slot) + (bytes(i) & 0xFF) * 0.001f
            i += 1
          }
          MediaFeature(id, kind, bytes.length, feat)
        }
      }
  }

  /** "Resize" metadata transform: recompute target dims preserving aspect
    * ratio — pure column math (the byte re-encode would live in the stub). */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide.toDouble) / greatest(col("width"), col("height")).cast("double"))
    media
      .withColumn("target_width", floor(col("width") * scale).cast("int"))
      .withColumn("target_height", floor(col("height") * scale).cast("int"))
  }

  /** Frame-sampling plan for videos: every `everyMs` ms timestamps, as an
    * array column — pure plan, bounded by duration. */
  def frameSamplePlan(media: DataFrame, everyMs: Long): DataFrame =
    media.withColumn("frame_ts_ms",
      when(col("kind") === "video",
        sequence(lit(0L), col("duration_ms"), lit(everyMs)))
        .otherwise(array().cast("array<bigint>")))
}
