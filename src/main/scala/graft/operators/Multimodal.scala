package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for a training-data pipeline: media as
  * opaque binary columns + typed metadata, with decode / feature
  * extraction / resize / frame-sampling as distributed per-partition
  * transforms.
  *
  * The Spark-side machinery (schema, batching, partition preservation,
  * deterministic output) is real and tested; the DECODE STEP IS A
  * DETERMINISTIC STUB — this container has no image/audio codec
  * libraries, so `decodeStub` derives pseudo pixel/sample statistics
  * from the payload bytes. Swapping in a real decoder changes only the
  * body of that one function; every data-movement property stays.
  */
object Multimodal {

  /** One decoded media item: dimensions + per-frame feature vector. */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int,
      features: Array[Double])

  /** Attach a synthetic binary payload + metadata struct to `documents`
    * (the fixtures carry no real media; payload bytes are the utf-8
    * text, which is deterministic and content-correlated). */
  def attachPayload(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video")).as("kind"),
        length(col("text")).cast("long").as("n_bytes")).as("meta"))

  /** STUB decoder: deterministic pseudo-decode of one payload.
    * A real implementation would parse the container format here. */
  private def decodeStub(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    kind match {
      case "image" => (256 + n % 256, 256 + (n / 7) % 256, 1)
      case "audio" => (1, 1, math.max(1, n / 64))
      case _       => (320, 240, math.max(1, n / 256))
    }
  }

  /** Distributed decode + feature extraction: one pass, partition-
    * preserving, no shuffle. Features = per-frame byte statistics
    * (stub for codec output). */
  def decodeFeatures(withPayload: DataFrame, frameFeatures: Int = 4): Dataset[MediaFeatures] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload
      .select(col("media_id"), col("payload"), col("meta.kind"), col("meta.n_bytes"))
      .as[(Long, Array[Byte], String, Long)]
      .mapPartitions { it =>
        it.map { case (id, payload, kind, nBytes) =>
          val (w, h, frames) = decodeStub(kind, payload)
          val feats = new Array[Double](math.min(frames, frameFeatures))
          var f = 0
          while (f < feats.length) {
            // per-frame byte-mean (stub feature; deterministic)
            val start = f * math.max(1, payload.length / math.max(1, feats.length))
            val end = math.min(payload.length,
              start + math.max(1, payload.length / math.max(1, feats.length)))
            var sum = 0L
            var i = start
            while (i < end) { sum += payload(i) & 0xff; i += 1 }
            feats(f) = if (end > start) sum.toDouble / (end - start) else 0.0
            f += 1
          }
          MediaFeatures(id, kind, nBytes, w, h, frames, feats)
        }
      }
  }

  /** Aspect-preserving resize planning over decoded media: target-fit
    * scale, output dimensions, and output byte budget (RGB) — the
    * shuffle-free arithmetic pass that precedes actual resampling. A
    * real implementation would resample pixels in the same partition
    * pass; the decode stub means only the dimension arithmetic is
    * meaningful here, and it is exactly what the oracle verifies. */
  def resizePlan(decoded: DataFrame, targetW: Int = 224, targetH: Int = 224): DataFrame =
    decoded
      .withColumn("scale", least(
        lit(targetW).cast("double") / col("width"),
        lit(targetH).cast("double") / col("height")))
      .withColumn("out_w",
        greatest(lit(1), floor(col("width") * col("scale")).cast("int")))
      .withColumn("out_h",
        greatest(lit(1), floor(col("height") * col("scale")).cast("int")))
      .withColumn("out_bytes",
        (col("out_w").cast("long") * col("out_h") * lit(3L) * col("n_frames")))

  /** Frame sampling: emit every k-th frame index with its byte slice —
    * the explode-shaped transform a video pipeline runs before
    * per-frame inference. One row per sampled frame, still no shuffle. */
  def sampleFrames(withPayload: DataFrame, everyK: Int = 10): DataFrame =
    withPayload
      .withColumn("n_frames",
        greatest(lit(1), (length(col("payload")) / 256).cast("int")))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))))
      .withColumn("frame_bytes",
        expr("substring(payload, frame_idx * 256 + 1, 256)"))
      .select(col("media_id"), col("meta.kind").as("kind"),
        col("frame_idx"), col("frame_bytes"))
}
