package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: opaque binary
  * payloads with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages as batched per-partition transforms.
  *
  * The container deliberately has no image/audio codecs, so the DECODE
  * KERNEL is a clearly-marked deterministic stub ([[StubCodec]]) — the
  * Spark-side contract (schema, batching, partition-local execution,
  * output shapes) is real and spec-tested, and a production deployment
  * swaps [[StubCodec]] for a JNI/javacpp codec without touching the plan.
  *
  * Scale notes: payloads never pass through a shuffle — every stage is a
  * narrow `mapPartitions` so a 100 TB media corpus streams partition-by-
  * partition; metadata-only queries prune the payload column at the scan
  * (kept as a separate top-level column, not inside a struct, precisely so
  * parquet column pruning can skip the bytes).
  */
object Multimodal {

  case class MediaMeta(kind: String, width: Int, height: Int, sampleRateHz: Int, nFrames: Int)

  case class MediaItem(media_id: Long, payload: Array[Byte], meta: MediaMeta)

  case class MediaFeatures(media_id: Long, kind: String, features: Array[Float])

  case class Frame(media_id: Long, frame_idx: Int, payload: Array[Byte])

  /** STUB — stands in for a real codec (missing by design in this
    * environment). Deterministic: features are a folded byte histogram,
    * "resize" is byte re-striding, frames are fixed-stride slices. */
  object StubCodec {
    val FeatureDim = 16

    def decodeFeatures(payload: Array[Byte]): Array[Float] = {
      val acc = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        acc(i % FeatureDim) += (payload(i) & 0xFF) / 255.0f
        i += 1
      }
      if (payload.length > 0) {
        val n = math.max(1, payload.length / FeatureDim)
        var j = 0
        while (j < FeatureDim) { acc(j) /= n; j += 1 }
      }
      acc
    }

    def resize(payload: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
      val out = new Array[Byte](math.max(0, outW * outH))
      if (payload.nonEmpty && out.nonEmpty) {
        var i = 0
        while (i < out.length) {
          out(i) = payload((i.toLong * payload.length / out.length).toInt)
          i += 1
        }
      }
      out
    }

    def sampleFrames(payload: Array[Byte], nFrames: Int, every: Int): Iterator[(Int, Array[Byte])] =
      if (nFrames <= 0 || payload.isEmpty) Iterator.empty
      else {
        val frameLen = math.max(1, payload.length / nFrames)
        (0 until nFrames by math.max(1, every)).iterator.map { f =>
          val from = f * frameLen
          (f, payload.slice(from, math.min(from + frameLen, payload.length)))
        }
      }
  }

  /** Derive a deterministic media corpus from the documents table (binary
    * payloads + typed metadata) — the harness ships no media files. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast(BinaryType).as("payload"),
      struct(
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        (col("n_chars") % 64 + 1).cast(IntegerType).as("width"),
        (col("n_chars") % 48 + 1).cast(IntegerType).as("height"),
        lit(16000).as("sampleRateHz"),
        (col("n_chars") % 10 + 1).cast(IntegerType).as("nFrames"))
        .as("meta"))

  /** Decode + feature-extract, batched per partition (no shuffle). */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaItem].mapPartitions { it =>
      it.map(m => MediaFeatures(m.media_id, m.meta.kind, StubCodec.decodeFeatures(m.payload)))
    }
  }

  /** Resize image payloads to a fixed raster; non-images pass through. */
  def resizeImages(spark: SparkSession, media: DataFrame, outW: Int, outH: Int): Dataset[MediaItem] = {
    import spark.implicits._
    media.as[MediaItem].mapPartitions { it =>
      it.map { m =>
        if (m.meta.kind == "image")
          MediaItem(m.media_id, StubCodec.resize(m.payload, outW, outH),
            m.meta.copy(width = outW, height = outH))
        else m
      }
    }
  }

  /** Sample every `every`-th frame of video payloads (one output row per
    * sampled frame). */
  def sampleFrames(spark: SparkSession, media: DataFrame, every: Int = 2): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaItem].mapPartitions { it =>
      it.filter(_.meta.kind == "video").flatMap { m =>
        StubCodec.sampleFrames(m.payload, m.meta.nFrames, every)
          .map { case (idx, bytes) => Frame(m.media_id, idx, bytes) }
      }
    }
  }
}
