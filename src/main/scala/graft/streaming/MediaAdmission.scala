package graft.streaming

import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming PERCEPTUAL admission for media ingest — the media twin of
  * [[DedupAdmission]]: each micro-batch of transcoded media rows
  * (media_id, payload, meta — real containers, the shape a door sees)
  * is decoded once and reduced to its per-asset 64-bit perceptual key,
  * and the persisted store admits only first-seen (family, hash)
  * content. The key is container- and resolution-invariant by
  * construction (images: dHash over decoded pixels; audio: the
  * framed-FFT band-delta hash; video: the contact-sheet MOSAIC dHash —
  * one key per asset; a video whose container yields only per-frame
  * hashes folds its ordered frame-hash roll into one key instead), so
  * the same asset arriving re-encoded in a different LOSSLESS
  * container is refused as a duplicate — the cross-container case the
  * planted duplicate-ingest ground truth exercises, spec-asserted.
  * A LOSSY re-encode (JPEG/GIF) can drift decoded pixels and so the
  * hash by a bit or two; exact-key admission then admits both copies,
  * and the batch-side hamming-tolerant dedup is what reconciles them —
  * the same precision split the batch family documents.
  *
  * Admission keys on hash EQUALITY — the exact-perceptual gate a door
  * admission wants (decide per arriving asset, no pairing). Hamming-
  * tolerant NEAR-dup resolution stays batch-side
  * ([[Multimodal.imageDedup]] and friends), where both sides of a
  * candidate pair are visible to the capped pigeonhole join.
  *
  * Store and replay semantics are [[DedupAdmission]]'s exactly (the
  * shared [[DedupAdmission.firstArrivalFold]] + [[StreamStateStore]]
  * exactly-once batch application): first-arrival canonical id, fold-in
  * copy counts, state grows with distinct CONTENT seen — a
  * duplicate-heavy media stream converges. Per-batch work is the one
  * decode pass plus a hash-keyed fold; admission never rescans history.
  */
object MediaAdmission {

  /** Canonical (content_hash, keep_media_id, n_copies) rows of one
    * batch — one decode pass ([[Multimodal.hashRows]]), smallest
    * media_id canonical within the batch. Per asset the key is the
    * image/audio/mosaic hash row; a video whose container decodes to
    * per-frame rows WITHOUT a mosaic (the non-PPM stub-codec path)
    * folds its ordered (frame_idx, hash) roll into one deterministic
    * key, so identical such videos still collide instead of slipping
    * through unkeyed. Payloads with no decodable content produce no
    * key and are NOT admitted (no perceptual evidence — the hashRows
    * drop contract). */
  private[graft] def batchCanonical(spark: SparkSession, batch: DataFrame): DataFrame = {
    val rows = Multimodal.hashRows(spark, batch).toDF()
      .localCheckpoint(eager = false) // feeds three consumers below
    val direct = rows.filter(col("family") =!= "frame")
      .select(
        concat_ws(":", col("family"), hex(col("hash"))).as("content_hash"),
        col("media_id"))
    val frameRoll = rows.filter(col("family") === "frame")
      .join(rows.filter(col("family") === "mosaic").select(col("media_id")),
        Seq("media_id"), "left_anti")
      .groupBy(col("media_id"))
      // sort_array makes the collect_list order-invariant (frame_idx is
      // unique per asset, so the struct order is total)
      .agg(xxhash64(sort_array(collect_list(
        struct(col("frame_idx"), col("hash"))))).as("hash"))
      .select(
        concat_ws(":", lit("frameroll"), hex(col("hash"))).as("content_hash"),
        col("media_id"))
    direct.unionByName(frameRoll)
      .groupBy(col("content_hash"))
      .agg(min(col("media_id")).as("keep_media_id"), count(lit(1)).as("n_copies"))
  }

  /** One micro-batch application — the testable core of [[sink]]. */
  private[graft] def applyAdmissionBatch(
      batch: DataFrame, batchId: Long, stateDir: String): Unit =
    StreamStateStore.applyBatch(
      batch.sparkSession, batchId, stateDir, "mediaAdmissionSink") {
      case None => batchCanonical(batch.sparkSession, batch)
      case Some(prev) => DedupAdmission.firstArrivalFold(
        prev, batchCanonical(batch.sparkSession, batch),
        carry = Seq("keep_media_id"))
    }

  /** One micro-batch against the BUCKETED store — the at-scale layout
    * ([[DedupAdmission.sinkBucketed]]'s shape): per-batch IO is
    * O(content in touched buckets), not O(store); the store grows with
    * distinct assets ever admitted, so at warehouse scale the
    * whole-store rewrite of [[applyAdmissionBatch]] is the thing to
    * shed. */
  private[graft] def applyAdmissionBatchBucketed(
      batch: DataFrame, batchId: Long, stateDir: String,
      nBuckets: Int = DedupAdmission.StoreBuckets): Unit =
    StreamStateStore.applyBatchBucketed(
      batch.sparkSession, batchId, stateDir, "mediaAdmissionSink",
      keyCol = "content_hash", nBuckets)(
      batchCanonical(batch.sparkSession, batch)) {
      case (None, cur) => cur
      case (Some(prev), cur) => DedupAdmission.firstArrivalFold(
        prev, cur, carry = Seq("keep_media_id", "b"))
    }

  /** foreachBatch sink over the bucketed store. */
  def sinkBucketed(media: DataFrame, stateDir: String,
      nBuckets: Int = DedupAdmission.StoreBuckets)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    media.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyAdmissionBatchBucketed(batch, batchId, stateDir, nBuckets)
      }

  /** The admitted store at `stateDir`'s current state:
    * (content_hash, keep_media_id, n_copies) with content_hash =
    * "family:hex(perceptual hash)". */
  def currentStore(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(stateDir)

  /** foreachBatch sink maintaining the admitted store from a stream of
    * transcoded media rows. */
  def sink(media: DataFrame, stateDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    media.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyAdmissionBatch(batch, batchId, stateDir)
      }
}
