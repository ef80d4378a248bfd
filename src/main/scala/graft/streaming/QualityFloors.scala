package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Streaming maintenance of the per-language quality floors that
  * `TextAnalysis.qualityThresholds` derives in batch: a `foreachBatch`
  * sink folds each micro-batch of scored documents into a persisted
  * per-(language, bucket) COUNT HISTOGRAM of quality scores, and the
  * floor (the [[graft.operators.TextAnalysis.QualityQuantile]] quantile)
  * is read off the cumulative histogram on demand.
  *
  * The histogram is the streaming-friendly quantile sketch: count sums
  * are exact and associative, so the maintained state after any sequence
  * of micro-batches is BIT-IDENTICAL to the histogram of everything seen
  * (no drift across batches, and task retries are safe) — the same
  * merge-exactness contract as the rollup sink. Accuracy is the
  * quantization bound: the derived floor is the lower edge of the bucket
  * holding the target order statistic, so it sits within
  * 1/[[QualityFloors.Buckets]] BELOW the exact value (spec-asserted) —
  * same epsilon-style guarantee shape as the batch operator's
  * `approx_percentile` swap, but with a state table that is mergeable
  * across micro-batches, executors, and restarts.
  *
  * Scale notes: state is at most languages x [[QualityFloors.Buckets]]
  * rows regardless of corpus size; the per-batch aggregation is map-side
  * combined on (lang, bucket). Floors derive via a per-language window
  * over <= [[QualityFloors.Buckets]] rows — dim-cardinality, never
  * fact-scale.
  */
object QualityFloors {

  /** Histogram resolution over the score range [0, 1]: the floor's
    * quantization error is below 1/Buckets ~ 0.002 on a 0-1 score —
    * negligible against the score's own heuristic noise. */
  val Buckets = 512

  /** Bucket index of a quality score, clamped into [0, Buckets-1] so an
    * out-of-range score cannot corrupt the histogram. */
  private def bucketOf(score: Column): Column =
    least(
      lit(Buckets - 1),
      greatest(lit(0), floor(score * Buckets).cast(IntegerType)))

  /** One micro-batch's histogram partial: (pred_lang, bucket, n) counts
    * over scored docs (confident language IDs only, matching the batch
    * operator's filter). */
  def partialHistogram(scored: DataFrame): DataFrame =
    scored
      .filter(col("pred_lang") =!= "und")
      // null/NaN scores are EXCLUDED, matching the batch operator whose
      // percentile() ignores them — bucketing them (null falls to 0
      // through greatest's null-skip, NaN casts to 0) would inflate
      // bucket 0 and drag floors down
      .filter(col("quality_score").isNotNull && !isnan(col("quality_score")))
      .groupBy(col("pred_lang"), bucketOf(col("quality_score")).as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Exact associative merge: counts add. */
  def mergeHistograms(parts: Seq[DataFrame]): DataFrame =
    parts
      .reduce(_ unionByName _)
      .groupBy(col("pred_lang"), col("bucket"))
      .agg(sum(col("n")).as("n"))

  /** Per-language floors from a histogram: the lower edge of the bucket
    * containing the QUANTILE_CONT target order statistic (rank
    * q*(n_docs-1), the same definition the batch operator and its DuckDB
    * oracle use). Always <= the exact quantile, and within one bucket
    * width of the order statistic it quantizes. */
  def floorsOf(hist: DataFrame): DataFrame = {
    val q = graft.operators.TextAnalysis.QualityQuantile
    val byLang = Window.partitionBy(col("pred_lang"))
    val cumW = byLang.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum(col("n")).over(cumW))
      .withColumn("n_docs", sum(col("n")).over(byLang))
      .withColumn("rank", lit(q) * (col("n_docs") - 1).cast("double"))
      .filter(col("cum") > col("rank"))
      .groupBy(col("pred_lang"))
      .agg(
        first(col("n_docs")).as("n_docs"),
        (min(col("bucket")).cast("double") / Buckets).as("q_low"))
  }

  /** The maintained floors at `stateDir`'s current state. */
  def currentFloors(spark: SparkSession, stateDir: String): DataFrame =
    floorsOf(spark.read.parquet(stateDir))

  /** One micro-batch application — the testable core of [[sink]], with
    * [[StreamStateStore]]'s replay-idempotency and crash-safe swap. */
  private[graft] def applyFloorBatch(batch: DataFrame, batchId: Long, stateDir: String): Unit =
    StreamStateStore.applyBatch(batch.sparkSession, batchId, stateDir, "qualityFloorSink") {
      case Some(prev) => mergeHistograms(Seq(prev, partialHistogram(batch)))
      case None => partialHistogram(batch)
    }

  /** foreachBatch sink maintaining the floors continuously from a stream
    * of scored docs (`pred_lang`, `quality_score`, ...). */
  def sink(scored: DataFrame, stateDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    scored.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyFloorBatch(batch, batchId, stateDir)
      }
}
