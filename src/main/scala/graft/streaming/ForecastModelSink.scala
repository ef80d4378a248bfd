package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.operators.Forecast

/** Streaming maintenance of the persisted forecast model: a
  * `foreachBatch` sink folds each micro-batch of observations into the
  * per-group exact OLS sufficient-statistics frame that IS the model
  * (`Forecast.writeForecastModel`). Every statistic is an associative
  * exact aggregate (counts, integer sums, decimal sums, max), so the
  * maintained model after any sequence of micro-batches is
  * BIT-IDENTICAL to training once on everything seen — the streamed
  * model serves the same forecasts as a nightly retrain, continuously,
  * without ever re-scanning history (spec-gated, incl. the derived
  * `forecastFromModel` output).
  *
  * Replay and crash safety come from [[StreamStateStore]] (the batch
  * `mergeForecastModel` path overwrites in place and is only safe under
  * an external scheduler that never replays; an at-least-once stream
  * needs the marker discipline).
  *
  * Scale notes: each micro-batch contributes ONE group-cardinality
  * aggregation (map-side combined over the batch); the state table is
  * group-cardinality regardless of stream length.
  */
object ForecastModelSink {

  /** The widened per-(brand, x) state layer lives next to the OLS frame.
    * Two layers, one sink: the group-cardinality OLS frame serves the
    * linear/interval family unchanged, and the per-x rollup serves the
    * families whose statistics are NOT associative at group grain —
    * monthly seasonal means, and changepoint hinge moments whose knots
    * move when a batch extends a group's x-range (see
    * `Forecast.xStatsExact`). Each layer has its own replay marker, so a
    * crash between the two writes replays the batch into whichever layer
    * missed it and skips the other — both end exactly-once. */
  private[graft] def xStateDir(stateDir: String): String = stateDir + "_x"

  /** One micro-batch application — the testable core of [[sink]].
    * `batch` carries observations in the model's input shape:
    * (`brand`, `x` month index, `y` price). */
  private[graft] def applyModelBatch(batch: DataFrame, batchId: Long, stateDir: String): Unit = {
    StreamStateStore.applyBatch(batch.sparkSession, batchId, stateDir, "forecastModelSink") {
      case Some(prev) => Forecast.mergeStatsFrames(prev, Forecast.olsStatsExact(batch))
      case None => Forecast.olsStatsExact(batch)
    }
    StreamStateStore.applyBatch(
      batch.sparkSession, batchId, xStateDir(stateDir), "forecastModelSink.x") {
      case Some(prev) => Forecast.mergeXStatsFrames(prev, Forecast.xStatsExact(batch))
      case None => Forecast.xStatsExact(batch)
    }
  }

  /** Live seasonal forecast from the sink-maintained widened state —
    * bit-identical to `Forecast.seasonalForecast`'s fact-scan fit over
    * everything the stream has seen (spec-gated). */
  def seasonalForecastFromState(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame =
    Forecast.seasonalForecastFromState(spark.read.parquet(xStateDir(stateDir)))

  /** Live changepoint forecast from the sink-maintained widened state —
    * bit-identical to `Forecast.forecastChangepoint`'s fact-scan fit. */
  def changepointForecastFromState(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame =
    Forecast.forecastChangepointFromState(spark.read.parquet(xStateDir(stateDir)))

  /** foreachBatch sink maintaining the persisted model continuously from
    * a stream of (`brand`, `x`, `y`) observations. Read the live model
    * with `Forecast.forecastFromModel(spark, stateDir)`,
    * [[seasonalForecastFromState]], or [[changepointForecastFromState]]. */
  def sink(observations: DataFrame, stateDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    observations.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyModelBatch(batch, batchId, stateDir)
      }
}
