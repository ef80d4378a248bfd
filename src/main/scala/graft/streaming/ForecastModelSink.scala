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

  /** One micro-batch application — the testable core of [[sink]].
    * `batch` carries observations in the model's input shape:
    * (`brand`, `x` month index, `y` price). */
  private[graft] def applyModelBatch(batch: DataFrame, batchId: Long, stateDir: String): Unit =
    StreamStateStore.applyBatch(batch.sparkSession, batchId, stateDir, "forecastModelSink") {
      case Some(prev) => Forecast.mergeStatsFrames(prev, Forecast.olsStatsExact(batch))
      case None => Forecast.olsStatsExact(batch)
    }

  /** foreachBatch sink maintaining the persisted model continuously from
    * a stream of (`brand`, `x`, `y`) observations. Read the live model
    * with `Forecast.forecastFromModel(spark, stateDir)`. */
  def sink(observations: DataFrame, stateDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    observations.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyModelBatch(batch, batchId, stateDir)
      }
}
