package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator inventory.
  * Every implemented operator is exposed as a named query over an sf
  * directory plus (where SQL-expressible) a DuckDB oracle equivalent.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pricing_summary" -> ((s, dir) => PricingSummary(s, dir)),
    "q_dim_build" -> ((s, dir) => StarSchema.dimBuild(s, dir)),
    "q_dedup_merge" -> ((s, dir) => StarSchema.dedupMerge(s, dir)),
    "q_date_dim" -> ((s, dir) => StarSchema.dateDim(s, dir)),
    "q_star_join" -> ((s, dir) => StarSchema.starJoin(s, dir)),
    "q_price_usd" -> ((s, dir) => StarSchema.priceUsd(s, dir)),
    "q_ml_extract" -> ((s, dir) => StarSchema.mlExtract(s, dir)),
    "q_unit_normalize" -> ((s, dir) => Units.unitNormalize(s, dir)),
    "q_price_per_unit" -> ((s, dir) => Units.pricePerUnit(s, dir)),
    "q_impute_mean" -> ((s, dir) => Impute.meanImpute(s, dir)),
    "q_impute_group_mean" -> ((s, dir) => Impute.groupMeanImpute(s, dir)),
    "q_seasonal_agg" -> ((s, dir) => Seasonal.seasonalAgg(s, dir)),
    "q_monthly_trend" -> ((s, dir) => Seasonal.monthlyTrend(s, dir)),
    "q_moving_avg" -> ((s, dir) => Seasonal.movingAvg(s, dir)),
    "q_topk_per_group" -> ((s, dir) => TopK.topkPerGroup(s, dir)),
    "q_forecast_linear" -> ((s, dir) => Forecast.forecastLinear(s, dir)),
    "q_seasonal_forecast" -> ((s, dir) => Forecast.seasonalForecast(s, dir)),
    "q_covariate_corr" -> ((s, dir) => Stats.covariateCorr(s, dir)),
    "q_pivot_monthly" -> ((s, dir) => Reshape.pivotMonthly(s, dir)),
    "q_unpivot_wide" -> ((s, dir) => Reshape.unpivotWide(s, dir)),
    "q_sessionize" -> ((s, dir) => Events.sessionize(s, dir)),
    "q_event_windows" -> ((s, dir) => Events.eventWindows(s, dir))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_pricing_summary" -> PricingSummary.oracle,
    "q_dim_build" -> StarSchema.dimBuildOracle,
    "q_dedup_merge" -> StarSchema.dedupMergeOracle,
    "q_date_dim" -> StarSchema.dateDimOracle,
    "q_star_join" -> StarSchema.starJoinOracle,
    "q_price_usd" -> StarSchema.priceUsdOracle,
    "q_ml_extract" -> StarSchema.mlExtractOracle,
    "q_unit_normalize" -> Units.unitNormalizeOracle,
    "q_price_per_unit" -> Units.pricePerUnitOracle,
    "q_impute_mean" -> Impute.meanImputeOracle,
    "q_impute_group_mean" -> Impute.groupMeanImputeOracle,
    "q_seasonal_agg" -> Seasonal.seasonalAggOracle,
    "q_monthly_trend" -> Seasonal.monthlyTrendOracle,
    "q_moving_avg" -> Seasonal.movingAvgOracle,
    "q_topk_per_group" -> TopK.topkPerGroupOracle,
    "q_forecast_linear" -> Forecast.forecastLinearOracle,
    "q_seasonal_forecast" -> Forecast.seasonalForecastOracle,
    "q_covariate_corr" -> Stats.covariateCorrOracle,
    "q_pivot_monthly" -> Reshape.pivotMonthlyOracle,
    "q_unpivot_wide" -> Reshape.unpivotWideOracle,
    "q_sessionize" -> Events.sessionizeOracle,
    "q_event_windows" -> Events.eventWindowsOracle
  )
}
