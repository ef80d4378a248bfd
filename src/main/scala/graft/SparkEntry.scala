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
    "q_topk_rows" -> ((s, dir) => TopK.topkRows(s, dir)),
    "q_forecast_linear" -> ((s, dir) => Forecast.forecastLinear(s, dir)),
    "q_forecast_interval" -> ((s, dir) => Forecast.forecastInterval(s, dir)),
    "q_forecast_weekly" -> ((s, dir) => Forecast.forecastWeekly(s, dir)),
    "q_forecast_changepoint" -> ((s, dir) => Forecast.forecastChangepoint(s, dir)),
    "q_forecast_horizon" -> ((s, dir) => Forecast.forecastHorizon(s, dir)),
    "q_topk_forecast" -> ((s, dir) => Forecast.forecastTopK(s, dir)),
    "q_forecast_recency" -> ((s, dir) => Forecast.forecastRecency(s, dir)),
    "q_seasonal_forecast" -> ((s, dir) => Forecast.seasonalForecast(s, dir)),
    "q_covariate_corr" -> ((s, dir) => Stats.covariateCorr(s, dir)),
    "q_hdi_volatility" -> ((s, dir) => Stats.hdiVolatility(s, dir)),
    "q_json_extract" -> ((s, dir) => Events.jsonExtract(s, dir)),
    "q_dedup_resolve" -> ((s, dir) => Dedup.dedupResolve(s, dir)),
    "q_asof_rates" -> ((s, dir) => AsOf.asofRates(s, dir)),
    "q_incremental_merge" -> ((s, dir) => Incremental.incrementalMonthly(s, dir)),
    "q_pivot_monthly" -> ((s, dir) => Reshape.pivotMonthly(s, dir)),
    "q_unpivot_wide" -> ((s, dir) => Reshape.unpivotWide(s, dir)),
    "q_sessionize" -> ((s, dir) => Events.sessionize(s, dir)),
    "q_event_windows" -> ((s, dir) => Events.eventWindows(s, dir)),
    "q_dedup_exact" -> ((s, dir) => TextAnalysis.dedupExact(s, dir)),
    "q_dedup_apply" -> ((s, dir) => TextAnalysis.dedupApply(s, dir)),
    "q_text_tokens" -> ((s, dir) => TextAnalysis.textTokens(s, dir)),
    "q_text_quality" -> ((s, dir) => TextAnalysis.textQuality(s, dir)),
    "q_lang_id" -> ((s, dir) => TextAnalysis.langId(s, dir)),
    "q_fingerprint" -> ((s, dir) => TextAnalysis.fingerprint(s, dir)),
    "q_train_split" -> ((s, dir) => TextAnalysis.trainSplit(s, dir)),
    "q_vocab_top" -> ((s, dir) => TextAnalysis.vocabTop(s, dir)),
    "q_corpus_mix" -> ((s, dir) => TextAnalysis.corpusMix(s, dir)),
    "q_pack_sequences" -> ((s, dir) => TextAnalysis.packSequences(s, dir)),
    "q_pack_bucketed" -> ((s, dir) => TextAnalysis.packSequencesBucketed(s, dir)),
    "q_corpus_clean" -> ((s, dir) => TextAnalysis.corpusClean(s, dir)),
    "q_corpus_stats" -> ((s, dir) => TextAnalysis.corpusStats(s, dir)),
    "q_quality_thresholds" -> ((s, dir) => TextAnalysis.qualityThresholds(s, dir)),
    "q_corpus_clean_adaptive" -> ((s, dir) => TextAnalysis.corpusCleanAdaptive(s, dir)),
    "q_winnow_fingerprint" -> ((s, dir) => TextAnalysis.winnowFingerprint(s, dir)),
    "q_text_bpe" -> ((s, dir) => TextAnalysis.textBpe(s, dir)),
    "q_dedup_ngram" -> ((s, dir) => Dedup.ngramJaccard(s, dir)),
    "q_dedup_minhash" -> ((s, dir) => Dedup.minhashDedup(s, dir)),
    "q_dedup_simhash" -> ((s, dir) => Dedup.simhashDedup(s, dir)),
    "q_dedup_simhash_idf" -> ((s, dir) => Dedup.simhashIdfDedup(s, dir)),
    "q_knn_brute" -> ((s, dir) => Similarity.knnBrute(s, dir)),
    "q_knn_lsh" -> ((s, dir) => Similarity.knnLsh(s, dir)),
    "q_knn_ivf" -> ((s, dir) => Similarity.knnIvfServe(s, dir)),
    "q_dedup_embedding" -> ((s, dir) => Similarity.embeddingDedup(s, dir)),
    "q_distinct_slices" -> ((s, dir) => Catalog.distinctSlices(s, dir)),
    "q_column_profile" -> ((s, dir) => Catalog.columnProfile(StarSchema.mlExtract(s, dir))),
    "q_contamination" -> ((s, dir) => Curation.contamination(s, dir)),
    "q_repetition_stats" -> ((s, dir) => Curation.repetitionStats(s, dir)),
    "q_sample_stratified" -> ((s, dir) => Curation.sampleStratified(s, dir)),
    "q_rarity_score" -> ((s, dir) => Curation.rarityScore(s, dir)),
    "q_knn_pq" -> ((s, dir) => Similarity.knnPqServe(s, dir)),
    "q_quality_classifier" -> ((s, dir) => QualityModel.qualityClassifierServe(s, dir)),
    "q_dedup_embedding_resolve" -> ((s, dir) => Similarity.embeddingDedupResolve(s, dir))
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
    "q_topk_rows" -> TopK.topkRowsOracle,
    "q_forecast_linear" -> Forecast.forecastLinearOracle,
    "q_forecast_interval" -> Forecast.forecastIntervalOracle,
    "q_forecast_weekly" -> Forecast.forecastWeeklyOracle,
    "q_forecast_changepoint" -> Forecast.forecastChangepointOracle,
    "q_forecast_horizon" -> Forecast.forecastHorizonOracle,
    "q_topk_forecast" -> Forecast.forecastTopKOracle,
    "q_forecast_recency" -> Forecast.forecastRecencyOracle,
    "q_seasonal_forecast" -> Forecast.seasonalForecastOracle,
    "q_covariate_corr" -> Stats.covariateCorrOracle,
    "q_hdi_volatility" -> Stats.hdiVolatilityOracle,
    "q_json_extract" -> Events.jsonExtractOracle,
    "q_dedup_resolve" -> Dedup.dedupResolveOracle,
    "q_asof_rates" -> AsOf.asofRatesOracle,
    "q_incremental_merge" -> Incremental.incrementalMonthlyOracle,
    "q_pivot_monthly" -> Reshape.pivotMonthlyOracle,
    "q_unpivot_wide" -> Reshape.unpivotWideOracle,
    "q_sessionize" -> Events.sessionizeOracle,
    "q_event_windows" -> Events.eventWindowsOracle,
    "q_dedup_exact" -> TextAnalysis.dedupExactOracle,
    "q_dedup_apply" -> TextAnalysis.dedupApplyOracle,
    "q_text_tokens" -> TextAnalysis.textTokensOracle,
    "q_text_quality" -> TextAnalysis.textQualityOracle,
    "q_lang_id" -> TextAnalysis.langIdOracle,
    "q_fingerprint" -> TextAnalysis.fingerprintOracle,
    "q_train_split" -> TextAnalysis.trainSplitOracle,
    "q_vocab_top" -> TextAnalysis.vocabTopOracle,
    "q_corpus_mix" -> TextAnalysis.corpusMixOracle,
    "q_corpus_clean" -> TextAnalysis.corpusCleanOracle,
    "q_corpus_stats" -> TextAnalysis.corpusStatsOracle,
    "q_quality_thresholds" -> TextAnalysis.qualityThresholdsOracle,
    "q_corpus_clean_adaptive" -> TextAnalysis.corpusCleanAdaptiveOracle,
    "q_dedup_ngram" -> Dedup.ngramJaccardOracle,
    "q_knn_brute" -> Similarity.knnBruteOracle,
    "q_distinct_slices" -> Catalog.distinctSlicesOracle,
    "q_column_profile" -> Catalog.columnProfileOracle,
    "q_contamination" -> Curation.contaminationOracle,
    "q_repetition_stats" -> Curation.repetitionStatsOracle,
    "q_sample_stratified" -> Curation.sampleStratifiedOracle,
    "q_rarity_score" -> Curation.rarityScoreOracle
    // q_dedup_minhash, q_dedup_simhash, q_knn_lsh, q_knn_ivf, q_knn_pq,
    // q_dedup_embedding, q_winnow_fingerprint, q_pack_sequences,
    // q_pack_bucketed, q_text_bpe: not SQL-expressible
    // (xxhash64 signatures / LSH plane constants / trained model state /
    // iterative BPE merge learning); q_quality_classifier: iterative
    // gradient descent. Driver records rows-only checks, specs carry
    // correctness.
  )
}
