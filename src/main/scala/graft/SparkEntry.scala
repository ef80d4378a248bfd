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

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Two serving-layer profiles wrap the raw constructors:
    *   - every query goes through the prepared-plan cache
    *     ([[PlanCache]]): construction (plan assembly + store sidecar
    *     checks) is memoized per (session, corpus stamp); execution is
    *     never cached.
    *   - queries in [[interactiveLane]] build against the interactive
    *     execution profile ([[Lane]]): byte-guarded AQE-off child
    *     session with corpus-scaled shuffle parallelism.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = prepared

  private lazy val prepared: Map[String, (SparkSession, String) => DataFrame] =
    rawQueries.map { case (n, f) =>
      n -> PlanCache.cached(n,
        if (expansionClass(n)) Lane.wrapExpanding(f) else Lane.wrap(f))
    }

  /** Operators whose shuffled intermediates EXPAND well past their
    * input (shingle/signature joins, word/ngram explosions, ANN
    * probes, media decode): they ride the interactive lane under the
    * tighter [[Lane.ExpandingMaxBytes]] guard, because their reduce
    * parallelism must track the expanded intermediates, which input
    * file stats cannot see. Everything else is input-proportional and
    * uses the standard guard (probed per query: tools/LaneProbe —
    * the lane won on 89 of 92 rows at sf0.1). */
  private val expansionClass: Set[String] = Set(
    "q_dedup_ngram", "q_dedup_resolve", "q_dedup_minhash", "q_dedup_simhash",
    "q_dedup_simhash_idf", "q_winnow_fingerprint", "q_text_bpe",
    "q_vocab_top", "q_rarity_score", "q_rarity_thresholds", "q_lm_score",
    "q_tfidf_terms", "q_collocations", "q_contamination",
    "q_contamination_delta", "q_repetition_stats", "q_dup_spans",
    "q_dedup_excise", "q_pack_sequences", "q_pack_bucketed",
    "q_quality_classifier", "q_knn_brute", "q_knn_lsh", "q_knn_ivf",
    "q_knn_pq", "q_knn_opq", "q_knn_ivfpq", "q_dedup_embedding",
    "q_dedup_embedding_resolve", "q_dedup_embedding_cells",
    "q_corpus_clean", "q_corpus_clean_adaptive", "q_corpus_stats",
    "q_quality_thresholds", "q_image_phash", "q_audio_phash",
    "q_video_mosaic", "q_image_dedup", "q_video_dedup",
    "q_media_crossmodal")

  /** The unwrapped constructors — [[Catalog.register]] builds its temp
    * views from these so the view lands in the CALLER's session catalog
    * (a lane-wrapped constructor returns a child-session frame, whose
    * temp view the caller's session cannot see). */
  private[graft] val rawQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pricing_summary" -> ((s, dir) => PricingSummary(s, dir)),
    "q_dim_build" -> ((s, dir) => StarSchema.dimBuild(s, dir)),
    "q_dedup_merge" -> ((s, dir) => StarSchema.dedupMerge(s, dir)),
    "q_date_dim" -> ((s, dir) => StarSchema.dateDim(s, dir)),
    "q_star_join" -> ((s, dir) => StarSchema.starJoinServed(s, dir)),
    // served from the fact layout's nation partials / transaction fact
    // (r16) — the inline forms are kept as the bit-equal scratch pair
    "q_price_usd" -> ((s, dir) => StarSchema.priceUsdServed(s, dir)),
    "q_ml_extract" -> ((s, dir) => StarSchema.mlExtractServed(s, dir)),
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
    "q_dup_spans" -> ((s, dir) => Dedup.dupSpans(s, dir)),
    "q_dedup_excise" -> ((s, dir) => Dedup.dedupExcise(s, dir)),
    "q_dedup_resolve" -> ((s, dir) => Dedup.dedupResolveServe(s, dir)),
    "q_asof_rates" -> ((s, dir) => AsOf.asofRates(s, dir)),
    "q_enrich_attach" -> ((s, dir) => AsOf.enrichAttach(s, dir)),
    "q_incremental_merge" -> ((s, dir) => Incremental.incrementalMonthly(s, dir)),
    "q_backfill_rollup" -> ((s, dir) => Incremental.backfillRollup(s, dir)),
    "q_pivot_monthly" -> ((s, dir) => Reshape.pivotMonthly(s, dir)),
    "q_unpivot_wide" -> ((s, dir) => Reshape.unpivotWide(s, dir)),
    "q_sessionize" -> ((s, dir) => Events.sessionize(s, dir)),
    "q_event_windows" -> ((s, dir) => Events.eventWindows(s, dir)),
    "q_funnel" -> ((s, dir) => Events.funnel(s, dir)),
    "q_conversion_cohort" -> ((s, dir) => Events.conversionCohort(s, dir)),
    "q_conversion_lag" -> ((s, dir) => Events.conversionLag(s, dir)),
    "q_cohort_retention" -> ((s, dir) => Events.cohortRetention(s, dir)),
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
    "q_export_manifest" -> ((s, dir) => Export.exportManifest(s, dir)),
    "q_corpus_stats" -> ((s, dir) => TextAnalysis.corpusStats(s, dir)),
    "q_quality_thresholds" -> ((s, dir) => TextAnalysis.qualityThresholds(s, dir)),
    "q_corpus_clean_adaptive" -> ((s, dir) => TextAnalysis.corpusCleanAdaptive(s, dir)),
    "q_winnow_fingerprint" -> ((s, dir) => TextAnalysis.winnowFingerprint(s, dir)),
    "q_text_bpe" -> ((s, dir) => TextAnalysis.textBpe(s, dir)),
    "q_dedup_ngram" -> ((s, dir) => Dedup.ngramJaccardServe(s, dir)),
    "q_dedup_minhash" -> ((s, dir) => Dedup.minhashDedup(s, dir)),
    "q_dedup_simhash" -> ((s, dir) => Dedup.simhashDedup(s, dir)),
    "q_dedup_simhash_idf" -> ((s, dir) => Dedup.simhashIdfDedup(s, dir)),
    "q_knn_brute" -> ((s, dir) => Similarity.knnBrute(s, dir)),
    "q_knn_lsh" -> ((s, dir) => Similarity.knnLsh(s, dir)),
    "q_knn_ivf" -> ((s, dir) => Similarity.knnIvfServe(s, dir)),
    "q_dedup_embedding" -> ((s, dir) => Similarity.embeddingDedup(s, dir)),
    "q_distinct_slices" -> ((s, dir) => Catalog.distinctSlices(s, dir)),
    "q_column_profile" -> ((s, dir) => Catalog.columnProfile(StarSchema.mlExtractServed(s, dir))),
    "q_contamination" -> ((s, dir) => Curation.contamination(s, dir)),
    "q_contamination_delta" -> ((s, dir) => Curation.contaminationServe(s, dir)),
    "q_repetition_stats" -> ((s, dir) => Curation.repetitionStats(s, dir)),
    "q_sample_stratified" -> ((s, dir) => Curation.sampleStratified(s, dir)),
    "q_rarity_score" -> ((s, dir) => Curation.rarityScore(s, dir)),
    "q_rarity_thresholds" -> ((s, dir) => Curation.rarityThresholds(s, dir)),
    "q_lm_score" -> ((s, dir) => Curation.lmScore(s, dir)),
    "q_knn_pq" -> ((s, dir) => Similarity.knnPqServe(s, dir)),
    "q_knn_opq" -> ((s, dir) => Similarity.knnOpqServe(s, dir)),
    "q_quality_classifier" -> ((s, dir) => QualityModel.qualityClassifierServe(s, dir)),
    "q_dedup_embedding_resolve" -> ((s, dir) => Similarity.embeddingDedupResolve(s, dir)),
    "q_dedup_embedding_cells" -> ((s, dir) => Similarity.embeddingDedupCells(s, dir)),
    "q_tfidf_terms" -> ((s, dir) => Curation.tfidfTerms(s, dir)),
    "q_collocations" -> ((s, dir) => Curation.collocations(s, dir)),
    "q_pii_scrub" -> ((s, dir) => Curation.piiScrub(s, dir)),
    "q_knn_ivfpq" -> ((s, dir) => Similarity.knnIvfPqServe(s, dir)),
    // all six media queries serve from the persisted hash generation
    // (Multimodal.ensureMediaHashes): ONE transcode+decode pass per
    // corpus generation, hash-table joins per query — re-decoding the
    // media corpus per query was the family's 100 TB scale-killer (r12)
    "q_image_phash" -> ((s, dir) => Multimodal.imageHashesServe(s, dir)),
    "q_audio_phash" -> ((s, dir) => Multimodal.audioHashesServe(s, dir)),
    "q_video_mosaic" -> ((s, dir) => Multimodal.mosaicHashesServe(s, dir)),
    "q_image_dedup" -> ((s, dir) => Multimodal.imageDedupServe(s, dir)),
    "q_video_dedup" -> ((s, dir) => Multimodal.videoDedupServe(s, dir)),
    "q_media_crossmodal" -> ((s, dir) => Multimodal.crossModalServe(s, dir))
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
    "q_dup_spans" -> Dedup.dupSpansOracle,
    "q_dedup_excise" -> Dedup.dedupExciseOracle,
    "q_dedup_resolve" -> Dedup.dedupResolveOracle,
    "q_asof_rates" -> AsOf.asofRatesOracle,
    "q_enrich_attach" -> AsOf.enrichAttachOracle,
    "q_incremental_merge" -> Incremental.incrementalMonthlyOracle,
    "q_backfill_rollup" -> Incremental.backfillRollupOracle,
    "q_pivot_monthly" -> Reshape.pivotMonthlyOracle,
    "q_unpivot_wide" -> Reshape.unpivotWideOracle,
    "q_sessionize" -> Events.sessionizeOracle,
    "q_event_windows" -> Events.eventWindowsOracle,
    "q_funnel" -> Events.funnelOracle,
    "q_conversion_cohort" -> Events.conversionCohortOracle,
    "q_conversion_lag" -> Events.conversionLagOracle,
    "q_cohort_retention" -> Events.cohortRetentionOracle,
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
    "q_export_manifest" -> Export.exportManifestOracle,
    "q_corpus_stats" -> TextAnalysis.corpusStatsOracle,
    "q_quality_thresholds" -> TextAnalysis.qualityThresholdsOracle,
    "q_corpus_clean_adaptive" -> TextAnalysis.corpusCleanAdaptiveOracle,
    "q_dedup_ngram" -> Dedup.ngramJaccardOracle,
    "q_knn_brute" -> Similarity.knnBruteOracle,
    "q_distinct_slices" -> Catalog.distinctSlicesOracle,
    "q_column_profile" -> Catalog.columnProfileOracle,
    "q_contamination" -> Curation.contaminationOracle,
    // the posting-index-served screen must equal the batch computation —
    // same oracle by design
    "q_contamination_delta" -> Curation.contaminationOracle,
    "q_repetition_stats" -> Curation.repetitionStatsOracle,
    "q_sample_stratified" -> Curation.sampleStratifiedOracle,
    "q_rarity_score" -> Curation.rarityScoreOracle,
    "q_rarity_thresholds" -> Curation.rarityThresholdsOracle,
    "q_lm_score" -> Curation.lmScoreOracle,
    "q_tfidf_terms" -> Curation.tfidfTermsOracle,
    "q_collocations" -> Curation.collocationsOracle,
    "q_pii_scrub" -> Curation.piiScrubOracle,
    // r17: first-fit packing IS SQL-expressible — a recursive CTE
    // replays the group-local packer with list-typed bin state
    "q_pack_sequences" -> TextAnalysis.packSequencesOracle,
    "q_pack_bucketed" -> TextAnalysis.packBucketedOracle,
    // r18: the LSH family IS SQL-expressible — the hyperplanes are
    // fixed code constants (not trained state), embedded as literals;
    // the embedding pair is branch-scoped to the LSH tier (Verify omits
    // it past LshSaturationBound, where the query runs k-means cells)
    "q_knn_lsh" -> Similarity.knnLshOracle,
    "q_dedup_embedding" -> Similarity.embeddingDedupOracle,
    "q_dedup_embedding_resolve" -> Similarity.embeddingDedupResolveOracle,
    // r19: CHECKER oracles for the trained-state ANN serves — the
    // k-means/codebook model cannot be replayed by standalone SQL, but
    // every claim in an emitted row can be independently re-derived
    // from the corpus: DuckDB recomputes each emitted pair's exact
    // cosine, re-ranks the emitted set, and recomputes recall@k vs
    // brute truth over the engine's OWN output rows (graft.Verify
    // substitutes the dump's result directory for the path token).
    // Correctness-only in the bench pair (the leading marker line —
    // see Similarity.CheckerMarker).
    "q_knn_ivf" -> Similarity.annCheckerOracle("q_knn_ivf"),
    "q_knn_pq" -> Similarity.annCheckerOracle("q_knn_pq"),
    "q_knn_opq" -> Similarity.annCheckerOracle("q_knn_opq"),
    "q_knn_ivfpq" -> Similarity.annCheckerOracle("q_knn_ivfpq"),
    "q_dedup_embedding_cells" -> Similarity.cellsCheckerOracle,
    // q_text_bpe (r20): checker oracle — the trained merge table is
    // model state (Verify substitutes it in as VALUES rows, the BPE twin
    // of the __GRAFT_OUT__ token), and DuckDB replays ENCODING from
    // scratch with a recursive CTE, re-deriving every emitted token
    // count from the corpus + table. Correctness-only in the bench pair
    // (leading marker line).
    "q_text_bpe" -> TextAnalysis.textBpeCheckerOracle
    // Still not SQL-expressible, even as a checker: q_dedup_minhash,
    // q_dedup_simhash, q_dedup_simhash_idf, q_winnow_fingerprint
    // (xxhash64 signatures — DuckDB has no compatible hash, so not even
    // the emitted signature values can be re-derived);
    // q_quality_classifier (IRLS needs bit-identical exp() across
    // engines); the media family (pure-JVM codec decode). Driver records
    // rows-only checks, pins + specs carry correctness.
  )
}
