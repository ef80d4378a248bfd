package graft

import graft.operators._
import graft.sources.Sinks
import org.apache.spark.sql.SparkSession

/** End-to-end pipeline main — the engine-side equivalent of the
  * reference's `make run-full-pipeline` (Airflow DAG chain raw -> staging
  * -> analytics -> ML extract, `/root/reference/Makefile`): builds the
  * dimension tables, the fact rollups, the analytics outputs, and the
  * denormalized forecasting extract in one Spark application, persisting
  * each layer as partitioned parquet.
  *
  * Orchestration (scheduling, retries) stays external by design — any
  * scheduler that can run a JVM main reproduces the reference's Airflow
  * setup; the engine itself is scheduler-agnostic.
  *
  * Usage: runMain graft.Pipeline <sfDir> <outDir>
  */
object Pipeline {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val spark = GraftSession.builder("graft-pipeline")
      .master(s"local[${GraftSession.cpus}]")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir, outDir)
    spark.stop()
  }

  def run(spark: SparkSession, sfDir: String, outDir: String): Unit = {
    val t0 = System.nanoTime()

    def stage(name: String)(df: org.apache.spark.sql.DataFrame,
        partitionCols: Seq[String] = Nil): Unit = {
      val s0 = System.nanoTime()
      Sinks.writeParquet(df, s"$outDir/$name", partitionCols)
      println(f"[pipeline] $name%-22s ${(System.nanoTime() - s0) / 1e9}%7.2fs")
    }

    // staging/analytics dims (dbt staging + analytics layers)
    stage("dim_locality")(StarSchema.dimBuild(spark, sfDir))
    stage("dim_country")(StarSchema.dedupMerge(spark, sfDir))
    stage("dim_date")(StarSchema.dateDim(spark, sfDir))
    stage("dim_unit")(Units.unitNormalize(spark, sfDir))
    // facts + analytics
    stage("fact_rollup")(StarSchema.starJoin(spark, sfDir))
    stage("fact_price_per_unit")(Units.pricePerUnit(spark, sfDir))
    stage("seasonal")(Seasonal.seasonalAgg(spark, sfDir))
    stage("monthly_trend")(Seasonal.monthlyTrend(spark, sfDir), Seq("year"))
    stage("best_markets")(TopK.topkPerGroup(spark, sfDir))
    stage("forecasts")(Forecast.seasonalForecast(spark, sfDir))
    // the prophet-input extract (dag_prophet_output.py)
    stage("ml_data")(StarSchema.mlExtract(spark, sfDir), Seq("country"))
    // LLM-corpus curation layers, genuinely CHAINED: splits, packs and
    // the report are computed over the CLEANED corpus (docs the curation
    // dropped must not leak into split assignments or bin fills).
    // Curation uses the DATA-DERIVED per-language floors and packing the
    // length-aware first-fit-decreasing — the r3 upgrades are the
    // pipeline defaults, not side queries.
    stage("corpus_thresholds")(TextAnalysis.qualityThresholds(spark, sfDir))
    // the clean applies the JUST-WRITTEN floors (read back like every
    // other chained layer) — the persisted thresholds are the thresholds
    // used, by construction rather than by recomputation
    val clean = TextAnalysis.corpusCleanWithFloors(
      TextAnalysis.scoredCorpus(spark, sfDir),
      spark.read.parquet(s"$outDir/corpus_thresholds"))
    stage("corpus_clean")(clean)
    val cleanedDocs = Tables.documents(spark, sfDir)
      .join(spark.read.parquet(s"$outDir/corpus_clean").select("doc_id"), Seq("doc_id"), "left_semi")
    stage("corpus_splits")(TextAnalysis.trainSplitOf(cleanedDocs))
    stage("corpus_packed")(TextAnalysis.packSequencesBucketedOf(spark, cleanedDocs))
    stage("corpus_report")(TextAnalysis.corpusStatsOf(
      spark.read.parquet(s"$outDir/corpus_clean")))
    // persisted model state: forecast sufficient statistics (maintained
    // incrementally by mergeForecastModel on later batches)
    stage("forecast_model")(Forecast.forecastModelFrame(spark, sfDir))

    println(f"[pipeline] TOTAL ${(System.nanoTime() - t0) / 1e9}%.2fs -> $outDir")
  }
}
