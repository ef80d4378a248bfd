package graft.operators

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed "prophet-lite" forecasting: per-group OLS trend plus an
  * additive monthly-seasonality component, computed exactly from decimal
  * sufficient statistics.
  *
  * Reference: `server/forecast_utils.py` — Prophet models (trend + yearly
  * seasonality) fit per (country, product, market) in a driver-side thread
  * pool. The Spark-first re-expression replaces the per-group model-fit
  * loop with ONE aggregation computing every group's OLS sufficient
  * statistics (n, Sx, Sy, Sxx, Sxy) — a single map-side-combined shuffle
  * for ALL groups, which is what survives when "groups" means millions of
  * (product, market) series over 100 TB. The seasonal component mirrors
  * Prophet's additive seasonality as month-of-year mean deviations.
  *
  * Determinism: x is an integer month index and y a DECIMAL(18,2) price,
  * so every sufficient statistic is exact; slope/intercept/forecast are
  * derived in doubles with formulas textually identical to the oracle SQL.
  */
object Forecast {

  /** Month index: months since 1995-01 (data starts 1995). */
  private def tIndex(d: Column): Column =
    ((year(d) - 1995) * 12 + month(d) - 1).cast(LongType)

  private def joined(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables
      .lineitem(spark, dir)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_shipdate"))
    val p = broadcast(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .select(
        col("p_brand").as("brand"),
        tIndex(col("l_shipdate")).as("x"),
        month(col("l_shipdate")).as("m"),
        col("l_extendedprice").as("y"))
  }

  private val xDec: Column = col("x").cast(DecimalType(10, 0))

  /** Exact per-group OLS sufficient statistics. */
  private def olsStats(df: DataFrame): DataFrame =
    df.groupBy(col("brand"))
      .agg(
        cnt.as("n"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        sum(dec2(col("y"))).cast(DoubleType).as("sy"),
        sum(xDec * dec2(col("y"))).cast(DoubleType).as("sxy"),
        max(col("x")).as("max_x"))

  /** OLS slope with a degenerate-series guard: a group whose x values are
    * all identical has zero x-variance — NULL slope (ANSI double division
    * would otherwise abort the job; DuckDB yields NULL rows). */
  private def slopeCol: Column = {
    val varX = col("n").cast(DoubleType) * col("sxx").cast(DoubleType) -
      col("sx").cast(DoubleType) * col("sx").cast(DoubleType)
    when(varX > 0,
      (col("n").cast(DoubleType) * col("sxy") - col("sx").cast(DoubleType) * col("sy")) / varX)
  }

  /** q_forecast_linear — per-brand linear trend and next-month forecast. */
  def forecastLinear(spark: SparkSession, dir: String): DataFrame =
    olsStats(joined(spark, dir))
      .withColumn("slope", slopeCol)
      .withColumn(
        "intercept",
        (col("sy") - col("slope") * col("sx").cast(DoubleType)) / col("n").cast(DoubleType))
      .withColumn(
        "forecast_next",
        col("intercept") + col("slope") * (col("max_x") + 1).cast(DoubleType))
      .select(col("brand"), col("n"), col("slope"), col("intercept"), col("forecast_next"))

  val forecastLinearOracle: String =
    """SELECT brand, n, slope,
      |  (sy - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
      |  (sy - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
      |    + slope * CAST(max_x + 1 AS DOUBLE) AS forecast_next
      |FROM (
      |  SELECT brand, n, sx, sxx, sy, sxy, max_x,
      |    CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
      |    THEN (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |    ELSE NULL END AS slope
      |  FROM (
      |    SELECT p_brand AS brand, COUNT(*) AS n,
      |      CAST(SUM(x) AS BIGINT) AS sx,
      |      CAST(SUM(x * x) AS BIGINT) AS sxx,
      |      CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sy,
      |      CAST(SUM(CAST(x AS DECIMAL(10,0)) * CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
      |      CAST(MAX(x) AS BIGINT) AS max_x
      |    FROM (
      |      SELECT p_brand,
      |        (CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) - 1995) * 12
      |          + CAST(EXTRACT(month FROM l_shipdate) AS BIGINT) - 1 AS x,
      |        l_extendedprice AS y
      |      FROM lineitem JOIN part ON l_partkey = p_partkey
      |    ) GROUP BY p_brand
      |  )
      |)""".stripMargin

  /** q_seasonal_forecast — trend + additive month-of-year seasonality:
    * forecast for each month of the year after each brand's last
    * observed month. Seasonal index = (month mean) - (overall mean). */
  def seasonalForecast(spark: SparkSession, dir: String): DataFrame = {
    val base = joined(spark, dir)
    val trend = olsStats(base)
      .withColumn("slope", slopeCol)
      .withColumn(
        "intercept",
        (col("sy") - col("slope") * col("sx").cast(DoubleType)) / col("n").cast(DoubleType))
      .withColumn("mean_all", col("sy") / col("n").cast(DoubleType))
      .select(col("brand"), col("slope"), col("intercept"), col("mean_all"), col("max_x"))
    val monthly = base
      .groupBy(col("brand").as("mb"), col("m").as("month"))
      .agg(meanOf(sum(dec2(col("y"))).cast(DoubleType), cnt).as("mean_month"))
    monthly
      .join(broadcast(trend), col("mb") === col("brand"))
      .withColumn("seasonal_idx", col("mean_month") - col("mean_all"))
      // forecast horizon: month m of the year after the last observed index
      .withColumn(
        "x_future",
        ((floor((col("max_x") + lit(12)) / 12) * 12) + col("month") - 1).cast(DoubleType))
      .withColumn(
        "forecast",
        col("intercept") + col("slope") * col("x_future") + col("seasonal_idx"))
      .select(col("brand"), col("month"), col("seasonal_idx"), col("forecast"))
  }

  val seasonalForecastOracle: String =
    """WITH base AS (
      |  SELECT p_brand AS brand,
      |    (CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) - 1995) * 12
      |      + CAST(EXTRACT(month FROM l_shipdate) AS BIGINT) - 1 AS x,
      |    CAST(EXTRACT(month FROM l_shipdate) AS INT) AS m,
      |    l_extendedprice AS y
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |), stats AS (
      |  SELECT brand, COUNT(*) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx,
      |    CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(x AS DECIMAL(10,0)) * CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
      |    CAST(MAX(x) AS BIGINT) AS max_x
      |  FROM base GROUP BY brand
      |), trend AS (
      |  SELECT brand, slope,
      |    (sy - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
      |    sy / CAST(n AS DOUBLE) AS mean_all,
      |    max_x
      |  FROM (
      |    SELECT brand, n, sx, sy, max_x,
      |      CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
      |      THEN (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      ELSE NULL END AS slope
      |    FROM stats
      |  )
      |), monthly AS (
      |  SELECT brand AS mb, m AS month,
      |    CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_month
      |  FROM base GROUP BY brand, m
      |)
      |SELECT brand, month,
      |  mean_month - mean_all AS seasonal_idx,
      |  intercept + slope * CAST((CAST(FLOOR((max_x + 12) / 12) AS BIGINT) * 12) + month - 1 AS DOUBLE)
      |    + (mean_month - mean_all) AS forecast
      |FROM monthly JOIN trend ON mb = brand""".stripMargin
}
