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

  /** Exact per-group OLS sufficient statistics (syy feeds the residual
    * variance for prediction intervals; unused columns are pruned by
    * Catalyst in the queries that don't need it). */
  private def olsStats(df: DataFrame): DataFrame =
    df.groupBy(col("brand"))
      .agg(
        cnt.as("n"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        sum(dec2(col("y"))).cast(DoubleType).as("sy"),
        sum(xDec * dec2(col("y"))).cast(DoubleType).as("sxy"),
        sum(dec2(col("y")) * dec2(col("y"))).cast(DoubleType).as("syy"),
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

  /** q_forecast_interval — next-month forecast with a Prophet-parity
    * uncertainty band: the reference serves `yhat_lower`/`yhat_upper`
    * from Prophet's default 80% interval
    * (`single_product_forecasting.py`, interval_width=0.8); here the
    * band is the classical OLS prediction interval derived from the SAME
    * exact sufficient statistics as the trend fit —
    * se² = s²(1 + 1/n + (x0-x̄)²/Sxx), s² = SSE/(n-2) — with z for the
    * 80% two-sided normal interval. One extra decimal sum (syy) on the
    * existing single aggregation pass; no second scan. */
  def forecastInterval(spark: SparkSession, dir: String): DataFrame = {
    val nD = col("n").cast(DoubleType)
    val sxD = col("sx").cast(DoubleType)
    val sxxD = col("sxx").cast(DoubleType)
    val x0 = (col("max_x") + 1).cast(DoubleType)
    olsStats(joined(spark, dir))
      .withColumn("slope", slopeCol)
      .withColumn("intercept", (col("sy") - col("slope") * sxD) / nD)
      .withColumn("forecast_next", col("intercept") + col("slope") * x0)
      // the guard keeps every division/sqrt inside the defined region so
      // Spark and DuckDB cannot diverge on IEEE edge values
      .withColumn(
        "se_pred",
        when(col("n") > 2 && nD * sxxD - sxD * sxD > 0,
          sqrt(
            (greatest(col("syy") - col("intercept") * col("sy") - col("slope") * col("sxy"),
              lit(0.0)) / (nD - 2.0)) *
              (lit(1.0) + lit(1.0) / nD +
                (x0 - sxD / nD) * (x0 - sxD / nD) / (sxxD - sxD * sxD / nD)))))
      .withColumn("yhat_lo", col("forecast_next") - lit(1.2815515655446004) * col("se_pred"))
      .withColumn("yhat_hi", col("forecast_next") + lit(1.2815515655446004) * col("se_pred"))
      .select(col("brand"), col("n"), col("forecast_next"), col("se_pred"),
        col("yhat_lo"), col("yhat_hi"))
  }

  val forecastIntervalOracle: String =
    """WITH stats AS (
      |  SELECT p_brand AS brand, COUNT(*) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx,
      |    CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sy,
    |    CAST(SUM(CAST(x AS DECIMAL(10,0)) * CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
      |    -- via VARCHAR: syy's scaled magnitude exceeds 2^53, and DuckDB's
      |    -- direct decimal->double cast double-rounds (int128 -> double,
      |    -- then /10^4); the string path is correctly rounded, matching
      |    -- Spark's BigDecimal.doubleValue
      |    CAST(CAST(SUM(CAST(y AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS syy,
      |    CAST(MAX(x) AS BIGINT) AS max_x
      |  FROM (
      |    SELECT p_brand,
      |      (CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) - 1995) * 12
      |        + CAST(EXTRACT(month FROM l_shipdate) AS BIGINT) - 1 AS x,
      |      l_extendedprice AS y
      |    FROM lineitem JOIN part ON l_partkey = p_partkey
      |  ) GROUP BY p_brand
      |), sloped AS (
      |  SELECT *, CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
      |    THEN (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |    ELSE NULL END AS slope
      |  FROM stats
      |), fitted AS (
      |  SELECT *, (sy - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept FROM sloped
      |), fc AS (
      |  SELECT *, intercept + slope * CAST(max_x + 1 AS DOUBLE) AS forecast_next FROM fitted
      |), banded AS (
      |  SELECT *, CASE WHEN n > 2 AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
      |    THEN SQRT(
      |      (GREATEST(syy - intercept * sy - slope * sxy, 0.0) / (CAST(n AS DOUBLE) - 2.0)) *
      |      (1.0 + 1.0 / CAST(n AS DOUBLE) +
      |        (CAST(max_x + 1 AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
      |        * (CAST(max_x + 1 AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
      |        / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))))
      |    ELSE NULL END AS se_pred
      |  FROM fc
      |)
      |SELECT brand, n, forecast_next, se_pred,
      |  forecast_next - 1.2815515655446004 * se_pred AS yhat_lo,
      |  forecast_next + 1.2815515655446004 * se_pred AS yhat_hi
      |FROM banded""".stripMargin

  /** q_forecast_weekly — Prophet-parity weekly seasonality
    * (`server/forecast_utils.py:29-34` fits weekly_seasonality=True):
    * daily-index OLS trend plus additive day-of-week seasonal indices
    * (mean deviation per dow, exact-decimal), forecasting the 7 days
    * after each brand's last observation. dow is Spark's `dayofweek`
    * (1=Sunday..7=Saturday; the oracle shifts DuckDB's 0-based dow). */
  def forecastWeekly(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables
      .lineitem(spark, dir)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_shipdate"))
    val p = broadcast(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")))
    val epoch = lit("1995-01-01").cast(DateType)
    val base = li.join(p, col("l_partkey") === col("p_partkey"))
      .select(
        col("p_brand").as("brand"),
        datediff(col("l_shipdate"), epoch).cast(LongType).as("x"),
        dayofweek(col("l_shipdate")).as("dow"),
        col("l_extendedprice").as("y"))
    val trend = olsStats(base)
      .withColumn("slope", slopeCol)
      .withColumn(
        "intercept",
        (col("sy") - col("slope") * col("sx").cast(DoubleType)) / col("n").cast(DoubleType))
      .withColumn("mean_all", col("sy") / col("n").cast(DoubleType))
      .select(col("brand"), col("slope"), col("intercept"), col("mean_all"), col("max_x"))
    val dowMeans = base
      .groupBy(col("brand").as("db"), col("dow"))
      .agg(meanOf(sum(dec2(col("y"))).cast(DoubleType), cnt).as("mean_dow"))
    val futures = trend
      .withColumn("day_offset", explode(sequence(lit(1), lit(7))))
      .withColumn("x_future", col("max_x") + col("day_offset"))
      .withColumn("forecast_date", date_add(epoch, col("x_future").cast(IntegerType)))
      .withColumn("fdow", dayofweek(col("forecast_date")))
    futures
      // dow means are group-cardinality (brands x 7) — broadcast, never SMJ
      .join(broadcast(dowMeans), col("brand") === col("db") && col("fdow") === col("dow"))
      .withColumn("seasonal_idx", col("mean_dow") - col("mean_all"))
      .withColumn(
        "forecast",
        col("intercept") + col("slope") * col("x_future").cast(DoubleType) + col("seasonal_idx"))
      .select(col("brand"), col("day_offset"), col("forecast_date"), col("dow"),
        col("seasonal_idx"), col("forecast"))
  }

  val forecastWeeklyOracle: String =
    """WITH base AS (
      |  SELECT p_brand AS brand,
      |    CAST(DATE_DIFF('day', DATE '1995-01-01', l_shipdate) AS BIGINT) AS x,
      |    CAST(EXTRACT(dow FROM l_shipdate) AS INT) + 1 AS dow,
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
      |    sy / CAST(n AS DOUBLE) AS mean_all, max_x
      |  FROM (
      |    SELECT brand, n, sx, sy, max_x,
      |      CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
      |      THEN (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      ELSE NULL END AS slope
      |    FROM stats
      |  )
      |), dowm AS (
      |  SELECT brand AS db, dow,
      |    CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_dow
      |  FROM base GROUP BY brand, dow
      |), futures AS (
      |  SELECT brand, slope, intercept, mean_all, max_x,
      |    CAST(d AS INT) AS day_offset,
      |    max_x + d AS x_future,
      |    DATE '1995-01-01' + CAST(max_x + d AS INTEGER) AS forecast_date
      |  FROM trend, (SELECT UNNEST(GENERATE_SERIES(1, 7)) AS d)
      |)
      |SELECT f.brand, f.day_offset, f.forecast_date, m.dow,
      |  m.mean_dow - f.mean_all AS seasonal_idx,
      |  f.intercept + f.slope * CAST(f.x_future AS DOUBLE) + (m.mean_dow - f.mean_all) AS forecast
      |FROM futures f JOIN dowm m
      |  ON f.brand = m.db AND CAST(EXTRACT(dow FROM f.forecast_date) AS INT) + 1 = m.dow""".stripMargin

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
