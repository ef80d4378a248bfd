package graft.operators

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Flagship grouped price aggregation (market-flow's core workload: summary
  * statistics of price observations per category).
  *
  * Reference: the fact-table aggregates served by the dashboard
  * (`/root/reference/server/pages/`) and the price/price_per_kg measures
  * of `dbt/models/staging/stg_transactions.sql:44-56`.
  *
  * Scale notes: single shuffle on the (tiny-cardinality) group key with full
  * map-side partial aggregation; the date filter and the 6-column projection
  * are pushed to the parquet scan. Group count is 6 regardless of fact size,
  * so the reduce side is trivial at any scale.
  */
object PricingSummary {
  def apply(spark: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast(DecimalType(18, 2))
    val discPrice = dec4(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
    Tables
      .lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("2000-12-01").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumd2(col("l_quantity")).as("sum_qty"),
        sumd2(col("l_extendedprice")).as("sum_base_price"),
        sum(discPrice).cast(DoubleType).as("sum_disc_price"),
        sum(discPrice * (one + dec2(col("l_tax")))).cast(DoubleType).as("sum_charge"),
        meanOf(sumd2(col("l_quantity")), cnt).as("avg_qty"),
        meanOf(sumd2(col("l_extendedprice")), cnt).as("avg_price"),
        meanOf(sumd2(col("l_discount")), cnt).as("avg_disc"),
        cnt.as("count_order")
      )
  }

  /** Oracle note (r17, surfaced by the sf10 gate): wide-decimal sums
    * convert to DOUBLE through a VARCHAR round-trip. DuckDB's direct
    * decimal→double cast on the int128 storage path is not correctly
    * rounded (observed one ulp high at 4.5e11 scale-6: sum_charge
    * ...729.7297 read ...729.72974), while Spark's Decimal.toDouble is
    * BigDecimal-exact; strtod of the decimal's text is correctly
    * rounded in both engines. The avg_* numerators are the SAME sums
    * (sum_base_price's unscaled units cross 2^53 around sf100), so they
    * take the same round-trip (r17 ADVICE). */
  val oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_price,
      |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin
}
