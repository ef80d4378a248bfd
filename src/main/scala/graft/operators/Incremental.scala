package graft.operators

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental aggregation: maintain a rollup under batch arrivals.
  *
  * Reference: the Airflow DAGs re-ingest and rebuild tables on a daily
  * schedule (`dags/raw/ingest_kaggle_data.py`, `@daily`). The Spark-first
  * form keeps a PARTIAL-SUM rollup (decimal sums + counts — associative,
  * commutative) and folds each new batch in with a key-wise merge, so a
  * day's update costs O(delta + rollup) instead of a full recompute.
  *
  * Because the partials are exact decimals, merged state is bit-identical
  * to a from-scratch aggregation — which is precisely what the oracle
  * checks (the SQL side computes directly over all data; the Spark side
  * answers from split-then-merged partials).
  */
object Incremental {

  /** Partial monthly rollup state for a slice of the fact table. */
  def partialMonthly(slice: DataFrame): DataFrame =
    slice
      .groupBy(col("brand"), col("year"), col("month"))
      .agg(
        sum(dec2(col("price"))).cast(DecimalType(28, 2)).as("sum_dec"),
        cnt.as("n"))

  /** Merge any number of partial rollups into one (associative). */
  def merge(parts: Seq[DataFrame]): DataFrame =
    parts
      .reduce(_ unionByName _)
      .groupBy(col("brand"), col("year"), col("month"))
      .agg(
        sum(col("sum_dec")).cast(DecimalType(28, 2)).as("sum_dec"),
        sum(col("n")).as("n"))

  /** q_incremental_merge — the monthly rollup answered from two
    * independently-aggregated halves of the fact (split at 1999-01-01)
    * merged together; must equal the direct aggregation exactly. */
  def incrementalMonthly(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables
      .lineitem(spark, dir)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_shipdate"))
    val p = broadcast(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")))
    val base = li
      .join(p, col("l_partkey") === col("p_partkey"))
      .select(
        col("p_brand").as("brand"),
        year(col("l_shipdate")).as("year"),
        month(col("l_shipdate")).as("month"),
        col("l_extendedprice").as("price"),
        col("l_shipdate"))
    val cutoff = lit("1999-01-01").cast(TimestampType)
    val history = partialMonthly(base.filter(col("l_shipdate") < cutoff))
    val delta = partialMonthly(base.filter(col("l_shipdate") >= cutoff))
    merge(Seq(history, delta))
      .select(
        col("brand"), col("year"), col("month"),
        col("sum_dec").cast(DoubleType).as("sum_price"),
        col("n").as("n_obs"))
  }

  val incrementalMonthlyOracle: String =
    """SELECT p_brand AS brand,
      |  CAST(EXTRACT(year FROM l_shipdate) AS INT) AS year,
      |  CAST(EXTRACT(month FROM l_shipdate) AS INT) AS month,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS DOUBLE) AS sum_price,
      |  COUNT(*) AS n_obs
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1, 2, 3""".stripMargin
}
