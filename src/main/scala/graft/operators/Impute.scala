package graft.operators

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Missing/invalid-value imputation, single-pass and driver-free.
  *
  * Reference: `dags/spark/impute_missing_currencies.py` (Spark ML `Imputer`,
  * strategy="mean") and `dags/spark/impute_missing_coords.py` (per-country
  * mean coordinates, applied row-by-row through the driver). Both are
  * re-expressed as declarative two-phase aggregate+broadcast-join plans: the
  * reference's driver-side UPDATE loop becomes a joined CASE, which is the
  * scalable form (no collect, no per-row round trips).
  *
  * "Missing" in the harness data: negative account balances stand in for the
  * reference's NULL currency values/coordinates.
  *
  * Scale notes: the stats pass is a full map-side-combined decimal aggregate
  * (one row per group out); the fill pass broadcast-joins those stats back,
  * so the fact table is scanned twice but never shuffled. At 100 TB the
  * stats side is bounded by group cardinality (25 nations), never by rows.
  */
object Impute {

  /** q_impute_mean — global mean imputation of invalid values
    * (impute_missing_currencies.py:74-88). */
  def meanImpute(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_acctbal"))
    val valid = c.filter(col("c_acctbal") >= 0)
    val stats = valid.agg(
      meanOf(sumd2(col("c_acctbal")), cnt).as("mean_valid"))
    c.crossJoin(broadcast(stats))
      .select(
        col("c_custkey"),
        col("c_acctbal"),
        when(col("c_acctbal") < 0, col("mean_valid"))
          .otherwise(col("c_acctbal"))
          .as("acctbal_imputed"))
  }

  val meanImputeOracle: String =
    """SELECT c_custkey, c_acctbal,
      |  CASE WHEN c_acctbal < 0 THEN mean_valid ELSE c_acctbal END AS acctbal_imputed
      |FROM customer CROSS JOIN (
      |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_valid
      |  FROM customer WHERE c_acctbal >= 0
      |)""".stripMargin

  /** q_impute_group_mean — per-group (nation) mean imputation
    * (impute_missing_coords.py:22-47), with a global-mean fallback for
    * groups that have no valid rows. */
  def groupMeanImpute(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
    val valid = c.filter(col("c_acctbal") >= 0)
    val groupStats = valid
      .groupBy(col("c_nationkey").as("g_nationkey"))
      .agg(meanOf(sumd2(col("c_acctbal")), cnt).as("group_mean"))
    val globalStats = valid.agg(meanOf(sumd2(col("c_acctbal")), cnt).as("global_mean"))
    c.join(broadcast(groupStats), col("c_nationkey") === col("g_nationkey"), "left")
      .crossJoin(broadcast(globalStats))
      .select(
        col("c_custkey"),
        col("c_nationkey"),
        col("c_acctbal"),
        when(col("c_acctbal") < 0, coalesce(col("group_mean"), col("global_mean")))
          .otherwise(col("c_acctbal"))
          .as("acctbal_imputed"))
  }

  val groupMeanImputeOracle: String =
    """SELECT c_custkey, c_nationkey, c_acctbal,
      |  CASE WHEN c_acctbal < 0 THEN COALESCE(group_mean, global_mean) ELSE c_acctbal END AS acctbal_imputed
      |FROM customer
      |LEFT JOIN (
      |  SELECT c_nationkey AS g_nationkey,
      |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS group_mean
      |  FROM customer WHERE c_acctbal >= 0 GROUP BY c_nationkey
      |) ON c_nationkey = g_nationkey
      |CROSS JOIN (
      |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS global_mean
      |  FROM customer WHERE c_acctbal >= 0
      |)""".stripMargin
}
