package graft.operators

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Covariate statistics: exact Pearson correlation per group.
  *
  * Reference: README objective "Impact of weather variations — measure the
  * influence of seasonal weather changes on pricing" and the weather
  * covariates carried into the ML extract (`dags/prophet/
  * dag_prophet_output.py:33-34`). The harness schema's (discount,
  * quantity) pair stands in for (temperature, price).
  *
  * Built-in `corr()` aggregates doubles and is therefore not reproducible
  * across partitionings; this operator computes r from exact decimal
  * moment sums in one map-side-combined pass, then derives r in doubles
  * with the oracle's exact formula. Group count bounds the reduce side at
  * any fact scale.
  */
object Stats {

  /** q_covariate_corr — Pearson r between discount and quantity per brand. */
  def covariateCorr(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables
      .lineitem(spark, dir)
      .select(col("l_partkey"), col("l_discount"), col("l_quantity"))
    val p = broadcast(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")))
    val x = dec2(col("l_discount"))
    val y = dec2(col("l_quantity"))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(
        cnt.as("n"),
        sum(x).cast(DoubleType).as("sx"),
        sum(y).cast(DoubleType).as("sy"),
        sum((x * y).cast(DecimalType(22, 4))).cast(DoubleType).as("sxy"),
        sum((x * x).cast(DecimalType(22, 4))).cast(DoubleType).as("sxx"),
        sum((y * y).cast(DecimalType(22, 4))).cast(DoubleType).as("syy"))
      .withColumn(
        "corr_disc_qty",
        (col("n").cast(DoubleType) * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n").cast(DoubleType) * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n").cast(DoubleType) * col("syy") - col("sy") * col("sy"))))
      .select(col("brand"), col("n"), col("corr_disc_qty"))
  }

  val covariateCorrOracle: String =
    """SELECT brand, n,
      |  (CAST(n AS DOUBLE) * sxy - sx * sy)
      |    / (SQRT(CAST(n AS DOUBLE) * sxx - sx * sx)
      |       * SQRT(CAST(n AS DOUBLE) * syy - sy * sy)) AS corr_disc_qty
      |FROM (
      |  SELECT p_brand AS brand, COUNT(*) AS n,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(22,4))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(22,4))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(22,4))) AS DOUBLE) AS syy
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY p_brand
      |)""".stripMargin
}
